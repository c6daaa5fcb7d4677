// Instrumented REFERENCE MinaCalc binding for parity debugging: runs the
// unmodified reference Calc and exposes its per-interval internals (doot,
// soap, base_adj_diff, itv_points, jack_diff) in the same dict layout as
// the repo's minacalc.calc_debug. Parity tooling only — not shipped.
#include <Python.h>
#include "MinaCalc/MinaCalc.h"
#include "MinaCalc/MinaCalcHelpers.h"
#include <vector>

static PyObject* VecToList(const float* v, int n) {
  PyObject* l = PyList_New(n);
  for (int i = 0; i < n; ++i) PyList_SetItem(l, i, PyFloat_FromDouble(v[i]));
  return l;
}

static PyObject* method_calc_debug(PyObject*, PyObject* args) {
  float rate = 0.f, score_goal = default_score_goal;
  PyObject* note_buff = nullptr;
  if (!PyArg_ParseTuple(args, "fO|f", &rate, &note_buff, &score_goal))
    return nullptr;
  Py_ssize_t size = PyList_Size(note_buff);
  std::vector<NoteInfo> rows;
  rows.reserve(size);
  long current_time = -1;
  unsigned current_notes = 0;
  for (Py_ssize_t i = 0; i < size; ++i) {
    PyObject* tup = PyList_GetItem(note_buff, i);
    long time_ms = PyLong_AsLong(PyTuple_GetItem(tup, 0));
    long column = PyLong_AsLong(PyTuple_GetItem(tup, 1));
    if (current_time != time_ms) {
      if (current_notes != 0) {
        rows.push_back({current_notes, current_time / 1000.f});
        current_notes = 0;
      }
      current_time = time_ms;
    }
    current_notes |= 1u << column;
  }
  if (current_notes != 0)
    rows.push_back({current_notes, current_time / 1000.f});

  Calc* calc = new Calc;
  std::vector<float> ssr = calc->CalcMain(rows, rate, score_goal);

  PyObject* out = PyDict_New();
  auto set_rel = [&out](const char* key, PyObject* v) {
    PyDict_SetItemString(out, key, v);
    Py_DECREF(v);
  };
  PyObject* pssr = PyList_New(ssr.size());
  for (size_t i = 0; i < ssr.size(); ++i)
    PyList_SetItem(pssr, i, PyFloat_FromDouble(ssr[i]));
  set_rel("ssr", pssr);
  int n = calc->numitv;
  set_rel("numitv", PyLong_FromLong(n));
  PyObject* doot = PyList_New(2);
  PyObject* soap = PyList_New(2);
  PyObject* badj = PyList_New(2);
  PyObject* itvpts = PyList_New(2);
  PyObject* jackd = PyList_New(2);
  for (int h = 0; h < 2; ++h) {
    PyObject* dl = PyList_New(NUM_CalcPatternMod);
    for (int m = 0; m < NUM_CalcPatternMod; ++m)
      PyList_SetItem(dl, m, VecToList(calc->doot[h][m].data(), n));
    PyList_SetItem(doot, h, dl);
    PyObject* sl = PyList_New(2);
    PyList_SetItem(sl, 0, VecToList(calc->soap[h][NPSBase].data(), n));
    PyList_SetItem(sl, 1, VecToList(calc->soap[h][TechBase].data(), n));
    PyList_SetItem(soap, h, sl);
    PyObject* bl = PyList_New(NUM_Skillset);
    for (int m = 0; m < NUM_Skillset; ++m)
      PyList_SetItem(bl, m, VecToList(calc->base_adj_diff[h][m].data(), n));
    PyList_SetItem(badj, h, bl);
    PyObject* pl = PyList_New(n);
    for (int i = 0; i < n; ++i)
      PyList_SetItem(pl, i, PyLong_FromLong(calc->itv_points[h][i]));
    PyList_SetItem(itvpts, h, pl);
    PyObject* jl = PyList_New(calc->jack_diff[h].size());
    for (size_t i = 0; i < calc->jack_diff[h].size(); ++i) {
      PyObject* a = PyFloat_FromDouble(calc->jack_diff[h][i].first);
      PyObject* b = PyFloat_FromDouble(calc->jack_diff[h][i].second);
      PyObject* t = PyTuple_Pack(2, a, b);
      Py_DECREF(a); Py_DECREF(b);
      PyList_SetItem(jl, i, t);
    }
    PyList_SetItem(jackd, h, jl);
  }
  set_rel("doot", doot);
  set_rel("soap", soap);
  set_rel("base_adj_diff", badj);
  set_rel("itv_points", itvpts);
  set_rel("jack_diff", jackd);
  delete calc;
  return out;
}

static PyMethodDef Methods[] = {
  {"calc_debug", method_calc_debug, METH_VARARGS, "debug internals"},
  {NULL, NULL, 0, NULL}
};
static struct PyModuleDef mod = {
  PyModuleDef_HEAD_INIT, "minacalc_refdbg", "ref debug", -1, Methods
};
PyMODINIT_FUNC PyInit_minacalc_refdbg(void) { return PyModule_Create(&mod); }
