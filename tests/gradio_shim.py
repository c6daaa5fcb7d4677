"""Minimal gradio stand-in for driving webui.py's Blocks graph in tests.

gradio is not installable in this image (zero egress), so this shim
implements just enough of the API surface webui.py uses — components as
value-less records, event wiring that registers (fn, inputs, outputs) under
the given ``api_name``, ``gr.update`` as a dict, ``gr.Error`` as an
exception — letting tests call the REAL endpoint callbacks with the REAL
registered argument order, which is exactly the contract `gradio_client`
consumers rely on.
"""

from __future__ import annotations

import types


class Error(Exception):
    pass


def update(**kwargs):
    return {"__type__": "update", **kwargs}


class Progress:
    def __call__(self, *a, **k):
        return None

    def tqdm(self, iterable, *a, **k):
        return iterable


class _Component:
    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.label = kwargs.get("label")
        _CURRENT["components"].append(self)

    def _register(self, event, fn, inputs=None, outputs=None, api_name=None,
                  **kwargs):
        _CURRENT["endpoints"][api_name or f"{event}_{id(fn)}"] = types.\
            SimpleNamespace(fn=fn, inputs=inputs or [], outputs=outputs or [])

    def click(self, fn, inputs=None, outputs=None, api_name=None, **kwargs):
        self._register("click", fn, inputs, outputs, api_name, **kwargs)

    def upload(self, fn, inputs=None, outputs=None, api_name=None, **kwargs):
        self._register("upload", fn, inputs, outputs, api_name, **kwargs)

    def change(self, fn, inputs=None, outputs=None, api_name=None, **kwargs):
        self._register("change", fn, inputs, outputs, api_name, **kwargs)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class Blocks(_Component):
    def __init__(self, *args, **kwargs):
        _CURRENT["components"] = []
        _CURRENT["endpoints"] = {}
        super().__init__(*args, **kwargs)
        self.endpoints = _CURRENT["endpoints"]
        self.components = _CURRENT["components"]

    def queue(self, *a, **k):
        return self

    def launch(self, *a, **k):
        raise RuntimeError("shim does not launch servers")


_CURRENT = {"components": [], "endpoints": {}}


def _make(name):
    return type(name, (_Component,), {})


Markdown = _make("Markdown")
Tab = _make("Tab")
Row = _make("Row")
Column = _make("Column")
File = _make("File")
Textbox = _make("Textbox")
Checkbox = _make("Checkbox")
Radio = _make("Radio")
Slider = _make("Slider")
Number = _make("Number")
Button = _make("Button")
Gallery = _make("Gallery")
Dataframe = _make("Dataframe")
Dropdown = _make("Dropdown")
