"""Compare the repo's native MinaCalc against the reference extension.

Generates realistic synthetic 4K charts (streams, jumpstream, handstream,
jacks, chordjack, tech, mixed — with tempo drift, bursts, and chords), runs
both calculators over a rate sweep, and reports the worst per-skillset MSD
difference plus dominant-pattern-flag agreement (the training-label threshold
at mug_diffusion_tpu/data/dataset.py — "dominant = within 1 MSD of max").

The reference extension (built from /root/reference/scripts/MinaCalc-1.0.tar.gz)
is executed in a subprocess to avoid the module-name collision with ours.

Usage:
    python scripts/minacalc_parity.py [--ref-so DIR] [--dump-golden PATH]
"""
from __future__ import annotations

import argparse
import json
import math
import random
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

NAMES = ["overall", "stream", "jumpstream", "handstream", "stamina",
         "jackspeed", "chordjack", "technical"]
RATES = [0.5, 0.7, 0.9, 1.0, 1.1, 1.3, 1.5, 1.8, 2.0]
KINDS = ["stream", "js", "hs", "jack", "cj", "tech", "mixed", "ln_dense",
         "burst", "anchor",
         # adversarial/degenerate regimes where a compact reimplementation
         # most plausibly diverges from the 8k-LoC original: the
         # max_intervals=1500 cap and 50-rows-per-interval saturation
         # (ref MinaCalc.h:24-30), dense quads, single-column walls,
         # sub-ms duplicate rows, and 32nd polyrhythm bursts
         "marathon", "saturate", "quad_wall", "vibro_col", "dupes",
         "polyburst"]


def gen_chart(kind: str, seed: int, n: int = 1400) -> list[tuple[float, int]]:
    """Realistic-ish 4K chart generator: tempo drift, chords, bursts, LN-like
    dense sections (MinaCalc only sees (ms, col) taps — LN heads count)."""
    rng = random.Random(seed)
    notes: list[tuple[float, int]] = []
    t = 1000.0
    bpm = rng.uniform(140, 220)
    step = 60000.0 / bpm / 4  # 16th notes
    col = rng.randrange(4)
    i = 0
    while i < n:
        if rng.random() < 0.01:
            step *= rng.uniform(0.92, 1.08)  # tempo drift
        if kind == "stream":
            col = rng.choice([c for c in range(4) if c != col])
            notes.append((t, col)); t += step; i += 1
        elif kind == "js":
            if i % 2 == 0:
                for c in rng.sample(range(4), 2):
                    notes.append((t, c))
            else:
                notes.append((t, rng.randrange(4)))
            t += step * 2; i += 1
        elif kind == "hs":
            if i % 4 == 0:
                for c in rng.sample(range(4), 3):
                    notes.append((t, c))
            else:
                notes.append((t, rng.randrange(4)))
            t += step * 2; i += 1
        elif kind == "jack":
            notes.append((t, col))
            if rng.random() < 0.3:
                col = rng.randrange(4)
            t += step * 2.2; i += 1
        elif kind == "cj":
            k = rng.choice([2, 2, 3, 3, 4])
            for c in rng.sample(range(4), k):
                notes.append((t, c))
            t += step * 2.5; i += 1
        elif kind == "tech":
            k = rng.choice([1, 1, 1, 2])
            for c in rng.sample(range(4), k):
                notes.append((t, c))
            t += step * rng.choice([0.5, 0.75, 1, 1, 1.5, 2]); i += 1
        elif kind == "ln_dense":
            # dense alternating with occasional simultaneous pairs (LN-heavy
            # charts present tap rows like this to the calc)
            notes.append((t, col))
            if rng.random() < 0.25:
                notes.append((t, (col + 2) % 4))
            col = (col + rng.choice([1, 3])) % 4
            t += step * 1.5; i += 1
        elif kind == "burst":
            # slow base with 16-note 32nd bursts
            if i % 24 < 16 and rng.random() < 0.5:
                for _ in range(16):
                    col = rng.choice([c for c in range(4) if c != col])
                    notes.append((t, col)); t += step / 2; i += 1
            else:
                notes.append((t, rng.randrange(4))); t += step * 2; i += 1
        elif kind == "anchor":
            # runningman-style: one column anchored, others fill
            if i % 2 == 0:
                notes.append((t, 0))
            else:
                notes.append((t, rng.choice([1, 2, 3])))
            t += step; i += 1
        elif kind == "marathon":
            # ~1300 s sparse chart: at rates <= ~0.86 the interval count
            # exceeds the reference's max_intervals=1500 cap
            # (ref MinaCalc.h:24) — the tail must be handled identically
            col = rng.choice([c for c in range(4) if c != col])
            notes.append((t, col)); t += 1300_000.0 / n; i += 1
        elif kind == "saturate":
            # vibro-dense rows 4-8 ms apart: a 0.5 s scan interval holds
            # 60-125 rows, saturating max_rows_for_single_interval=50
            # (ref MinaCalc.h:30)
            col = rng.choice([c for c in range(4) if c != col])
            notes.append((t, col))
            if rng.random() < 0.3:
                notes.append((t, (col + 2) % 4))
            t += rng.uniform(4.0, 8.0); i += 1
        elif kind == "quad_wall":
            # every row a quad
            for c in range(4):
                notes.append((t, c))
            t += step * rng.choice([1.5, 2.0, 2.0, 3.0]); i += 1
        elif kind == "vibro_col":
            # single-column wall at burst speeds
            notes.append((t, 1))
            t += step * rng.choice([0.5, 0.5, 0.75, 1.0]); i += 1
        elif kind == "dupes":
            # duplicate (ms, col) rows and 0-1 ms near-duplicates — the
            # integer-ms codec can emit these; row merging must agree
            col = rng.choice([c for c in range(4) if c != col])
            notes.append((t, col))
            r = rng.random()
            if r < 0.2:
                notes.append((t, col))          # exact duplicate
            elif r < 0.4:
                notes.append((t + 1, (col + 1) % 4))  # 1 ms apart
            t += step; i += 1
        elif kind == "polyburst":
            # 32nd bursts against an off-phase jump layer
            if i % 3 == 0:
                for _ in range(8):
                    col = rng.choice([c for c in range(4) if c != col])
                    notes.append((t, col)); t += step / 2; i += 1
                notes.append((t + step / 3, 0))
                notes.append((t + step / 3, 3))
            else:
                notes.append((t, rng.randrange(4))); t += step; i += 1
        else:  # mixed
            r = rng.random()
            if r < 0.5:
                col = rng.choice([c for c in range(4) if c != col])
                notes.append((t, col)); t += step
            elif r < 0.75:
                for c in rng.sample(range(4), 2):
                    notes.append((t, c))
                t += step * 2
            else:
                notes.append((t, col)); t += step * 2
            i += 1
    # the reference binding requires integer milliseconds (PyLong_AsLong,
    # MinaCalcModule.cpp:23); round like the dataset does
    return [(int(round(tt)), int(cc)) for tt, cc in notes]


def make_corpus() -> dict[str, list[tuple[float, int]]]:
    import zlib  # stable across processes (str hash() is salted)
    corpus = {}
    for kind in KINDS:
        for seed in range(7):
            corpus[f"{kind}_{seed}"] = gen_chart(
                kind, seed * 7 + zlib.crc32(kind.encode()) % 100)
    return corpus


_REF_RUNNER = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
import minacalc
inp = json.load(open(sys.argv[2]))
out = {}
for name, spec in inp.items():
    notes = [(int(t), int(c)) for t, c in spec["notes"]]
    out[name] = {str(r): list(minacalc.calc_skill_set(float(r), notes))
                 for r in spec["rates"]}
json.dump(out, open(sys.argv[3], "w"))
"""


def run_reference(ref_dir: str, corpus, rates, tmp: Path) -> dict:
    inp = {name: {"notes": notes, "rates": rates} for name, notes in corpus.items()}
    in_path, out_path = tmp / "parity_in.json", tmp / "parity_out.json"
    in_path.write_text(json.dumps(inp))
    subprocess.run([sys.executable, "-c", _REF_RUNNER, ref_dir, str(in_path),
                    str(out_path)], check=True)
    return json.loads(out_path.read_text())


def flags(v):
    """Dominant-pattern flags per data/dataset.py: within 1 MSD of the max
    over {stream, js, hs, jackspeed, chordjack, technical}."""
    pats = [v[1], v[2], v[3], v[5], v[6], v[7]]
    m = max(pats)
    return tuple(p >= m - 1.0 for p in pats)


PMOD_NAMES = ["Stream", "JS", "HS", "CJ", "CJDensity", "OHJump", "CJOHJump",
              "Balance", "Roll", "OHTrill", "VOHTrill", "Chaos", "FlamJam",
              "WRRoll", "WRJumptrill", "WRBalance", "WRAnchor", "TheThing",
              "TheThing2", "RanMan"]

_REF_DBG_RUNNER = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
import minacalc_refdbg as ref
inp = json.load(open(sys.argv[2]))
out = ref.calc_debug(float(inp["rate"]), [tuple(x) for x in inp["notes"]])
json.dump(out, open(sys.argv[3], "w"))
"""


def debug_chart(name: str, rate: float, dbg_dir: str):
    """Interval-by-interval diff of pattern mods vs the reference debug
    binding (build it first: see /tmp/minacalc_dbg/refdbg.cpp)."""
    import tempfile
    sys.path.insert(0, str(REPO))
    import minacalc as ours

    corpus = make_corpus()
    notes = corpus[name]
    with tempfile.TemporaryDirectory() as td:
        ip, op = Path(td) / "i.json", Path(td) / "o.json"
        ip.write_text(json.dumps({"rate": rate, "notes": notes}))
        subprocess.run([sys.executable, "-c", _REF_DBG_RUNNER, dbg_dir,
                        str(ip), str(op)], check=True)
        refd = json.loads(op.read_text())
    ourd = ours.calc_debug(rate, notes)
    n = min(ourd["numitv"], refd["numitv"])
    print("ssr ours:", [round(x, 3) for x in ourd["ssr"]])
    print("ssr ref :", [round(x, 3) for x in refd["ssr"]])
    # rows per interval for context
    itv_rows = [[] for _ in range(n + 2)]
    for t, c in notes:
        itv = int(t / 1000.0 / rate / 0.5)
        if itv < len(itv_rows):
            itv_rows[itv].append((t, c))
    for h in range(2):
        for m in range(20):
            do, dr = ourd["doot"][h][m][:n], refd["doot"][h][m][:n]
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(do, dr))
                     if abs(a - b) > 0.015]
            if diffs:
                i, a, b = diffs[0]
                mx = max(abs(a - b) for _, a, b in diffs)
                print(f"h{h} {PMOD_NAMES[m]:12s} ndiff={len(diffs):3d} "
                      f"max={mx:.3f} first@itv{i}: ours={a:.3f} ref={b:.3f}")
        for m, label in [(0, "NPSBase"), (1, "TechBase")]:
            so, sr = ourd["soap"][h][m][:n], refd["soap"][h][m][:n]
            mx = max(abs(a - b) for a, b in zip(so, sr)) if n else 0
            if mx > 1e-3:
                print(f"h{h} soap {label} maxdiff {mx:.4f}")
        for ssi in range(8):
            bo = ourd["base_adj_diff"][h][ssi][:n]
            br = refd["base_adj_diff"][h][ssi][:n]
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(bo, br))
                     if abs(a - b) > 0.05]
            if diffs:
                i, a, b = max(diffs, key=lambda t: abs(t[1] - t[2]))
                print(f"h{h} badj {NAMES[ssi]:12s} ndiff={len(diffs):3d} "
                      f"worst@itv{i}: ours={a:.3f} ref={b:.3f}")
        jo, jr = ourd["jack_diff"][h], refd["jack_diff"][h]
        if len(jo) != len(jr):
            print(f"h{h} jack_diff length ours={len(jo)} ref={len(jr)}")
        else:
            mx = max((abs(a[1] - b[1]) for a, b in zip(jo, jr)), default=0)
            if mx > 1e-3:
                print(f"h{h} jack_diff maxdiff {mx:.4f}")
    return ourd, refd, itv_rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-so", default="/tmp/minacalc_ref_build")
    ap.add_argument("--ref-dbg", default="/tmp/minacalc_dbg")
    ap.add_argument("--dump-golden", default=None,
                    help="write reference results as a golden JSON")
    ap.add_argument("--debug", nargs=2, metavar=("CHART", "RATE"),
                    help="per-interval pmod diff for one corpus chart")
    args = ap.parse_args()

    if args.debug:
        debug_chart(args.debug[0], float(args.debug[1]), args.ref_dbg)
        return

    # the golden is ONLY ever the reference's output — refuse to continue
    # (and in particular to --dump-golden) when the reference extension
    # isn't built, instead of failing late or, worse, pinning repo output
    ref_dir = Path(args.ref_so)
    if not (ref_dir.exists() and list(ref_dir.glob("minacalc*.so"))):
        sys.exit(
            f"reference extension not found in {args.ref_so}; build it "
            "first: tar -xzf /root/reference/scripts/MinaCalc-1.0.tar.gz "
            "&& python setup.py build_ext --build-lib " + args.ref_so
        )

    sys.path.insert(0, str(REPO))
    import minacalc as ours

    corpus = make_corpus()
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        ref_out = run_reference(args.ref_so, corpus, RATES, Path(td))

    worst = 0.0
    worst_info = None
    per_skill = [0.0] * 8
    flags_total = flags_agree = 0
    for name, notes in corpus.items():
        for rate in RATES:
            a = ours.calc_skill_set(rate, notes)
            b = ref_out[name][str(rate)]
            for i, (x, y) in enumerate(zip(a, b)):
                d = abs(x - y)
                per_skill[i] = max(per_skill[i], d)
                if d > worst:
                    worst = d
                    worst_info = (name, rate, NAMES[i], x, y)
            fa, fb = flags(a), flags(b)
            flags_total += 6
            flags_agree += sum(x == y for x, y in zip(fa, fb))

    print("per-skillset worst |diff| (MSD):")
    for n, d in zip(NAMES, per_skill):
        print(f"  {n:12s} {d:.4f}")
    print("worst overall:", worst, worst_info)
    print(f"dominance-flag agreement: {flags_agree}/{flags_total} "
          f"= {flags_agree/flags_total:.4f}")

    if args.dump_golden:
        # same structure as tests/goldens/minacalc_corpus.json (consumed by
        # tests/test_minacalc.py::test_parity_corpus_msd_within_005):
        # {"rates": [...], "msd": {chart: {"<rate>": [8 floats]}}}.
        # Notes are NOT stored — the test regenerates the corpus
        # deterministically via make_corpus().
        golden = {
            "rates": RATES,
            "msd": {
                name: {str(r): ref_out[name][str(r)] for r in RATES}
                for name in corpus
            },
        }
        Path(args.dump_golden).write_text(json.dumps(golden))
        print("golden written to", args.dump_golden)


if __name__ == "__main__":
    main()
