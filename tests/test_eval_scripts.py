"""Unit coverage for the round-5 evidence scripts' pure helpers
(scripts/eval_controllability.py, scripts/demo_inpaint.py) — the
measurement arithmetic the trained-weights evals rest on."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.demo_inpaint import _jacks, _notes_in
from scripts.eval_controllability import _measure


def test_measure_counts_ln_ratio_and_msd():
    # 12 notes, 3 of them holds (type 128) -> ln_ratio 0.25; enough notes
    # for a MinaCalc row
    lines = []
    t = 0
    for i in range(12):
        col_x = [64, 192, 320, 448][i % 4]
        t += 400
        if i < 3:
            lines.append(f"{col_x},192,{t},128,0,{t + 300}:0:0:0:0:")
        else:
            lines.append(f"{col_x},192,{t},1,0,0:0:0:0:")
    out = _measure(lines)
    assert out["notes"] == 12
    assert abs(out["ln_ratio"] - 0.25) < 1e-9
    assert "msd" in out and "overall" in out["msd"]
    assert np.isfinite(list(out["msd"].values())).all()


def test_measure_empty_and_tiny():
    assert _measure([]) == {"notes": 0, "ln_ratio": 0.0}
    out = _measure(["64,192,100,1,0,0:0:0:0:"])
    assert out["notes"] == 1 and "msd" not in out  # <10 notes: no MSD


def test_notes_in_window_and_columns():
    lines = [
        "64,192,1000,1,0,0:0:0:0:",       # col 0
        "192,192,2000,128,0,2500:0:0:",   # col 1, hold
        "448,192,9000,1,0,0:0:0:0:",      # col 3, outside [0, 5000)
    ]
    notes = _notes_in(lines, 0, 5000)
    assert notes == [(1000, 0, 0), (2000, 1, 128)]
    assert _notes_in(lines) == [(1000, 0, 0), (2000, 1, 128), (9000, 3, 0)]


def test_jacks_same_column_interval():
    # two 80 ms same-column pairs -> 2 jacks at the 100 ms threshold; a
    # 150 ms same-column pair and cross-column speed never count
    notes = [(0, 0, 0), (80, 0, 0), (120, 1, 0), (200, 1, 0),
             (205, 2, 0), (355, 2, 0)]
    assert _jacks(notes, interval_ms=100.0) == 2
    assert _jacks(notes, interval_ms=50.0) == 0
