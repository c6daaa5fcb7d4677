"""Tests for the symbolic post-processing: BPM detection, grid snapping,
mini-jack removal (ref: mug/data/utils.py)."""

import numpy as np

from mug_diffusion_tpu.data.postprocess import (
    gridify,
    parse_hit_objects,
    remove_intractable_mania_mini_jacks,
    test_timing as score_timing,
    timing,
)


def make_objects(times_cols):
    lines = []
    for t, c in times_cols:
        lines.append(f"{int((c + 0.5) * 128)},192,{int(t)},1,0,0:0:0:0:")
    return lines


def test_parse_hit_objects():
    st, col, end = parse_hit_objects("64,192,1500,1,0,0:0:0:0:", 128)
    assert (st, col, end) == (1500.0, 0, None)
    st, col, end = parse_hit_objects("448,192,100,128,0,900:0:0:0:0:", 128)
    assert (st, col, end) == (100.0, 3, 900.0)


def test_timing_detects_bpm():
    """Notes exactly on a 180 BPM quarter grid."""
    gap = 60000 / 180
    times = np.asarray([1000 + i * gap for i in range(60)], np.float32)
    bpm, offset = timing(times)
    assert abs(bpm - 180) < 0.5
    # offset within a beat of the true phase
    assert abs((offset - 1000) % gap) < 15 or abs(
        gap - ((offset - 1000) % gap)
    ) < 15


def test_gridify_snaps_jittered_notes():
    gap = 60000 / 200  # 200 BPM
    rng = np.random.default_rng(0)
    times = [1000 + i * gap + rng.uniform(-4, 4) for i in range(80)]
    objs = make_objects([(t, i % 4) for i, t in enumerate(times)])
    snapped, bpm, offset = gridify(objs)
    assert abs(bpm - 200) < 1.0
    # snapped times should align to the grid better than the inputs
    errs = []
    for line in snapped:
        t = int(line.split(",")[2])
        beat_gap = 60000 / bpm
        m = (t - offset) / beat_gap
        errs.append(abs(m - round(m)) * beat_gap)
    assert np.median(errs) < 3.0


def test_jack_removal_removes_fast_jacks():
    # two notes 50 ms apart on the same column, dense neighborhood
    objs = make_objects(
        [(1000, 0), (1050, 0), (1100, 1), (1150, 2), (1200, 3), (1250, 1)]
    )
    out = remove_intractable_mania_mini_jacks(objs, jack_interval=90)
    # the jack pair must be broken: either one note removed or moved
    cols_at = {}
    for line in out:
        st, col, _ = parse_hit_objects(line, 128)
        cols_at.setdefault(col, []).append(st)
    for col, ts in cols_at.items():
        ts.sort()
        for a, b in zip(ts, ts[1:]):
            assert b - a >= 90, f"jack remains on col {col}: {a}->{b}"


def test_jack_removal_keeps_stream_end():
    # isolated jack at the end of a burst: should be ignored (kept)
    objs = make_objects([(1000, 0), (1080, 0)])
    out = remove_intractable_mania_mini_jacks(objs, jack_interval=90)
    assert len(out) == 2


def test_score_timing_counts_aligned_notes():
    gap = 60000 / 240
    times = np.asarray([i * gap for i in range(100)], np.float32)
    ratio, valid, bpm, offset = score_timing(times, 240.0, 0.0, div=1,
                                             refine=False)
    assert valid.sum() == 100
