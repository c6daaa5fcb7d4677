"""Corpus-v2 generator invariants (scripts/make_synthetic_dataset.py):
pattern families, LN emission, on-grid onsets, codec round-trip."""

import numpy as np
import pytest

from scripts.make_synthetic_dataset import (
    FAMILIES,
    _apply_lns,
    _gen_events,
    write_set,
)


def _parse(osu_path):
    from mug_diffusion_tpu.data.convertor import parse_osu_file

    return parse_osu_file(osu_path, None)


def test_write_set_emits_lns_and_grid(tmp_path):
    path = write_set(str(tmp_path), "s0", duration_s=12.0, bpm=180.0,
                     seed=3, family="jumpstream", density=0.9, ln_ratio=0.5)
    hit_objects, meta = _parse(path)
    assert len(hit_objects) > 30
    lns = [h for h in hit_objects if int(h.split(",")[3]) & 128]
    rice = [h for h in hit_objects if not int(h.split(",")[3]) & 128]
    assert lns and rice, "ln_ratio=0.5 must produce both note kinds"
    # every LN end must come after its start and before the track end
    for h in lns:
        p = h.split(",")
        start = int(p[2])
        end = int(p[5].split(":")[0])
        assert end > start
        assert end < 12000
    # on-grid: 1/12-beat lines of the timing point anchored at 0
    step = (60000.0 / 180.0) / 12.0
    starts = np.array([int(h.split(",")[2]) for h in hit_objects], float)
    phase = np.mod(starts, step)
    err = np.minimum(phase, step - phase)
    assert err.mean() < 1.0, f"onset grid error {err.mean():.2f} ms"
    # audio synthesized beside the chart
    assert (tmp_path / "s0" / "audio.wav").stat().st_size > 100_000


@pytest.mark.parametrize("family", FAMILIES)
def test_family_structure(family):
    rng = np.random.default_rng(0)
    events = _gen_events(rng, family, duration_s=20.0, bpm=160.0,
                         density=0.95)
    assert len(events) > 40
    cols = [c for _, c in events]
    assert set(cols) <= {0, 1, 2, 3}
    from collections import Counter

    by_t = Counter(t for t, _ in events)
    max_chord = max(by_t.values())
    if family == "handstream":
        assert max_chord >= 3
    elif family == "chordjack":
        assert max_chord >= 2
    elif family in ("stream", "technical"):
        assert max_chord <= 2
    if family == "jackspeed":
        # same-column repeats at the 16th gap must be common
        gap = 60000.0 / 160.0 / 4.0
        per_col = {}
        for t, c in events:
            per_col.setdefault(c, []).append(t)
        jacks = sum(
            1
            for ts in per_col.values()
            for a, b in zip(sorted(ts), sorted(ts)[1:])
            if b - a < gap * 1.5
        )
        assert jacks > len(events) * 0.3


def test_apply_lns_never_overlaps_next_note():
    rng = np.random.default_rng(1)
    events = _gen_events(rng, "stream", 20.0, 170.0, 0.95)
    notes = _apply_lns(rng, events, ln_ratio=0.9, bpm=170.0)
    per_col = {}
    for t, c, e in notes:
        per_col.setdefault(c, []).append((t, e))
    for rows in per_col.values():
        rows.sort()
        for (t0, e0), (t1, _) in zip(rows, rows[1:]):
            if e0 > 0:
                assert e0 < t1, "hold must release before the next note"


def test_codec_round_trip_preserves_lns(tmp_path):
    """Corpus chart -> tensor -> chart: LN starts/ends survive the live
    codec (ref mug/data/convertor.py:244-262 reconstruction rules)."""
    path = write_set(str(tmp_path), "s1", duration_s=10.0, bpm=200.0,
                     seed=9, family="stream", density=0.9, ln_ratio=0.6)
    convertor_params = {
        "frame_ms": 512 / 22050 / 4 * 8 * 1000,
        "max_frame": 4096,
        "from_logits": False,
    }
    from mug_diffusion_tpu.data.convertor import parse_osu_file

    hit_objects, meta = parse_osu_file(path, convertor_params)
    arr, valid = meta.convertor.objects_to_array(hit_objects, meta)
    lines = meta.convertor.array_to_objects(arr, meta)  # arr is [4K, T]
    orig_lns = sum(1 for h in hit_objects if int(h.split(",")[3]) & 128)
    rt_lns = sum(1 for h in lines if int(h.split(",")[3]) & 128)
    # the codec quantizes to ~46 ms frames; holds shorter than a frame
    # legitimately collapse to rice — allow a small deficit only
    assert rt_lns >= orig_lns * 0.85, (rt_lns, orig_lns)
    assert abs(len(lines) - len(hit_objects)) <= len(hit_objects) * 0.02
