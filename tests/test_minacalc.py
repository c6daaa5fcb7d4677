"""Tests for the native MinaCalc difficulty calculator (build with
`make -C native/minacalc`). Golden values derived from the reference
extension on synthetic charts (stream/jack/trill/roll)."""

import random

import pytest

minacalc = pytest.importorskip("minacalc")


def make_chart(bpm, n, mode="stream", seed=42):
    rng = random.Random(seed)
    notes = []
    t = 1000.0
    gap = 60000.0 / bpm / 4
    last_col = -1
    for i in range(n):
        if mode == "js" and i % 2 == 0:
            for c in rng.sample(range(4), 2):
                notes.append((int(t), c))
        elif mode == "trill":
            notes.append((int(t), i % 2))
        elif mode == "jack":
            notes.append((int(t), 0))
        elif mode == "roll":
            notes.append((int(t), i % 4))
        else:
            c = rng.choice([x for x in range(4) if x != last_col])
            last_col = c
            notes.append((int(t), c))
        t += gap
    return notes


KEYS = ["overall", "stream", "jumpstream", "handstream", "stamina",
        "jackspeed", "chordjack", "technical"]


def scores(notes, rate=1.0):
    return dict(zip(KEYS, minacalc.calc_skill_set(rate, notes)))


def test_version():
    assert minacalc.version() == 434


def test_output_shape_and_range():
    s = minacalc.calc_skill_set(1.0, make_chart(180, 600))
    assert len(s) == 8
    assert all(0 <= x <= 40 for x in s)


def test_stream_chart_is_stream_dominant():
    s = scores(make_chart(180, 600))
    assert s["stream"] == max(
        s[k] for k in KEYS if k not in ("overall", "stamina", "technical")
    )
    # golden vs reference extension: ref stream = 16.88
    assert 15.0 < s["stream"] < 18.5


def test_js_chart_is_js_dominant():
    s = scores(make_chart(150, 600, "js"))
    assert s["jumpstream"] > s["stream"]
    assert s["jumpstream"] > s["handstream"]
    # ref jumpstream = 21.02
    assert 19.0 < s["jumpstream"] < 23.0


def test_trill_is_downscaled_vs_stream():
    """A one-hand trill must be crushed relative to an actual stream
    (ref trill120 stream = 3.72)."""
    s = scores(make_chart(120, 400, "trill"))
    assert s["stream"] < 6.0
    assert s["jackspeed"] == pytest.approx(10.11, abs=0.5)


def test_jack_chart_is_jack_dominant():
    s = scores(make_chart(100, 300, "jack"))
    assert s["jackspeed"] == max(s[k] for k in KEYS if k != "overall")
    # ref jackspeed = 16.48
    assert 15.0 < s["jackspeed"] < 18.0


def test_roll_is_downscaled():
    s = scores(make_chart(200, 800, "roll"))
    assert s["stream"] < 3.0  # ref 1.44


def test_rate_scaling_increases_difficulty():
    notes = make_chart(160, 500)
    s10 = scores(notes, 1.0)
    s15 = scores(notes, 1.5)
    assert s15["overall"] > s10["overall"]
    s07 = scores(notes, 0.7)
    assert s07["overall"] < s10["overall"]


def test_empty_and_tiny_inputs():
    assert list(minacalc.calc_skill_set(1.0, [])) == [0.0] * 8
    assert list(minacalc.calc_skill_set(1.0, [(1000, 0)])) == [0.0] * 8


# golden values produced by the reference MinaCalc extension (built from
# /root/reference/scripts/MinaCalc-1.0.tar.gz) on a seeded 170 BPM stream
# chart at four music rates
REFERENCE_RATE_GOLDENS = {
    0.8: [13.621, 13.357, 7.600, 6.795, 11.783, 8.275, 7.189, 13.621],
    1.0: [16.302, 15.861, 8.955, 8.167, 13.897, 10.291, 8.570, 16.302],
    1.2: [18.814, 17.836, 10.103, 9.279, 15.962, 12.298, 9.790, 18.814],
    1.5: [23.510, 21.652, 12.290, 11.380, 19.438, 15.530, 12.075, 23.510],
}


def _golden_chart():
    rng = random.Random(7)
    notes = []
    t = 1000.0
    gap = 60000.0 / 170 / 4
    last = -1
    for _ in range(500):
        c = rng.choice([x for x in range(4) if x != last])
        last = c
        notes.append((int(t), c))
        t += gap
    return notes


def test_reference_goldens_across_rates():
    notes = _golden_chart()
    for rate, want in REFERENCE_RATE_GOLDENS.items():
        got = minacalc.calc_skill_set(rate, notes)
        for g, w in zip(got, want):
            assert abs(g - w) < 0.05, (rate, got, want)


# ----------------------------------------------------------------------
# Full parity corpus: 30 realistic synthetic charts (streams, jumpstream,
# handstream, jacks, chordjack, tech, mixed, LN-dense, bursts, anchors,
# plus adversarial regimes: interval-cap marathons, 50-rows-per-interval
# saturation, quad walls, single-column vibro, sub-ms duplicate rows —
# with tempo drift and chords) x 9 music rates (0.5-2.0), pinned against
# the reference extension to <=0.05 MSD per skillset (measured worst diff:
# 0.0000 — bitwise), plus 100%
# dominant-pattern-flag agreement (the training-label threshold used by
# mug_diffusion_tpu/data/dataset.py).  Regenerate the golden with
# scripts/minacalc_parity.py --dump-golden.


def _load_corpus_golden():
    import json
    from pathlib import Path

    p = Path(__file__).parent / "goldens" / "minacalc_corpus.json"
    return json.loads(p.read_text())


def _dominance_flags(v):
    pats = [v[1], v[2], v[3], v[5], v[6], v[7]]
    m = max(pats)
    return tuple(p >= m - 1.0 for p in pats)


def test_parity_corpus_msd_within_005():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    from minacalc_parity import make_corpus

    golden = _load_corpus_golden()
    corpus = make_corpus()
    assert set(corpus) == set(golden["msd"])
    worst = 0.0
    flags_total = flags_agree = 0
    for name, notes in corpus.items():
        for rate in golden["rates"]:
            got = minacalc.calc_skill_set(rate, notes)
            want = golden["msd"][name][str(rate)]
            for g, w in zip(got, want):
                worst = max(worst, abs(g - w))
            fa, fb = _dominance_flags(got), _dominance_flags(want)
            flags_total += len(fa)
            flags_agree += sum(x == y for x, y in zip(fa, fb))
    assert worst <= 0.05, f"worst MSD diff {worst}"
    assert flags_agree == flags_total, (
        f"dominance flags disagree: {flags_agree}/{flags_total}")
