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
