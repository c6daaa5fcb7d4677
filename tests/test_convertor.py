"""Golden round-trip tests for the chart codec (ref behavior:
mug/data/convertor.py + its __main__ smoke block)."""

import os

import numpy as np
import pytest

from mug_diffusion_tpu.data.convertor import (
    BeatmapMeta,
    OsuManiaConvertor,
    parse_osu_file,
    save_osu_file,
    slugify,
)

FRAME_MS = 512 / 22050 / 4 * 8 * 1000  # note frame = 8 audio hops ~= 46.44 ms
MAX_FRAME = 4096


def make_convertor(**kw):
    params = dict(frame_ms=FRAME_MS, max_frame=MAX_FRAME)
    params.update(kw)
    return OsuManiaConvertor(**params)


def make_meta(convertor):
    return BeatmapMeta(path="synthetic.osu", cs=4, convertor=convertor)


SYNTHETIC_OSU = """osu file format v14

[General]
AudioFilename: audio.mp3
Mode: 3

[Metadata]
Title:Synthetic
Version:test
BeatmapSetID:123

[Difficulty]
HPDrainRate: 8
CircleSize: 4

[TimingPoints]
0,400,4,2,1,20,1,0

[HitObjects]
64,192,1000,1,0,0:0:0:0:
192,192,1400,1,0,0:0:0:0:
320,192,1800,128,0,2600:0:0:0:0:
448,192,2200,1,0,0:0:0:0:
"""


@pytest.fixture
def osu_file(tmp_path):
    p = tmp_path / "synthetic.osu"
    p.write_text(SYNTHETIC_OSU)
    return str(p)


def test_parse_osu_file(osu_file):
    hit_objects, meta = parse_osu_file(
        osu_file, {"frame_ms": FRAME_MS, "max_frame": MAX_FRAME}
    )
    assert len(hit_objects) == 4
    assert meta.game_mode == 3
    assert meta.cs == 4
    assert meta.version == "test"
    assert meta.set_id == 123
    assert meta.convertor is not None
    assert len(meta.timing_points) == 1


def test_objects_to_array_layout(osu_file):
    hit_objects, meta = parse_osu_file(
        osu_file, {"frame_ms": FRAME_MS, "max_frame": MAX_FRAME}
    )
    arr, valid = meta.convertor.objects_to_array(hit_objects, meta)
    assert arr.shape == (16, MAX_FRAME)
    assert valid.shape == (MAX_FRAME,)

    # note at 1000 ms in column 0 -> frame 21 (1000/46.44)
    idx = int(1000 / FRAME_MS)
    assert arr[0, idx] == 1
    expected_offset = (1000 - idx * FRAME_MS) / FRAME_MS
    np.testing.assert_allclose(arr[4, idx], expected_offset, atol=1e-6)

    # LN from 1800 to 2600 in column 2: holding set on (start, end]
    s_idx = int(1800 / FRAME_MS)
    e_idx = int(2600 / FRAME_MS)
    assert arr[2, s_idx] == 1
    assert arr[2 + 8, s_idx] == 0  # holding excludes start frame
    assert np.all(arr[2 + 8, s_idx + 1 : e_idx + 1] == 1)
    assert arr[2 + 12, e_idx] > 0  # offset_end on last holding frame

    # valid flag covers everything strictly before the last touched frame
    assert valid[e_idx - 1] == 1
    assert valid[e_idx] == 0


def test_roundtrip_exact(osu_file):
    """objects -> array -> objects reproduces times within rounding error."""
    hit_objects, meta = parse_osu_file(
        osu_file, {"frame_ms": FRAME_MS, "max_frame": MAX_FRAME}
    )
    arr, _ = meta.convertor.objects_to_array(hit_objects, meta)
    decoded = meta.convertor.array_to_objects(arr, meta)
    assert len(decoded) == len(hit_objects)
    for orig, dec in zip(sorted(hit_objects, key=lambda l: int(l.split(",")[2])),
                         decoded):
        o = orig.split(",")
        d = dec.split(",")
        assert o[0] == d[0]  # same column
        assert o[3] == d[3]  # same type
        assert abs(int(o[2]) - int(d[2])) <= 1  # start within 1 ms
        if int(o[3]) == 128:
            o_end = int(o[5].split(":")[0])
            d_end = int(d[5].split(":")[0])
            assert abs(o_end - d_end) <= 1


def test_mirror_flips_columns(osu_file):
    hit_objects, meta = parse_osu_file(
        osu_file, {"frame_ms": FRAME_MS, "max_frame": MAX_FRAME, "mirror": True}
    )
    arr, _ = meta.convertor.objects_to_array(hit_objects, meta)
    idx = int(1000 / FRAME_MS)
    assert arr[3, idx] == 1  # column 0 mirrored to column 3
    assert arr[0, idx] == 0


def test_rate_augmentation_shrinks_valid_region(osu_file):
    hit_objects, meta = parse_osu_file(
        osu_file, {"frame_ms": FRAME_MS, "max_frame": MAX_FRAME, "rate": 2.0}
    )
    arr, valid = meta.convertor.objects_to_array(hit_objects, meta)
    assert arr.shape == (16, MAX_FRAME)  # padded back to max_frame
    idx = int(500 / FRAME_MS)  # 2x rate halves the time
    assert arr[0, idx] == 1


def test_from_logits_threshold():
    conv = make_convertor(from_logits=True)
    meta = make_meta(conv)
    arr = np.zeros((16, MAX_FRAME), dtype=np.float32)
    arr[0, 10] = 0.2  # positive logit -> note
    arr[1, 10] = -0.2  # negative logit -> no note
    decoded = conv.array_to_objects(arr, meta)
    assert len(decoded) == 1
    assert decoded[0].startswith("64,")


def test_save_osu_file_roundtrip(osu_file, tmp_path):
    hit_objects, meta = parse_osu_file(
        osu_file, {"frame_ms": FRAME_MS, "max_frame": MAX_FRAME}
    )
    arr, _ = meta.convertor.objects_to_array(hit_objects, meta)
    out = str(tmp_path / "out.osu")
    save_osu_file(meta, arr, out, override={"Version": "resaved"})
    hit2, meta2 = parse_osu_file(out, {"frame_ms": FRAME_MS, "max_frame": MAX_FRAME})
    assert len(hit2) == len(hit_objects)
    assert meta2.version == "resaved"


def test_slugify():
    assert slugify("sound (tv-size) [mix].mp3") == "sound (tv-size) [mix].mp3"
    assert slugify("日本語タイトル.mp3") == ".mp3"
