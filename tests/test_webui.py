"""WebUI integration: build the real Blocks graph (via the gradio shim) on
the tiny pipeline and drive the registered 'generate', 'chart2prompt', and
'autofill_tags' endpoints end to end — the same callbacks and argument order
a gradio_client consumer would hit (ref webui.py:834-858 api_name wiring)."""

import os
import sys
import types
import wave as wave_mod

import numpy as np
import pytest

from tests import gradio_shim
from tests.test_pipeline import tiny_config


@pytest.fixture(scope="module")
def ui(tmp_path_factory):
    sys.modules["gradio"] = gradio_shim
    for mod in list(sys.modules):
        if mod == "webui":
            del sys.modules[mod]
    import webui

    webui.gr = gradio_shim
    from mug_diffusion_tpu.apps.pipeline import GenerationPipeline

    pipe = GenerationPipeline(tiny_config())
    # tiny buckets so sampling is fast
    pipe.z_length_buckets = (8,)
    template = os.path.join(
        os.path.dirname(__file__), "..", "assets", "template.osu"
    )
    demo = webui.build_ui(pipe, template)
    out_root = tmp_path_factory.mktemp("webui_out")
    webui.output_path = str(out_root)
    return types.SimpleNamespace(webui=webui, demo=demo, pipe=pipe)


def _write_wav(path, seconds=2.0, sr=22050):
    t = np.arange(int(seconds * sr)) / sr
    y = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((y * 32767).astype(np.int16).tobytes())
    return path


def test_endpoints_registered(ui):
    assert set(ui.demo.endpoints) >= {"generate", "chart2prompt",
                                      "autofill_tags"}
    # the generate endpoint's input arity matches startMapping's signature
    gen = ui.demo.endpoints["generate"]
    assert len(gen.inputs) == 3 + 45  # audio/title/artist + 45 control args
    assert len(gen.outputs) == 5


def test_generate_endpoint_end_to_end(ui, tmp_path):
    wav = _write_wav(str(tmp_path / "Artist - Song.wav"))
    gen = ui.demo.endpoints["generate"]
    # control args in registered order (everything off, tiny counts):
    # rss, rs, srs, sr, etts, ett, cjs, cj, cjss, cjsc, stas, sta, stass,
    # stasc, sss, ss, ssss, sssc, jss, js, jsss, jssc, hss, hs, hsss, hssc,
    # jsps, jsp, jspss, jspsc, techs, tech, techss, techsc, mts, lnrs,
    # mapType, lnr, count, step, scale, sampler, rm_jacks, auto_snap, seed
    args = [
        False, "Rice (Mostly rices and chords)", False, 4.0,
        False, 20.0,
        False, "more", False, 17.0,
        False, "more", False, 17.0,
        False, "more", False, 17.0,
        False, "more", False, 17.0,
        False, "more", False, 17.0,
        False, "more", False, 17.0,
        False, "more", False, 17.0,
        False, False, "Rice (Mostly rices and chords)", 0.0,
        1, 4, 3.0, "dpmpp", 90, True, 7,
    ]
    out = gen.fn(wav, "Song", "Artist", *args,
                 progress=gradio_shim.Progress())
    assert len(out) == 5
    osz = out[1]["value"]
    assert os.path.isfile(osz) and osz.endswith(".osz")
    import zipfile

    names = zipfile.ZipFile(osz).namelist()
    assert any(n.endswith(".osu") for n in names)
    assert any(n.startswith("audio") for n in names)


def test_generate_endpoint_user_errors(ui, tmp_path):
    gen = ui.demo.endpoints["generate"]
    with pytest.raises(gradio_shim.Error, match="Audio not found"):
        gen.fn(None, "T", "A", *([None] * 45),
               progress=gradio_shim.Progress())
    wav = _write_wav(str(tmp_path / "x.wav"))
    with pytest.raises(gradio_shim.Error, match="title"):
        gen.fn(wav, "", "A", *([None] * 45),
               progress=gradio_shim.Progress())


def test_chart2prompt_endpoint(ui, tmp_path):
    minacalc = pytest.importorskip("minacalc")  # noqa: F841
    import random

    # synthesize a chart through the template
    tpl = open(os.path.join(os.path.dirname(__file__), "..", "assets",
                            "template.osu")).read()
    rng = random.Random(0)
    lines = []
    t = 1000.0
    for i in range(400):
        col = rng.randrange(4)
        lines.append(f"{col * 128 + 64},192,{int(t)},1,0,0:0:0:0:")
        t += 120
    chart = str(tmp_path / "c.osu")
    open(chart, "w").write(
        tpl.split("[HitObjects]")[0] + "[HitObjects]\n" + "\n".join(lines)
    )
    inv = ui.demo.endpoints["chart2prompt"]
    out = inv.fn(chart, 1.0)
    rows = dict((k, v) for k, v in out["value"])
    assert "MSD score (Etterna)" in rows
    with pytest.raises(gradio_shim.Error, match="Rate"):
        inv.fn(chart, 0)
    with pytest.raises(gradio_shim.Error, match="Chart not found"):
        inv.fn(None, 1.0)


def test_autofill_tags_endpoint(ui, tmp_path):
    wav = _write_wav(str(tmp_path / "Some Artist - Some Song.wav"))
    fill = ui.demo.endpoints["autofill_tags"]
    title_u, artist_u = fill.fn(wav)
    assert title_u["value"] == "Some Song"
    assert artist_u["value"] == "Some Artist"
    t2, a2 = fill.fn(None)
    assert "value" not in t2 and "value" not in a2
