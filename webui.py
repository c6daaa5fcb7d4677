"""Gradio WebUI (ref: /root/reference/webui.py).

Same control surface as the reference: audio upload + title/artist, switches
and sliders for every prompt feature (star rating, MSD, map type, LN ratio,
7 pattern switches + per-pattern MSD), sampling count/steps/CFG/seed,
mini-jack removal interval and auto-snapping, chart preview gallery, .osz
download, and a chart2prompt tab (MinaCalc inversion).

Run: python webui.py --model_config models/ckpt/model.yaml --ckpt models/ckpt/model
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
import sys
from collections import OrderedDict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mug_diffusion_tpu.apps.invert import chart_to_prompt
from mug_diffusion_tpu.apps.pipeline import GenerationPipeline
from mug_diffusion_tpu.utils.config import load_config
from mug_diffusion_tpu.utils.seed import seed_everything

try:
    import gradio as gr
except ImportError:  # pragma: no cover - gradio not in the TPU image
    gr = None

VERSION = "tpu-0.1"
output_path = "outputs/webui"


def check_update(current_version: str = VERSION):
    """Optional release check (ref: webui.py:85-97). Queries the endpoint in
    MUG_UPDATE_URL (JSON {'version': ..., 'url': ...}); silently no-ops when
    unset, offline, or requests is unavailable."""
    url = os.environ.get("MUG_UPDATE_URL")
    if not url:
        return None
    try:
        import requests

        data = requests.get(url, timeout=5).json()
        if data.get("version") and data["version"] != current_version:
            print(
                f"New version available: {data['version']} "
                f"(current {current_version}): {data.get('url', '')}"
            )
            return data
    except Exception:  # noqa: BLE001 - update check must never break startup
        pass
    return None


def generate_feature_dict(
    rss, rs, srs, sr, etts, ett, cjs, cj, cjss, cjsc, stas, sta, stass, stasc,
    sss, ss, ssss, sssc, jss, js, jsss, jssc, hss, hs, hsss, hssc, jsps, jsp,
    jspss, jspsc, techs, tech, techss, techsc, mts, lnrs, mapType, lnr,
    count, step, scale, rm_jacks, auto_snap, seed,
):
    """UI switches -> feature dict + human-readable prompt
    (ref: webui.py:130-184)."""
    feature_dict = {}
    human_readable_dict = OrderedDict()

    def add_value_if(condition, key, val, h_key, h_val):
        if condition:
            feature_dict[key] = val
            human_readable_dict[h_key] = h_val

    add_value_if(rss, "rank_status",
                 "ranked" if rs == "ranked/stable" else rs, "style", rs)
    add_value_if(srs, "sr", sr, "sr", sr)
    add_value_if(etts, "ett", ett, "msd", ett)

    if mts:
        if mapType.startswith("Rice"):
            feature_dict["rc"] = 1
            human_readable_dict["type"] = "rc"
        elif mapType.startswith("Long Note"):
            feature_dict["ln"] = 1
            human_readable_dict["type"] = "ln"
        elif mapType.startswith("Hybrid"):
            feature_dict["hb"] = 1
            human_readable_dict["type"] = "hb"
        else:
            raise ValueError(mapType)

    add_value_if(lnrs, "ln_ratio", lnr, "ln", lnr)

    patterns = [
        (cjs, "Chordjack", cj, cjss, cjsc),
        (stas, "Stamina", sta, stass, stasc),
        (sss, "Stream", ss, ssss, sssc),
        (jss, "Jumpstream", js, jsss, jssc),
        (hss, "Handstream", hs, hsss, hssc),
        (jsps, "Jackspeed", jsp, jspss, jspsc),
        (techs, "Technical", tech, techss, techsc),
    ]
    for sw, name, val, score_sw, score_val in patterns:
        add_value_if(sw, name.lower(), val.startswith("more"), name.lower(),
                     "more" if val.startswith("more") else "less")
        add_value_if(score_sw, name.lower() + "_ett", score_val,
                     name.lower() + "-msd", score_val)

    human_readable_dict["rm-interval"] = rm_jacks
    human_readable_dict["snapping"] = auto_snap
    human_readable_dict["count"] = count
    human_readable_dict["step"] = step
    human_readable_dict["cfg-scale"] = scale
    human_readable_dict["seed"] = seed
    return feature_dict, human_readable_dict


def build_ui(pipeline: GenerationPipeline, template_path: str):
    assert gr is not None, (
        "gradio is not installed; `pip install gradio` to use the WebUI, "
        "or use scripts/mapping.py for CLI generation"
    )

    def startMapping(audioPath, audioTitle, audioArtist, *args,
                     progress=gr.Progress()):
        if audioPath is None:
            raise gr.Error("Audio not found!")
        audioPath = audioPath.name if hasattr(audioPath, "name") else audioPath
        if not audioTitle or not audioTitle.strip():
            raise gr.Error("Please specify your audio title")
        if not audioArtist or not audioArtist.strip():
            raise gr.Error("Please specify your audio artist")

        (rss, rs, srs, sr, etts, ett, cjs, cj, cjss, cjsc, stas, sta, stass,
         stasc, sss, ss, ssss, sssc, jss, js, jsss, jssc, hss, hs, hsss, hssc,
         jsps, jsp, jspss, jspsc, techs, tech, techss, techsc, mts, lnrs,
         mapType, lnr, count, step, scale, sampler, rm_jack_interval,
         auto_snap, seed) = args

        seed = int(seed)
        if seed < 0:
            seed = random.randint(1, 100000000)
        # seed all host RNGs like the reference webui (ref: webui.py:301-307)
        seed_everything(seed)

        feature_dict, h_dict = generate_feature_dict(
            rss, rs, srs, sr, etts, ett, cjs, cj, cjss, cjsc, stas, sta,
            stass, stasc, sss, ss, ssss, sssc, jss, js, jsss, jssc, hss, hs,
            hsss, hssc, jsps, jsp, jspss, jspsc, techs, tech, techss, techsc,
            mts, lnrs, mapType, lnr, count, step, scale, rm_jack_interval,
            auto_snap, seed,
        )
        prompt = ", ".join(f"{k}={v}" for k, v in h_dict.items())

        try:
            decoded, z_length = pipeline.sample_charts(
                audioPath, feature_dict, count=int(count), steps=int(step),
                scale=float(scale), seed=seed,
                solver=str(sampler or "ddim"),
            )
        except Exception as e:  # user-facing OOM/driver errors (ref
            # webui.py:468-471) — resource exhaustion should suggest a fix,
            # anything else surfaces as a readable error instead of a 500
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower():
                raise gr.Error(
                    "Out of device memory — reduce the chart count or use a "
                    "shorter audio file."
                )
            raise gr.Error(f"Generation failed: {msg[:300]}")
        save_name = f"{audioArtist} - {audioTitle}"
        save_dir = os.path.join(output_path, save_name)
        shutil.rmtree(save_dir, ignore_errors=True)
        paths = pipeline.save_charts(
            decoded, save_dir, audioPath, audioTitle, audioArtist,
            template_path, z_length, prompt=prompt, auto_snap=auto_snap,
            rm_jack_interval=rm_jack_interval,
            creator=f"MuG Diffusion TPU v{VERSION}",
        )
        osz_path = pipeline.package_osz(
            save_dir, os.path.join(output_path, save_name + ".osz")
        )
        previews = _render_previews(paths)
        return [
            gr.update(value=previews, visible=bool(previews)),
            gr.update(value=osz_path, visible=True),
            gr.update(value=save_name),
            gr.update(visible=True),
            gr.update(visible=True, value=prompt),
        ]

    def _render_previews(paths):
        """Chart preview PNGs via reamber when available
        (ref: webui.py:448-461)."""
        try:
            from reamber.osu.OsuMap import OsuMap
            from reamber.algorithms.playField import PlayField
            from reamber.algorithms.playField.parts import (
                PFDrawBeatLines, PFDrawBpm, PFDrawColumnLines, PFDrawNotes,
                PFDrawOffsets,
            )
        except ImportError:
            return []
        previews = []
        for path in paths:
            m = OsuMap.read_file(path)
            pf = (
                PlayField(m=m, duration_per_px=5, padding=40)
                + PFDrawBpm() + PFDrawBeatLines() + PFDrawColumnLines()
                + PFDrawNotes() + PFDrawOffsets()
            )
            previews.append(pf.export_fold(max_height=1000))
        return previews

    def startInvertion(chart_file, rate):
        if chart_file is None:
            raise gr.Error("Chart not found")
        try:
            result = chart_to_prompt(
                chart_file.name if hasattr(chart_file, "name") else chart_file,
                rate,
            )
        except ValueError as e:
            raise gr.Error(str(e))
        return gr.update(value=result)

    def autofill_tags(audio_file):
        """Fill title/artist from the uploaded file's ID3 tags (eyed3 when
        available, ref webui.py:518-528), else from the 'Artist - Title'
        filename convention."""
        if audio_file is None:
            return gr.update(), gr.update()
        path = (audio_file.name if hasattr(audio_file, "name")
                else str(audio_file))
        title_v, artist_v = "", ""
        try:
            import eyed3

            meta = eyed3.load(path)
            if meta is not None and meta.tag is not None:
                title_v = meta.tag.title or ""
                artist_v = meta.tag.artist or ""
        except Exception:
            # eyed3 missing OR the upload is corrupt/unreadable — either
            # way fall back to the filename convention below
            pass
        if not title_v:
            stem = os.path.splitext(os.path.basename(path))[0]
            if " - " in stem:
                artist_v, title_v = stem.split(" - ", 1)
            else:
                title_v = stem
        return gr.update(value=title_v), gr.update(value=artist_v)

    def pattern_block(name, default_msd=17):
        with gr.Row():
            sw = gr.Checkbox(label=f"{name}")
            val = gr.Radio(["more", "less"], value="more",
                           label=f"{name} amount")
            score_sw = gr.Checkbox(label=f"{name} MSD")
            score = gr.Slider(5, 35, value=default_msd, step=0.5,
                              label=f"{name} MSD value")
        return sw, val, score_sw, score

    with gr.Blocks(title="MuG Diffusion TPU") as demo:
        gr.Markdown("# MuG Diffusion TPU — AI charting for rhythm games")
        with gr.Tab("Generate"):
            audio = gr.File(label="Audio file")
            title = gr.Textbox(label="Audio title")
            artist = gr.Textbox(label="Audio artist")
            audio.upload(autofill_tags, inputs=[audio],
                         outputs=[title, artist], api_name="autofill_tags")
            with gr.Row():
                rss = gr.Checkbox(label="style switch")
                rs = gr.Radio(
                    ["ranked/stable", "loved", "graveyard"],
                    value="ranked/stable", label="style",
                )
            with gr.Row():
                srs = gr.Checkbox(label="star rating switch")
                sr = gr.Slider(1, 8, value=4, step=0.1, label="star rating")
            with gr.Row():
                etts = gr.Checkbox(label="MSD switch")
                ett = gr.Slider(5, 35, value=20, step=0.5, label="MSD score")
            cjs, cj, cjss, cjsc = pattern_block("Chordjack")
            stas, sta, stass, stasc = pattern_block("Stamina")
            sss, ss, ssss, sssc = pattern_block("Stream")
            jss, js, jsss, jssc = pattern_block("Jumpstream")
            hss, hs, hsss, hssc = pattern_block("Handstream")
            jsps, jsp, jspss, jspsc = pattern_block("Jackspeed")
            techs, tech, techss, techsc = pattern_block("Technical")
            with gr.Row():
                mts = gr.Checkbox(label="map type switch")
                mapType = gr.Radio(
                    ["Rice (LN < 10%)", "Hybrid (10% < LN < 40%)",
                     "Long Note (LN > 40%)"],
                    value="Rice (LN < 10%)", label="map type",
                )
            with gr.Row():
                lnrs = gr.Checkbox(label="LN ratio switch")
                lnr = gr.Slider(0, 1, value=0.0, step=0.05, label="ln ratio")
            with gr.Row():
                count = gr.Slider(1, 16, value=4, step=1,
                                  label="Sampling count")
                step = gr.Slider(10, 200, value=100, step=1,
                                 label="Sampling steps")
                scale = gr.Slider(1, 30, value=5.0, step=0.5,
                                  label="CFG scale")
                # uniform-t dpmpp is NOT exposed: at matched steps it
                # measured WORSE than ddim on trained weights
                # (docs/PERF.md solver-quality table) — the solver stays
                # in code solely as the basis for the lambda grid
                sampler = gr.Radio(
                    ["ddim", "dpmpp-lambda"], value="ddim",
                    label="sampler (dpmpp-lambda: ~100-step ddim quality "
                          "at 10-20 steps, measured on trained weights)",
                )
            with gr.Row():
                rm_jacks = gr.Slider(
                    0, 180, value=90, step=5,
                    label="remove mini-jack interval (ms)",
                )
                auto_snap = gr.Checkbox(value=True, label="auto snapping")
                seed = gr.Number(value=-1, label="seed (-1 = random)")
            btn = gr.Button("Start Generation", variant="primary")
            gallery = gr.Gallery(label="Chart preview", visible=False)
            out_file = gr.File(label="Output (.osz)", visible=False)
            out_name = gr.Textbox(label="Name", visible=True)
            out_type = gr.Markdown(visible=False)
            out_prompt = gr.Textbox(label="Prompt", visible=False)
            btn.click(
                startMapping,
                inputs=[audio, title, artist, rss, rs, srs, sr, etts, ett,
                        cjs, cj, cjss, cjsc, stas, sta, stass, stasc, sss, ss,
                        ssss, sssc, jss, js, jsss, jssc, hss, hs, hsss, hssc,
                        jsps, jsp, jspss, jspsc, techs, tech, techss, techsc,
                        mts, lnrs, mapType, lnr, count, step, scale, sampler,
                        rm_jacks, auto_snap, seed],
                outputs=[gallery, out_file, out_name, out_type, out_prompt],
                api_name="generate",
            )
        with gr.Tab("chart2prompt"):
            chart = gr.File(label="Chart file (.osu)")
            rate = gr.Number(value=1.0, label="rate")
            inv_btn = gr.Button("Analyze")
            inv_out = gr.Dataframe(
                headers=["key", "value"], label="prompt", visible=True
            )
            inv_btn.click(
                startInvertion, inputs=[chart, rate], outputs=[inv_out],
                api_name="chart2prompt",
            )
    return demo


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_config", type=str, default="models/ckpt/model.yaml")
    p.add_argument("--ckpt", type=str, default="models/ckpt/model")
    p.add_argument("--template_beatmap", type=str, default="assets/template.osu")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--share", action="store_true")
    opt = p.parse_args(argv)

    check_update()
    config = load_config(opt.model_config)
    pipeline = GenerationPipeline(config, ckpt_path=opt.ckpt)
    demo = build_ui(pipeline, opt.template_beatmap)
    demo.queue(10).launch(server_port=opt.port, share=opt.share)


if __name__ == "__main__":
    main()
