"""CLI chart generation (ref: /root/reference/scripts/mapping.py).

Usage:
    python scripts/mapping.py --audio song.mp3 --ckpt models/ckpt/model \
        --model_config models/ckpt/model.yaml \
        --prompt_dir configs/mapping --n_samples 4 --ddim_steps 200
"""

from __future__ import annotations

import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mug_diffusion_tpu.apps.pipeline import GenerationPipeline
from mug_diffusion_tpu.utils.config import load_config


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt_dir", type=str, default="configs/mapping",
                   help="directory of feature_{i}.yaml prompt configs")
    p.add_argument("--feature_yaml", type=str,
                   default="configs/mug/mania_beatmap_features.yaml")
    p.add_argument("--template_beatmap", type=str, default="assets/template.osu")
    p.add_argument("--audio", type=str, required=True)
    p.add_argument("--audio_title", type=str, default=None)
    p.add_argument("--audio_artist", type=str, default=None)
    p.add_argument("--model_config", type=str,
                   default="models/ckpt/model.yaml")
    p.add_argument("--ckpt", type=str, default="models/ckpt/model")
    p.add_argument("--outdir", type=str, default="outputs/beatmaps")
    p.add_argument("--ddim_steps", type=int, default=200)
    p.add_argument("--no_adsorption", action="store_true",
                   help="don't snap notes to the detected grid")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--sampler", choices=["ddim", "dpmpp", "dpmpp-lambda"], default="ddim",
                   help="dpmpp-lambda = DPM-Solver++(2M) on a log-SNR node "
                        "grid: ~100-step ddim quality at 10-20 steps, "
                        "measured on trained weights (docs/PERF.md); "
                        "uniform-t dpmpp showed no measured win over ddim; "
                        "both deterministic, so --ddim_eta must be 0")
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--scale", type=float, default=1.0,
                   help="classifier-free guidance scale")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--inpaint_from", type=str, default=None,
                   help="existing .osu chart for masked partial regeneration")
    p.add_argument("--inpaint_keep", type=str, default=None,
                   help="comma-separated ms ranges to keep, e.g. "
                        "'0:30000,60000:90000'")
    return p


def main(argv=None):
    opt = get_parser().parse_args(argv)

    title = opt.audio_title or os.path.splitext(os.path.basename(opt.audio))[0]
    artist = opt.audio_artist or "Unknown Artist"

    model_config = opt.model_config
    if model_config == "models/ckpt/model.yaml" and not os.path.isfile(
            model_config):
        # the reference's deploy layout (ref mapping.py) puts the config
        # next to the downloaded weights; fall back to the repo's live
        # config so a fresh clone with --ckpt alone still generates
        model_config = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs/mug/mug_diffusion_tpu.yaml")
    config = load_config(model_config)
    pipeline = GenerationPipeline(config, ckpt_path=opt.ckpt)

    # per-sample prompts feature_1.yaml .. feature_N.yaml (ref mapping.py:422-427)
    feature_dicts = []
    for i in range(opt.n_samples):
        path = os.path.join(opt.prompt_dir, f"feature_{i + 1}.yaml")
        if os.path.isfile(path):
            with open(path) as f:
                feature_dicts.append(yaml.safe_load(f) or {})
        else:
            feature_dicts.append({})

    keep_ranges = None
    if opt.inpaint_keep:
        keep_ranges = [
            tuple(float(x) for x in r.split(":"))
            for r in opt.inpaint_keep.split(",")
        ]

    decoded, z_length = pipeline.sample_charts(
        opt.audio,
        feature_dicts if any(feature_dicts) else {},
        count=opt.n_samples,
        steps=opt.ddim_steps,
        scale=opt.scale,
        seed=opt.seed,
        eta=opt.ddim_eta,
        solver=opt.sampler,
        inpaint_from=opt.inpaint_from,
        inpaint_keep_ms=keep_ranges,
    )

    save_dir = os.path.join(opt.outdir, f"{artist} - {title}")
    paths = pipeline.save_charts(
        decoded, save_dir, opt.audio, title, artist, opt.template_beatmap,
        z_length, auto_snap=not opt.no_adsorption,
    )
    osz = pipeline.package_osz(
        save_dir, os.path.join(opt.outdir, f"{artist} - {title}.osz")
    )
    print("Wrote:")
    for pth in paths:
        print(" ", pth)
    print(" ", osz)


if __name__ == "__main__":
    main()
