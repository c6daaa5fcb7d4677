"""Artifact-level inpainting demo on trained weights (VERDICT r4 item 4).

Takes an existing chart + its audio, regenerates ONE time window with the
fused mask/x0 serving path (ref mug/diffusion/ddim.py:141-144), and checks:

  1. the KEPT region's decoded note list is identical to a no-op
     regeneration baseline (mask=1 everywhere re-noises and restores the
     original latent each step, so kept-region equality is measured
     against what the codec itself preserves through encode->decode);
  2. the regenerated window is valid (notes exist, decodable);
  3. the seam is consistent — no mini-jack spike in a ±1 s boundary band
     versus the original chart's own jack rate there.

Writes before/after .osu artifacts under --out (default
docs/inpaint_r5/) for side-by-side inspection in the editor.

Usage:
  python scripts/demo_inpaint.py --ckpt <orbax dir> --chart x.osu \
      [--audio auto] [--window_ms 8000 16000] [--out docs/inpaint_r5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _notes_in(lines, lo_ms=None, hi_ms=None):
    out = []
    for line in lines:
        p = line.split(",")
        t = int(float(p[2]))
        if (lo_ms is None or t >= lo_ms) and (hi_ms is None or t < hi_ms):
            out.append((t, int(int(float(p[0])) / 128), int(p[3]) & 128))
    return sorted(out)


def _jacks(notes, interval_ms=100.0):
    from collections import defaultdict

    per_col = defaultdict(list)
    for t, c, _ in notes:
        per_col[c].append(t)
    jacks = 0
    for ts in per_col.values():
        ts.sort()
        jacks += sum(1 for a, b in zip(ts, ts[1:]) if b - a < interval_ms)
    return jacks


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--chart", required=True, help="existing .osu to edit")
    p.add_argument("--audio", default=None,
                   help="audio file (default: the chart's AudioFilename)")
    p.add_argument("--window_ms", type=float, nargs=2,
                   default=(8000.0, 16000.0),
                   help="time window to REGENERATE (start end, ms)")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="docs/inpaint_r5")
    opt = p.parse_args()

    import numpy as np

    from mug_diffusion_tpu.apps.pipeline import GenerationPipeline
    from mug_diffusion_tpu.data.convertor import parse_osu_file
    from mug_diffusion_tpu.utils.config import load_config
    from scripts.eval_controllability import _chart_lines

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = load_config(
        os.path.join(root, "configs/mug/mug_diffusion_tpu.yaml"))
    config["model"]["params"]["first_stage_config"]["params"].pop(
        "ckpt_path", None)
    pipe = GenerationPipeline(config, ckpt_path=opt.ckpt)

    audio = opt.audio
    if audio is None:
        _, meta = parse_osu_file(opt.chart, None)
        audio = meta.audio
    w0, w1 = opt.window_ms

    def sample(keep_ranges):
        decoded, z_length = pipe.sample_charts(
            audio, {}, count=1, steps=opt.steps, scale=opt.scale,
            seed=opt.seed, inpaint_from=opt.chart,
            inpaint_keep_ms=keep_ranges)
        return _chart_lines(decoded[0], z_length, pipe), z_length

    # baseline: keep EVERYTHING (mask=1 over the full latent) — what the
    # encode->decode round trip preserves of the original chart
    baseline, z_length = sample([(0.0, 1e9)])
    # the demo: keep everything OUTSIDE the window
    inpainted, _ = sample([(0.0, w0), (w1, 1e9)])

    # latent frames quantize the window; compare outside a safety margin of
    # one latent frame (371.5 ms) around the window edges
    frame_ms = (pipe.audio_frame_duration * pipe.audio_note_window_ratio
                * 1000 * 8)
    lo, hi = w0 - frame_ms, w1 + frame_ms

    kept_base = (_notes_in(baseline, None, lo)
                 + _notes_in(baseline, hi, None))
    kept_inp = (_notes_in(inpainted, None, lo)
                + _notes_in(inpainted, hi, None))
    window_notes = _notes_in(inpainted, w0, w1)
    window_orig = _notes_in(baseline, w0, w1)

    # seam band: ±1 s around each window edge
    seam_inp = (_notes_in(inpainted, w0 - 1000, w0 + 1000)
                + _notes_in(inpainted, w1 - 1000, w1 + 1000))
    seam_base = (_notes_in(baseline, w0 - 1000, w0 + 1000)
                 + _notes_in(baseline, w1 - 1000, w1 + 1000))

    report = {
        "chart": opt.chart,
        "window_ms": [w0, w1],
        "kept_region_identical": kept_base == kept_inp,
        "kept_notes": len(kept_base),
        "kept_mismatches": len(
            set(map(tuple, kept_base)) ^ set(map(tuple, kept_inp))),
        "window_notes_original": len(window_orig),
        "window_notes_regenerated": len(window_notes),
        "window_changed": window_notes != window_orig,
        "seam_jacks_inpainted": _jacks(seam_inp),
        "seam_jacks_baseline": _jacks(seam_base),
    }
    print(json.dumps(report, indent=1))

    os.makedirs(opt.out, exist_ok=True)

    def write(lines, name):
        tmpl = open(
            os.path.join(root, "assets", "template.osu")).read()
        body = tmpl.split("[HitObjects]")[0]
        with open(os.path.join(opt.out, name), "w") as f:
            f.write(body + "[HitObjects]\n" + "\n".join(lines) + "\n")

    write(baseline, "before.osu")
    write(inpainted, "after.osu")
    with open(os.path.join(opt.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {opt.out}/before.osu, after.osu, report.json")

    ok = (report["kept_region_identical"]
          and report["window_notes_regenerated"] > 0)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()


