"""Prompt-controllability evaluation on TRAINED weights (VERDICT r4 item 2).

The control sliders are the reference's whole premise (ref webui.py:130-193;
chart2prompt :196-274): this script measures whether a trained model's
output actually TRACKS the prompt, by generating over a prompt grid and
inverting each generated chart back to measured quantities:

  * sr sweep        — requested sr vs MinaCalc overall MSD / 4 (the same
                      heuristic that labeled the training corpus, so
                      requested and measured live on one scale)
  * ln_ratio sweep  — requested ln_ratio vs decoded LN fraction
  * pattern bools   — per-skillset MSD of charts generated WITH the
                      pattern prompted vs the SAME seed/audio without it

Charts are decoded RAW (no gridify / jack removal) so the numbers measure
the model, not the symbolic post-processor.

Usage:
  python scripts/eval_controllability.py --ckpt <orbax dir> \
      [--audio path.wav] [--out docs/controllability_r5.json]
Prints one JSON line per grid point plus a summary; optionally writes the
full record to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _default_audio(tmp_dir: str) -> str:
    """Deterministic synthetic track (corpus-v2 style: beat ticks + tone
    bed) when no --audio is given."""
    from scripts.make_synthetic_dataset import write_set

    return os.path.join(
        os.path.dirname(
            write_set(tmp_dir, "evaltrack", duration_s=30.0, bpm=180.0,
                      seed=123, family="stream", density=0.9, ln_ratio=0.3)
        ),
        "audio.wav",
    )


def _chart_lines(decoded_row, z_length: int, pipe):
    """[4K, T] logits -> hit-object lines via the live codec (no grid
    snapping, no jack removal)."""
    from mug_diffusion_tpu.data.convertor import parse_osu_file

    convertor_params = {
        "frame_ms": pipe.audio_frame_duration
        * pipe.audio_note_window_ratio * 1000,
        "max_frame": z_length * 8,
        "from_logits": True,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _, meta = parse_osu_file(
        os.path.join(root, "assets", "template.osu"), convertor_params
    )
    return meta.convertor.array_to_objects(decoded_row, meta)


def _measure(lines):
    """Hit-object lines -> (ln_ratio, notes, minacalc 8-skillset dict)."""
    notes = []
    ln = 0
    for line in lines:
        p = line.split(",")
        if int(p[3]) & 128:
            ln += 1
        notes.append((int(float(p[2])), int(int(float(p[0])) / 128)))
    total = len(notes)
    out = {"notes": total, "ln_ratio": (ln / total) if total else 0.0}
    try:
        import minacalc

        from mug_diffusion_tpu.apps.invert import ETT_KEYS

        notes.sort()
        if total >= 10:
            out["msd"] = dict(
                zip(ETT_KEYS, map(float, minacalc.calc_skill_set(1.0, notes)))
            )
    except ImportError:
        pass
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--audio", default=None)
    p.add_argument("--count", type=int, default=4)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    opt = p.parse_args()

    import numpy as np

    from mug_diffusion_tpu.apps.pipeline import GenerationPipeline
    from mug_diffusion_tpu.utils.config import load_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = load_config(
        os.path.join(root, "configs/mug/mug_diffusion_tpu.yaml"))
    config["model"]["params"]["first_stage_config"]["params"].pop(
        "ckpt_path", None)
    pipe = GenerationPipeline(config, ckpt_path=opt.ckpt)

    audio = opt.audio or _default_audio("/tmp/eval_controllability")

    def run(feature_dict, seed):
        decoded, z_length = pipe.sample_charts(
            audio, feature_dict, count=opt.count, steps=opt.steps,
            scale=opt.scale, seed=seed)
        rows = []
        for i in range(opt.count):
            lines = _chart_lines(decoded[i], z_length, pipe)
            if lines:
                rows.append(_measure(lines))
        return rows

    record = {"ckpt": opt.ckpt, "audio": audio, "count": opt.count,
              "steps": opt.steps, "scale": opt.scale, "grids": {}}

    def mean_of(rows, key):
        vals = [r[key] for r in rows if key in r]
        return float(np.mean(vals)) if vals else None

    # ---- sr sweep ------------------------------------------------------
    sr_rows = []
    for sr in (1.5, 2.5, 3.5, 4.5, 6.0):
        rows = run({"sr": sr}, opt.seed)
        measured = [r["msd"]["overall"] / 4.0 for r in rows if "msd" in r]
        row = {
            "grid": "sr", "requested": sr,
            "measured_sr": float(np.mean(measured)) if measured else None,
            "notes": mean_of(rows, "notes"),
        }
        sr_rows.append(row)
        print(json.dumps(row), flush=True)
    record["grids"]["sr"] = sr_rows

    # ---- ln_ratio sweep -------------------------------------------------
    ln_rows = []
    for lnr in (0.0, 0.3, 0.6, 0.85):
        rows = run({"ln_ratio": lnr}, opt.seed)
        row = {
            "grid": "ln_ratio", "requested": lnr,
            "measured_ln_ratio": mean_of(rows, "ln_ratio"),
            "notes": mean_of(rows, "notes"),
        }
        ln_rows.append(row)
        print(json.dumps(row), flush=True)
    record["grids"]["ln_ratio"] = ln_rows

    # ---- pattern bools ---------------------------------------------------
    pat_rows = []
    for pattern in ("jackspeed", "chordjack", "stream"):
        on = run({pattern: True, f"{pattern}_ett": 20.0}, opt.seed + 1)
        off = run({}, opt.seed + 1)
        row = {
            "grid": "pattern", "pattern": pattern,
            "msd_prompted": mean_of(
                [{"v": r["msd"][pattern]} for r in on if "msd" in r], "v"),
            "msd_unprompted": mean_of(
                [{"v": r["msd"][pattern]} for r in off if "msd" in r], "v"),
        }
        pat_rows.append(row)
        print(json.dumps(row), flush=True)
    record["grids"]["pattern"] = pat_rows

    # ---- monotonicity summary -------------------------------------------
    def monotone(rows, req_key, meas_key):
        pts = [(r[req_key], r[meas_key]) for r in rows
               if r.get(meas_key) is not None]
        if len(pts) < 2:
            return None
        return bool(all(b[1] >= a[1] - 1e-9
                        for a, b in zip(pts, pts[1:])))

    summary = {
        "sr_monotone": monotone(sr_rows, "requested", "measured_sr"),
        "ln_ratio_monotone": monotone(
            ln_rows, "requested", "measured_ln_ratio"),
        "patterns_respond": {
            r["pattern"]: (
                None if r["msd_prompted"] is None
                or r["msd_unprompted"] is None
                else bool(r["msd_prompted"] > r["msd_unprompted"])
            )
            for r in pat_rows
        },
    }
    record["summary"] = summary
    print(json.dumps({"summary": summary}))

    if opt.out:
        with open(opt.out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {opt.out}")


if __name__ == "__main__":
    main()
