"""Solver-quality evaluation on TRAINED weights: substantiate (or refute)
the DPM-Solver++ step-budget claims on a real checkpoint instead of the
analytic tanh oracle (tests/test_samplers.py).

For each (solver, steps) pair this generates charts through the SAME fused
serving executable the webui uses (steps is a traced argument — one compile
per solver), then scores them against the ddim@100 reference run at equal
seed and conditioning:

  * logit_mae     — mean |delta| of the decoded VAE logits
  * decision_agree — fraction of binarized note decisions (start + holding
                     channels, threshold 0 as in convertor.py from_logits)
                     equal to the ddim@100 run's decisions
  * notes          — number of note-start decisions fired (sanity: a
                     diverged solver fires wildly more/fewer notes)

The claim under test (webui.py sampler labels, docs/PERF.md convergence
ladder): dpmpp@20 and dpmpp-lambda@10 reach ddim@100 quality, while
ddim@20/ddim@10 visibly lag. Ref comparison point: the reference serves
DDIM only, fixed at whatever the steps slider says (ref webui.py:380).

Usage:
  python scripts/eval_solvers_quality.py --ckpt /path/to/checkpoints/best \
      --audio /tmp/synth96/synth000/audio.wav
Prints one JSON line per (solver, steps) plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="trained diffusion checkpoint (orbax dir)")
    p.add_argument("--audio", required=True)
    p.add_argument("--count", type=int, default=4)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=0)
    opt = p.parse_args()

    import numpy as np

    from mug_diffusion_tpu.apps.pipeline import GenerationPipeline
    from mug_diffusion_tpu.utils.config import load_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = load_config(
        os.path.join(root, "configs/mug/mug_diffusion_tpu.yaml"))
    # the serving pipeline never trains the first stage; drop a train-time
    # ckpt_path if present so GenerationPipeline doesn't try to re-load it
    config["model"]["params"]["first_stage_config"]["params"].pop(
        "ckpt_path", None)
    pipe = GenerationPipeline(config, ckpt_path=opt.ckpt)

    def decisions(arr):
        # [count, 4K, T] logits; channel layout is 4 per key:
        # (start, holding, start_offset, end_offset) — binary decisions are
        # the first two of each group at threshold 0 (convertor.py:194)
        k4 = arr.shape[1]
        idx = [i for i in range(k4) if i % 4 in (0, 1)]
        return arr[:, idx, :] > 0.0

    def run(solver, steps):
        decoded, _ = pipe.sample_charts(
            opt.audio, {}, count=opt.count, steps=steps, scale=opt.scale,
            seed=opt.seed, solver=solver)
        return np.asarray(decoded)

    ref = run("ddim", 100)
    ref_dec = decisions(ref)

    rows = []
    for solver, steps in (("ddim", 10), ("ddim", 20), ("dpmpp", 10),
                          ("dpmpp", 20), ("dpmpp-lambda", 10),
                          ("dpmpp-lambda", 20)):
        arr = run(solver, steps)
        dec = decisions(arr)
        row = {
            "solver": solver,
            "steps": steps,
            "logit_mae": round(float(np.abs(arr - ref).mean()), 5),
            "decision_agree": round(float((dec == ref_dec).mean()), 5),
            "notes": int(dec[:, ::2, :].sum()),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "reference": {"solver": "ddim", "steps": 100,
                      "notes": int(ref_dec[:, ::2, :].sum())},
        "ckpt": opt.ckpt,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
