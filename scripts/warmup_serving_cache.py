"""Pre-populate the serving compile cache for all length buckets.

First compilation of the fused generation executable costs minutes cold;
the persistent XLA compilation cache (mug_diffusion_tpu/__init__.py,
MUG_COMPILE_CACHE dir) makes subsequent process starts fast. Steps, eta
and guidance scale are TRACED arguments of the dynamic executable, so the
compile surface is only (z_length bucket, count bucket, cfg/mask
structure) — warming the buckets below covers the ENTIRE webui slider
range (steps 10-200, scale 1-30, count 1-16 padded to count buckets).

This warms through ``GenerationPipeline.warmup`` — the exact executables
``sample_charts`` dispatches in production (mel input, config sr/n_mels,
mesh sharding if configured) — so the persistent-cache entries it writes
are the ones real requests hit. Building the fused callables directly
with a different input kind would warm programs serving never runs.

Usage:
    python scripts/warmup_serving_cache.py \
        [--model_config configs/mug/mug_diffusion_tpu.yaml] \
        [--ckpt models/ckpt/model] [--buckets 128,256,512] \
        [--counts 4,8,16] [--skip-uncond] [--skip-mask]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_config", type=str,
                   default="configs/mug/mug_diffusion_tpu.yaml")
    p.add_argument("--ckpt", type=str, default=None,
                   help="optional checkpoint; compiled HLO depends only on "
                        "shapes, so random-init params warm the same cache")
    p.add_argument("--buckets", type=str, default=None,
                   help="z-length buckets (default: the pipeline's own "
                        "Z_LENGTH_BUCKETS)")
    p.add_argument("--counts", type=str, default=None,
                   help="count buckets to warm (default: the pipeline's "
                        "COUNT_BUCKETS; webui slider 1-16 pads to these)")
    p.add_argument("--solvers", type=str, default="ddim,dpmpp",
                   help="comma list of solvers to warm; default warms both "
                        "since the webui exposes the sampler radio (each "
                        "solver is its own graph per structure — pass "
                        "--solvers ddim to halve warmup cost if dpmpp is "
                        "not exposed)")
    p.add_argument("--skip-uncond", action="store_true",
                   help="skip the scale==1.0 (no-CFG) graph structures")
    p.add_argument("--skip-mask", action="store_true",
                   help="skip the fused inpainting graph structures")
    opt = p.parse_args()

    from mug_diffusion_tpu.apps.pipeline import GenerationPipeline
    from mug_diffusion_tpu.utils.config import load_config

    config = load_config(opt.model_config)
    pipeline = GenerationPipeline(config, ckpt_path=opt.ckpt)

    buckets = ([int(b) for b in opt.buckets.split(",")]
               if opt.buckets else pipeline.z_length_buckets)
    counts = ([int(c) for c in opt.counts.split(",")]
              if opt.counts else pipeline.count_buckets)

    timings = {}
    for z_length in buckets:
        t0 = time.time()
        pipeline.warmup(
            buckets=[z_length], counts=counts,
            include_uncond=not opt.skip_uncond,
            include_mask=not opt.skip_mask,
            solvers=tuple(opt.solvers.split(",")),
        )
        timings[str(z_length)] = round(time.time() - t0, 1)
        print(f"bucket {z_length}: {timings[str(z_length)]} s")
    print(json.dumps({"warmup_seconds_per_bucket": timings}))


if __name__ == "__main__":
    main()
