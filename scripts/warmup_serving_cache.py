"""Pre-populate the serving compile cache for all length buckets.

First compilation of the fused generation executable costs minutes cold;
the persistent XLA compilation cache (mug_diffusion_tpu/__init__.py,
MUG_COMPILE_CACHE dir) makes subsequent process starts fast, but every
(z_length bucket, steps, count, scale) signature still compiles once.
Run this at deploy time (or bake the cache dir into the serving image) so
first user requests hit warm executables.

Usage:
    python scripts/warmup_serving_cache.py [--buckets 128,256,512] \
        [--steps 100] [--count 4] [--scale 5.0] [--tiny]
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
    p.add_argument("--buckets", type=str, default="128,192,256,320,384,448,"
                   "512,640,768,1024")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--count", type=int, default=4)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--tiny", action="store_true")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _model_config
    from mug_diffusion_tpu.apps.serving import build_fused_generate
    from mug_diffusion_tpu.utils.config import instantiate_from_config

    ddpm = instantiate_from_config(_model_config(tiny=opt.tiny))
    params = ddpm.init_params(jax.random.PRNGKey(0),
                              {"batch": 1, "z_length": 64})
    feature = jnp.zeros((opt.count, 21), jnp.int32)

    timings = {}
    for z_length in (int(b) for b in opt.buckets.split(",")):
        wave = jnp.zeros((z_length * 64 * 128,), jnp.float32)
        fused = build_fused_generate(
            ddpm, steps=opt.steps, scale=opt.scale, count=opt.count,
            z_length=z_length,
        )
        t0 = time.time()
        fused(params, wave, feature, feature,
              jax.random.PRNGKey(0)).block_until_ready()
        timings[z_length] = round(time.time() - t0, 1)
        print(f"bucket {z_length}: {timings[z_length]} s")
    print(json.dumps({"warmup_seconds_per_bucket": timings}))


if __name__ == "__main__":
    main()
