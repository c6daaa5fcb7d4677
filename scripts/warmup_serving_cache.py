"""Pre-populate the serving compile cache for all length buckets.

First compilation of the fused generation executable costs minutes cold;
the persistent XLA compilation cache (mug_diffusion_tpu/__init__.py,
MUG_COMPILE_CACHE dir) makes subsequent process starts fast. Steps, eta
and guidance scale are TRACED arguments of the dynamic executable, so the
compile surface is only (z_length bucket, count bucket, cfg-structure) —
warming the buckets below covers the ENTIRE webui slider range
(steps 10-200, scale 1-30, count 1-16 padded to count buckets).

Usage:
    python scripts/warmup_serving_cache.py [--buckets 128,256,512] \
        [--counts 4,8,16] [--tiny]
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
    p.add_argument("--counts", type=str, default="1,2,4,8,16",
                   help="count buckets to warm (webui slider 1-16 pads to "
                        "these)")
    p.add_argument("--scale", type=float, default=5.0,
                   help="traced; any value works for warming the CFG graph")
    p.add_argument("--skip-uncond", action="store_true",
                   help="skip the scale==1.0 (no-CFG) graph structure")
    p.add_argument("--tiny", action="store_true")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _model_config
    from mug_diffusion_tpu.apps.serving import build_fused_generate
    from mug_diffusion_tpu.utils.config import instantiate_from_config

    import numpy as np

    ddpm = instantiate_from_config(_model_config(tiny=opt.tiny))
    params = ddpm.init_params(jax.random.PRNGKey(0),
                              {"batch": 1, "z_length": 64})

    timings = {}
    for z_length in (int(b) for b in opt.buckets.split(",")):
        wave = jnp.zeros((z_length * 64 * 128,), jnp.float32)
        for count in (int(c) for c in opt.counts.split(",")):
            feature = jnp.zeros((count, 21), jnp.int32)
            scales = [opt.scale] if opt.skip_uncond else [opt.scale, 1.0]
            for s in scales:  # scale==1.0 is a distinct (no-CFG) graph
                fused = build_fused_generate(
                    ddpm, steps=None, scale=s, count=count,
                    z_length=z_length,
                )
                t0 = time.time()
                np.asarray(fused(params, wave, feature, feature,
                                 jax.random.PRNGKey(0), s, 100, 0.0))
                key = f"{z_length}x{count}@cfg={s != 1.0}"
                timings[key] = round(time.time() - t0, 1)
                print(f"bucket {z_length} count {count} cfg={s != 1.0}: "
                      f"{timings[key]} s")
    print(json.dumps({"warmup_seconds_per_bucket": timings}))


if __name__ == "__main__":
    main()
