"""Measure fused serving latency per solver at matched QUALITY budgets.

The DPM-Solver++(2M) ladder (docs/PERF.md) showed 20-step dpmpp and
~10-step dpmpp-lambda match 100-step DDIM accuracy; this script measures
what those budgets cost end-to-end on the live-size model (the webui
default workload: 4 charts, 3-min audio, CFG 5.0) through the same
dynamic fused executables the pipeline serves.

Usage: python scripts/bench_solvers.py  (real TPU; ~3 cold compiles on a
fresh cache). Prints one JSON line with seconds per generation per
(solver, steps) pair.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _model_config
    from mug_diffusion_tpu.apps.serving import build_fused_generate
    from mug_diffusion_tpu.utils.config import instantiate_from_config

    count, scale, z_length = 4, 5.0, 512
    sr, seconds = 22050, 180
    ddpm = instantiate_from_config(_model_config(tiny=False))
    params = ddpm.init_params(
        jax.random.PRNGKey(0),
        {"batch": 1, "z_length": 64, "num_features": 21},
    )

    t = np.arange(seconds * sr) / sr
    wave = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    n_feats = 21
    feature = jnp.zeros((count, n_feats), jnp.int32)

    results = {}
    for solver, steps in (("ddim", 100), ("dpmpp", 20),
                          ("dpmpp-lambda", 10)):
        fused = build_fused_generate(
            ddpm, steps=None, scale=scale, count=count, z_length=z_length,
            solver=solver,
        )
        wave_dev = jnp.asarray(wave)

        def gen(seed):
            # forced readback: block_until_ready is unreliable on the
            # axon tunnel (docs/PERF.md measurement notes)
            return np.asarray(fused(
                params, wave_dev, feature, feature,
                jax.random.PRNGKey(seed), scale, steps, 0.0,
            ))

        t0 = time.time()
        out = gen(0)
        warm = time.time() - t0
        assert np.isfinite(out).all()
        times = []
        for i in range(1, 6):
            t0 = time.time()
            gen(i)
            times.append(time.time() - t0)
        results[f"{solver}@{steps}"] = {
            "warm_s": round(warm, 2),
            "median_s": round(sorted(times)[len(times) // 2], 4),
        }
        print(f"{solver}@{steps}: median "
              f"{results[f'{solver}@{steps}']['median_s']} s", flush=True)

    print(json.dumps({
        "workload": f"{count} charts / {seconds}s audio / CFG {scale}",
        "results": results,
    }))


if __name__ == "__main__":
    main()
