"""A/B: XLA attention vs the fused rel-pos Pallas kernel at serving shapes.

Round-2 measured the original (fp32-cast) kernel at +56 ms e2e under the
bf16 compute policy and shipped it permanently off (docs/PERF.md). Round-4
reworked the kernel to consume native dtypes (bf16 dots with fp32 MXU
accumulation, fp32 softmax in-register) — this script decides win-or-remove
on the real chip: the full fused static serving path (100-step CFG DDIM,
count 4, z_length 512) and a single UNet apply, both ways, forced-readback
timings (jax.block_until_ready is unreliable through the axon tunnel).

Usage: python scripts/bench_pallas_ab.py [--steps 100] [--runs 3]
"""

import argparse
import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(use_pallas: bool):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _model_config
    from mug_diffusion_tpu.utils.config import instantiate_from_config

    cfg = copy.deepcopy(_model_config(tiny=False))
    cfg["params"]["unet_config"]["params"]["use_pallas"] = use_pallas
    ddpm = instantiate_from_config(cfg)
    params = ddpm.init_params(
        jax.random.PRNGKey(0), {"batch": 1, "z_length": 64, "num_features": 21}
    )
    return ddpm, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mug_diffusion_tpu.apps.serving import build_fused_generate

    count, z_length, sr, secs = 4, 512, 22050, 180
    t = np.arange(secs * sr) / sr
    wave = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wave_dev = jnp.asarray(wave)
    feature = jnp.zeros((count, 21), jnp.int32)

    out = {}
    for label, use_pallas in (("xla", False), ("pallas", True)):
        ddpm, params = build(use_pallas)

        # single UNet apply at the CFG serving batch: the sharpest signal
        x = jnp.zeros((2 * count, z_length, 16), ddpm.compute_dtype)
        tt = jnp.zeros((2 * count,), jnp.int32)
        c = ddpm.cond_output(params, jnp.concatenate([feature, feature]))
        from mug_diffusion_tpu.ops.mel import melspectrogram_on_device

        mel = melspectrogram_on_device(wave_dev, max_frames=z_length * 64)
        _, w1 = ddpm.encode_conditioning(params, mel.T[None], feature[:1])
        w = [
            jnp.broadcast_to(wi, (2 * count,) + wi.shape[1:])
            for wi in list(w1)[-4:]
        ]
        unet = jax.jit(
            lambda p, x, t, c, w: ddpm.apply_model(p, x, t, c, w)
        )
        np.asarray(unet(params, x, tt, c, w))  # compile + force
        unet_times = []
        for _ in range(max(args.runs, 5)):
            t0 = time.time()
            np.asarray(unet(params, x, tt, c, w))
            unet_times.append(time.time() - t0)

        fused = build_fused_generate(
            ddpm, steps=args.steps, scale=5.0, count=count, z_length=z_length
        )
        np.asarray(fused(params, wave_dev, feature, feature,
                         jax.random.PRNGKey(0)))
        e2e_times = []
        for i in range(args.runs):
            t0 = time.time()
            np.asarray(fused(params, wave_dev, feature, feature,
                             jax.random.PRNGKey(i + 1)))
            e2e_times.append(time.time() - t0)

        out[label] = {
            "unet_apply_ms": round(min(unet_times) * 1000, 2),
            "e2e_s": round(min(e2e_times), 3),
        }

    out["delta_e2e_ms"] = round(
        (out["pallas"]["e2e_s"] - out["xla"]["e2e_s"]) * 1000, 1
    )
    out["delta_unet_ms"] = round(
        out["pallas"]["unet_apply_ms"] - out["xla"]["unet_apply_ms"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
