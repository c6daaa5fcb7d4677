"""Training-throughput benchmark: full live-model training step on the
current device (wave encoder over 32768 mel frames with remat, frozen VAE
encode, U-Net fwd+bwd, masked AdamW), plus host input-pipeline throughput.

Prints one JSON line: {"metric", "value", "unit", "detail"}.

Env:
  BENCH_TRAIN_BATCH   per-device batch (default 48 = the reference's
                      configs/mug/mug_diffusion.yaml:93 batch size)
  BENCH_TRAIN_STEPS   timed steps (default 10)

NOTE timing uses a host readback of the final loss — on the remote-TPU
tunnel jax.block_until_ready() does not reliably block (docs/PERF.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def loader_throughput(seconds: float = 5.0):
    """Items/sec of the host data pipeline on a synthetic dataset (parse +
    tensorize + augment + host mel from cached npz)."""
    try:
        import tempfile

        import numpy as np

        from scripts.make_synthetic_dataset import write_set
        from mug_diffusion_tpu.data.dataset import OsuTrainDataset

        with tempfile.TemporaryDirectory() as td:
            rng = np.random.default_rng(0)
            paths = [
                write_set(td, f"synth{i:03d}", 30.0,
                          float(rng.uniform(150, 220)), seed=i)
                for i in range(8)
            ]
            txt = os.path.join(td, "beatmap.txt")
            with open(txt, "w") as f:
                f.writelines(p + "\n" for p in paths)
            ds = OsuTrainDataset(
                txt_file=[txt], sr=22050, n_fft=512, max_audio_frame=32768,
                audio_note_window_ratio=8, n_mels=128,
                cache_dir=os.path.join(td, "cache"),
                with_audio=True, with_feature=False,
                feature_yaml=os.path.join(
                    os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))),
                    "configs/mug/mania_beatmap_features.yaml"),
            )
            # COLD path first: ffmpeg/WAV decode + librosa-parity mel per
            # item (first epoch of a fresh cache dir pays this per song)
            t0 = time.time()
            n_cold = min(len(ds), 8)
            for i in range(n_cold):
                ds[i]
            cold = round(n_cold / (time.time() - t0), 2)
            # warm path: npz mel cache hits
            n = 0
            t0 = time.time()
            while time.time() - t0 < seconds:
                ds[n % len(ds)]
                n += 1
            return {"cold_items_per_sec": cold,
                    "warm_items_per_sec": round(n / (time.time() - t0), 1)}
    except Exception as e:  # pragma: no cover - diagnostic only
        return f"unavailable: {type(e).__name__}: {e}"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _model_config
    from mug_diffusion_tpu.utils.checkpoint import trainable_mask
    from mug_diffusion_tpu.utils.config import instantiate_from_config

    B = int(os.environ.get("BENCH_TRAIN_BATCH", "48"))
    n = int(os.environ.get("BENCH_TRAIN_STEPS", "10"))
    # BENCH_TRAIN_ZLEN: latent length bucket (512 = the reference's fixed
    # 190 s padding; 128/256 measure the bucketed-training shapes)
    z_len = int(os.environ.get("BENCH_TRAIN_ZLEN", "512"))
    note_len = z_len * 8
    mel_len = z_len * 64

    cfg = _model_config(tiny=False)
    # BENCH_TRAIN_REMAT=0: disable wave-encoder gradient checkpointing —
    # bf16 halves activation memory, which may buy back the remat
    # recompute (~1/3 of wave FLOPs) if the batch still fits in HBM
    if os.environ.get("BENCH_TRAIN_REMAT", "1") == "0":
        cfg["params"]["wave_stage_config"]["params"]["use_checkpoint"] = False
    ddpm = instantiate_from_config(cfg)
    rng = jax.random.PRNGKey(0)
    params = ddpm.init_params(
        rng, {"batch": 1, "z_length": 64, "num_features": 21}
    )
    mask = {
        "params": trainable_mask(
            params["params"], frozen_prefixes=("first_stage_model",)
        )
    }
    opt = optax.chain(
        optax.adamw(1e-4),
        optax.masked(
            optax.set_to_zero(),
            jax.tree_util.tree_map(lambda t: not t, mask),
        ),
    )
    opt_state = opt.init(params)

    # random batch: an all-zeros batch NaNs the GroupNorm gradient (0/0 at
    # zero variance) and is unrepresentative for timing anyway
    kb = jax.random.PRNGKey(42)
    batch = {
        "note": (jax.random.uniform(kb, (B, note_len, 16)) > 0.9).astype(
            jnp.float32),
        "audio": 0.1 * jax.random.normal(
            jax.random.fold_in(kb, 1), (B, mel_len, 128)),
        "feature": jnp.zeros((B, 21), jnp.int32),
        "valid_flag": jnp.ones((B, note_len)),
    }

    @jax.jit
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            loss, _ = ddpm.loss_fn(p, batch, rng, train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state, batch,
                                   jax.random.PRNGKey(1))
    float(np.asarray(loss))  # force completion (see module docstring)

    # analytic FLOPs of one train step (fwd+bwd+optimizer) for MFU
    try:
        comp = jax.jit(step).lower(params, opt_state, batch,
                                   jax.random.PRNGKey(1)).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        step_flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        step_flops = None

    # BENCH_TRAIN_PROFILE=<dir>: capture an XLA device-timeline trace of the
    # timed steps (the tunnel's profiler timelines are trustworthy even
    # though block_until_ready is not — docs/PERF.md)
    profile_dir = os.environ.get("BENCH_TRAIN_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir, create_perfetto_trace=True)
    t0 = time.time()
    for i in range(n):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(i))
    final = float(np.asarray(loss))  # in-order queue: forces all n steps
    dt = (time.time() - t0) / n
    if profile_dir:
        jax.profiler.stop_trace()

    try:
        stats = jax.devices()[0].memory_stats() or {}
        hbm_peak_gb = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        hbm_peak_gb = None

    # BENCH_TRAIN_BREAKDOWN=1: attribute the step to its components by
    # timing each as its own executable (readback-forced, best of 3).
    # Components overlap/fuse differently inside the full step, so the
    # parts need not sum to the whole — this is attribution, not algebra.
    breakdown = None
    if os.environ.get("BENCH_TRAIN_BREAKDOWN", "0") == "1":
        from mug_diffusion_tpu.utils.precision import cast_floating

        model = ddpm.model
        cls = type(model)
        ap = (cast_floating(params)
              if ddpm.compute_dtype == jnp.bfloat16 else params)
        audio_in = batch["audio"].astype(ddpm.compute_dtype)
        note_in = batch["note"].astype(ddpm.compute_dtype)

        def wave_loss(p):
            w = model.apply(p, audio_in, True, method=cls.wave_output)
            return sum(jnp.sum(wi.astype(jnp.float32)) for wi in w)

        c_const = model.apply(ap, batch["feature"], method=cls.cond_output)
        w_const = model.apply(ap, audio_in, True, method=cls.wave_output)
        x = jax.random.normal(kb, (B, z_len, 16), ddpm.compute_dtype)
        tt = jnp.zeros((B,), jnp.int32)

        def unet_loss(p):
            out = ddpm.apply_model(p, x, tt, c_const, w_const)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def vae_encode(p):
            return jnp.sum(jnp.abs(
                model.apply(p, note_in, True, method=cls.encode)
                .mode().astype(jnp.float32)))

        def fwd_bwd(loss_f):
            # grads reduced to one scalar INSIDE the jit: outputting the
            # full grad tree would cost a ~200 MB tunnel readback per
            # timing, and outputting only the loss would let XLA DCE the
            # whole backward pass
            def f(p):
                loss, grads = jax.value_and_grad(loss_f)(p)
                gn = sum(
                    jnp.sum(jnp.square(g.astype(jnp.float32)))
                    for g in jax.tree_util.tree_leaves(grads)
                )
                return loss + gn
            return f

        def opt_only(params, opt_state):
            grads = jax.tree_util.tree_map(jnp.ones_like, params)
            updates, _ = opt.update(grads, opt_state, params)
            new = optax.apply_updates(params, updates)
            return sum(
                jnp.sum(jnp.abs(l.astype(jnp.float32)))
                for l in jax.tree_util.tree_leaves(new)
            )

        def timed(fn, *args):
            jitted = jax.jit(fn)
            np.asarray(jitted(*args))  # compile + force (tunnel-safe)
            try:
                comp = jitted.lower(*args).compile()
                ca = comp.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                fl = float(ca.get("flops", 0.0))
            except Exception:
                fl = None
            best = None
            for _ in range(3):
                t0 = time.time()
                np.asarray(jitted(*args))
                el = time.time() - t0
                best = el if best is None else min(best, el)
            return {"ms": round(best * 1000, 1),
                    "tflops": round(fl / 1e12, 2) if fl else None}

        breakdown = {
            "wave_encoder_fwd_bwd": timed(fwd_bwd(wave_loss), ap),
            "unet_fwd_bwd": timed(fwd_bwd(unet_loss), ap),
            "vae_encode_fwd": timed(vae_encode, ap),
            "optimizer_update": timed(opt_only, params, opt_state),
        }

    print(json.dumps({
        "metric": "train_step_live_model",
        "value": round(dt * 1000, 1),
        "unit": "ms",
        "detail": {
            "batch": B,
            "z_length": z_len,
            "charts_per_sec_per_chip": round(B / dt, 1),
            "hbm_peak_gb": hbm_peak_gb,
            "tflops_per_step": (
                round(step_flops / 1e12, 2) if step_flops else None
            ),
            "mfu": (
                round(step_flops / dt / 1.97e14, 4)
                if (step_flops and any(
                    k in jax.devices()[0].device_kind.lower()
                    for k in ("v5 lite", "v5e")
                ))
                else None
            ),
            "loss_finite": bool(np.isfinite(final)),
            "breakdown": breakdown,
            "loader": loader_throughput(),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
