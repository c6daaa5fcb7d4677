"""Benchmark: end-to-end chart generation on TPU.

Headline metric mirrors the reference's published number (ref:
/root/reference/README.md:63): generate 4 charts for a 3-minute audio at the
webui defaults (100 DDIM steps, CFG 5.0, batch 4) — ~30 s on the reference's
RTX 3050 Ti. Here the whole neural pipeline runs on-device: mel spectrogram,
wave encoder (once), 100-step CFG DDIM scan, VAE decode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the speedup factor over the 30 s reference time.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_SECONDS = 30.0  # ref README.md:63


def _ensure_idle_chip(
    guard_files=(("/tmp/train_guard.pid", "train_guard"),
                 ("/tmp/pipeline.pid", "pipeline")),
    child_file=("/tmp/train_guard_child.pid", "main.py"),
    poll_s=5.0,
    max_polls=120,
    settle_s=10.0,
):
    """Gracefully land any guarded training run before measuring.

    The driver calls bench.py at times this process cannot control; if the
    round-5 retrain pipeline is still holding the TPU (and its HBM), the
    headline number measures host/device contention, not the serving path —
    exactly the BENCH_r04 failure mode diagnosed in docs/PERF.md ("never
    bench on a contended host"). Training is resilient to this stop: the
    trainer's SIGTERM handler defers to a step boundary and checkpoints,
    so a later `main.py -r <run>` resume loses nothing.

    Only explicit PID files written by scripts/train_guard.sh and
    scripts/_r5_resume_pipeline.sh are used — never process-name patterns;
    each PID's /proc cmdline must contain the expected tag (guards against
    PID recycling). Returns True if a trainer was landed.
    """
    import signal

    def _pid(path, expect):
        try:
            with open(path) as f:
                pid = int(f.read().strip())
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
            return pid if expect in cmd else None
        except (OSError, ValueError):
            return None

    # stop the relaunch loops first so the trainer is not restarted
    for path, tag in guard_files:
        guard = _pid(path, tag)
        if guard is not None:
            os.kill(guard, signal.SIGKILL)
    child = _pid(*child_file)
    if child is None:
        return False
    print(f"bench: landing live training (pid {child}) before "
          "measuring — SIGTERM checkpoints at the next step boundary",
          file=sys.stderr)
    os.kill(child, signal.SIGTERM)
    for _ in range(max_polls):  # default ~10 min: step boundary + orbax
        time.sleep(poll_s)
        if _pid(*child_file) is None:
            break
    else:
        os.kill(child, signal.SIGKILL)
        time.sleep(settle_s)
    time.sleep(settle_s)  # let the tunnel release device memory
    return True


def main():
    # advertise the bench's own PID so landing tooling can avoid grabbing
    # the chip mid-measurement (scripts/_r5_watch_and_land.sh)
    try:
        with open("/tmp/bench.pid", "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass
    _ensure_idle_chip()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _model_config
    from mug_diffusion_tpu.diffusion.ddim import DDIMSampler
    from mug_diffusion_tpu.ops.mel import melspectrogram_on_device
    from mug_diffusion_tpu.utils.config import instantiate_from_config

    count = 4
    steps = 100
    scale = 5.0
    seconds_of_audio = 180
    sr = 22050

    ddpm = instantiate_from_config(_model_config(tiny=False))
    sampler = DDIMSampler(ddpm)

    # 3-minute synthetic track (tone mixture + beat clicks)
    t = np.arange(seconds_of_audio * sr) / sr
    wave = (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 440 * t * (1 + 0.001 * np.sin(t)))
        + 0.2 * (np.sin(2 * np.pi * 2 * t) > 0.99)
    ).astype(np.float32)

    # length bucket: 180 s -> 31008 mel frames -> z_length 512 (full size)
    z_length = 512
    mel_frames = z_length * 64

    rng = jax.random.PRNGKey(0)
    params = ddpm.init_params(
        rng, {"batch": 1, "z_length": 64, "num_features": 21}
    )

    feature = jnp.zeros((count, 21), jnp.int32)
    uc_feature = jnp.zeros((count, 21), jnp.int32)
    wave_dev = jnp.asarray(wave)  # one 16 MB host->device transfer
    n_unet_levels = 4

    def make_conditioning():
        mel = melspectrogram_on_device(wave_dev, max_frames=mel_frames)
        audio1 = mel.T[None]  # [1, T, 128]
        _, w1 = ddpm.encode_conditioning(params, audio1, feature[:1])
        w = [
            jnp.broadcast_to(wi, (count,) + wi.shape[1:])
            for wi in list(w1)[-n_unet_levels:]
        ]
        c = ddpm.cond_output(params, feature)
        uc = ddpm.cond_output(params, uc_feature)
        return c, w, uc, audio1

    def generate(seed):
        # mel + wave features stay on-device; the audio is identical for all
        # samples, so encode at batch 1 and broadcast the (small) deep scales
        c, w, uc, _ = make_conditioning()
        samples, _ = sampler.sample(
            S=steps, c=c, w=w, batch_size=count, params=params,
            shape=(16, z_length), rng=jax.random.PRNGKey(seed),
            unconditional_guidance_scale=scale, unconditional_conditioning=uc,
        )
        decoded = ddpm.decode(params, samples)
        return np.asarray(decoded)

    def analytic_flops():
        """XLA-estimated FLOPs for one full generation: S x U-Net (CFG 2x
        batch) + wave encoder + VAE decode."""

        def cost(fn, *args):
            comp = jax.jit(fn).lower(*args).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))

        c, w, uc, audio1 = make_conditioning()
        x = jnp.zeros((2 * count, z_length, 16))
        tt = jnp.zeros((2 * count,), jnp.int32)
        c2 = jnp.concatenate([uc, c], axis=0)
        w2 = [jnp.concatenate([wi, wi], axis=0) for wi in w]
        unet = cost(
            lambda p, x, t, c, w: ddpm.apply_model(p, x, t, c, w),
            params, x, tt, c2, w2,
        )
        wave = cost(
            lambda p, a: ddpm.model.apply(p, a, method=type(ddpm.model).wave_output),
            params, audio1,
        )
        z = jnp.zeros((count, z_length, 16))
        dec = cost(
            lambda p, z: ddpm.model.apply(p, z, method=type(ddpm.model).decode),
            params, z,
        )
        return steps * unet + wave + dec

    def analytic_flops_batched(n_count, n_songs=1):
        """XLA-estimated FLOPs for one THROUGHPUT-mode generation (count
        n_count charts of n_songs songs): S x U-Net at CFG 2*n_count batch
        + wave encoder at batch n_songs + VAE decode at n_count."""

        def cost(fn, *args):
            comp = jax.jit(fn).lower(*args).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))

        c1, w1, uc1, audio1 = make_conditioning()
        reps = n_count // count
        cb = jnp.concatenate([c1] * reps, axis=0)
        ucb = jnp.concatenate([uc1] * reps, axis=0)
        # w1 entries already carry the latency-mode batch (count): tile up
        wb = [jnp.concatenate([wi] * reps, axis=0) for wi in w1]
        x = jnp.zeros((2 * n_count, z_length, 16))
        tt = jnp.zeros((2 * n_count,), jnp.int32)
        c2 = jnp.concatenate([ucb, cb], axis=0)
        w2 = [jnp.concatenate([wi, wi], axis=0) for wi in wb]
        unet = cost(
            lambda p, x, t, c, w: ddpm.apply_model(p, x, t, c, w),
            params, x, tt, c2, w2,
        )
        audio_b = jnp.concatenate([audio1] * n_songs, axis=0)
        wave = cost(
            lambda p, a: ddpm.model.apply(
                p, a, method=type(ddpm.model).wave_output),
            params, audio_b,
        )
        z = jnp.zeros((n_count, z_length, 16))
        dec = cost(
            lambda p, z: ddpm.model.apply(
                p, z, method=type(ddpm.model).decode),
            params, z,
        )
        return steps * unet + wave + dec

    # fused single-dispatch serving path: whole generation (mel -> wave ->
    # prompt -> 100-step CFG scan -> decode) is ONE executable. The DYNAMIC
    # variant (steps/eta/scale traced — what the pipeline actually serves;
    # one compile covers the whole webui slider surface) is the headline;
    # the static variant (steps baked as scan constants) is measured for
    # the dynamic-dispatch overhead comparison.
    from mug_diffusion_tpu.apps.serving import build_fused_generate

    fused_dyn = build_fused_generate(
        ddpm, steps=None, scale=scale, count=count, z_length=z_length,
    )
    fused_static = build_fused_generate(
        ddpm, steps=steps, scale=scale, count=count, z_length=z_length,
    )

    def generate_fused(seed):
        return np.asarray(
            fused_dyn(params, wave_dev, feature, uc_feature,
                      jax.random.PRNGKey(seed), scale, steps, 0.0)
        )

    # warmup (compile)
    t0 = time.time()
    out = generate_fused(0)
    warm = time.time() - t0

    # timed runs
    times = []
    for i in range(3):
        t0 = time.time()
        out = generate_fused(i + 1)
        times.append(time.time() - t0)
    best = min(times)

    # static-steps executable for comparison
    np.asarray(fused_static(params, wave_dev, feature, uc_feature,
                            jax.random.PRNGKey(0)))
    static_times = []
    for i in range(3):
        t0 = time.time()
        np.asarray(fused_static(params, wave_dev, feature, uc_feature,
                                jax.random.PRNGKey(i + 1)))
        static_times.append(time.time() - t0)
    static_s = min(static_times)

    # modular (multi-dispatch) path for comparison
    generate(0)
    t0 = time.time()
    generate(1)
    modular_s = time.time() - t0

    assert out.shape == (count, z_length * 8, 16)
    assert np.isfinite(out).all()

    # THROUGHPUT mode: one fused dispatch generating a 16-chart batch of
    # the same song (the sample_charts_batched serving shape) — bigger
    # per-op shapes should lift MFU above the latency-mode 0.34 where
    # DESIGN.md blames "intrinsic small per-op sizes"; this measures it.
    dev_kind = jax.devices()[0].device_kind.lower()
    # TPU v5e peak: 197 TFLOP/s bf16 (scaling-book hardware table)
    peak = 1.97e14 if ("v5 lite" in dev_kind or "v5e" in dev_kind) else None
    tp = {}
    # sweep: count 16 and 32 of one song, plus a 2-song count-32 fused
    # batch (the production batch-serving shape: the wave encoder runs
    # once PER SONG, each song fans out to its 16 charts)
    mel_on_dev = melspectrogram_on_device(wave_dev, max_frames=mel_frames)
    for label, tp_count, tp_songs in (
        ("tp16", 16, 1), ("tp32", 32, 1), ("tp32_2song", 32, 2),
    ):
        try:
            feat_tp = jnp.zeros((tp_count, 21), jnp.int32)
            if tp_songs == 1:
                fused_tp = build_fused_generate(
                    ddpm, steps=steps, scale=scale, count=tp_count,
                    z_length=z_length,
                )
                audio_arg = wave_dev
            else:
                fused_tp = build_fused_generate(
                    ddpm, steps=steps, scale=scale, count=tp_count,
                    z_length=z_length, input_kind="mel_songs",
                    n_songs=tp_songs,
                )
                audio_arg = jnp.stack([mel_on_dev] * tp_songs)
            np.asarray(fused_tp(params, audio_arg, feat_tp, feat_tp,
                                jax.random.PRNGKey(0)))
            tp_times = []
            for i in range(3):
                t0 = time.time()
                np.asarray(fused_tp(params, audio_arg, feat_tp, feat_tp,
                                    jax.random.PRNGKey(i + 1)))
                tp_times.append(time.time() - t0)
            tp_s = min(tp_times)
            try:
                tp_flops = analytic_flops_batched(tp_count, tp_songs)
            except Exception as e:
                tp_flops = None
                tp[f"{label}_flops_error"] = f"{type(e).__name__}: {e}"
            row = {
                f"{label}_batch_s": round(tp_s, 3),
                f"{label}_charts_per_min_per_chip": round(
                    tp_count / tp_s * 60, 1),
                f"{label}_mfu": (
                    round(tp_flops / tp_s / peak, 4)
                    if (tp_flops and peak) else None
                ),
            }
            tp.update(row)
            # headline throughput_* keys track the best charts/min config
            if (row[f"{label}_charts_per_min_per_chip"]
                    > tp.get("throughput_charts_per_min_per_chip", 0)):
                tp.update({
                    "throughput_count": tp_count,
                    "throughput_songs": tp_songs,
                    "throughput_batch_s": row[f"{label}_batch_s"],
                    "throughput_charts_per_min_per_chip": row[
                        f"{label}_charts_per_min_per_chip"],
                    "throughput_mfu": row[f"{label}_mfu"],
                })
        except Exception as e:  # HBM overflow etc: report, don't fail
            tp[f"{label}_error"] = f"{type(e).__name__}: {e}"
    # HBM high-water across everything this process ran (axon tunnels may
    # not expose memory_stats — then this key is absent)
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            tp["hbm_peak_gb"] = round(
                stats["peak_bytes_in_use"] / 2 ** 30, 2)
    except Exception:
        pass

    # MFU: XLA-estimated FLOPs / wall time / chip peak.
    try:
        total_flops = analytic_flops()
    except Exception:
        total_flops = None
    mfu = (
        round(total_flops / best / peak, 4)
        if (total_flops and peak) else None
    )

    result = {
        "metric": "e2e_generation_4charts_3min_100steps_cfg",
        "value": round(best, 3),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_SECONDS / best, 2),
    }
    detail = {
        "warmup_incl_compile_s": round(warm, 1),
        "runs_s": [round(x, 3) for x in times],
        "unet_steps_per_sec": round(steps / best, 2),
        "charts_per_min_per_chip": round(count / best * 60, 1),
        "static_steps_path_s": round(static_s, 3),
        "dynamic_overhead_pct": round((best / static_s - 1.0) * 100, 1),
        "modular_path_s": round(modular_s, 3),
        "compute_dtype": str(ddpm.compute_dtype.__name__),
        "total_gflops_per_generation": (
            round(total_flops / 1e9, 1) if total_flops else None
        ),
        "mfu": mfu,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    detail.update(tp)
    # detail FIRST (stderr), headline LAST: whatever records the tail of
    # this process sees both rows and any last-JSON-line parse lands on
    # the headline metric
    print(json.dumps({"detail": detail}), file=sys.stderr, flush=True)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
