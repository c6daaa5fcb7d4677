"""Fused single-dispatch generation for serving.

The modular pipeline (apps/pipeline.py) issues ~8 device calls per
generation (mel, wave encode, prompt embed x2, DDIM scan, VAE decode) plus
five schedule-table uploads — each call and transfer pays a host->device
round trip. On a co-located host that's microseconds; over a remote-TPU
tunnel it dominates end-to-end latency by ~60x (measured: ~32 ms per
blocking dispatch, ~94 ms/MB readback, vs ~13 ms total device compute for a
4-chart 100-step CFG generation).

``build_fused_generate`` closes over everything static — DDIM schedule
tables become XLA constants, steps/scale/shape are baked into the
executable — so one call is ONE dispatch taking raw audio samples and
feature ids, and ONE readback of the decoded charts.

This is also the right shape for production batch serving: XLA sees the
whole graph and can overlap the wave encoder with the first scan steps'
memory traffic, and no [S, B, T, C] trajectory is ever materialized.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from mug_diffusion_tpu.diffusion.ddim import (
    DDIMSampler,
    ddim_dynamic_core,
    ddim_scan_core,
    extract_s4_kernels,
    make_dynamic_schedule_tables,
)
from mug_diffusion_tpu.ops.mel import melspectrogram_on_device


def build_fused_generate(
    ddpm,
    *,
    steps: Optional[int] = None,
    scale: float = 5.0,
    count: int,
    z_length: int,
    mel_frames: Optional[int] = None,
    eta: float = 0.0,
    temperature: float = 1.0,
    use_mask: bool = False,
    out_dtype=jnp.float32,
    sr: int = 22050,
    n_mels: int = 128,
    n_fft: int = 512,
    input_kind: str = "wave",
    n_songs: int = 1,
    mesh=None,
    data_axis: str = "data",
    shard_wave_time: bool = False,
    param_shardings=None,
    solver: str = "ddim",
):
    """Returns jitted ``generate(params, wave_samples, feature, uc_feature,
    rng) -> decoded [count, z_length*8, 16]``.

    wave_samples: raw 1-D PCM at the config sample rate (padded/truncated on
    device to ``mel_frames`` mel frames). feature/uc_feature: [count, F]
    embedding ids.

    ``steps=None`` (the serving default) builds the DYNAMIC executable: the
    DDIM step count and eta become TRACED arguments of the returned callable
    (``generate(..., guidance_scale, steps, eta)``) — one compiled graph
    serves the entire webui slider surface (steps 10-200, CFG 1-30, eta),
    matching the reference's serve-any-combo behavior
    (ref webui.py:602-608, mug/diffusion/ddim.py:56) with zero per-request
    recompiles. A data-dependent ``lax.while_loop`` runs exactly ``steps``
    U-Net evaluations. An integer ``steps`` bakes the schedule as scan
    constants (used by A/B benches and parity tests).

    ``use_mask=True`` adds traced ``mask``/``x0`` latent arguments for
    masked partial regeneration fused into the same single dispatch
    (ref ddim.py:141-144); pass mask=0 to regenerate everything.

    When ``mesh`` is given (a ``jax.sharding.Mesh`` with a ``data_axis``
    axis), the sample batch — noise, conditioning, the whole CFG-doubled
    DDIM scan, and the VAE decode — is sharded over that axis (SPMD data
    parallelism over ICI; params replicated). ``count`` must be divisible by
    the axis size. The reference has no multi-GPU inference at all
    (webui.py serves on one device); here one fused executable scales the
    chart batch across a TPU pod slice.

    ``shard_wave_time=True`` additionally shards the wave-encoder pyramid
    over its TIME axis (the SURVEY §2.4 sequence-sharding stretch goal):
    the encoder runs once per song at batch 1 over 32768 mel frames, so
    batch sharding alone leaves it replicated — time sharding splits that
    work across the mesh, with XLA/GSPMD inserting the conv halo exchanges
    and attention all-gathers over ICI automatically. The features are
    then resharded to the batch axis for the DDIM scan.
    """
    mel_frames = mel_frames or z_length * 64
    dynamic = steps is None
    if solver not in ("ddim", "dpmpp", "dpmpp-lambda"):
        raise ValueError(
            f"unknown solver {solver!r} (ddim|dpmpp|dpmpp-lambda)"
        )
    if solver != "ddim" and not dynamic:
        raise ValueError(f"solver={solver!r} requires dynamic steps "
                         "(steps=None)")
    if dynamic:
        # full-length schedule constants; steps/eta are call-time scalars
        full_tables = make_dynamic_schedule_tables(ddpm.schedule)
        if solver != "ddim":
            from mug_diffusion_tpu.diffusion.dpm_solver import (
                make_dpm_full_tables,
            )

            dpm_tables = make_dpm_full_tables(ddpm.schedule)
    else:
        sampler = DDIMSampler(ddpm)
        sched = sampler.make_schedule(steps, ddim_eta=eta)
        # numpy closures become XLA constants — no per-call upload
        tables = (
            jnp.asarray(sched["timesteps"], jnp.int32),
            jnp.asarray(sched["alphas"]),
            jnp.asarray(sched["alphas_prev"]),
            jnp.asarray(sched["sigmas"]),
            jnp.asarray(sched["sqrt_one_minus_alphas"]),
        )
    if use_mask and not dynamic:
        raise ValueError(
            "use_mask fused serving requires dynamic steps (steps=None)"
        )
    use_cfg = scale != 1.0
    n_levels = len(ddpm.model.unet_config["params"]["channel_mult"])
    wrapper_cls = type(ddpm.model)

    assert input_kind in ("wave", "mel", "mel_batch", "mel_songs")
    # "mel_songs": MULTI-SONG fused batch — audio_in is [n_songs, n_mels,
    # T]; the wave encoder runs ONCE at batch n_songs and each song's
    # features fan out to its count/n_songs charts. This is the production
    # batch-serving shape: K requests for different tracks share one
    # dispatch without re-encoding any song per chart (mel_batch would run
    # the encoder count times) and without the single-song restriction of
    # "wave"/"mel".
    if input_kind == "mel_songs" and count % n_songs != 0:
        raise ValueError(
            f"count={count} not divisible by n_songs={n_songs}"
        )

    jit_kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_shard = mesh.shape[data_axis]
        if count % n_shard != 0:
            raise ValueError(
                f"count={count} not divisible by mesh '{data_axis}' axis "
                f"size {n_shard}"
            )
        batch_sh = NamedSharding(mesh, PartitionSpec(data_axis))
        rep_sh = NamedSharding(mesh, PartitionSpec())

        def shard(a):
            return jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, PartitionSpec(data_axis))
            )

        # mel_batch already parallelizes the encoder over the batch axis;
        # time sharding only pays for the single-song kinds (batch 1)
        if shard_wave_time and input_kind != "mel_batch":
            time_sh = NamedSharding(
                mesh, PartitionSpec(None, data_axis)
            )

            def shard_time(a):  # [B, T, C] -> split T over the mesh
                return jax.lax.with_sharding_constraint(a, time_sh)
        else:
            def shard_time(a):
                return a

        audio_sh = batch_sh if input_kind == "mel_batch" else rep_sh
        # params default replicated; pass parallel/tp.py tp_shardings for
        # tensor-parallel serving over a (data, model) mesh — GSPMD then
        # splits the attention/GEGLU matmuls across the model axis inside
        # the same fused executable
        params_sh = param_shardings if param_shardings is not None else rep_sh
        in_sh = [params_sh, audio_sh, batch_sh, batch_sh, rep_sh, rep_sh]
        if dynamic:
            in_sh += [rep_sh, rep_sh]  # steps, eta scalars
        if use_mask:
            in_sh += [batch_sh, batch_sh]  # mask, x0 latents
        jit_kwargs = dict(
            in_shardings=tuple(in_sh),
            out_shardings=batch_sh,
        )
    else:
        def shard(a):
            return a

        def shard_time(a):
            return a

    @partial(jax.jit, **jit_kwargs)
    def _generate(params, audio_in, feature, uc_feature, rng,
                  guidance_scale, *extra):
        if input_kind == "wave":  # raw PCM -> mel on device
            mel = melspectrogram_on_device(
                audio_in, sr=sr, n_mels=n_mels, hop_length=n_fft // 4,
                n_fft=n_fft, max_frames=mel_frames,
            )
            audio = mel.T[None]  # [1, T_mel, n_mels]
        elif input_kind == "mel":  # one song, [n_mels, T]
            audio = audio_in.T[None]
        else:  # "mel_batch"/"mel_songs": [count|n_songs, n_mels, T]
            audio = audio_in.transpose(0, 2, 1)

        audio = shard_time(audio)

        def encode_all(module):
            w1 = module.wave_output(audio)
            if not isinstance(w1, (list, tuple)):
                w1 = [w1]
            # pin every scale to time-sharded so GSPMD keeps the whole
            # pyramid split over the sequence axis (no-op when disabled)
            w1 = [shard_time(wi) for wi in w1]
            c = module.cond_output(feature)
            uc = module.cond_output(uc_feature) if use_cfg else None
            return list(w1), c, uc

        w1, c, uc = ddpm.model.apply(params, method=encode_all)
        # single-song kinds encode the audio once at batch 1 and broadcast
        # the (small) deep scales to all samples; mel_batch is already
        # [count, ...]; mel_songs repeats each song's row to its charts
        if input_kind == "mel_songs" and n_songs != count:
            def fan_out(wi):
                return jnp.repeat(wi, count // n_songs, axis=0)
        else:
            def fan_out(wi):
                return jnp.broadcast_to(wi, (count,) + wi.shape[1:])

        w = [
            shard(fan_out(wi).astype(jnp.float32))
            for wi in list(w1)[-n_levels:]
        ]

        it = iter(extra)
        steps_arg = next(it) if dynamic else None
        eta_arg = next(it) if dynamic else None
        mask = shard(next(it)) if use_mask else None
        x0 = shard(next(it)) if use_mask else None

        rng, rng_init = jax.random.split(rng)
        size = (count, z_length, ddpm.z_channels)
        x = shard(jax.random.normal(rng_init, size))
        c_in = shard(jnp.concatenate([uc, c], axis=0)) if use_cfg else shard(c)
        w_in = (
            [shard(jnp.concatenate([wi, wi], axis=0)) for wi in w]
            if use_cfg else w
        )

        # materialize the L-specific S4 conv kernels ONCE (one extra U-Net
        # forward) — XLA does not hoist their FFT math out of the scan
        B_in = size[0] * (2 if use_cfg else 1)
        x_probe = shard(jnp.zeros((B_in,) + size[1:]))
        s4k = extract_s4_kernels(ddpm, params, x_probe, c_in, w_in)
        params_k = {**params, **s4k}

        mask_in = mask if use_mask else jnp.zeros(size)
        x0_in = x0 if use_mask else jnp.zeros(size)
        if dynamic and solver != "ddim":
            # 2nd-order ODE solver: ~5x fewer steps than DDIM at equal
            # quality (another ~2x fewer with the -lambda log-SNR node
            # spacing); deterministic (eta_arg is ignored by construction)
            from mug_diffusion_tpu.diffusion.dpm_solver import (
                dpm_dynamic_core,
            )

            x_final = dpm_dynamic_core(
                ddpm, params_k, x, c_in, w_in, mask_in, x0_in, rng,
                steps_arg, guidance_scale, dpm_tables,
                use_cfg=use_cfg, use_mask=use_mask,
                discretize=(
                    "lambda" if solver == "dpmpp-lambda" else "uniform"
                ),
            )
        elif dynamic:
            x_final = ddim_dynamic_core(
                ddpm, params_k, x, c_in, w_in, mask_in, x0_in, rng,
                steps_arg, eta_arg, guidance_scale, full_tables,
                use_cfg=use_cfg, use_mask=use_mask, temperature=temperature,
            )
        else:
            x_final, _ = ddim_scan_core(
                ddpm, params_k, x, c_in, w_in,
                mask_in, x0_in, rng, tables, guidance_scale,
                use_cfg=use_cfg, use_mask=use_mask, temperature=temperature,
                collect=False,
            )
        decoded = ddpm.model.apply(
            params, x_final, method=wrapper_cls.decode
        )
        if out_dtype == jnp.int8:
            # quantized readback: x*64 at int8 keeps the logit signs exact
            # (note placement) and offsets to 1/64 frame (~0.7 ms); the
            # consumer must dequantize with /64 before chart decoding
            return jnp.round(
                jnp.clip(decoded * 64.0, -127.0, 127.0)
            ).astype(jnp.int8)
        return decoded.astype(out_dtype)

    if dynamic:
        def generate(params, audio_in, feature, uc_feature, rng,
                     guidance_scale, steps, eta=0.0, mask=None, x0=None):
            """``guidance_scale``, ``steps`` and ``eta`` are TRACED scalars:
            every slider combination reuses this one compiled executable.
            Only the CFG structure (scale==1.0 at build time) and
            ``use_mask`` change the graph. No defaults for scale/steps —
            the cached executable must not silently reuse a build-time
            value."""
            if solver != "ddim" and float(eta) != 0.0:
                raise ValueError("solver='dpmpp' is deterministic (eta=0)")
            extra = [jnp.int32(steps), jnp.float32(eta)]
            if use_mask:
                size = (count, z_length, ddpm.z_channels)
                extra += [
                    jnp.zeros(size) if mask is None
                    else jnp.broadcast_to(mask, size).astype(jnp.float32),
                    jnp.zeros(size) if x0 is None
                    else jnp.broadcast_to(x0, size).astype(jnp.float32),
                ]
            return _generate(
                params, audio_in, feature, uc_feature, rng,
                jnp.float32(guidance_scale), *extra,
            )
    else:
        def generate(params, audio_in, feature, uc_feature, rng,
                     guidance_scale=scale):
            """``guidance_scale`` is a TRACED scalar: any value reuses the
            one compiled executable (the webui exposes a 1-30 slider — a
            baked constant would recompile minutes per notch). The
            build-time ``scale`` only decides the CFG structure
            (scale==1.0 builds the single-pass graph) and serves as the
            default."""
            return _generate(
                params, audio_in, feature, uc_feature, rng,
                jnp.float32(guidance_scale),
            )

    generate._jitted = _generate  # test hook: inspect XLA cache size
    return generate
