"""Mixed-precision policy tests: the bf16 compute path must stay close to
fp32 end-to-end (sampler latents), and the fused serving path must match the
modular sampler exactly at equal seeds."""

import jax
import jax.numpy as jnp
import numpy as np

from mug_diffusion_tpu.diffusion.ddim import DDIMSampler
from mug_diffusion_tpu.utils.config import instantiate_from_config

from tests.test_pipeline import tiny_config


def _build(compute_dtype):
    cfg = tiny_config()["model"]
    cfg["params"]["compute_dtype"] = compute_dtype
    ddpm = instantiate_from_config(cfg)
    params = ddpm.init_params(
        jax.random.PRNGKey(7), {"batch": 1, "z_length": 8, "n_mels": 16}
    )
    return ddpm, params


def _sample(ddpm, params, steps=8, count=2, z_length=8):
    sampler = DDIMSampler(ddpm)
    feature = jnp.zeros((count, 21), jnp.int32)
    audio = 0.1 * jax.random.normal(
        jax.random.PRNGKey(3), (1, z_length * 8 * 8, 16)
    )
    c, w1 = ddpm.encode_conditioning(params, audio, feature[:1])
    n_levels = len(ddpm.model.unet_config["params"]["channel_mult"])
    w = [jnp.broadcast_to(wi, (count,) + wi.shape[1:])
         for wi in list(w1)[-n_levels:]]
    c = ddpm.cond_output(params, feature)
    uc = ddpm.cond_output(params, feature * 0)
    samples, _ = sampler.sample(
        S=steps, c=c, w=w, batch_size=count, params=params,
        shape=(16, z_length), rng=jax.random.PRNGKey(11),
        unconditional_guidance_scale=3.0, unconditional_conditioning=uc,
    )
    return np.asarray(samples)


def test_bf16_sampler_close_to_fp32():
    """Same weights, same noise: the bf16 compute path's final latents must
    track fp32 (policy keeps DDIM math, softmax stats, norms and S4 in
    fp32 — only matmul/conv compute drops to bf16)."""
    ddpm32, params = _build("float32")
    ddpm16, _ = _build("bfloat16")
    s32 = _sample(ddpm32, params)
    s16 = _sample(ddpm16, params)
    scale = np.abs(s32).mean()
    assert np.abs(s16 - s32).mean() < 0.05 * scale + 1e-3


def test_fused_generate_matches_modular_sampler():
    """The single-dispatch serving path must reproduce the modular pipeline
    bit-for-bit given the same params/seed (same scan, same tables)."""
    from mug_diffusion_tpu.apps.serving import build_fused_generate
    from mug_diffusion_tpu.ops.mel import melspectrogram_on_device

    ddpm, params = _build("float32")
    count, steps, z_length = 2, 6, 8
    n_mels, ratio = 16, 8
    mel_frames = z_length * 8 * ratio

    wave_samples = 0.05 * np.random.RandomState(0).randn(
        mel_frames * 16
    ).astype(np.float32)
    feature = jnp.zeros((count, 21), jnp.int32)
    uc_feature = jnp.ones((count, 21), jnp.int32)

    fused = build_fused_generate(
        ddpm, steps=steps, scale=3.0, count=count, z_length=z_length,
        mel_frames=mel_frames, n_mels=16, n_fft=64,
    )
    rng = jax.random.PRNGKey(5)
    out_fused = np.asarray(
        fused(params, jnp.asarray(wave_samples), feature, uc_feature, rng)
    )

    # modular: identical mel -> conditioning -> sample -> decode chain
    mel = melspectrogram_on_device(
        jnp.asarray(wave_samples), n_mels=16, hop_length=16, n_fft=64,
        max_frames=mel_frames,
    )
    audio1 = mel.T[None]
    _, w1 = ddpm.encode_conditioning(params, audio1, feature[:1])
    n_levels = len(ddpm.model.unet_config["params"]["channel_mult"])
    w = [jnp.broadcast_to(wi, (count,) + wi.shape[1:])
         for wi in list(w1)[-n_levels:]]
    c = ddpm.cond_output(params, feature)
    uc = ddpm.cond_output(params, uc_feature)
    sampler = DDIMSampler(ddpm)
    # replicate the fused path's rng handling (split before x_T draw)
    rng2, rng_init = jax.random.split(rng)
    x_T = jax.random.normal(rng_init, (count, z_length, ddpm.z_channels))
    samples, _ = sampler.sample(
        S=steps, c=c, w=w, batch_size=count, params=params,
        shape=(16, z_length), rng=rng2, x_T=x_T,
        unconditional_guidance_scale=3.0, unconditional_conditioning=uc,
    )
    out_mod = np.asarray(ddpm.decode(params, samples))
    assert np.allclose(out_fused, out_mod, atol=5e-5), (
        np.abs(out_fused - out_mod).max()
    )


def test_int8_quantized_readback_semantics():
    """out_dtype=int8 serving output: logit signs preserved (note
    placement identical) and offset planes within 1/64 frame of fp32."""
    import jax

    from mug_diffusion_tpu.apps.serving import build_fused_generate

    ddpm, params = _build("float32")
    count, steps, z_length = 2, 3, 8
    mel_frames = z_length * 8 * 8
    wave = jnp.asarray(
        0.05 * np.random.RandomState(1).randn(mel_frames * 16)
    ).astype(jnp.float32)
    feature = jnp.zeros((count, 21), jnp.int32)
    ucf = jnp.ones((count, 21), jnp.int32)
    kw = dict(steps=steps, scale=3.0, count=count, z_length=z_length,
              mel_frames=mel_frames, n_mels=16, n_fft=64)
    rng = jax.random.PRNGKey(4)

    f32 = np.asarray(
        build_fused_generate(ddpm, **kw)(params, wave, feature, ucf, rng)
    )
    q8 = np.asarray(
        build_fused_generate(ddpm, out_dtype=jnp.int8, **kw)(
            params, wave, feature, ucf, rng
        )
    )
    assert q8.dtype == np.int8
    deq = q8.astype(np.float32) / 64.0
    # sign agreement outside a +-1-quantum dead zone around 0
    confident = np.abs(f32) > (1.5 / 64.0)
    assert ((deq > 0) == (f32 > 0))[confident].all()
    off = np.abs(np.clip(deq, -1, 1) - np.clip(f32, -1, 1))
    assert off.max() <= (1.0 / 64.0) + 1e-6, off.max()


def test_guidance_scale_is_traced_not_baked():
    """One fused executable serves every guidance scale (the webui slider):
    different scales produce different charts WITHOUT recompiling, and the
    default-arg call equals the explicit build-scale call. Params must be
    perturbed: at init the U-Net out-conv is zero (ref zero_module), the
    denoiser returns 0 and CFG is vacuously scale-independent."""
    from mug_diffusion_tpu.apps.serving import build_fused_generate

    ddpm, params = _build("float32")
    params = jax.tree_util.tree_map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
        if hasattr(x, "shape") and x.ndim >= 1 else x,
        params,
    )
    count, steps, z_length = 2, 4, 8
    mel_frames = z_length * 8 * 8
    wave = jnp.asarray(
        0.05 * np.random.RandomState(0).randn(mel_frames * 16)
    ).astype(jnp.float32)
    feat = jnp.zeros((count, 21), jnp.int32)
    ucf = jnp.ones((count, 21), jnp.int32)
    fused = build_fused_generate(
        ddpm, steps=steps, scale=3.0, count=count, z_length=z_length,
        mel_frames=mel_frames, n_mels=16, n_fft=64,
    )
    rng = jax.random.PRNGKey(5)
    a = np.asarray(fused(params, wave, feat, ucf, rng, 3.0))
    b = np.asarray(fused(params, wave, feat, ucf, rng, 9.0))
    c = np.asarray(fused(params, wave, feat, ucf, rng))  # default = 3.0
    assert np.abs(a - b).mean() > 1e-5   # scale reaches the CFG combine
    np.testing.assert_allclose(a, c)     # default arg == build scale
