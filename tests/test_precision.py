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


def test_bf16_training_tracks_fp32():
    """Mixed-precision TRAINING (fp32 masters + bf16 fwd/bwd inside
    loss_fn): gradients must come back fp32 on the master params, and a
    short AdamW run must descend equivalently to full fp32."""
    import optax

    ddpm32, params = _build("float32")
    ddpm16, _ = _build("bfloat16")

    B, z_len = 2, 8
    note = np.zeros((B, z_len * 8, 16), np.float32)
    note[:, ::8, 0] = 1.0
    rs = np.random.RandomState(0)
    batch = {
        "note": jnp.asarray(note),
        "audio": jnp.asarray(
            0.1 * rs.randn(B, z_len * 8 * 8, 16).astype(np.float32)
        ),
        "feature": jnp.zeros((B, 21), jnp.int32),
        "valid_flag": jnp.ones((B, z_len * 8), jnp.float32),
    }

    def run(ddpm, params, n_steps=20):
        opt = optax.adamw(2e-3)
        state = opt.init(params)

        @jax.jit
        def step(params, state, rng):
            def lw(p):
                loss, _ = ddpm.loss_fn(p, batch, rng, train=True)
                return loss

            loss, grads = jax.value_and_grad(lw)(params)
            updates, state = opt.update(grads, state, params)
            return optax.apply_updates(params, updates), state, loss, grads

        losses = []
        for i in range(n_steps):
            params, state, loss, grads = step(
                params, state, jax.random.PRNGKey(100 + i)
            )
            losses.append(float(loss))
        return losses, grads

    l32, _ = run(ddpm32, params)
    l16, g16 = run(ddpm16, params)
    # grads land on the fp32 masters in fp32 (the bf16 cast is inside the
    # differentiated graph)
    for leaf in jax.tree_util.tree_leaves(g16):
        assert leaf.dtype == jnp.float32, leaf.dtype
    assert l32[-1] < l32[0] and l16[-1] < l16[0], (l32, l16)
    # loss curves track: same batch/noise, only compute precision differs
    rel = abs(l16[-1] - l32[-1]) / max(abs(l32[-1]), 1e-6)
    assert rel < 0.1, (l32[-1], l16[-1])


def test_bf16_vae_training_tracks_fp32():
    """AutoencoderTask mixed precision: bf16 fwd/bwd, fp32 loss/KL; short
    Adam runs must descend equivalently to fp32."""
    import optax

    from mug_diffusion_tpu.training.tasks import AutoencoderTask
    from tests.test_pipeline import tiny_config

    vae_cfg = dict(tiny_config()["model"]["params"]["first_stage_config"])
    vae_cfg["params"] = dict(
        vae_cfg["params"],
        lossconfig={
            "target": "mug_diffusion_tpu.models.losses.ManiaReconstructLoss",
            "params": {},
        },
    )

    note = np.zeros((2, 64, 16), np.float32)
    note[:, ::8, 0] = 1.0
    batch = {
        "note": jnp.asarray(note),
        "valid_flag": jnp.ones((2, 64), jnp.float32),
    }

    def run(compute_dtype, n_steps=15):
        cfg = dict(vae_cfg)
        cfg["params"] = dict(cfg["params"], compute_dtype=compute_dtype)
        task = AutoencoderTask(cfg)
        params = task.init_params(
            jax.random.PRNGKey(3), {"batch": 2, "note_length": 64}
        )
        opt = optax.adam(2e-3)
        state = opt.init(params)

        @jax.jit
        def step(params, state, rng):
            def lw(p):
                loss, _ = task.loss_fn(p, batch, rng, train=True)
                return loss

            loss, grads = jax.value_and_grad(lw)(params)
            updates, state = opt.update(grads, state)
            return optax.apply_updates(params, updates), state, loss, grads

        losses = []
        for i in range(n_steps):
            params, state, loss, grads = step(
                params, state, jax.random.PRNGKey(50 + i)
            )
            losses.append(float(loss))
        return losses, grads

    l32, _ = run("float32")
    l16, g16 = run("bfloat16")
    for leaf in jax.tree_util.tree_leaves(g16):
        assert leaf.dtype == jnp.float32
    assert l32[-1] < l32[0] and l16[-1] < l16[0]
    rel = abs(l16[-1] - l32[-1]) / max(abs(l32[-1]), 1e-6)
    assert rel < 0.1, (l32[-1], l16[-1])


def test_dynamic_steps_fused_matches_static_fused():
    """The traced-steps executable (steps passed at call time, schedule
    re-derived in-graph) must reproduce the static-steps executable (tables
    baked as constants) at the same step count — the uniform-stride
    timestep math and all per-step constants are bitwise-shared."""
    from mug_diffusion_tpu.apps.serving import build_fused_generate

    ddpm, params = _build("float32")
    count, z_length = 2, 8
    mel_frames = z_length * 8 * 8
    wave = jnp.asarray(
        0.05 * np.random.RandomState(0).randn(mel_frames * 16)
    ).astype(jnp.float32)
    feature = jnp.zeros((count, 21), jnp.int32)
    ucf = jnp.ones((count, 21), jnp.int32)
    kw = dict(scale=3.0, count=count, z_length=z_length,
              mel_frames=mel_frames, n_mels=16, n_fft=64)
    rng = jax.random.PRNGKey(5)

    dyn = build_fused_generate(ddpm, steps=None, **kw)
    for steps in (3, 6, 11):
        static = build_fused_generate(ddpm, steps=steps, **kw)
        a = np.asarray(static(params, wave, feature, ucf, rng, 3.0))
        b = np.asarray(
            dyn(params, wave, feature, ucf, rng, 3.0, steps, 0.0)
        )
        assert np.allclose(a, b, atol=1e-6), (
            steps, np.abs(a - b).max()
        )
    # every step count hit ONE compiled executable
    assert dyn._jitted._cache_size() == 1


def test_dynamic_eta_fused_matches_modular_sampler():
    """Traced eta: in-graph sigma derivation (DDIM eq. 16) must match the
    modular sampler's host-side float64 sigma tables."""
    from mug_diffusion_tpu.apps.serving import build_fused_generate
    from mug_diffusion_tpu.ops.mel import melspectrogram_on_device

    ddpm, params = _build("float32")
    count, steps, z_length, eta = 2, 5, 8, 0.7
    mel_frames = z_length * 8 * 8
    wave = jnp.asarray(
        0.05 * np.random.RandomState(2).randn(mel_frames * 16)
    ).astype(jnp.float32)
    feature = jnp.zeros((count, 21), jnp.int32)
    ucf = jnp.ones((count, 21), jnp.int32)
    rng = jax.random.PRNGKey(9)

    dyn = build_fused_generate(
        ddpm, steps=None, scale=3.0, count=count, z_length=z_length,
        mel_frames=mel_frames, n_mels=16, n_fft=64,
    )
    out_dyn = np.asarray(
        dyn(params, wave, feature, ucf, rng, 3.0, steps, eta)
    )

    mel = melspectrogram_on_device(
        wave, n_mels=16, hop_length=16, n_fft=64, max_frames=mel_frames
    )
    audio1 = mel.T[None]
    _, w1 = ddpm.encode_conditioning(params, audio1, feature[:1])
    n_levels = len(ddpm.model.unet_config["params"]["channel_mult"])
    w = [jnp.broadcast_to(wi, (count,) + wi.shape[1:])
         for wi in list(w1)[-n_levels:]]
    c = ddpm.cond_output(params, feature)
    uc = ddpm.cond_output(params, ucf)
    rng2, rng_init = jax.random.split(rng)
    x_T = jax.random.normal(rng_init, (count, z_length, ddpm.z_channels))
    sampler = DDIMSampler(ddpm)
    samples, _ = sampler.sample(
        S=steps, c=c, w=w, batch_size=count, params=params,
        shape=(16, z_length), rng=rng2, x_T=x_T, eta=eta,
        unconditional_guidance_scale=3.0, unconditional_conditioning=uc,
    )
    out_mod = np.asarray(ddpm.decode(params, samples))
    assert np.allclose(out_dyn, out_mod, atol=1e-4), (
        np.abs(out_dyn - out_mod).max()
    )


def test_fused_inpaint_matches_modular_masked_sampler():
    """The fused use_mask executable (one dispatch) must reproduce the
    modular sampler's mask/x0 re-noising path (ref ddim.py:141-144)."""
    from mug_diffusion_tpu.apps.serving import build_fused_generate
    from mug_diffusion_tpu.ops.mel import melspectrogram_on_device

    ddpm, params = _build("float32")
    count, steps, z_length = 2, 4, 8
    mel_frames = z_length * 8 * 8
    wave = jnp.asarray(
        0.05 * np.random.RandomState(3).randn(mel_frames * 16)
    ).astype(jnp.float32)
    feature = jnp.zeros((count, 21), jnp.int32)
    ucf = jnp.ones((count, 21), jnp.int32)
    rng = jax.random.PRNGKey(13)
    size = (count, z_length, ddpm.z_channels)
    x0 = jnp.asarray(
        0.5 * np.random.RandomState(4).randn(*size).astype(np.float32)
    )
    mask = jnp.zeros(size).at[:, : z_length // 2, :].set(1.0)

    fused = build_fused_generate(
        ddpm, steps=None, scale=3.0, count=count, z_length=z_length,
        mel_frames=mel_frames, n_mels=16, n_fft=64, use_mask=True,
    )
    out_fused = np.asarray(
        fused(params, wave, feature, ucf, rng, 3.0, steps, 0.0, mask, x0)
    )

    mel = melspectrogram_on_device(
        wave, n_mels=16, hop_length=16, n_fft=64, max_frames=mel_frames
    )
    audio1 = mel.T[None]
    _, w1 = ddpm.encode_conditioning(params, audio1, feature[:1])
    n_levels = len(ddpm.model.unet_config["params"]["channel_mult"])
    w = [jnp.broadcast_to(wi, (count,) + wi.shape[1:])
         for wi in list(w1)[-n_levels:]]
    c = ddpm.cond_output(params, feature)
    uc = ddpm.cond_output(params, ucf)
    rng2, rng_init = jax.random.split(rng)
    x_T = jax.random.normal(rng_init, size)
    sampler = DDIMSampler(ddpm)
    samples, _ = sampler.sample(
        S=steps, c=c, w=w, batch_size=count, params=params,
        shape=(16, z_length), rng=rng2, x_T=x_T, mask=mask, x0=x0,
        unconditional_guidance_scale=3.0, unconditional_conditioning=uc,
    )
    out_mod = np.asarray(ddpm.decode(params, samples))
    assert np.allclose(out_fused, out_mod, atol=5e-5), (
        np.abs(out_fused - out_mod).max()
    )


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


def test_mel_songs_fused_matches_modular_fan_out():
    """input_kind='mel_songs' (multi-song fused batch): the wave encoder
    runs once at batch n_songs and each song's features fan out to its
    count/n_songs charts — must equal the modular chain that encodes both
    songs and jnp.repeats the conditioning, bit-for-bit at equal seeds."""
    from mug_diffusion_tpu.apps.serving import build_fused_generate

    ddpm, params = _build("float32")
    count, n_songs, steps, z_length = 4, 2, 6, 8
    n_mels, ratio = 16, 8
    mel_frames = z_length * 8 * ratio

    rs = np.random.RandomState(1)
    mels = jnp.asarray(
        0.3 * rs.randn(n_songs, n_mels, mel_frames).astype(np.float32)
    )
    feature = jnp.zeros((count, 21), jnp.int32)
    uc_feature = jnp.ones((count, 21), jnp.int32)

    fused = build_fused_generate(
        ddpm, steps=steps, scale=3.0, count=count, z_length=z_length,
        mel_frames=mel_frames, n_mels=n_mels, n_fft=64,
        input_kind="mel_songs", n_songs=n_songs,
    )
    rng = jax.random.PRNGKey(5)
    out_fused = np.asarray(fused(params, mels, feature, uc_feature, rng))

    # modular: encode both songs at batch n_songs, repeat per chart
    audio = mels.transpose(0, 2, 1)  # [n_songs, T, n_mels]
    _, w1 = ddpm.encode_conditioning(params, audio, feature[:n_songs])
    n_levels = len(ddpm.model.unet_config["params"]["channel_mult"])
    w = [jnp.repeat(wi, count // n_songs, axis=0)
         for wi in list(w1)[-n_levels:]]
    c = ddpm.cond_output(params, feature)
    uc = ddpm.cond_output(params, uc_feature)
    sampler = DDIMSampler(ddpm)
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

    # count % n_songs must be rejected
    import pytest

    with pytest.raises(ValueError):
        build_fused_generate(
            ddpm, steps=steps, scale=3.0, count=3, z_length=z_length,
            mel_frames=mel_frames, n_mels=n_mels, n_fft=64,
            input_kind="mel_songs", n_songs=2,
        )
