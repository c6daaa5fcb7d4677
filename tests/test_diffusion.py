"""Diffusion core tests: schedule golden values (ref: mug/diffusion/utils.py,
diffusion.py:131-189) and DDIM update math (ref: mug/diffusion/ddim.py)."""

import numpy as np
import pytest

from mug_diffusion_tpu.diffusion.schedules import (
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)


def test_linear_beta_schedule_golden():
    betas = make_beta_schedule("linear", 1000, 1e-4, 2e-2)
    assert betas.shape == (1000,)
    # linear in sqrt space (ref utils.py:17-21)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(2e-2)
    mid = (np.sqrt(1e-4) + (np.sqrt(2e-2) - np.sqrt(1e-4)) * 500 / 999) ** 2
    assert betas[500] == pytest.approx(mid, rel=1e-6)


def test_cosine_schedule_bounds():
    betas = make_beta_schedule("cosine", 1000)
    assert np.all(betas >= 0) and np.all(betas <= 0.999)


def test_schedule_buffers():
    s = DiffusionSchedule.create(timesteps=1000)
    a = s.alphas_cumprod
    assert a.shape == (1000,)
    assert a[0] == pytest.approx(1 - 1e-4, rel=1e-5)
    assert np.all(np.diff(a) < 0)  # strictly decreasing
    np.testing.assert_allclose(
        s.sqrt_alphas_cumprod ** 2 + s.sqrt_one_minus_alphas_cumprod ** 2,
        1.0, atol=1e-5,
    )
    # posterior mean coefficients: q(x_{t-1}|x_t, x_0); recompute in f64
    # from betas (1 - alphas_cumprod[0] cancels catastrophically in f32)
    betas = np.asarray(s.betas, np.float64)
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    np.testing.assert_allclose(
        s.posterior_mean_coef1,
        betas * np.sqrt(acp_prev) / (1 - acp), rtol=1e-4,
    )
    np.testing.assert_allclose(
        s.posterior_mean_coef2,
        (1 - acp_prev) * np.sqrt(alphas) / (1 - acp), rtol=1e-4,
    )
    # lvlb_weights[0] replaced by [1] (ref diffusion.py:187)
    assert s.lvlb_weights[0] == s.lvlb_weights[1]
    assert np.isfinite(s.lvlb_weights).all()


def test_ddim_timesteps_uniform():
    ts = make_ddim_timesteps("uniform", 100, 1000)
    assert len(ts) == 100
    # stride 10, +1 shift (ref utils.py:50-66)
    assert ts[0] == 1
    assert ts[-1] == 991
    assert np.all(np.diff(ts) == 10)


def test_ddim_sampling_parameters():
    s = DiffusionSchedule.create(timesteps=1000)
    ts = make_ddim_timesteps("uniform", 50, 1000)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        np.asarray(s.alphas_cumprod, np.float64), ts, eta=0.0
    )
    assert np.all(sigmas == 0)  # eta 0 -> deterministic
    np.testing.assert_allclose(alphas, s.alphas_cumprod[ts], rtol=1e-6)
    assert alphas_prev[0] == s.alphas_cumprod[0]
    np.testing.assert_allclose(alphas_prev[1:], s.alphas_cumprod[ts[:-1]],
                               rtol=1e-6)

    sigmas_eta, _, _ = make_ddim_sampling_parameters(
        np.asarray(s.alphas_cumprod, np.float64), ts, eta=1.0
    )
    # DDIM paper eq 16
    expect = np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    np.testing.assert_allclose(sigmas_eta, expect, rtol=1e-6)


def test_ddim_step_math_matches_reference_formula():
    """One DDIM step through the jitted sampler must equal the closed-form
    update x_prev = sqrt(a_prev) x0_hat + dir_xt (ref ddim.py:183-196) when
    the model is an identity-epsilon stub."""
    import jax
    import jax.numpy as jnp

    from mug_diffusion_tpu.diffusion.ddim import DDIMSampler

    class StubDDPM:
        def __init__(self):
            self.schedule = DiffusionSchedule.create(timesteps=1000)
            self.num_timesteps = 1000
            self.z_channels = 4
            self.z_length = 8

        def apply_model(self, params, x, t, c, w):
            return x * 0.1  # deterministic pseudo-epsilon

        def q_sample(self, x0, t, noise):
            s = self.schedule
            a = jnp.asarray(s.sqrt_alphas_cumprod)[t][:, None, None]
            b = jnp.asarray(s.sqrt_one_minus_alphas_cumprod)[t][:, None, None]
            return a * x0 + b * noise

    model = StubDDPM()
    sampler = DDIMSampler(model)
    rng = jax.random.PRNGKey(0)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4))

    samples, inter = sampler.sample(
        S=5, c=None, w=[], batch_size=2, params={}, rng=rng, x_T=x_T, eta=0.0,
    )
    assert samples.shape == (2, 8, 4)

    # NumPy replay of the same 5 steps
    sched = sampler.make_schedule(5, ddim_eta=0.0)
    x = np.asarray(x_T, np.float64)
    for i in range(5):
        a_t = sched["alphas"][i]
        a_prev = sched["alphas_prev"][i]
        sqrt_oma = sched["sqrt_one_minus_alphas"][i]
        e_t = x * 0.1
        pred_x0 = (x - sqrt_oma * e_t) / np.sqrt(a_t)
        dir_xt = np.sqrt(1.0 - a_prev) * e_t
        x = np.sqrt(a_prev) * pred_x0 + dir_xt
    np.testing.assert_allclose(np.asarray(samples), x, rtol=1e-4, atol=1e-5)


def test_ddim_cfg_combination():
    """CFG must compute e_uncond + scale*(e_cond - e_uncond)
    (ref ddim.py:170-175). The stub returns different eps for the two batch
    halves so the combination is detectable."""
    import jax
    import jax.numpy as jnp

    from mug_diffusion_tpu.diffusion.ddim import DDIMSampler

    class StubCFG:
        def __init__(self):
            self.schedule = DiffusionSchedule.create(timesteps=1000)
            self.num_timesteps = 1000
            self.z_channels = 4
            self.z_length = 8

        def apply_model(self, params, x, t, c, w):
            B = x.shape[0]
            half = B // 2
            # uncond half predicts 0, cond half predicts 0.2*x
            scale_vec = jnp.concatenate(
                [jnp.zeros((half,)), jnp.full((half,), 0.2)]
            )
            return x * scale_vec[:, None, None]

        def q_sample(self, x0, t, noise):
            return x0

    model = StubCFG()
    sampler = DDIMSampler(model)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4))
    guidance = 3.0
    samples, _ = sampler.sample(
        S=3, c=jnp.zeros((2, 1, 1)), w=[], batch_size=2, params={},
        rng=jax.random.PRNGKey(0), x_T=x_T, eta=0.0,
        unconditional_guidance_scale=guidance,
        unconditional_conditioning=jnp.zeros((2, 1, 1)),
    )

    sched = sampler.make_schedule(3, ddim_eta=0.0)
    x = np.asarray(x_T, np.float64)
    for i in range(3):
        a_t = sched["alphas"][i]
        a_prev = sched["alphas_prev"][i]
        sqrt_oma = sched["sqrt_one_minus_alphas"][i]
        e_uncond = 0.0 * x
        e_cond = 0.2 * x
        e_t = e_uncond + guidance * (e_cond - e_uncond)
        pred_x0 = (x - sqrt_oma * e_t) / np.sqrt(a_t)
        x = np.sqrt(a_prev) * pred_x0 + np.sqrt(1.0 - a_prev) * e_t
    # f32 rounding is amplified ~1/sqrt(alpha_t) per replayed step
    np.testing.assert_allclose(np.asarray(samples), x, rtol=1e-2, atol=1e-4)


def test_smooth_l1():
    import jax.numpy as jnp

    from mug_diffusion_tpu.diffusion.ddpm import smooth_l1

    pred = jnp.asarray([0.0, 0.01, 0.5])
    target = jnp.zeros(3)
    out = np.asarray(smooth_l1(pred, target, beta=0.02))
    # |d| < beta: 0.5 d^2 / beta; else |d| - beta/2 (torch semantics)
    assert out[0] == pytest.approx(0.0)
    assert out[1] == pytest.approx(0.5 * 0.01 ** 2 / 0.02)
    assert out[2] == pytest.approx(0.5 - 0.01)
