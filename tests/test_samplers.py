"""PLMS sampler + DDIM mask-inpainting tests (ref: mug/diffusion/plms.py
[vestigial, reimplemented working], ddim.py:141-144 inpainting)."""

import jax
import jax.numpy as jnp
import numpy as np

from mug_diffusion_tpu.diffusion.ddim import DDIMSampler
from mug_diffusion_tpu.diffusion.plms import PLMSSampler
from mug_diffusion_tpu.diffusion.schedules import DiffusionSchedule


class StubDDPM:
    """eps-prediction stub with a contraction so sampling converges."""

    def __init__(self):
        self.schedule = DiffusionSchedule.create(timesteps=1000)
        self.num_timesteps = 1000
        self.z_channels = 4
        self.z_length = 8

    def apply_model(self, params, x, t, c, w):
        return 0.3 * x

    def q_sample(self, x0, t, noise):
        s = self.schedule
        a = jnp.asarray(s.sqrt_alphas_cumprod)[t][:, None, None]
        b = jnp.asarray(s.sqrt_one_minus_alphas_cumprod)[t][:, None, None]
        return a * x0 + b * noise


def test_plms_runs_and_matches_ddim_at_convergence():
    model = StubDDPM()
    ddim = DDIMSampler(model)
    plms = PLMSSampler(model)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4))

    s_d, _ = ddim.sample(S=50, c=None, w=[], batch_size=2, params={},
                         rng=jax.random.PRNGKey(1), x_T=x_T, eta=0.0)
    s_p, _ = plms.sample(S=50, c=None, w=[], batch_size=2, params={},
                         rng=jax.random.PRNGKey(1), x_T=x_T)
    assert s_p.shape == (2, 8, 4)
    assert np.isfinite(np.asarray(s_p)).all()
    # for a linear eps model both integrate the same ODE; at 50 steps the
    # multistep method should land near the ddim trajectory
    diff = np.abs(np.asarray(s_p) - np.asarray(s_d)).max()
    rel = diff / (np.abs(np.asarray(s_d)).max() + 1e-9)
    assert rel < 0.15, rel


def test_ddim_mask_inpainting_keeps_region():
    """Masked region must follow q_sample(x0) re-noising each step and end at
    ~x0; unmasked region is generated (ref ddim.py:141-144)."""
    model = StubDDPM()
    sampler = DDIMSampler(model)
    x0 = jnp.ones((1, 8, 4)) * 0.5
    mask = jnp.zeros((1, 8, 4)).at[:, :4, :].set(1.0)  # keep first half

    samples, _ = sampler.sample(
        S=50, c=None, w=[], batch_size=1, params={},
        rng=jax.random.PRNGKey(0), eta=0.0, mask=mask, x0=x0,
    )
    out = np.asarray(samples)
    # kept region: the last step re-noised at t=1 with tiny noise -> close
    # to x0 (the final step's mask blend happens before the last denoise,
    # so allow loose tolerance)
    assert np.abs(out[0, :4] - 0.5).mean() < 0.25
    assert np.isfinite(out).all()


def test_ddim_eta_stochastic_differs():
    model = StubDDPM()
    sampler = DDIMSampler(model)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 4))
    a, _ = sampler.sample(S=20, c=None, w=[], batch_size=1, params={},
                          rng=jax.random.PRNGKey(1), x_T=x_T, eta=1.0)
    b, _ = sampler.sample(S=20, c=None, w=[], batch_size=1, params={},
                          rng=jax.random.PRNGKey(2), x_T=x_T, eta=1.0)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # deterministic at eta=0 for equal rngs
    c1, _ = sampler.sample(S=20, c=None, w=[], batch_size=1, params={},
                           rng=jax.random.PRNGKey(3), x_T=x_T, eta=0.0)
    c2, _ = sampler.sample(S=20, c=None, w=[], batch_size=1, params={},
                           rng=jax.random.PRNGKey(4), x_T=x_T, eta=0.0)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)
