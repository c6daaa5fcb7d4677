"""PLMS (pseudo linear multistep) sampler, jitted as one lax.scan.

The reference ships a PLMS sampler as vestigial Stable Diffusion code that
imports an absent package and asserts image shapes (ref:
mug/diffusion/plms.py:8, :201-204; gated off at scripts/mapping.py:434-436).
This is a WORKING re-implementation for 1-D chart latents: the 4th-order
Adams-Bashforth multistep update over the DDIM ODE direction, carrying the
last three eps predictions through the scan.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mug_diffusion_tpu.diffusion.ddpm import DDPM
from mug_diffusion_tpu.diffusion.schedules import (
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)


class PLMSSampler:
    """Same call surface as DDIMSampler (eta must be 0 for PLMS)."""

    def __init__(self, model: DDPM, schedule: str = "linear"):
        self.model = model
        self.ddpm_num_timesteps = model.num_timesteps
        self.schedule = schedule
        self._cache = {}

    def make_schedule(self, ddim_num_steps: int):
        ddim_timesteps = make_ddim_timesteps(
            "uniform", ddim_num_steps, self.ddpm_num_timesteps
        )
        alphacums = np.asarray(self.model.schedule.alphas_cumprod, np.float64)
        _, alphas, alphas_prev = make_ddim_sampling_parameters(
            alphacums, ddim_timesteps, eta=0.0
        )
        order = slice(None, None, -1)
        return dict(
            timesteps=ddim_timesteps[order].copy(),
            alphas=alphas[order].astype(np.float32),
            alphas_prev=alphas_prev[order].astype(np.float32),
            sqrt_one_minus_alphas=np.sqrt(1.0 - alphas)[order].astype(
                np.float32
            ),
        )

    def sample(
        self,
        S: int,
        c,
        w,
        batch_size: int,
        params=None,
        shape: Optional[Tuple[int, int]] = None,
        eta: float = 0.0,
        x_T=None,
        rng=None,
        unconditional_guidance_scale: float = 1.0,
        unconditional_conditioning=None,
        **kwargs,
    ):
        assert eta == 0.0, "PLMS requires eta=0"
        assert params is not None and rng is not None
        if shape is None:
            size = (batch_size, self.model.z_length, self.model.z_channels)
        else:
            size = (batch_size, shape[1], shape[0])

        sched = self.make_schedule(S)
        use_cfg = (
            unconditional_conditioning is not None
            and unconditional_guidance_scale != 1.0
        )
        if x_T is None:
            rng, rng_init = jax.random.split(rng)
            x = jax.random.normal(rng_init, size)
        else:
            x = x_T

        if use_cfg:
            c_in = jnp.concatenate([unconditional_conditioning, c], axis=0)
            w_in = [jnp.concatenate([wi, wi], axis=0) for wi in w]
        else:
            c_in = c
            w_in = list(w)

        fn = self._get_step_fn(S, size, use_cfg, len(w_in))
        samples = fn(
            params, x, c_in, w_in,
            jnp.asarray(sched["timesteps"], jnp.int32),
            jnp.asarray(sched["alphas"]),
            jnp.asarray(sched["alphas_prev"]),
            jnp.asarray(sched["sqrt_one_minus_alphas"]),
            unconditional_guidance_scale,
        )
        return samples, {}

    def _get_step_fn(self, S, size, use_cfg, n_w):
        key = (S, size, use_cfg, n_w)
        if key in self._cache:
            return self._cache[key]

        model = self.model

        @jax.jit
        def run(params, x, c_in, w_in, timesteps, alphas, alphas_prev,
                sqrt_omas, guidance_scale):
            B = size[0]

            def eps_fn(x, ts):
                t_vec = jnp.full((B,), ts, jnp.int32)
                if use_cfg:
                    x_dbl = jnp.concatenate([x, x], axis=0)
                    t_dbl = jnp.concatenate([t_vec, t_vec], axis=0)
                    out = model.apply_model(params, x_dbl, t_dbl, c_in, w_in)
                    e_u, e_c = jnp.split(out, 2, axis=0)
                    return e_u + guidance_scale * (e_c - e_u)
                return model.apply_model(params, x, t_vec, c_in, w_in)

            def x_prev_from_eps(x, e_t, a_t, a_prev, sqrt_oma):
                pred_x0 = (x - sqrt_oma * e_t) / jnp.sqrt(a_t)
                dir_xt = jnp.sqrt(1.0 - a_prev) * e_t
                return jnp.sqrt(a_prev) * pred_x0 + dir_xt

            def step(carry, per_step):
                x, old_eps, n_old = carry
                ts, a_t, a_prev, sqrt_oma = per_step
                e_t = eps_fn(x, ts)

                # Adams-Bashforth blend by history length (ref PLMS orders)
                e1 = (3 * e_t - old_eps[2]) / 2
                e2 = (23 * e_t - 16 * old_eps[2] + 5 * old_eps[1]) / 12
                e3 = (
                    55 * e_t - 59 * old_eps[2] + 37 * old_eps[1]
                    - 9 * old_eps[0]
                ) / 24
                e_prime = jnp.where(
                    n_old == 0, e_t,
                    jnp.where(n_old == 1, e1, jnp.where(n_old == 2, e2, e3)),
                )
                x_new = x_prev_from_eps(x, e_prime, a_t, a_prev, sqrt_oma)

                new_old = jnp.stack([old_eps[1], old_eps[2], e_t], axis=0)
                return (x_new, new_old, jnp.minimum(n_old + 1, 3)), None

            old_eps0 = jnp.zeros((3,) + size)
            (x, _, _), _ = jax.lax.scan(
                step, (x, old_eps0, jnp.asarray(0)),
                (timesteps, alphas, alphas_prev, sqrt_omas),
            )
            return x

        self._cache[key] = run
        return run
