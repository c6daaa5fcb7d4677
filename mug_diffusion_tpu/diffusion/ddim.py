"""DDIM sampler with classifier-free guidance, jitted as one lax.scan.

Re-design of ref: mug/diffusion/ddim.py for XLA: the reference iterates a
Python loop over S steps (ddim.py:137) launching 2 batched U-Net calls per
step; here the entire trajectory is a single ``lax.scan`` whose per-step
constants (alphas, sigmas, timesteps) are stacked scan inputs — XLA compiles
one step body, hoists the loop-invariant conditioning (and every S4 kernel)
out of the loop, and the whole sampler runs device-side with zero host
round-trips. CFG doubles the batch exactly like the reference
(ddim.py:170-175). Masked inpainting re-noises the kept region each step
(ddim.py:141-144).

Compiled executables are cached per (steps, shape, cfg, mask) signature —
the reference recomputes its schedule per call (ddim.py:85); we memoize.
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


def extract_s4_kernels(model, params, x_probe, c_in, w_in):
    """Materialize the length-specific S4 conv kernels ONCE with a single
    probe U-Net forward and return the mutable ``s4_kernel`` collection
    (merge into params with ``{**params, **s4k}``) — XLA does not hoist
    their FFT math out of a scan on its own. Shared by DDIMSampler and the
    fused serving path (apps/serving.py). Traceable: safe inside jit."""
    t_probe = jnp.zeros((x_probe.shape[0],), jnp.int32)
    _, s4k = model.model.apply(
        params, x_probe, t_probe, c_in, w_in, mutable=["s4_kernel"]
    )
    return s4k


class DDIMSampler:
    """ref: mug/diffusion/ddim.py:11-196."""

    def __init__(self, model: DDPM, schedule: str = "linear"):
        self.model = model
        self.ddpm_num_timesteps = model.num_timesteps
        self.schedule = schedule
        self._cache = {}

    def make_schedule(
        self, ddim_num_steps: int, ddim_discretize: str = "uniform",
        ddim_eta: float = 0.0,
    ):
        """Stacked per-step constants, reversed to sampling order
        (ref: ddim.py:24-53)."""
        ddim_timesteps = make_ddim_timesteps(
            ddim_discretize, ddim_num_steps, self.ddpm_num_timesteps
        )
        alphacums = np.asarray(self.model.schedule.alphas_cumprod, np.float64)
        sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
            alphacums, ddim_timesteps, ddim_eta
        )
        # sampling iterates np.flip(timesteps) (ref: ddim.py:130); index runs
        # from S-1 down to 0, so flip all tables into visit order.
        order = slice(None, None, -1)
        return dict(
            timesteps=ddim_timesteps[order].copy(),
            alphas=alphas[order].astype(np.float32),
            alphas_prev=alphas_prev[order].astype(np.float32),
            sigmas=sigmas[order].astype(np.float32),
            sqrt_one_minus_alphas=np.sqrt(1.0 - alphas)[order].astype(np.float32),
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
        mask=None,
        x0=None,
        temperature: float = 1.0,
        noise_dropout: float = 0.0,
        x_T=None,
        rng=None,
        log_every_t: int = 100,
        unconditional_guidance_scale: float = 1.0,
        unconditional_conditioning=None,
        **kwargs,
    ):
        """ref: mug/diffusion/ddim.py:56-107. Returns (samples, intermediates).

        ``params`` is the DDPM variables pytree; ``rng`` a JAX PRNG key.
        """
        assert params is not None and rng is not None
        if shape is None:
            size = (batch_size, self.model.z_length, self.model.z_channels)
        else:
            # reference passes (channels, length); our layout is [B, T, C]
            size = (batch_size, shape[1], shape[0])

        sched = self.make_schedule(S, ddim_eta=eta)
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

        fn = self._get_step_fn(
            S, size, use_cfg, mask is not None,
            temperature, noise_dropout, len(w_in),
        )
        # materialize the L-specific S4 conv kernels once outside the scan
        # (XLA does not hoist their FFT math out of the loop body)
        params = self._with_s4_kernels(params, size, use_cfg, c_in, w_in)
        mask_arg = (
            jnp.zeros(size) if mask is None else jnp.broadcast_to(mask, size)
        )
        x0_arg = jnp.zeros(size) if x0 is None else x0
        xs, pred_x0s = fn(
            params, x, c_in, w_in, mask_arg, x0_arg, rng,
            jnp.asarray(sched["timesteps"], jnp.int32),
            jnp.asarray(sched["alphas"]),
            jnp.asarray(sched["alphas_prev"]),
            jnp.asarray(sched["sigmas"]),
            jnp.asarray(sched["sqrt_one_minus_alphas"]),
            unconditional_guidance_scale,
        )
        samples = xs[-1]
        total = xs.shape[0]
        log_idx = [
            i for i in range(total)
            if (total - i - 1) % log_every_t == 0 or i == 0
        ]
        intermediates = {
            "x_inter": [xs[i] for i in log_idx],
            "pred_x0": [pred_x0s[i] for i in log_idx],
        }
        return samples, intermediates

    def _with_s4_kernels(self, params, size, use_cfg, c_in, w_in):
        if not hasattr(self.model, "model") or not isinstance(params, dict):
            return params  # stub/test models without a flax wrapper
        if "s4_kernel" in params:
            return params
        B_in = size[0] * (2 if use_cfg else 1)
        key = ("s4k", size[1:], B_in, tuple(wi.shape for wi in w_in))
        if key not in self._cache:
            model = self.model

            @jax.jit
            def extract(params, c_in, w_in):
                x_probe = jnp.zeros((B_in,) + tuple(size[1:]))
                return extract_s4_kernels(model, params, x_probe, c_in, w_in)

            self._cache[key] = extract
        return {**params, **self._cache[key](params, c_in, w_in)}

    def _get_step_fn(
        self, S, size, use_cfg, use_mask, temperature, noise_dropout, n_w
    ):
        key = (S, size, use_cfg, use_mask, temperature, noise_dropout, n_w)
        if key in self._cache:
            return self._cache[key]

        model = self.model

        @jax.jit
        def run(params, x, c_in, w_in, mask, x0, rng, timesteps, alphas,
                alphas_prev, sigmas, sqrt_omas, guidance_scale):
            xs, pred_x0s = ddim_scan_core(
                model, params, x, c_in, w_in, mask, x0, rng,
                (timesteps, alphas, alphas_prev, sigmas, sqrt_omas),
                guidance_scale, use_cfg=use_cfg, use_mask=use_mask,
                temperature=temperature, noise_dropout=noise_dropout,
                collect=True,
            )
            return xs, pred_x0s

        self._cache[key] = run
        return run


def _ddim_step_math(
    model, params, x, rng, c_in, w_in, mask, x0, per_step, guidance_scale,
    *, use_cfg, use_mask, temperature, noise_dropout,
):
    """One DDIM update (ref: mug/diffusion/ddim.py:162-196). Shared verbatim
    by the static-steps scan core and the traced-steps while core so the two
    paths are bitwise-identical given equal per-step constants. The rng
    split order (mask q_sample -> step noise -> dropout) is part of the
    contract."""
    ts, a_t, a_prev, sigma_t, sqrt_oma = per_step
    B = x.shape[0]
    t_vec = jnp.full((B,), ts, jnp.int32)

    if use_mask:
        rng, rng_q = jax.random.split(rng)
        noise_q = jax.random.normal(rng_q, x.shape)
        x_orig = model.q_sample(x0, t_vec, noise_q)
        x = x_orig * mask + (1.0 - mask) * x

    if use_cfg:
        x_dbl = jnp.concatenate([x, x], axis=0)
        t_dbl = jnp.concatenate([t_vec, t_vec], axis=0)
        out = model.apply_model(params, x_dbl, t_dbl, c_in, w_in)
        e_uncond, e_cond = jnp.split(out, 2, axis=0)
        e_t = e_uncond + guidance_scale * (e_cond - e_uncond)
    else:
        e_t = model.apply_model(params, x, t_vec, c_in, w_in)

    pred_x0 = (x - sqrt_oma * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma_t ** 2) * e_t
    rng, rng_n = jax.random.split(rng)
    noise = sigma_t * jax.random.normal(rng_n, x.shape) * temperature
    if noise_dropout > 0.0:
        rng, rng_d = jax.random.split(rng)
        keep = jax.random.bernoulli(
            rng_d, 1.0 - noise_dropout, noise.shape
        )
        noise = jnp.where(keep, noise / (1.0 - noise_dropout), 0.0)
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
    return x_prev, pred_x0, rng


def ddim_scan_core(
    model, params, x, c_in, w_in, mask, x0, rng, tables, guidance_scale,
    *, use_cfg, use_mask, temperature=1.0, noise_dropout=0.0, collect=True,
):
    """The whole DDIM trajectory as one ``lax.scan``
    (ref: mug/diffusion/ddim.py:110-196). Shared by the modular sampler and
    the fused single-dispatch serving path (apps/serving.py).

    collect=False emits no per-step outputs (the scan carries only x),
    saving the [S, B, T, C] x2 trajectory stores; returns (x_final, None).
    """

    def step(carry, per_step):
        x, rng = carry
        x_prev, pred_x0, rng = _ddim_step_math(
            model, params, x, rng, c_in, w_in, mask, x0, per_step,
            guidance_scale, use_cfg=use_cfg, use_mask=use_mask,
            temperature=temperature, noise_dropout=noise_dropout,
        )
        ys = (x_prev, pred_x0) if collect else None
        return (x_prev, rng), ys

    (x_final, _), ys = jax.lax.scan(step, (x, rng), tables)
    if collect:
        return ys
    return x_final, None


def make_dynamic_schedule_tables(schedule):
    """Full-length (T=1000) constants for the traced-steps sampler.

    These are built exactly like ``DDIMSampler.make_schedule`` builds its
    per-step tables (float64 math, float32 storage) so that gathering them
    at the uniform-stride timesteps reproduces the static tables BITWISE:
    the static path does ``f32(f64sqrt(1 - f64(acum_f32)))`` per entry, so
    we precompute that for every t once."""
    acum64 = np.asarray(schedule.alphas_cumprod, np.float64)
    return (
        jnp.asarray(acum64.astype(np.float32)),                 # ACUM[t]
        jnp.asarray(np.sqrt(1.0 - acum64).astype(np.float32)),  # sqrt(1-ACUM)
    )


def ddim_dynamic_core(
    model, params, x, c_in, w_in, mask, x0, rng, steps, eta, guidance_scale,
    full_tables, *, use_cfg, use_mask, temperature=1.0,
):
    """DDIM trajectory with a TRACED step count: one compiled executable
    serves every (steps, eta, guidance_scale) combination of the webui
    sliders (ref: webui.py:602-608 serves any combo; mug/diffusion/ddim.py:56
    takes ``S`` at call time — a static-shapes XLA design must not regress
    this to one compile per steps value).

    The uniform-stride schedule (ref: mug/diffusion/utils.py:50-66,
    ``arange(0, 1000, 1000//S) + 1``) is re-derived in-graph with integer
    ops and per-step constants are gathered from full-length float32 tables,
    so a traced ``steps=S`` run is bitwise-identical to the static scan at
    S. A ``lax.while_loop`` with a data-dependent trip count runs exactly
    the active steps — steps=10 does 10 U-Net evals, not max_steps.

    ``eta`` is traced too: sigmas are computed in-graph from alpha gathers
    (DDIM paper eq. 16, ref utils.py:69-80). Returns x_final.
    """
    acum, sqrt_om = full_tables
    T = acum.shape[0]
    steps = jnp.clip(jnp.asarray(steps, jnp.int32), 1, T)
    stride = T // steps
    num = (T - 1) // stride + 1  # == len(range(0, T, stride))
    eta = jnp.asarray(eta, jnp.float32)
    acum_first = acum[0]  # alphas_prev[0] = alphacums[0] (ref utils.py:74)

    def cond_fn(carry):
        return carry[0] < num

    def body_fn(carry):
        j, x, rng = carry
        # visit order is descending t (ref ddim.py:130 flips the tables):
        # while-iteration j handles original schedule index i = num-1-j
        i = num - 1 - j
        ts = jnp.minimum(i * stride + 1, T - 1)
        ts_prev = jnp.minimum(jnp.maximum(i - 1, 0) * stride + 1, T - 1)
        a_t = acum[ts]
        a_prev = jnp.where(i == 0, acum_first, acum[ts_prev])
        sqrt_oma = sqrt_om[ts]
        sigma_t = eta * jnp.sqrt(
            (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
        )
        x_prev, _, rng = _ddim_step_math(
            model, params, x, rng, c_in, w_in, mask, x0,
            (ts, a_t, a_prev, sigma_t, sqrt_oma), guidance_scale,
            use_cfg=use_cfg, use_mask=use_mask,
            temperature=temperature, noise_dropout=0.0,
        )
        return j + 1, x_prev, rng

    _, x_final, _ = jax.lax.while_loop(
        cond_fn, body_fn, (jnp.int32(0), x, rng)
    )
    return x_final
