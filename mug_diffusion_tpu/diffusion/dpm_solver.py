"""DPM-Solver++(2M) sampler, jitted as one lax.scan.

Beyond the reference (it ships DDIM + a broken PLMS, ref:
mug/diffusion/ddim.py, plms.py:8): a second-order multistep solver of the
probability-flow ODE in the data-prediction parameterization
(Lu et al., "DPM-Solver++", arXiv:2211.01095, Alg. 2). Reaches the quality
of ~100-step DDIM in ~15-25 steps, cutting serving latency proportionally —
per step it is exactly one (CFG-doubled) U-Net eval, like DDIM.

Same call surface as DDIMSampler (deterministic: eta must be 0); supports
classifier-free guidance and masked inpainting (the kept region is
re-noised to the current t each step, mirroring ref ddim.py:141-144).

The update between nodes i -> i+1 in log-SNR time (lambda = log(alpha/sigma),
alpha_t = sqrt(acum_t), sigma_t = sqrt(1-acum_t)):

    x0_i   = (x_i - sigma_i * eps_i) / alpha_i          (data prediction)
    h_i    = lambda_{i+1} - lambda_i
    r_i    = h_{i-1} / h_i
    D_i    = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1}  (first step: x0_i)
    x_{i+1} = (sigma_{i+1}/sigma_i) x_i - alpha_{i+1} expm1(-h_i) D_i

Node times reuse the repo's uniform DDIM discretization
(schedules.make_ddim_timesteps) with a final node at the schedule start
(alphas_cumprod[0], matching DDIM's alphas_prev[0] target, ref
mug/diffusion/utils.py:74) so both samplers integrate to the same endpoint.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mug_diffusion_tpu.diffusion.ddim import extract_s4_kernels
from mug_diffusion_tpu.diffusion.ddpm import DDPM
from mug_diffusion_tpu.diffusion.schedules import make_ddim_timesteps


def _dpm_nodes(lam_full, num_steps, T, discretize):
    """Integer node timesteps in VISIT order (descending t).

    "uniform": the DDIM uniform-stride grid (reversed to visit order).
    "lambda": nearest integer timestep to a uniform log-SNR grid from
    lam[T-1] to lam[1] — computed with the exact f32 formula the traced
    core re-derives in-graph (target = lam_hi + (lam_lo-lam_hi) * j/(S-1),
    argmin |lam - target|), so static and dynamic select IDENTICAL nodes.
    """
    if discretize == "uniform":
        ts = make_ddim_timesteps("uniform", num_steps, T)
        return ts[::-1].copy()
    if discretize != "lambda":
        raise ValueError(f"unknown discretize {discretize!r}")
    lam_hi = lam_full[T - 1]
    lam_lo = lam_full[1]
    denom = np.float32(max(num_steps - 1, 1))
    js = np.arange(num_steps, dtype=np.float32)
    targets = (lam_hi + (lam_lo - lam_hi) * (js / denom)).astype(np.float32)
    ts = np.array(
        [int(np.abs(lam_full - t).argmin()) for t in targets], np.int64
    )
    return np.maximum(ts, 1)


def make_dpm_full_tables(schedule):
    """Full-length (T) alpha/sigma/lambda tables, f64 math -> f32 storage.

    Both the static scan sampler and the traced-steps dynamic core gather
    their node constants from THESE tables, so a traced ``steps=S`` run is
    bitwise-identical to the static sampler at S (same discipline as
    ddim.make_dynamic_schedule_tables)."""
    acum = np.asarray(schedule.alphas_cumprod, np.float64)
    alpha = np.sqrt(acum)
    sigma = np.sqrt(1.0 - acum)
    lam = np.log(alpha) - np.log(sigma)
    return (
        alpha.astype(np.float32),
        sigma.astype(np.float32),
        lam.astype(np.float32),
    )


def _dpm_step_math(
    model, params, x, rng, c_in, w_in, mask, x0, per, carry, guidance_scale,
    *, use_cfg, use_mask,
):
    """One DPM-Solver++(2M) update. Shared VERBATIM by the static-steps
    scan body and the traced-steps while body so the two paths stay
    bitwise-identical given equal node constants (the same discipline as
    ddim._ddim_step_math). ``per`` = (ts, alpha_i, sigma_i, lambda_i,
    alpha_next, sigma_next, lambda_next); ``carry`` = (x0_prev, h_prev,
    done-count). Duplicate nodes (timestep clipping at S ~ T) give h == 0:
    the step is skipped instead of divided by."""
    ts, a_i, s_i, l_i, a_n, s_n, l_n = per
    x0_prev, h_prev, done = carry
    B = x.shape[0]

    if use_mask:
        rng, rng_q = jax.random.split(rng)
        t_vec = jnp.full((B,), ts, jnp.int32)
        noise_q = jax.random.normal(rng_q, x.shape)
        x_orig = model.q_sample(x0, t_vec, noise_q)
        x = x_orig * mask + (1.0 - mask) * x

    t_vec = jnp.full((B,), ts, jnp.int32)
    if use_cfg:
        x_dbl = jnp.concatenate([x, x], axis=0)
        t_dbl = jnp.concatenate([t_vec, t_vec], axis=0)
        out = model.apply_model(params, x_dbl, t_dbl, c_in, w_in)
        e_u, e_c = jnp.split(out, 2, axis=0)
        e_t = e_u + guidance_scale * (e_c - e_u)
    else:
        e_t = model.apply_model(params, x, t_vec, c_in, w_in)

    x0_i = (x - s_i * e_t) / a_i
    h = l_n - l_i
    ok = jnp.abs(h) > 0.0
    hs = jnp.where(ok, h, 1.0)
    r = h_prev / hs
    d_2m = (1.0 + 1.0 / (2.0 * r)) * x0_i - (1.0 / (2.0 * r)) * x0_prev
    d = jnp.where(done == 0, x0_i, d_2m)
    x_new = (s_n / s_i) * x - a_n * jnp.expm1(-hs) * d
    x_new = jnp.where(ok, x_new, x)
    new_carry = (
        jnp.where(ok, x0_i, x0_prev),
        jnp.where(ok, hs, h_prev),
        done + ok.astype(jnp.int32),
    )
    return x_new, new_carry, rng


class DPMSolverPlusPlusSampler:
    """Same call surface as DDIMSampler (eta must be 0)."""

    def __init__(self, model: DDPM, schedule: str = "linear"):
        self.model = model
        self.ddpm_num_timesteps = model.num_timesteps
        self.schedule = schedule
        self._cache = {}

    def make_schedule(self, num_steps: int, discretize: str = "uniform"):
        """Per-step node tables in VISIT order (descending t): S scan rows,
        each holding the current node (model-eval time + alpha/sigma/lambda)
        and the next node's (alpha/sigma/lambda). The final node is the
        schedule start (index 0 == DDIM's alphas_prev[0] target).

        ``discretize="uniform"`` reuses the DDIM uniform-stride timestep
        grid. ``"lambda"`` places nodes uniformly in log-SNR (the
        DPM-Solver paper's preferred spacing): measured another ~3-8x error
        reduction at 5-20 steps on the oracle ladder (docs/PERF.md). The
        lambda grid may select duplicate integer timesteps at large S —
        the step math's h==0 guard skips those, preserving the node-count
        contract with the traced-steps core."""
        alpha, sigma, lam = make_dpm_full_tables(self.model.schedule)
        idx = np.concatenate(
            [_dpm_nodes(lam, num_steps, self.ddpm_num_timesteps, discretize),
             [0]]  # descending t, then the t~0 target
        )
        return dict(
            timesteps=idx[:-1].copy(),
            alpha=alpha[idx][:-1], sigma=sigma[idx][:-1], lam=lam[idx][:-1],
            alpha_next=alpha[idx][1:], sigma_next=sigma[idx][1:],
            lam_next=lam[idx][1:],
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
        x_T=None,
        rng=None,
        unconditional_guidance_scale: float = 1.0,
        unconditional_conditioning=None,
        discretize: str = "uniform",
        **kwargs,
    ):
        assert eta == 0.0, "DPM-Solver++ is a deterministic ODE solver"
        assert params is not None and rng is not None
        if shape is None:
            size = (batch_size, self.model.z_length, self.model.z_channels)
        else:
            size = (batch_size, shape[1], shape[0])

        sched = self.make_schedule(S, discretize=discretize)
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

        fn = self._get_step_fn(S, size, use_cfg, mask is not None, len(w_in))
        params = self._with_s4_kernels(params, size, use_cfg, c_in, w_in)
        mask_arg = (
            jnp.zeros(size) if mask is None else jnp.broadcast_to(mask, size)
        )
        x0_arg = jnp.zeros(size) if x0 is None else x0
        samples = fn(
            params, x, c_in, w_in, mask_arg, x0_arg, rng,
            jnp.asarray(sched["timesteps"], jnp.int32),
            jnp.asarray(sched["alpha"]), jnp.asarray(sched["sigma"]),
            jnp.asarray(sched["lam"]),
            jnp.asarray(sched["alpha_next"]),
            jnp.asarray(sched["sigma_next"]),
            jnp.asarray(sched["lam_next"]),
            unconditional_guidance_scale,
        )
        return samples, {}

    def _with_s4_kernels(self, params, size, use_cfg, c_in, w_in):
        """Materialize length-specific S4 conv kernels once outside the scan
        (same hoist as DDIMSampler._with_s4_kernels)."""
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

    def _get_step_fn(self, S, size, use_cfg, use_mask, n_w):
        key = (S, size, use_cfg, use_mask, n_w)
        if key in self._cache:
            return self._cache[key]

        model = self.model

        @jax.jit
        def run(params, x, c_in, w_in, mask, x0, rng, timesteps,
                alpha, sigma, lam, alpha_next, sigma_next, lam_next,
                guidance_scale):
            def step(carry, per):
                x, dpm_carry, rng = carry
                x_new, dpm_carry, rng = _dpm_step_math(
                    model, params, x, rng, c_in, w_in, mask, x0, per,
                    dpm_carry, guidance_scale,
                    use_cfg=use_cfg, use_mask=use_mask,
                )
                return (x_new, dpm_carry, rng), None

            carry0 = (
                x,
                (jnp.zeros_like(x), jnp.float32(1.0), jnp.int32(0)),
                rng,
            )
            (x, _, _), _ = jax.lax.scan(
                step, carry0,
                (timesteps, alpha, sigma, lam,
                 alpha_next, sigma_next, lam_next),
            )
            return x

        self._cache[key] = run
        return run


def dpm_dynamic_core(
    model, params, x, c_in, w_in, mask, x0, rng, steps, guidance_scale,
    dpm_tables, *, use_cfg, use_mask, discretize: str = "uniform",
):
    """DPM-Solver++(2M) trajectory with a TRACED step count, for the fused
    serving executable (apps/serving.py ``solver="dpmpp"``): one compiled
    graph serves every steps/scale slider combination, like
    ddim.ddim_dynamic_core.

    Node times re-derive the uniform-stride DDIM discretization in-graph
    (``i*stride + 1``, ref mug/diffusion/utils.py:50-66) and gather
    alpha/sigma/lambda from the full-length f32 tables of
    ``make_dpm_full_tables``, so a traced ``steps=S`` run is
    bitwise-identical to ``DPMSolverPlusPlusSampler`` at S. A
    ``lax.while_loop`` runs exactly ``steps`` U-Net evaluations.
    Deterministic (the DDIM ``eta`` has no analog here).
    """
    alpha_full, sigma_full, lam_full = (
        jnp.asarray(t) for t in dpm_tables
    )
    T = alpha_full.shape[0]
    steps = jnp.clip(jnp.asarray(steps, jnp.int32), 1, T)
    if discretize == "lambda":
        # uniform log-SNR grid, re-derived in-graph with the exact f32
        # formula of the host-side _dpm_nodes so static and dynamic runs
        # select identical nodes; visit position k in [0, steps-1],
        # k == steps is the final t~0 target
        num = steps
        lam_hi = lam_full[T - 1]
        lam_lo = lam_full[1]
        denom = jnp.maximum(steps - 1, 1).astype(jnp.float32)

        def node_at(k):
            target = lam_hi + (lam_lo - lam_hi) * (
                k.astype(jnp.float32) / denom
            )
            t = jnp.argmin(jnp.abs(lam_full - target)).astype(jnp.int32)
            return jnp.where(k >= num, 0, jnp.maximum(t, 1))

        def visit_nodes(j):
            return node_at(j), node_at(j + 1)
    elif discretize == "uniform":
        stride = T // steps
        num = (T - 1) // stride + 1  # == len(range(0, T, stride))

        def node_t(i):
            # schedule index i in [0, num-1] -> model time; i == -1 is the
            # final integration target at the schedule start (acum[0], the
            # static sampler's appended node / DDIM's alphas_prev[0])
            ts = jnp.minimum(i * stride + 1, T - 1)
            return jnp.where(i < 0, 0, ts)

        def visit_nodes(j):
            i = num - 1 - j  # visit order: descending t
            return node_t(i), node_t(i - 1)
    else:
        raise ValueError(f"unknown discretize {discretize!r}")

    def cond_fn(carry):
        return carry[0] < num

    def body_fn(carry):
        j, x, dpm_carry, rng = carry
        ts, ts_next = visit_nodes(j)
        per = (
            ts, alpha_full[ts], sigma_full[ts], lam_full[ts],
            alpha_full[ts_next], sigma_full[ts_next], lam_full[ts_next],
        )
        x_new, dpm_carry, rng = _dpm_step_math(
            model, params, x, rng, c_in, w_in, mask, x0, per, dpm_carry,
            guidance_scale, use_cfg=use_cfg, use_mask=use_mask,
        )
        return j + 1, x_new, dpm_carry, rng

    carry0 = (
        jnp.int32(0), x,
        (jnp.zeros_like(x), jnp.float32(1.0), jnp.int32(0)), rng,
    )
    _, x_final, _, _ = jax.lax.while_loop(cond_fn, body_fn, carry0)
    return x_final
