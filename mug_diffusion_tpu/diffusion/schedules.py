"""Diffusion noise schedules and derived buffers.

Numerics-parity port of ref: mug/diffusion/utils.py (make_beta_schedule :16,
make_ddim_timesteps :50, make_ddim_sampling_parameters :69) and the buffer
algebra of DDPM.register_schedule (ref: mug/diffusion/diffusion.py:131-189).
All schedule math is float64 NumPy at build time; buffers are float32 device
constants thereafter.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """ref: mug/diffusion/utils.py:16-40."""
    if schedule == "linear":
        betas = (
            np.linspace(
                linear_start ** 0.5, linear_end ** 0.5, n_timestep,
                dtype=np.float64,
            )
            ** 2
        )
    elif schedule == "cosine":
        timesteps = (
            np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        )
        alphas = timesteps / (1 + cosine_s) * np.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, a_min=0, a_max=0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = (
            np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
            ** 0.5
        )
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """ref: mug/diffusion/utils.py:50-66 (uniform stride + 1 shift)."""
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps)
            ** 2
        ).astype(int)
    else:
        raise NotImplementedError(
            f'There is no ddim discretization method called "{ddim_discr_method}"'
        )
    # +1 shift as in the reference; additionally clip to the last valid index
    # (the reference IndexErrors when 1000 % S leaves the last stride at 999,
    # e.g. S=3)
    return np.minimum(ddim_timesteps + 1, num_ddpm_timesteps - 1)


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
):
    """ref: mug/diffusion/utils.py:69-80 (DDIM paper eq. 16 sigmas)."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray(
        [alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist()
    )
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return sigmas, alphas, alphas_prev


@dataclass
class DiffusionSchedule:
    """All DDPM buffers (ref: mug/diffusion/diffusion.py:131-189)."""

    betas: np.ndarray
    v_posterior: float = 0.0
    parameterization: str = "eps"

    alphas_cumprod: np.ndarray = field(init=False)
    alphas_cumprod_prev: np.ndarray = field(init=False)
    sqrt_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_one_minus_alphas_cumprod: np.ndarray = field(init=False)
    log_one_minus_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recip_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recipm1_alphas_cumprod: np.ndarray = field(init=False)
    posterior_variance: np.ndarray = field(init=False)
    posterior_log_variance_clipped: np.ndarray = field(init=False)
    posterior_mean_coef1: np.ndarray = field(init=False)
    posterior_mean_coef2: np.ndarray = field(init=False)
    lvlb_weights: np.ndarray = field(init=False)

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        self.num_timesteps = int(betas.shape[0])

        self.alphas_cumprod = alphas_cumprod.astype(np.float32)
        self.alphas_cumprod_prev = alphas_cumprod_prev.astype(np.float32)
        self.sqrt_alphas_cumprod = np.sqrt(alphas_cumprod).astype(np.float32)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(1.0 - alphas_cumprod).astype(
            np.float32
        )
        self.log_one_minus_alphas_cumprod = np.log(1.0 - alphas_cumprod).astype(
            np.float32
        )
        self.sqrt_recip_alphas_cumprod = np.sqrt(1.0 / alphas_cumprod).astype(
            np.float32
        )
        self.sqrt_recipm1_alphas_cumprod = np.sqrt(
            1.0 / alphas_cumprod - 1
        ).astype(np.float32)

        posterior_variance = (1 - self.v_posterior) * betas * (
            1.0 - alphas_cumprod_prev
        ) / (1.0 - alphas_cumprod) + self.v_posterior * betas
        self.posterior_variance = posterior_variance.astype(np.float32)
        self.posterior_log_variance_clipped = np.log(
            np.maximum(posterior_variance, 1e-20)
        ).astype(np.float32)
        self.posterior_mean_coef1 = (
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ).astype(np.float32)
        self.posterior_mean_coef2 = (
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ).astype(np.float32)

        if self.parameterization == "eps":
            # element 0 divides by zero posterior variance; it is overwritten
            # with element 1 below (ref: diffusion.py:187)
            with np.errstate(divide="ignore"):
                lvlb = betas ** 2 / (
                    2 * posterior_variance * alphas * (1 - alphas_cumprod)
                )
        elif self.parameterization in ("x0", "recon"):
            lvlb = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
        else:
            raise NotImplementedError("mu not supported")
        lvlb[0] = lvlb[1]
        self.lvlb_weights = lvlb.astype(np.float32)
        assert not np.isnan(self.lvlb_weights).any()

    @classmethod
    def create(
        cls,
        beta_schedule: str = "linear",
        timesteps: int = 1000,
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        given_betas: Optional[np.ndarray] = None,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
    ) -> "DiffusionSchedule":
        betas = (
            given_betas
            if given_betas is not None
            else make_beta_schedule(
                beta_schedule, timesteps, linear_start=linear_start,
                linear_end=linear_end, cosine_s=cosine_s,
            )
        )
        return cls(
            betas=betas, v_posterior=v_posterior,
            parameterization=parameterization,
        )
