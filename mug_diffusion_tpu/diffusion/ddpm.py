"""DDPM core: model wrapper, q-sampling, training losses, ancestral sampler.

JAX re-design of ref: mug/diffusion/diffusion.py. The torch LightningModule
becomes (a) a flax ``MugDiffusionWrapper`` module owning the four networks
and (b) a plain ``DDPM`` coordinator holding the (device-constant) schedule
and exposing *pure functions* — ``loss_fn(params, batch, rng)`` for training
under pjit, and a ``lax.scan`` ancestral sampler replacing the Python
step loop at ref diffusion.py:255-277.

The first stage is frozen by masking its gradients in the optimizer
(see training.trainer), the functional equivalent of requires_grad=False at
ref diffusion.py:32-38.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mug_diffusion_tpu.diffusion.schedules import DiffusionSchedule
from mug_diffusion_tpu.utils.config import instantiate_from_config

Params = Any


class MugDiffusionWrapper(nn.Module):
    """Owns unet / first-stage VAE / wave encoder / prompt embedder
    (ref: diffusion.py:23-54)."""

    unet_config: dict
    first_stage_config: dict
    wave_stage_config: dict
    cond_stage_config: dict

    def setup(self):
        self.unet_model = instantiate_from_config(self.unet_config)
        self.first_stage_model = instantiate_from_config(self.first_stage_config)
        self.wave_model = instantiate_from_config(self.wave_stage_config)
        self.cond_stage_model = instantiate_from_config(self.cond_stage_config)

    def wave_output(self, audio, deterministic: bool = True):
        """[B, T_mel, n_mels] -> list of multi-scale features. Floating
        inputs keep their dtype (bf16 under the mixed-precision policy);
        integer/fp16-cache inputs are promoted to fp32."""
        if not jnp.issubdtype(audio.dtype, jnp.floating) or \
                audio.dtype == jnp.float16:
            audio = audio.astype(jnp.float32)
        return self.wave_model(audio, deterministic)

    def cond_output(self, feature):
        """[B, F] ids -> [B, F, H] context."""
        return self.cond_stage_model(feature)

    def encode(self, note, deterministic: bool = True):
        return self.first_stage_model.encode(note, deterministic)

    def decode(self, z, deterministic: bool = True):
        return self.first_stage_model.decode(z, deterministic)

    def __call__(self, x, t, c, w, deterministic: bool = True):
        """Denoise: w is the wave encoder's full multi-scale list; the U-Net
        consumes the deepest len(channel_mult) scales (ref unet.py:527-546
        indexes audios[-4..-1]).

        Single-scale encoders (STFTEncoder, ref configs/mug/
        mug_diffusion_stft.yaml — wave concatenated at the input level only,
        in_channels 544 = 512 + 32) produce one tensor; it feeds level 0 and
        deeper levels get zero-channel placeholders (concat no-ops), with
        audio_channels like [512, 0, 0, 0]."""
        n_levels = len(self.unet_model.channel_mult)
        if not isinstance(w, (list, tuple)):
            w = [w]
        if len(w) >= n_levels:
            audios = list(w)[-n_levels:]
        else:
            audios = list(w)
            while len(audios) < n_levels:
                prev = audios[-1]
                audios.append(jnp.zeros(
                    (prev.shape[0], prev.shape[1] // 2, 0), prev.dtype))
        return self.unet_model(x, t, c, audios, deterministic)

    def full_init(self, note, audio, feature, deterministic: bool = True):
        """Single path touching every submodule — used only by .init() so
        all parameters materialize."""
        posterior = self.encode(note, deterministic)
        z = posterior.mode()
        c = self.cond_output(feature)
        w = self.wave_output(audio, deterministic)
        t = jnp.zeros((z.shape[0],), jnp.int32)
        eps = self(z, t, c, w, deterministic)
        dec = self.decode(z, deterministic)
        return eps, dec


def smooth_l1(pred, target, beta: float = 0.02):
    """torch.nn.functional.smooth_l1_loss(beta=...) semantics."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


class DDPM:
    """Diffusion coordinator (ref: mug/diffusion/diffusion.py:57-513).

    Not a flax module: parameters live in an external pytree created by
    ``init_params``; every step method is a pure function suitable for
    jit/pjit.
    """

    def __init__(
        self,
        unet_config,
        first_stage_config,
        wave_stage_config,
        cond_stage_config,
        z_channels: int,
        z_length: int,
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        loss_type: str = "l2",
        ckpt_path: Optional[str] = None,
        ignore_keys=(),
        training_keys=None,
        load_only_unet: bool = False,
        monitor: str = "val/loss",
        log_every_t: int = 100,
        log_index: int = 0,
        clip_denoised: bool = True,
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        given_betas=None,
        original_elbo_weight: float = 0.0,
        v_posterior: float = 0.0,
        l_simple_weight: float = 1.0,
        parameterization: str = "eps",
        scheduler_config: Optional[dict] = None,
        learn_logvar: bool = False,
        logvar_init: float = 0.0,
        base_learning_rate: Optional[float] = None,
        compute_dtype: str = "bfloat16",
    ):
        assert parameterization in ("eps", "x0", "recon")
        self.parameterization = parameterization
        # inference compute precision (params stay fp32 masters); 'float32'
        # disables the bf16 fast path — see utils/precision.py
        from mug_diffusion_tpu.utils.precision import resolve_dtype
        self.compute_dtype = resolve_dtype(compute_dtype)
        self.clip_denoised = clip_denoised
        self.log_every_t = log_every_t
        self.z_channels = z_channels
        self.z_length = z_length
        self.log_index = log_index
        self.loss_type = loss_type
        self.monitor = monitor
        self.training_keys = training_keys
        self.ckpt_path = ckpt_path
        self.ignore_keys = tuple(ignore_keys or ())
        self.load_only_unet = load_only_unet
        self.scheduler_config = scheduler_config
        self.original_elbo_weight = original_elbo_weight
        self.l_simple_weight = l_simple_weight
        self.v_posterior = v_posterior
        self.learn_logvar = learn_logvar
        self.logvar_init = logvar_init
        self.base_learning_rate = base_learning_rate

        self.model = MugDiffusionWrapper(
            unet_config=unet_config,
            first_stage_config=first_stage_config,
            wave_stage_config=wave_stage_config,
            cond_stage_config=cond_stage_config,
        )
        self.schedule = DiffusionSchedule.create(
            beta_schedule=beta_schedule,
            timesteps=timesteps,
            linear_start=linear_start,
            linear_end=linear_end,
            cosine_s=cosine_s,
            given_betas=given_betas,
            v_posterior=v_posterior,
            parameterization=parameterization,
        )
        self.num_timesteps = self.schedule.num_timesteps

    # ------------------------------------------------------------- params

    def init_params(self, rng, batch_spec: Optional[dict] = None) -> Params:
        """Materialize all network parameters on tiny shapes (shapes don't
        constrain later use — every module is length-agnostic)."""
        spec = batch_spec or {}
        B = spec.get("batch", 1)
        z_len = spec.get("z_length", 64)
        n_mels = spec.get("n_mels", 128)
        ratio = spec.get("audio_note_window_ratio", 8)
        ddcfg = self.model.first_stage_config["params"]["ddconfig"]
        # VAE time downsample = 2^(levels-1); 8x in the live config
        vae_down = 2 ** (len(ddcfg["channel_mult"]) - 1)
        note_len = z_len * vae_down
        mel_len = spec.get("mel_length", note_len * ratio)
        n_feats = spec.get("num_features", 21)

        note = jnp.zeros((B, note_len, ddcfg["x_channels"]))
        wave_cfg = self.model.wave_stage_config
        if wave_cfg["target"].endswith("STFTEncoder"):
            # raw STFT input [B, T, n_fft/2+1, 2] (real/imag)
            n_fft = wave_cfg["params"]["n_fft"]
            audio = jnp.zeros((B, mel_len, n_fft // 2 + 1, 2))
        else:
            audio = jnp.zeros((B, mel_len, n_mels))
        feature = jnp.zeros((B, n_feats), jnp.int32)

        # jit the whole init: flax init otherwise dispatches op-by-op, which
        # is prohibitively slow over a remote-TPU tunnel
        @jax.jit
        def _init(rng, note, audio, feature):
            return self.model.init(
                rng, note, audio, feature, method=MugDiffusionWrapper.full_init
            )

        variables = dict(_init(rng, note, audio, feature))
        # drop the init-length S4 kernel cache: it is L-specific and is
        # re-materialized per length bucket by the serving path
        variables.pop("s4_kernel", None)
        return variables

    # ------------------------------------------------------------ q / p

    def _extract(self, buf, t, ndim):
        out = jnp.asarray(buf)[t]
        return out.reshape(t.shape[0], *((1,) * (ndim - 1)))

    def q_sample(self, x_start, t, noise):
        """P(x_t | x_0) (ref: diffusion.py:327-333)."""
        s = self.schedule
        return (
            self._extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + self._extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
            * noise
        )

    def predict_start_from_noise(self, x_t, t, noise):
        s = self.schedule
        return (
            self._extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - self._extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
        )

    def get_loss(self, pred, target):
        """Element-wise loss (ref: diffusion.py:335-354)."""
        if self.loss_type == "l1":
            return jnp.abs(target - pred)
        if self.loss_type == "l2":
            return jnp.square(target - pred)
        if self.loss_type == "smooth_l1":
            return smooth_l1(pred, target, beta=0.02) + 0.01
        raise NotImplementedError(f"unknown loss type '{self.loss_type}'")

    # -------------------------------------------------------------- loss

    def loss_fn(
        self,
        params: Params,
        batch: Dict[str, jnp.ndarray],
        rng,
        min_step: int = 0,
        max_step: Optional[int] = None,
        all_noise: bool = False,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Training/validation loss (ref: diffusion.py:356-414).

        batch: note [B,T,16], audio [B,Tm,128], feature [B,F] (+valid_flag).
        """
        if max_step is None:
            max_step = self.num_timesteps
        rng_t, rng_noise, rng_drop = jax.random.split(rng, 3)

        # mixed-precision training (beyond the reference, which trains fp32,
        # ref main.py has no AMP): fp32 master params + optimizer state, the
        # forward/backward network compute in bf16 (the cast is inside the
        # differentiated graph, so grads come back fp32 on the masters), the
        # diffusion q-sample math, targets, loss and norm stats in fp32.
        bf16 = self.compute_dtype == jnp.bfloat16
        if bf16:
            from mug_diffusion_tpu.utils.precision import cast_floating

            apply_params = cast_floating(params)
            audio_in = batch["audio"].astype(jnp.bfloat16)
            note_in = batch["note"].astype(jnp.bfloat16)
        else:
            apply_params = params
            audio_in = batch["audio"]
            note_in = batch["note"]

        def run(module):
            posterior = module.encode(note_in, not train)
            x_start = posterior.mode().astype(jnp.float32)
            B = x_start.shape[0]
            t = jax.random.randint(rng_t, (B,), min_step, max_step)
            noise = jax.random.normal(rng_noise, x_start.shape)
            x_noisy = noise if all_noise else self.q_sample(x_start, t, noise)
            c = module.cond_output(batch["feature"])
            w = module.wave_output(audio_in, not train)
            model_out = module(
                x_noisy.astype(self.compute_dtype), t, c, w, not train
            )
            return model_out, x_start, posterior, t, noise

        rngs = {"dropout": rng_drop} if train else {}
        model_out, x_start, posterior, t, noise = self.model.apply(
            apply_params, method=run, rngs=rngs
        )
        model_out = model_out.astype(jnp.float32)

        if self.parameterization == "eps":
            target = noise
        elif self.parameterization == "x0":
            target = x_start
        else:  # recon
            target = batch["note"]

        loss_dict = {}
        prefix = "train" if train else "val"
        if self.parameterization == "recon":
            raise NotImplementedError(
                "recon parameterization requires the VAE loss; the live "
                "config uses eps (ref mug_diffusion.yaml:12)"
            )

        loss_el = self.get_loss(model_out, target)
        loss = loss_el.mean(axis=(1, 2))  # [B]

        loss_simple = loss.mean() * self.l_simple_weight
        loss_vlb = (jnp.asarray(self.schedule.lvlb_weights)[t] * loss).mean()
        total = loss_simple + self.original_elbo_weight * loss_vlb

        loss_dict[f"{prefix}/loss_simple"] = loss.mean()
        loss_dict[f"{prefix}/loss_mae"] = jnp.abs(model_out - target).mean()
        loss_dict[f"{prefix}/loss_mse"] = jnp.square(model_out - target).mean()
        loss_dict[f"{prefix}/loss_ratio"] = (
            jnp.abs(model_out - target) / posterior.std
        ).mean()
        loss_dict[f"{prefix}/loss_vlb"] = loss_vlb
        loss_dict[f"{prefix}/loss"] = total
        return total, loss_dict

    # ----------------------------------------------------------- sampling

    def _maybe_bf16(self, params, *arrays):
        """Apply the compute-dtype policy to a (params, inputs...) pair."""
        if self.compute_dtype == jnp.bfloat16:
            from mug_diffusion_tpu.utils.precision import cast_floating

            params = cast_floating(params)
            arrays = tuple(a.astype(jnp.bfloat16) for a in arrays)
        return (params,) + arrays

    @functools.cached_property
    def _wave_jit(self):
        def f(params, audio):
            params, audio = self._maybe_bf16(params, audio)
            w = self.model.apply(
                params, audio, method=MugDiffusionWrapper.wave_output
            )
            if not isinstance(w, (list, tuple)):
                w = [w]
            return [wi.astype(jnp.float32) for wi in w]

        return jax.jit(f)

    @functools.cached_property
    def _cond_jit(self):
        return jax.jit(
            lambda params, feature: self.model.apply(
                params, feature, method=MugDiffusionWrapper.cond_output
            )
        )

    @functools.cached_property
    def _decode_jit(self):
        def f(params, z):
            params, z = self._maybe_bf16(params, z)
            out = self.model.apply(
                params, z, method=MugDiffusionWrapper.decode
            )
            return out.astype(jnp.float32)

        return jax.jit(f)

    @functools.cached_property
    def _encode_mode_jit(self):
        def f(params, note):
            posterior = self.model.apply(
                params, note, method=MugDiffusionWrapper.encode
            )
            return posterior.mode()

        return jax.jit(f)

    def encode_conditioning(self, params, audio, feature):
        """Run wave + prompt encoders once per generation (ref webui.py:369).
        Jitted: eager flax apply dispatches op-by-op, which is slow over a
        remote-TPU tunnel."""
        w = self._wave_jit(params, audio)
        c = self._cond_jit(params, feature)
        return c, w

    def cond_output(self, params, feature):
        return self._cond_jit(params, feature)

    def apply_model(self, params, x, t, c, w):
        """U-Net evaluation — the hot call inside sampling scans. Under the
        bf16 policy the parameter cast is traced inside the caller's jit, so
        XLA hoists it out of the scan (one cast per call, not per step); the
        output returns to fp32 for the DDIM update math."""
        if self.compute_dtype == jnp.bfloat16:
            from mug_diffusion_tpu.utils.precision import cast_floating

            params = cast_floating(params)
            x = x.astype(jnp.bfloat16)
            c = c.astype(jnp.bfloat16)
            w = [wi.astype(jnp.bfloat16) for wi in w]
            out = self.model.apply(params, x, t, c, w)
            return out.astype(jnp.float32)
        return self.model.apply(params, x, t, c, w)

    def decode(self, params, z):
        return self._decode_jit(params, z)

    def encode_first_stage_mode(self, params, note):
        return self._encode_mode_jit(params, note)

    def ancestral_sample(
        self,
        params,
        c,
        w,
        rng,
        shape: Tuple[int, int, int],
        log_every_t: Optional[int] = None,
    ):
        """Full-T ancestral sampling as one lax.scan
        (ref: diffusion.py:228-283 log_beatmap). Returns final x and the
        stacked intermediate latents at each log point."""
        s = self.schedule
        T = self.num_timesteps
        log_every_t = log_every_t or self.log_every_t

        rng, rng_init = jax.random.split(rng)
        x_init = jax.random.normal(rng_init, shape)

        coef1 = jnp.asarray(s.posterior_mean_coef1)
        coef2 = jnp.asarray(s.posterior_mean_coef2)
        logvar = jnp.asarray(s.posterior_log_variance_clipped)

        def step(carry, i):
            x, rng = carry
            t = jnp.full((shape[0],), i, jnp.int32)
            eps = self.apply_model(params, x, t, c, w)
            if self.parameterization == "eps":
                x_recon = self.predict_start_from_noise(x, t, eps)
            else:
                x_recon = eps
            if self.clip_denoised:
                x_recon = jnp.clip(x_recon, -10.0, 10.0)
            mean = (
                self._extract(coef1, t, x.ndim) * x_recon
                + self._extract(coef2, t, x.ndim) * x
            )
            lv = self._extract(logvar, t, x.ndim)
            rng, rng_n = jax.random.split(rng)
            noise = jax.random.normal(rng_n, x.shape)
            nonzero = (i != 0).astype(x.dtype)
            x_new = mean + nonzero * jnp.exp(0.5 * lv) * noise
            return (x_new, rng), x_new

        (x, _), xs = jax.lax.scan(
            step, (x_init, rng), jnp.arange(T - 1, -1, -1)
        )
        # subsample intermediates at log points (host-side gather is fine)
        idx = [
            j for j, i in enumerate(range(T - 1, -1, -1))
            if i % log_every_t == 0 or i == T - 1
        ]
        return x, xs[jnp.asarray(idx)]
