"""Training tasks: the two trainable model families.

Wraps the DDPM diffusion model and the first-stage VAE behind one task
interface (init_params / loss_fn / optimizer spec / monitor) so the Trainer
is model-agnostic — the functional equivalent of the reference's two
LightningModules (ref: mug/diffusion/diffusion.py DDPM.training_step /
configure_optimizers, mug/firststage/autoencoder.py AutoencoderKL.step).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from mug_diffusion_tpu.utils.checkpoint import trainable_mask
from mug_diffusion_tpu.utils.config import instantiate_from_config


def _masked_adamw(lr_schedule, mask) -> optax.GradientTransformation:
    return optax.chain(
        optax.adamw(learning_rate=lr_schedule),
        optax.masked(
            optax.set_to_zero(),
            jax.tree_util.tree_map(lambda trainable: not trainable, mask),
        ),
    )


class DiffusionTask:
    """Latent diffusion training (ref: diffusion.py:416-513).

    Optimizer: AdamW at scaled LR, step-wise LambdaLinear multiplier, first
    stage frozen, optional ``training_keys`` selective trainability.
    """

    def __init__(self, model_config: dict):
        self.model = instantiate_from_config(model_config)  # DDPM
        self.config = model_config
        self.monitor = self.model.monitor

    def init_params(self, rng, batch_spec=None):
        return self.model.init_params(rng, batch_spec)

    def loss_fn(self, params, batch, rng, train=True, **kw):
        return self.model.loss_fn(params, batch, rng, train=train, **kw)

    def validation_metrics(self, params, batch, rng, batch_idx: int):
        """Stratified noise-decile validation (ref: diffusion.py:433-458)."""
        level = batch_idx % 10
        min_step = int(level / 10 * self.model.num_timesteps)
        max_step = int((level + 1) / 10 * self.model.num_timesteps)
        metrics = self.validation_metrics_traced(
            params, batch, rng, min_step, max_step
        )
        metrics[f"loss_level_{level}"] = metrics.pop("loss_level")
        return metrics

    def validation_metrics_traced(self, params, batch, rng, min_step,
                                  max_step):
        """Same metrics with the decile bounds as TRACED scalars, so the
        whole validation step is ONE compiled executable instead of one per
        decile (each cold compile of the live model costs minutes on TPU;
        see docs/PERF.md). The decile loss comes back under the generic key
        'loss_level' — the caller renames it."""
        metrics = {}
        _, loss_dict = self.model.loss_fn(params, batch, rng, train=False)
        metrics.update(loss_dict)
        loss_all, _ = self.model.loss_fn(
            params, batch, rng, all_noise=True, train=False
        )
        metrics["loss_level_all"] = loss_all
        loss_lvl, _ = self.model.loss_fn(
            params, batch, rng, min_step=min_step, max_step=max_step,
            train=False,
        )
        metrics["loss_level"] = loss_lvl
        return metrics

    def make_optimizer(self, params, learning_rate: float):
        mask = trainable_mask(
            params["params"],
            training_keys=self.model.training_keys,
            frozen_prefixes=("first_stage_model",),
        )
        mask = {"params": mask}
        scheduler_config = self.model.scheduler_config
        if scheduler_config is not None:
            scheduler = instantiate_from_config(scheduler_config)
            # optax schedules must be traceable; wrap via host constants:
            # LambdaLinearScheduler is piecewise-linear -> implement traceably
            lr_fn = _traceable_lambda_linear(scheduler, learning_rate)
            self.lr_fn = lr_fn  # Trainer logs the live scheduled value
        else:
            lr_fn = learning_rate
        return _masked_adamw(lr_fn, mask)


def _traceable_lambda_linear(scheduler, base_lr):
    """Convert LambdaLinearScheduler (single cycle, the live config) into a
    jnp-traceable schedule."""
    warm = float(scheduler.lr_warm_up_steps[0])
    f_start = float(scheduler.f_start[0])
    f_max = float(scheduler.f_max[0])
    f_min = float(scheduler.f_min[0])
    cycle = float(scheduler.cycle_lengths[0])

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm_f = jnp.where(
            warm > 0, (f_max - f_start) / jnp.maximum(warm, 1.0) * step + f_start,
            f_max,
        )
        lin_f = f_min + (f_max - f_min) * (cycle - step) / cycle
        return base_lr * jnp.where(step < warm, warm_f, lin_f)

    return fn


class AutoencoderTask:
    """First-stage VAE training (ref: autoencoder.py:88-145).

    Loss: ManiaReconstructLoss + kl_weight * KL; optimizer Adam; monitor
    val/loss (the reference's ReduceLROnPlateau is reproduced as a
    plateau-scaled LR managed by the Trainer).
    """

    def __init__(self, model_config: dict):
        from mug_diffusion_tpu.utils.precision import resolve_dtype

        self.vae = instantiate_from_config(model_config)
        self.config = model_config
        params = model_config.get("params", {})
        self.kl_weight = params.get("kl_weight", 0.0)
        self.loss = instantiate_from_config(params["lossconfig"])
        self.monitor = params.get("monitor", "val/loss")
        self.training_keys = params.get("training_keys")
        # mixed-precision training like DiffusionTask: fp32 masters, bf16
        # fwd/bwd, fp32 loss/KL stats (true-fp32 matmuls measured 6x slower
        # on v5e, docs/PERF.md)
        self.compute_dtype = resolve_dtype(
            params.get("compute_dtype", "bfloat16")
        )
        # ReduceLROnPlateau knobs (torch defaults: factor 0.1, patience 10).
        # Patience counts VALIDATIONS: the reference validates once per
        # epoch over ~51k charts (~1.6k steps), so patience 10 means ~16k
        # stagnant steps there. On a small synthetic corpus an epoch is a
        # few steps, and the default can kill the LR mid-takeoff — scale
        # patience (or val cadence) to the corpus when overriding.
        self.plateau_factor = params.get("plateau_factor", 0.1)
        self.plateau_patience = params.get("plateau_patience", 10)

    def init_params(self, rng, batch_spec=None):
        spec = batch_spec or {}
        B = spec.get("batch", 1)
        T = spec.get("note_length", 256)
        C = self.vae.ddconfig["x_channels"]
        note = jnp.zeros((B, T, C))
        return self.vae.init(rng, note, rng)

    def loss_fn(self, params, batch, rng, train=True, **kw):
        notes = batch["note"]
        valid_flag = batch["valid_flag"]
        bf16 = self.compute_dtype == jnp.bfloat16
        if bf16:
            from mug_diffusion_tpu.utils.precision import cast_floating

            apply_params = cast_floating(params)
            notes_in = notes.astype(jnp.bfloat16)
        else:
            apply_params = params
            notes_in = notes
        recon, posterior = self.vae.apply(
            apply_params, notes_in, rng,
            sample_posterior=train, deterministic=not train,
        )
        # loss + KL statistics in fp32 against the ORIGINAL fp32 targets
        recon = recon.astype(jnp.float32)
        loss, log_dict = self.loss(notes, recon, valid_flag)
        kl_loss = posterior.kl().astype(jnp.float32)
        loss = loss + kl_loss * self.kl_weight
        prefix = "train" if train else "val"
        log_dict["kl_loss"] = kl_loss
        z_mode = posterior.mode().astype(jnp.float32)
        log_dict["z_std"] = jnp.std(z_mode)
        log_dict["z_mean"] = z_mode.mean()
        log_dict = {f"{prefix}/{k}": v for k, v in log_dict.items()}
        log_dict[f"{prefix}/loss"] = loss
        return loss, log_dict

    def validation_metrics(self, params, batch, rng, batch_idx: int):
        _, log_dict = self.loss_fn(params, batch, rng, train=False)
        return log_dict

    def make_optimizer(self, params, learning_rate: float):
        mask = trainable_mask(
            params["params"], training_keys=self.training_keys
        )
        mask = {"params": mask}
        # inject_hyperparams exposes the LR in opt_state so the Trainer can
        # apply ReduceLROnPlateau semantics (ref: autoencoder.py:145)
        return optax.chain(
            optax.inject_hyperparams(optax.adam)(
                learning_rate=learning_rate
            ),
            optax.masked(
                optax.set_to_zero(),
                jax.tree_util.tree_map(lambda t: not t, mask),
            ),
        )



def build_task(model_config: dict):
    target = model_config["target"]
    if "autoencoder" in target.lower() or target.endswith("AutoencoderKL"):
        return AutoencoderTask(model_config)
    return DiffusionTask(model_config)
