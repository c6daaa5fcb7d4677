"""First-stage KL autoencoder: chart tensor [B, T, 16] <-> latent [B, T/8, 16].

Flax re-design of ref: mug/firststage/autoencoder.py. The live config
(configs/mug/autoencoder.yaml) compresses 8x in time via channel_mult
[1,2,4,4] (3 downsamples), middle_channels 64, num_groups 8, 1 res block per
level. ``encode`` returns a DiagonalGaussianDistribution over 16 latent
channels; ``decode`` maps latents back to logits over the 16 note planes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mug_diffusion_tpu.models.blocks import (
    Downsample,
    Normalize,
    ResnetBlock,
    Upsample,
)


class DiagonalGaussianDistribution:
    """Posterior over latents (ref: mug/firststage/autoencoder.py:356-387).

    ``parameters`` is the encoder output with mean/logvar split over the
    channel axis (last dim in our layout).
    """

    def __init__(self, parameters, deterministic=False, scale=1.0, logvar=None):
        self.parameters = parameters
        self.mean, self.logvar = jnp.split(parameters, 2, axis=-1)
        if logvar is not None:
            self.logvar = logvar * jnp.ones_like(self.mean)
        self.logvar = jnp.clip(self.logvar, -10.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)
        self.scale = scale
        if deterministic:
            self.var = self.std = jnp.zeros_like(self.mean)

    def sample(self, rng):
        # noise in the posterior's own dtype: under the bf16 training policy
        # an f32 draw would silently promote the latent (and the whole
        # decoder compute) back to fp32
        noise = jax.random.normal(rng, self.mean.shape, self.mean.dtype)
        x = self.mean + self.std * noise
        return x * self.scale

    def kl(self, other=None):
        if self.deterministic:
            return jnp.array(0.0)
        # reduce in fp32: under the bf16 training policy the moments are
        # bf16, and a bf16 mean over the whole latent (~3 significant
        # digits) would feed a gradient-carrying loss term
        mean = self.mean.astype(jnp.float32)
        var = self.var.astype(jnp.float32)
        logvar = self.logvar.astype(jnp.float32)
        if other is None:
            return 0.5 * jnp.mean(jnp.square(mean) + var - 1.0 - logvar)
        o_mean = other.mean.astype(jnp.float32)
        o_var = other.var.astype(jnp.float32)
        o_logvar = other.logvar.astype(jnp.float32)
        return 0.5 * jnp.mean(
            jnp.square(mean - o_mean) / o_var
            + var / o_var - 1.0 - logvar + o_logvar
        )

    def mode(self):
        return self.mean * self.scale


class Encoder(nn.Module):
    """Downsampling conv encoder (ref: autoencoder.py:185-265)."""

    x_channels: int
    middle_channels: int
    z_channels: int
    channel_mult: Sequence[int]
    num_res_blocks: int
    num_groups: int = 32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        num_resolutions = len(self.channel_mult)
        inchannel_mult = (1,) + tuple(self.channel_mult)

        h = nn.Conv(self.middle_channels, (3,), padding=[(1, 1)])(x)
        for i_level in range(num_resolutions):
            block_in = self.middle_channels * inchannel_mult[i_level]
            block_out = self.middle_channels * self.channel_mult[i_level]
            for _ in range(self.num_res_blocks):
                h = ResnetBlock(
                    in_channels=block_in, out_channels=block_out,
                    num_groups=self.num_groups,
                )(h, deterministic=deterministic)
                block_in = block_out
            if i_level != num_resolutions - 1:
                h = Downsample(block_in, True)(h)

        h = ResnetBlock(in_channels=block_in, num_groups=self.num_groups)(
            h, deterministic=deterministic
        )
        h = ResnetBlock(in_channels=block_in, num_groups=self.num_groups)(
            h, deterministic=deterministic
        )

        h = Normalize(self.num_groups)(h)
        h = nn.silu(h)
        h = nn.Conv(self.z_channels * 2, (3,), padding=[(1, 1)])(h)
        return h


class Decoder(nn.Module):
    """Upsampling conv decoder (ref: autoencoder.py:268-354)."""

    x_channels: int
    middle_channels: int
    z_channels: int
    channel_mult: Sequence[int]
    num_res_blocks: int
    num_groups: int = 32

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        num_resolutions = len(self.channel_mult)
        block_in = self.middle_channels * self.channel_mult[-1]

        h = nn.Conv(block_in, (3,), padding=[(1, 1)])(z)

        h = ResnetBlock(in_channels=block_in, num_groups=self.num_groups)(
            h, deterministic=deterministic
        )
        h = ResnetBlock(in_channels=block_in, num_groups=self.num_groups)(
            h, deterministic=deterministic
        )

        for i_level in reversed(range(num_resolutions)):
            block_out = self.middle_channels * self.channel_mult[i_level]
            for _ in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    in_channels=block_in, out_channels=block_out,
                    num_groups=self.num_groups,
                )(h, deterministic=deterministic)
                block_in = block_out
            if i_level != 0:
                h = Upsample(block_in, True)(h)

        h = Normalize(self.num_groups)(h)
        h = nn.silu(h)
        h = nn.Conv(self.x_channels, (3,), padding=[(1, 1)])(h)
        return h


class AutoencoderKL(nn.Module):
    """KL-regularized chart autoencoder (ref: autoencoder.py:13-183).

    Construction mirrors the reference config surface: ``ddconfig`` dict,
    optional constant learned logvar, latent ``scale``. Checkpoint surgery
    (ckpt_path / ignore_keys / remove_prefix / training_keys) lives in
    mug_diffusion_tpu.utils.checkpoint, not here, because flax params are
    external pytrees.
    """

    ddconfig: dict
    lossconfig: Optional[dict] = None
    kl_weight: float = 0.0
    scale: float = 1.0
    constant_var: Optional[float] = None
    monitor: Optional[str] = None
    # accepted for config parity; handled by the checkpoint loader
    ckpt_path: Optional[str] = None
    remove_prefix: Optional[str] = None
    ignore_keys: Optional[tuple] = None
    training_keys: Optional[tuple] = None
    # accepted for config parity; consumed by AutoencoderTask (bf16 policy,
    # ReduceLROnPlateau knobs)
    compute_dtype: Optional[str] = None
    plateau_factor: Optional[float] = None
    plateau_patience: Optional[int] = None

    def setup(self):
        dd = dict(self.ddconfig)
        dd.pop("num_groups_decoder", None)
        self.encoder = Encoder(
            x_channels=dd["x_channels"],
            middle_channels=dd["middle_channels"],
            z_channels=dd["z_channels"],
            channel_mult=tuple(dd["channel_mult"]),
            num_res_blocks=dd["num_res_blocks"],
            num_groups=dd.get("num_groups", 32),
        )
        self.decoder = Decoder(
            x_channels=dd["x_channels"],
            middle_channels=dd["middle_channels"],
            z_channels=dd["z_channels"],
            channel_mult=tuple(dd["channel_mult"]),
            num_res_blocks=dd["num_res_blocks"],
            num_groups=dd.get("num_groups", 32),
        )
        if self.constant_var is not None:
            import numpy as np

            self.log_var = self.param(
                "log_var",
                lambda key: jnp.asarray(
                    [float(np.log(self.constant_var) * 2)], jnp.float32
                ),
            )
        else:
            self.log_var = None

    def encode(self, x, deterministic: bool = True) -> DiagonalGaussianDistribution:
        h = self.encoder(x, deterministic=deterministic)
        return DiagonalGaussianDistribution(
            h, scale=self.scale, logvar=self.log_var
        )

    def decode(self, z, deterministic: bool = True):
        return self.decoder(z / self.scale, deterministic=deterministic)

    def __call__(self, x, rng=None, sample_posterior: bool = True,
                 deterministic: bool = True):
        posterior = self.encode(x, deterministic=deterministic)
        if sample_posterior:
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        dec = self.decode(z, deterministic=deterministic)
        return dec, posterior
