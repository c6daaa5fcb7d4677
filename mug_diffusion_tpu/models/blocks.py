"""Shared 1-D NN blocks (flax.linen, channels-last [B, T, C]).

TPU-native re-design of the reference's shared blocks (ref:
mug/model/models.py, mug/model/util.py). Channels sit in the last (lane)
dimension so every 1x1 conv is a plain Dense/matmul on the MXU and GroupNorm
reduces over lanes. 3-wide convs use lax.conv_general_dilated via nn.Conv
with NWC layout. Gradient checkpointing is nn.remat at the call site rather
than the reference's custom autograd function (ref: mug/model/util.py:105-153).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Zero init for the "zero_module" convention (ref: mug/model/util.py:179-185):
# final convs of residual branches start at zero so each block is identity
# at init.
zeros_init = nn.initializers.zeros


class Normalize(nn.Module):
    """GroupNorm(32) with eps 1e-6 (ref: mug/model/models.py:10-13).

    Group count clamps to a divisor of the channel count so tiny test
    configurations work; live configs always divide evenly.
    """

    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        groups = math.gcd(self.num_groups, x.shape[-1])
        return nn.GroupNorm(
            num_groups=groups, epsilon=1e-6, dtype=jnp.float32
        )(x)


def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embedding [N] -> [N, dim]
    (ref: mug/model/util.py:156-176; cos first, then sin)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


class Upsample(nn.Module):
    """2x nearest upsample + optional 3-conv (ref: mug/model/models.py:55-70)."""

    channels: int
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        # [B, T, C] -> [B, 2T, C]
        x = jnp.repeat(x, 2, axis=1)
        if self.with_conv:
            x = nn.Conv(self.channels, (3,), padding=[(1, 1)])(x)
        return x


class Downsample(nn.Module):
    """2x strided downsample with right-pad (ref: mug/model/models.py:73-91).

    The reference pads (0, 1) then applies a stride-2 width-3 conv with no
    implicit padding, so the first output taps x[-pad..1]; we reproduce the
    same (0, 1) asymmetric padding.
    """

    channels: int
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            return nn.Conv(
                self.channels, (3,), strides=(2,), padding=[(0, 1)]
            )(x)
        return nn.avg_pool(x, (2,), strides=(2,))


class Upsample2D(nn.Module):
    """2x nearest 2-D upsample + conv (ref: mug/model/models.py:15-30).
    Layout [B, T, F, C]."""

    channels: int
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)])(x)
        return x


class Downsample2D(nn.Module):
    """2x strided 2-D downsample with right/bottom pad
    (ref: mug/model/models.py:33-52)."""

    channels: int
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            return nn.Conv(
                self.channels, (3, 3), strides=(2, 2),
                padding=[(0, 1), (0, 1)],
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResnetBlock2D(nn.Module):
    """2-D variant of ResnetBlock (ref: mug/model/models.py:94-159 with
    dims=2), used by the legacy 2-D mel encoder."""

    in_channels: int
    out_channels: Optional[int] = None
    dropout: float = 0.0
    num_groups: int = 32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_ch = self.out_channels or self.in_channels
        h = Normalize(self.num_groups)(x)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=[(1, 1), (1, 1)])(h)
        h = Normalize(self.num_groups)(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(out_ch, (3, 3), padding=[(1, 1), (1, 1)])(h)
        if self.in_channels != out_ch:
            x = nn.Dense(out_ch)(x)
        return x + h


class ResnetBlock(nn.Module):
    """Pre-norm dilated residual block (ref: mug/model/models.py:94-159)."""

    in_channels: int
    out_channels: Optional[int] = None
    dropout: float = 0.0
    num_groups: int = 32
    dilations: Tuple[int, int] = (1, 1)
    conv_shortcut: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_ch = self.out_channels or self.in_channels
        h = Normalize(self.num_groups)(x)
        h = nn.silu(h)
        h = nn.Conv(
            out_ch, (3,),
            kernel_dilation=(self.dilations[0],),
            padding=[(self.dilations[0], self.dilations[0])],
        )(h)
        h = Normalize(self.num_groups)(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(
            out_ch, (3,),
            kernel_dilation=(self.dilations[1],),
            padding=[(self.dilations[1], self.dilations[1])],
        )(h)
        if self.in_channels != out_ch:
            if self.conv_shortcut:
                x = nn.Conv(out_ch, (3,), padding=[(1, 1)])(x)
            else:
                x = nn.Dense(out_ch)(x)  # 1x1 conv == Dense in NWC
        return x + h


class TimestepResBlock(nn.Module):
    """Residual block conditioned on a timestep embedding
    (ref: mug/diffusion/unet.py:121-239).

    With ``use_scale_shift_norm`` the embedding FiLM-modulates the second
    norm; otherwise (the live config) it is added to the hidden state.
    """

    channels: int
    emb_channels: int
    dropout: float = 0.0
    out_channels: Optional[int] = None
    use_conv: bool = False
    use_scale_shift_norm: bool = False

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        out_ch = self.out_channels or self.channels

        h = Normalize()(x)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3,), padding=[(1, 1)])(h)

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch
        )(nn.silu(emb))
        emb_out = emb_out[:, None, :]  # broadcast over T

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = Normalize()(h) * (1 + scale) + shift
            h = nn.silu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = nn.Conv(
                out_ch, (3,), padding=[(1, 1)],
                kernel_init=zeros_init, bias_init=zeros_init,
            )(h)
        else:
            h = h + emb_out
            h = Normalize()(h)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = nn.Conv(
                out_ch, (3,), padding=[(1, 1)],
                kernel_init=zeros_init, bias_init=zeros_init,
            )(h)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = nn.Conv(out_ch, (3,), padding=[(1, 1)])(x)
        else:
            skip = nn.Dense(out_ch)(x)
        return skip + h


class AttnBlock(nn.Module):
    """Single-head full self-attention (legacy VAE block, ref:
    mug/model/models.py:162-210). Kept for config parity; the live VAE
    config does not instantiate it."""

    channels: int

    @nn.compact
    def __call__(self, x):
        h = Normalize()(x)
        q = nn.Dense(self.channels)(h)
        k = nn.Dense(self.channels)(h)
        v = nn.Dense(self.channels)(h)
        scale = self.channels ** -0.5
        w = jnp.einsum("btc,bsc->bts", q, k) * scale
        w = jax.nn.softmax(w, axis=-1)
        h = jnp.einsum("bts,bsc->btc", w, v)
        h = nn.Dense(self.channels)(h)
        return x + h


class FixedPositionalEmbedding(nn.Module):
    """Concatenate fixed sinusoidal features over channels
    (ref: mug/model/models.py:213-223)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        # x: [B, T, C]
        inv_freq = 1.0 / (
            10000 ** (jnp.arange(0, self.dim, 2, dtype=jnp.float32) / self.dim)
        )
        t = jnp.arange(x.shape[1], dtype=jnp.float32)
        sinusoid = t[:, None] * inv_freq[None, :]
        emb = jnp.concatenate([jnp.sin(sinusoid), jnp.cos(sinusoid)], axis=-1)
        emb = jnp.broadcast_to(emb[None], (x.shape[0],) + emb.shape)
        return jnp.concatenate([x, emb], axis=-1)
