"""Audio (mel spectrogram) encoders.

Flax re-design of ref: mug/cond/wave.py. The live model is
``MelspectrogramScaleEncoder1D``: a Conv stem over the 128-mel input plus 10
progressively downsampled levels of dilated ResnetBlocks with
relative-position self-attention at time-downsample factors 128/256/512,
returning the **list of all 10 multi-scale feature maps** — the U-Net
concatenates the last four scales into its levels (skip-injection
conditioning). Channels-last [B, T, C].
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mug_diffusion_tpu.models.attention import ContextualTransformer
from mug_diffusion_tpu.models.blocks import (
    Downsample,
    Normalize,
    ResnetBlock,
    Upsample,
)
from mug_diffusion_tpu.models.s4 import S4BidirectionalLayer


class MelspectrogramScaleEncoder1D(nn.Module):
    """Multi-scale mel encoder (ref: mug/cond/wave.py:398-464).

    Live config: n_freq=128, middle_channels=128,
    channel_mult=[1,1,1,1,2,2,2,4,4,4], num_res_blocks=2,
    attention_resolutions=[128,256,512], num_heads=8, num_groups=32.
    Input [B, T=32768, 128] -> list of 10 features, scale i has shape
    [B, T/2^i, 128*mult_i].
    """

    n_freq: int
    middle_channels: int
    channel_mult: Sequence[int]
    num_res_blocks: int
    attention_resolutions: Sequence[int] = ()
    num_heads: int = 8
    num_groups: int = 32
    dropout: float = 0.0
    use_checkpoint: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        num_resolutions = len(self.channel_mult)
        inchannel_mult = (1,) + tuple(self.channel_mult)

        h = nn.Conv(self.middle_channels, (3,), padding=[(1, 1)])(x)
        hs: List[jnp.ndarray] = []
        ds = 1
        res_cls = ResnetBlock
        if self.use_checkpoint:
            res_cls = nn.remat(ResnetBlock, static_argnums=(2,))
        for i_level in range(num_resolutions):
            block_in = self.middle_channels * inchannel_mult[i_level]
            block_out = self.middle_channels * self.channel_mult[i_level]
            if i_level != 0:
                h = Downsample(block_in, True)(h)
                ds *= 2
            for i_block in range(self.num_res_blocks):
                h = res_cls(
                    in_channels=block_in,
                    out_channels=block_out,
                    dropout=self.dropout,
                    num_groups=self.num_groups,
                    dilations=(1, 2) if i_block % 2 == 0 else (4, 8),
                )(h, deterministic)
                if ds in self.attention_resolutions:
                    h = ContextualTransformer(
                        in_channels=block_out,
                        n_heads=self.num_heads,
                        d_head=block_out // self.num_heads,
                        depth=1,
                        dropout=self.dropout,
                        use_checkpoint=self.use_checkpoint,
                    )(h, deterministic=deterministic)
                block_in = block_out
            hs.append(h)
        return hs


class MelspectrogramEncoder(nn.Module):
    """Legacy 2-D mel encoder (ref: mug/cond/wave.py:129-228): 2-D conv
    pyramid over (time, freq), frequency folded into channels at the bottom,
    then 1-D refinement. Layout [B, T, F] -> [B, T', out_channels]."""

    n_freq: int
    middle_channels: int
    out_channels: int
    channel_mult: Sequence[int]
    num_res_blocks: int
    use_checkpoint: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from mug_diffusion_tpu.models.blocks import (
            Downsample2D,
            ResnetBlock2D,
        )

        num_resolutions = len(self.channel_mult)
        inchannel_mult = (1,) + tuple(self.channel_mult)

        h = x[..., None]  # [B, T, F, 1]
        h = nn.Conv(self.middle_channels, (3, 3), padding=[(1, 1), (1, 1)])(h)
        n_freq = self.n_freq
        for i_level in range(num_resolutions):
            block_in = self.middle_channels * inchannel_mult[i_level]
            block_out = self.middle_channels * self.channel_mult[i_level]
            for _ in range(self.num_res_blocks):
                h = ResnetBlock2D(
                    in_channels=block_in, out_channels=block_out,
                    num_groups=8,
                )(h, deterministic=deterministic)
                block_in = block_out
            if i_level != num_resolutions - 1:
                h = Downsample2D(block_in, True)(h)
                n_freq //= 2

        # fold frequency into channels: [B, T', F', C] -> [B, T', F'*C]
        B, T = h.shape[0], h.shape[1]
        h = h.reshape(B, T, -1)

        h = ResnetBlock(
            in_channels=h.shape[-1], out_channels=self.middle_channels,
            num_groups=16,
        )(h, deterministic=deterministic)
        h = ResnetBlock(
            in_channels=self.middle_channels,
            out_channels=self.middle_channels, num_groups=8,
        )(h, deterministic=deterministic)

        h = Normalize(8)(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3,), padding=[(1, 1)])(h)


class MelspectrogramEncoder1D(nn.Module):
    """Single-output 1-D mel encoder (legacy alt, ref: wave.py:231-319)."""

    n_freq: int
    middle_channels: int
    out_channels: int
    channel_mult: Sequence[int]
    num_res_blocks: int
    num_groups: int = 32
    use_checkpoint: bool = True

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

        h = ResnetBlock(
            in_channels=block_in, out_channels=self.middle_channels,
            num_groups=self.num_groups,
        )(h, deterministic=deterministic)
        h = ResnetBlock(
            in_channels=self.middle_channels, out_channels=self.middle_channels,
            num_groups=self.num_groups,
        )(h, deterministic=deterministic)

        h = Normalize(self.num_groups)(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3,), padding=[(1, 1)])(h)


class STFTEncoder(nn.Module):
    """Legacy STFT-input encoder (ref: wave.py:9-117): a strided 2-D stem
    folds the frequency axis into channels, then 1-D dilated resblocks."""

    n_fft: int
    middle_channels: int
    out_channels: int
    channel_mult: Sequence[int]
    num_res_blocks: int
    freq_stride: int = 32
    num_groups: int = 8
    use_checkpoint: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: [B, T, F, 2] (real/imag last) -> drop Nyquist bin
        x = x[:, :, : self.n_fft // 2, :]
        # strided conv over frequency: treat as 2D conv [B, T, F, 2]
        h = nn.Conv(
            self.n_fft // 2 // self.freq_stride,
            (1, self.freq_stride * 2),
            strides=(1, self.freq_stride),
            padding=[(0, 0), (self.freq_stride // 2, self.freq_stride // 2)],
        )(x)
        # fold freq into channels -> [B, T, C]
        B, T = h.shape[0], h.shape[1]
        h = h.reshape(B, T, -1)

        num_resolutions = len(self.channel_mult)
        inchannel_mult = (1,) + tuple(self.channel_mult)
        for i_level in range(num_resolutions):
            block_in = (
                self.middle_channels * inchannel_mult[i_level]
                if i_level != 0 else self.n_fft // 2
            )
            block_out = self.middle_channels * self.channel_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    in_channels=block_in, out_channels=block_out,
                    num_groups=self.num_groups,
                    dilations=(1, 2) if i_block % 2 == 0 else (4, 8),
                )(h, deterministic=deterministic)
                block_in = block_out
            if i_level != num_resolutions - 1:
                h = Downsample(block_in, True)(h)

        h = ResnetBlock(
            in_channels=block_in, out_channels=self.middle_channels,
            num_groups=self.num_groups,
        )(h, deterministic=deterministic)
        h = ContextualTransformer(
            in_channels=self.middle_channels, n_heads=8,
            d_head=self.middle_channels // 8,
        )(h, deterministic=deterministic)
        h = ResnetBlock(
            in_channels=self.middle_channels, out_channels=self.middle_channels,
            num_groups=self.num_groups,
        )(h, deterministic=deterministic)

        h = Normalize(self.num_groups)(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3,), padding=[(1, 1)])(h)


class TimingDecoder(nn.Module):
    """S4-bidirectional upsampling decoder (ref: wave.py:336-396; unused in
    the live path, kept for capability parity)."""

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
        for i_level in reversed(range(num_resolutions)):
            block_out = self.middle_channels * self.channel_mult[i_level]
            for _ in range(self.num_res_blocks):
                h = ResnetBlock(
                    in_channels=block_in, out_channels=block_out,
                    num_groups=self.num_groups,
                )(h, deterministic=deterministic)
                h = S4BidirectionalLayer(block_out)(h, deterministic)
                block_in = block_out
            if i_level != 0:
                h = Upsample(block_in, True)(h)

        h = Normalize(self.num_groups)(h)
        h = nn.silu(h)
        return nn.Conv(self.x_channels, (3,), padding=[(1, 1)])(h)
