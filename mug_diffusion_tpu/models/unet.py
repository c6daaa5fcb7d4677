"""Denoising 1-D U-Net with audio skip-injection, cross-attention and S4.

Flax re-design of ref: mug/diffusion/unet.py UNetModel. Channels-last
[B, T, C]; the live topology (configs/mug/mug_diffusion.yaml:28-44):

  in 16 -> model 128, channel_mult [1,2,3,4], 2 res blocks/level,
  rel-pos attention at time-downsample 2/4/8, S4 layers on, heads 8,
  prompt context dim 128, audio_channels [256,512,512,512].

Audio conditioning: the wave encoder's last four scales (time lengths
matching the latent at each U-Net level) are channel-concatenated at the
start of each level on the way down (shallowest-first) and again on the way
up (deepest-first) (ref: unet.py:352-354, 438-440, 527-546).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mug_diffusion_tpu.models.attention import ContextualTransformer
from mug_diffusion_tpu.models.blocks import (
    Downsample,
    Normalize,
    TimestepResBlock,
    Upsample,
    timestep_embedding,
    zeros_init,
)
from mug_diffusion_tpu.models.s4 import S4Layer


class LSTMLayer(nn.Module):
    """Zero-init residual LSTM (ref: unet.py:53-74). Off in the live config
    (lstm_layer: false); implemented as a lax.scan-backed OptimizedLSTMCell
    for config parity."""

    model_channels: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = Normalize()(x)
        h = nn.silu(h)
        cell = nn.OptimizedLSTMCell(
            self.model_channels,
            kernel_init=zeros_init,
            recurrent_kernel_init=zeros_init,
            bias_init=zeros_init,
        )
        rnn = nn.RNN(cell)
        h = rnn(h)
        return x + h


class UNetModel(nn.Module):
    """ref: mug/diffusion/unet.py:262-550."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    audio_channels: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    use_checkpoint: bool = False
    num_heads: int = -1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    lstm_last: bool = False
    lstm_layer: bool = False
    s4_layer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None

    def _heads(self, ch):
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels

    @nn.compact
    def __call__(self, x, timesteps, context, audios, deterministic: bool = True):
        """
        x: [B, T, C_in] noisy latent; timesteps: [B]; context: [B, F, Cc];
        audios: list of len(channel_mult) feature maps, audios[k] has time
        length T / 2^k (shallowest first).
        """
        assert len(audios) == len(self.channel_mult), (
            f"need {len(self.channel_mult)} audio scales, got {len(audios)}"
        )

        res_cls = TimestepResBlock
        if self.use_checkpoint:
            res_cls = nn.remat(TimestepResBlock, static_argnums=(3,))

        def make_res(ch_in, ch_out):
            return res_cls(
                channels=ch_in,
                emb_channels=time_embed_dim,
                dropout=self.dropout,
                out_channels=ch_out,
                use_scale_shift_norm=self.use_scale_shift_norm,
            )

        def make_attn(ch):
            heads, dim_head = self._heads(ch)
            return ContextualTransformer(
                in_channels=ch,
                n_heads=heads,
                d_head=dim_head,
                depth=self.transformer_depth,
                dropout=self.dropout,
                context_dim=self.context_dim,
                use_checkpoint=self.use_checkpoint,
            )

        time_embed_dim = self.model_channels * 4
        if timesteps.ndim == 2:
            timesteps = timesteps[:, 0]
        t_emb = timestep_embedding(timesteps, self.model_channels)
        # keep the embedding in the compute dtype: a fp32 emb would type-
        # promote every FiLM resblock back to fp32 under the bf16 policy
        emb = nn.Dense(time_embed_dim)(t_emb.astype(x.dtype))
        emb = nn.Dense(time_embed_dim)(nn.silu(emb))
        emb = emb.astype(x.dtype)

        h = nn.Conv(self.model_channels, (3,), padding=[(1, 1)])(x)
        hs = [h]
        ch = self.model_channels
        ds = 1

        # ---- input (down) path --------------------------------------
        for level, mult in enumerate(self.channel_mult):
            # audio skip-injection: shallowest-first (= audios[level])
            h = jnp.concatenate([h, audios[level]], axis=-1)
            ch += self.audio_channels[level]
            for level_res in range(self.num_res_blocks):
                h = make_res(ch, mult * self.model_channels)(
                    h, emb, deterministic
                )
                ch = mult * self.model_channels
                if ds in self.attention_resolutions:
                    h = make_attn(ch)(h, context, deterministic=deterministic)
                if self.lstm_layer and level_res == 0:
                    h = LSTMLayer(ch)(h, deterministic)
                if self.s4_layer:
                    h = S4Layer(ch)(h, deterministic)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = Downsample(ch, self.conv_resample)(h)
                hs.append(h)
                ds *= 2

        # ---- middle --------------------------------------------------
        h = make_res(ch, None)(h, emb, deterministic)
        h = make_attn(ch)(h, context, deterministic=deterministic)
        h = make_res(ch, None)(h, emb, deterministic)

        # ---- output (up) path ----------------------------------------
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            # audio skip-injection: deepest-first (= audios[level] again,
            # since we are walking levels in reverse)
            h = jnp.concatenate([h, audios[level]], axis=-1)
            ch += self.audio_channels[level]
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = make_res(ch + skip.shape[-1], self.model_channels * mult)(
                    h, emb, deterministic
                )
                ch = self.model_channels * mult
                if ds in self.attention_resolutions:
                    h = make_attn(ch)(h, context, deterministic=deterministic)
                if self.lstm_layer and i == 0:
                    h = LSTMLayer(ch)(h, deterministic)
                if self.s4_layer and i != self.num_res_blocks:
                    h = S4Layer(ch)(h, deterministic)
                if level and i == self.num_res_blocks:
                    h = Upsample(ch, self.conv_resample)(h)
                    ds //= 2
        assert not hs

        h = Normalize()(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3,), padding=[(1, 1)],
            kernel_init=zeros_init, bias_init=zeros_init,
        )(h)
        return h
