"""Relative-position cross-attention transformer (flax.linen, [B, T, C]).

Re-design of the reference's attention stack (ref: mug/model/attention.py)
for TPU: the whole block is matmul-shaped for the MXU, the relative-position
bias and the multiplicative ``C_embedding`` matrix are built once per call
from a clamped distance index (distance-stationary, so the block generalizes
to any length), and all heads are kept in one batched einsum rather than the
reference's (b h) reshape.

The two MuG-specific modifications (not in Stable Diffusion) are kept
exactly:
  * a learned additive relative-position bias added to q.k^T *before* the
    1/sqrt(d) scaling (ref: attention.py:113)
  * a learned multiplicative per-distance re-weighting of the *post-softmax*
    attention matrix (``C_embedding``, ones-init, ref: attention.py:122).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mug_diffusion_tpu.models.blocks import Normalize, zeros_init


class GEGLU(nn.Module):
    """Gated GELU projection (ref: mug/model/attention.py:38-45)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim_out * 2)(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate, approximate=False)  # torch F.gelu default is exact erf


class FeedForward(nn.Module):
    """Transformer MLP, GEGLU-gated by default
    (ref: mug/model/attention.py:48-65)."""

    dim: int
    dim_out: Optional[int] = None
    mult: int = 4
    glu: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inner = int(self.dim * self.mult)
        if self.glu:
            x = GEGLU(inner)(x)
        else:
            x = nn.gelu(nn.Dense(inner)(x), approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.dim_out or self.dim)(x)


class CrossAttention(nn.Module):
    """Multi-head attention with clamped relative-position bias and
    multiplicative distance re-weighting (ref: mug/model/attention.py:67-126).
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    position_max_embedding: int = 64

    @nn.compact
    def __call__(self, x, context=None, mask=None, deterministic: bool = True):
        h = self.heads
        inner_dim = self.dim_head * h
        ctx = x if context is None else context

        q = nn.Dense(inner_dim, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner_dim, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner_dim, use_bias=False, name="to_v")(ctx)

        B, Lq, _ = q.shape
        Lk = k.shape[1]
        q = q.reshape(B, Lq, h, self.dim_head)
        k = k.reshape(B, Lk, h, self.dim_head)
        v = v.reshape(B, Lk, h, self.dim_head)

        P = self.position_max_embedding
        rel_pos = self.param(
            "relative_position_embedding", zeros_init, (2 * P + 1, h)
        )
        c_emb = self.param(
            "C_embedding", nn.initializers.ones, (2 * P + 1, h)
        )

        # distance index [Lq, Lk] clamped to +-P (ref: attention.py:101-106).
        # The materialized [Lq, Lk, h] gathers depend only on params + shape
        # and are expensive VPU random access — loop-invariant inside a
        # sampling scan, but XLA won't hoist them, so callers can cache them
        # via `mutable=['s4_kernel']` (shared hoisting collection).
        cached = None
        if self.has_variable("s4_kernel", "relpos"):
            cached = self.get_variable("s4_kernel", "relpos")
            if isinstance(cached, tuple):  # sow's default tuple wrapper
                cached = cached[-1] if cached else None
            if cached is not None and cached.shape[1:3] != (Lq, Lk):
                cached = None
        if cached is None:
            idx = jnp.arange(Lk)[None, :] - jnp.arange(Lq)[:, None]
            idx = jnp.clip(idx, -P, P) + P
            pos_bias = rel_pos[idx]  # [Lq, Lk, h]
            c_matrix = c_emb[idx]  # [Lq, Lk, h]
            if self.is_mutable_collection("s4_kernel"):
                self.sow("s4_kernel", "relpos",
                         jnp.stack([pos_bias, c_matrix]),
                         reduce_fn=lambda prev, new: new)
        else:
            pos_bias, c_matrix = cached[0], cached[1]

        scale = self.dim_head ** -0.5

        # NOTE: a fused Pallas kernel for this body was built, reworked for
        # native bf16, and deleted after losing the serving-shape A/B both
        # times (+65 ms e2e at L=512; docs/PERF.md "Pallas attention") —
        # XLA's fusion of this einsum chain inside the sampler scan beats a
        # custom-call boundary at these sizes.
        sim = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        sim = (sim + pos_bias.transpose(2, 0, 1)[None]) * scale

        if mask is not None:
            big_neg = jnp.finfo(sim.dtype).min
            sim = jnp.where(mask[:, None, None, :], sim, big_neg)

        # softmax in fp32 for bf16 stability, back to compute dtype after
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
        attn = attn.astype(v.dtype)
        attn = attn * c_matrix.transpose(2, 0, 1)[None]

        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(B, Lq, inner_dim)
        out = nn.Dense(self.query_dim, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class BasicTransformerBlock(nn.Module):
    """Pre-LN self-attn + cross-attn + GEGLU FF
    (ref: mug/model/attention.py:129-151)."""

    dim: int
    n_heads: int
    d_head: int
    dropout: float = 0.0
    context_dim: Optional[int] = None
    gated_ff: bool = True

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        x = CrossAttention(
            query_dim=self.dim, heads=self.n_heads, dim_head=self.d_head,
            dropout=self.dropout,
        )(nn.LayerNorm()(x), deterministic=deterministic) + x
        x = CrossAttention(
            query_dim=self.dim, context_dim=self.context_dim,
            heads=self.n_heads, dim_head=self.d_head, dropout=self.dropout,
        )(nn.LayerNorm()(x), context=context, deterministic=deterministic) + x
        x = FeedForward(self.dim, dropout=self.dropout, glu=self.gated_ff)(
            nn.LayerNorm()(x), deterministic=deterministic
        ) + x
        return x


class ContextualTransformer(nn.Module):
    """Project -> transformer blocks -> zero-projected residual
    (ref: mug/model/attention.py:154-199). In channels-last layout the 1x1
    in/out convs are Dense layers."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    dropout: float = 0.0
    context_dim: Optional[int] = None
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        inner_dim = self.n_heads * self.d_head
        x_in = x
        x = Normalize()(x)
        x = nn.Dense(inner_dim)(x)
        block_cls = BasicTransformerBlock
        if self.use_checkpoint:
            block_cls = nn.remat(
                BasicTransformerBlock, static_argnums=(3,)
            )
        for _ in range(self.depth):
            x = block_cls(
                dim=inner_dim, n_heads=self.n_heads, d_head=self.d_head,
                dropout=self.dropout, context_dim=self.context_dim,
            )(x, context, deterministic)
        x = nn.Dense(
            self.in_channels, kernel_init=zeros_init, bias_init=zeros_init
        )(x)
        return x + x_in
