"""Fused relative-position self-attention Pallas kernel.

Fuses the whole MuG attention body (ref math: mug/model/attention.py:91-126)
into one VMEM-resident kernel per (batch, head): sim = (q k^T + bias) * scale,
softmax over keys, multiplicative per-distance re-weighting, then attn @ v.
The unfused XLA path materializes the [B, H, L, L] similarity and attention
matrices in HBM; at chart latent lengths (L <= 512) the whole tile fits in
VMEM, so this kernel reads q/k/v plus the two [L, L] distance tables once
and writes only the [L, D] output.

Verified against the jnp module path in tests/test_pallas.py (interpret mode
on CPU; compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_relpos_attention(q, k, v, pos_bias, c_matrix, scale: float,
                           interpret: bool = False):
    """q, k, v: [B, H, L, D]; pos_bias, c_matrix: [H, L, L] -> [B, H, L, D].

    out = (softmax((q k^T + pos_bias) * scale) * c_matrix) @ v
    """
    B, H, L, D = q.shape

    def kernel(q_ref, k_ref, v_ref, bias_ref, c_ref, out_ref):
        qb = q_ref[0, 0]      # [L, D]
        kb = k_ref[0, 0]      # [L, D]
        vb = v_ref[0, 0]      # [L, D]
        bias = bias_ref[0, 0]  # [L, L]
        c = c_ref[0, 0]        # [L, L]

        sim = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, L] = q @ k^T
        sim = (sim + bias) * scale
        sim = sim - jnp.max(sim, axis=-1, keepdims=True)
        p = jnp.exp(sim)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p = p * c
        out_ref[0, 0] = jnp.dot(p, vb, preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, L, L), lambda b, h: (0, h, 0, 0)),
            pl.BlockSpec((1, 1, L, L), lambda b, h: (0, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), jnp.float32),
        interpret=interpret,
    )(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        pos_bias[None].astype(jnp.float32), c_matrix[None].astype(jnp.float32),
    )
    return out
