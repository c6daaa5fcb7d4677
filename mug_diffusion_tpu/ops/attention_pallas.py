"""Fused relative-position self-attention Pallas kernel.

Fuses the whole MuG attention body (ref math: mug/model/attention.py:91-126)
into one VMEM-resident kernel per (batch, head): sim = (q k^T + bias) * scale,
softmax over keys, multiplicative per-distance re-weighting, then attn @ v.
The unfused XLA path materializes the [B, H, L, L] similarity and attention
matrices in HBM; at chart latent lengths (L <= 512) the whole tile fits in
VMEM, so this kernel reads q/k/v plus the two [L, L] distance tables once
and writes only the [L, D] output.

dtype policy (round-4 rework): inputs stay in their native dtype all the way
into VMEM — under the bf16 compute policy q/k/v arrive and are dotted as
bf16 with fp32 MXU accumulation (`preferred_element_type`), the softmax and
distance tables run in fp32 in-register, and the output is written back in
the input dtype. The previous version cast everything to fp32 *outside* the
kernel, which materialized fp32 copies of q/k/v and both [L, L] tables in
HBM per step and made the kernel a net loss under bf16 (+56 ms at serving
shapes, docs/PERF.md round-2 A/B).

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

    Inputs are consumed in their native dtypes (bf16 under the compute
    policy); accumulation and softmax run in fp32 in-register; the output
    dtype matches q.
    """
    B, H, L, D = q.shape
    out_dtype = q.dtype

    def kernel(q_ref, k_ref, v_ref, bias_ref, c_ref, out_ref):
        qb = q_ref[0, 0]      # [L, D], native dtype
        kb = k_ref[0, 0]      # [L, D]
        vb = v_ref[0, 0]      # [L, D]
        bias = bias_ref[0, 0].astype(jnp.float32)  # [L, L], upcast in VMEM
        c = c_ref[0, 0].astype(jnp.float32)        # [L, L]

        sim = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, L] = q @ k^T, fp32 accumulation on the MXU
        sim = (sim + bias) * scale
        sim = sim - jnp.max(sim, axis=-1, keepdims=True)
        p = jnp.exp(sim)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p = (p * c).astype(vb.dtype)  # second dot in the input dtype
        out_ref[0, 0] = jnp.dot(
            p, vb, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)

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
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), out_dtype),
        interpret=interpret,
    )(q, k, v, pos_bias[None], c_matrix[None])
    return out
