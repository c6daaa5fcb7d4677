"""Pallas Cauchy-resolvent kernel for the S4 NPLR generating function.

Computes r[..., l] = sum_n v[..., n] / (z[l] - w[..., n]) over the state
dimension — the inner loop of the S4 kernel evaluation (the reference used
an optional CUDA extension for this, ref mug/model/s4.py:33-42; its shipped
fallback is a naive torch broadcast). Complex arithmetic is carried as
separate real/imaginary planes since the TPU vector unit is real-valued:

  1/(z - w) = conj(z - w) / |z - w|^2

One grid step per H-channel block; the [N, L] broadcast lives entirely in
VMEM (N = 32 states, L <= 513 nodes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@functools.partial(jax.jit, static_argnames=("interpret",))
def cauchy_pallas(v, z, w, interpret: bool = False):
    """v: [K, H, N] complex64; z: [L] complex64; w: [H, N] complex64
    -> [K, H, L] complex64, r = sum_n v/(z - w).

    K carries the stacked (B|P) x (C|Q) combinations of the NPLR kernel.
    """
    K, H, N = v.shape
    L = z.shape[0]

    v_re = jnp.real(v).astype(jnp.float32)
    v_im = jnp.imag(v).astype(jnp.float32)
    w_re = jnp.real(w).astype(jnp.float32)
    w_im = jnp.imag(w).astype(jnp.float32)
    # broadcast z to 2-D rows for TPU-friendly layout
    z_re = jnp.real(z).astype(jnp.float32)[None, :]  # [1, L]
    z_im = jnp.imag(z).astype(jnp.float32)[None, :]

    def kernel(vre_ref, vim_ref, wre_ref, wim_ref, zre_ref, zim_ref,
               out_re_ref, out_im_ref):
        wre = wre_ref[0]  # [N]
        wim = wim_ref[0]
        zre = zre_ref[0]  # [L]
        zim = zim_ref[0]

        # denom[n, l] = (z_l - w_n); reciprocal via conj/|.|^2
        dre = zre[None, :] - wre[:, None]  # [N, L]
        dim = zim[None, :] - wim[:, None]
        inv_mag = 1.0 / (dre * dre + dim * dim)
        rre = dre * inv_mag
        rim = -dim * inv_mag

        for kk in range(K):  # K is small (2x2 stacked combos)
            vre = vre_ref[kk, 0]  # [N]
            vim = vim_ref[kk, 0]
            # v * recip, summed over n
            pre = vre[:, None] * rre - vim[:, None] * rim
            pim = vre[:, None] * rim + vim[:, None] * rre
            out_re_ref[kk, 0] = jnp.sum(pre, axis=0)
            out_im_ref[kk, 0] = jnp.sum(pim, axis=0)

    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(H,),
        in_specs=[
            pl.BlockSpec((K, 1, N), lambda h: (0, h, 0)),
            pl.BlockSpec((K, 1, N), lambda h: (0, h, 0)),
            pl.BlockSpec((1, N), lambda h: (h, 0)),
            pl.BlockSpec((1, N), lambda h: (h, 0)),
            pl.BlockSpec((1, L), lambda h: (0, 0)),
            pl.BlockSpec((1, L), lambda h: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((K, 1, L), lambda h: (0, h, 0)),
            pl.BlockSpec((K, 1, L), lambda h: (0, h, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, H, L), jnp.float32),
            jax.ShapeDtypeStruct((K, H, L), jnp.float32),
        ],
        interpret=interpret,
    )(v_re, v_im, w_re, w_im, z_re, z_im)
    return (out_re + 1j * out_im).astype(jnp.complex64)
