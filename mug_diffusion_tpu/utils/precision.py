"""Mixed-precision policy: fp32 master params, bfloat16 compute.

TPU MXU peak for bf16 is ~2x fp32; the hot path (U-Net convolutions and
attention inside the DDIM scan, the wave-encoder pyramid, the VAE decoder)
runs in bf16 by casting the parameter tree at trace time — XLA hoists the
cast out of the sampling scan so it happens once per call, not per step.

Numerically sensitive islands stay fp32:
  * S4/SSM kernels (complex resolvent math, FFT conv) — every parameter
    under an ``S4*`` module scope is excluded from the cast, and the S4
    layers cast their residual back to the caller's dtype;
  * normalization statistics (flax computes mean/var in fp32 natively);
  * attention softmax (models/attention.py upcasts scores to fp32);
  * the DDIM update equations and CFG combine (diffusion/ddim.py keeps x
    in fp32, only the U-Net evaluation runs bf16).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# module-scope name prefixes whose parameters must stay fp32
_EXCLUDE_SCOPE_PREFIXES = ("S4",)


def _path_excluded(path) -> bool:
    for p in path:
        key = getattr(p, "key", None)
        if isinstance(key, str) and key.startswith(_EXCLUDE_SCOPE_PREFIXES):
            return True
    return False


def cast_floating(tree: Any, dtype=jnp.bfloat16) -> Any:
    """Cast float32 leaves to ``dtype``, leaving complex/int leaves and any
    parameter under an S4 module scope untouched."""

    def cast(path, x):
        if _path_excluded(path):
            return x
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map_with_path(cast, tree)


def resolve_dtype(name) -> Any:
    if name in (None, "float32", "fp32", jnp.float32):
        return jnp.float32
    if name in ("bfloat16", "bf16", jnp.bfloat16):
        return jnp.bfloat16
    raise ValueError(f"unknown compute dtype {name!r}")
