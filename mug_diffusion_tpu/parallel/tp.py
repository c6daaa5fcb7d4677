"""Tensor-parallel parameter layouts over the mesh's ``model`` axis.

GSPMD makes tensor parallelism declarative: these are sharding HINTS on
the weight pytree — XLA partitions the matmuls/convs and inserts the
all-reduces. Two megatron-style column/row pairs cover the model:

- attention/MLP: column-parallel q/k/v projections and the GEGLU
  up-projection (output features sharded — each model-rank computes its
  own heads / hidden slice); row-parallel attention out-projection and
  feed-forward down-projection (input features sharded — XLA inserts the
  psum of partial products).
- residual conv pairs: every ResnetBlock / TimestepResBlock (U-Net, wave
  encoder, VAE — 1-D and 2-D) computes norm→conv→norm→conv; the FIRST
  conv is column-parallel (out channels sharded) and the SECOND
  row-parallel (in channels sharded), one psum per block. The norms,
  timestep-embedding Dense and skip projections between them stay
  replicated: they are elementwise/broadcast against the sharded hidden
  state (or negligible FLOPs), so they cost no collectives. This is
  where the bulk of this conv-heavy model's FLOPs are — attention-only
  TP sharded a minority.

Everything else (standalone in/out convs, S4 kernels, embedders) stays
replicated: correctness is layout-independent under GSPMD, so an
unmatched or non-divisible leaf simply costs replication, never wrong
math (tests/test_parallel.py asserts exact agreement with the pure-DP
step).

The reference has no model parallelism at all (Lightning DP/DDP only,
ref main.py:536-537; its ~50M params fit any single device) — this is
the beyond-reference layout for scaling wider variants over a 2-D
(data, model) mesh.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# ordered: first match wins (GEGLU's inner Dense must not hit the
# FeedForward down-projection rule — its path has GEGLU_* in between,
# which the FeedForward rule's adjacency excludes anyway).
# 'col'/'row' resolve rank-aware at match time: conv kernels are
# (W, in, out) or (H, W, in, out); col shards the last dim, row the
# second-to-last. nn.remat prefixes scope names with 'Checkpoint'
# (e.g. CheckpointResnetBlock_0), hence the loose block-name match.
_RULES = (
    (re.compile(r"\['to_[qkv]'\]\['kernel'\]$"), "col"),
    (re.compile(r"\['to_out'\]\['kernel'\]$"), "row"),
    (re.compile(r"\['GEGLU_\d+'\]\['Dense_\d+'\]\['kernel'\]$"), "col"),
    (re.compile(r"\['GEGLU_\d+'\]\['Dense_\d+'\]\['bias'\]$"), "col_bias"),
    (re.compile(r"\['FeedForward_\d+'\]\['Dense_\d+'\]\['kernel'\]$"),
     "row"),
    (re.compile(
        r"Res(?:net)?Block[^']*_\d+'\]\['Conv_0'\]\['kernel'\]$"), "col"),
    (re.compile(
        r"Res(?:net)?Block[^']*_\d+'\]\['Conv_0'\]\['bias'\]$"),
     "col_bias"),
    (re.compile(
        r"Res(?:net)?Block[^']*_\d+'\]\['Conv_1'\]\['kernel'\]$"), "row"),
)


def _kind_to_spec(kind: str, rank: int) -> P:
    if kind == "col":
        return P(*(None,) * (rank - 1), "model")
    if kind == "row":
        return P(*(None,) * (rank - 2), "model", None)
    if kind == "col_bias":
        return P(*(None,) * (rank - 1), "model")
    raise ValueError(kind)


def tp_spec(path, shape, model_axis_size: int) -> P:
    """PartitionSpec for one weight leaf: the matched megatron rule if
    every sharded dim divides the model axis, else replicated."""
    key = jax.tree_util.keystr(path)
    for rx, kind in _RULES:
        if rx.search(key):
            spec = _kind_to_spec(kind, len(shape))
            ok = all(
                name is None or shape[d] % model_axis_size == 0
                for d, name in enumerate(spec)
            )
            return spec if ok else P()
    return P()


def tp_shardings(params, mesh: Mesh):
    """NamedSharding pytree for ``params`` over ``mesh``'s ``model`` axis
    (pass as jit in/out_shardings, or device_put the weights directly).
    With no ``model`` axis (or size 1) everything is replicated — the
    pure-DP layout."""
    size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)

    def one(path, v):
        spec = tp_spec(path, v.shape, size) if size > 1 else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def tp_param_coverage(params, model_axis_size: int = 2,
                      frozen_prefixes: tuple = ()) -> float:
    """PARAMETER-weighted fraction of matmul/conv kernels the TP rules
    shard: sum(sharded kernel elements)/sum(all kernel elements) over
    rank>=2 'kernel' leaves, skipping ``frozen_prefixes`` subtrees (e.g.
    the frozen VAE, which serving replicates anyway).

    This is a PROXY for FLOP coverage, not the thing itself: actual conv
    FLOPs are kernel elements x output positions, and output length varies
    across U-Net levels (time downsampling), so layers at full sequence
    length are under-weighted here (advisor r4). Exact FLOP weighting
    needs per-layer activation shapes, which params alone don't carry.
    Diagnostic for "how much of the model does TP actually scale".
    """
    total = sharded = 0
    for path, v in jax.tree_util.tree_leaves_with_path(params):
        key = jax.tree_util.keystr(path)
        if "kernel" not in key or v.ndim < 2:
            continue
        if any(p in key for p in frozen_prefixes):
            continue
        n = int(np.prod(v.shape))
        total += n
        if tp_spec(path, v.shape, model_axis_size) != P():
            sharded += n
    return sharded / total if total else 0.0
