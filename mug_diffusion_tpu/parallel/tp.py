"""Tensor-parallel parameter layouts over the mesh's ``model`` axis.

GSPMD makes tensor parallelism declarative: these are sharding HINTS on
the weight pytree — XLA partitions the matmuls and inserts the
all-reduces. The layout is the megatron attention/MLP pattern:

- column-parallel q/k/v projections and the GEGLU up-projection
  (output features sharded — each model-rank computes its own heads /
  hidden slice),
- row-parallel attention out-projection and feed-forward down-projection
  (input features sharded — XLA inserts the psum of partial products).

Everything else (convs, norms, S4 kernels, embedders, the frozen VAE)
stays replicated: correctness is layout-independent under GSPMD, so an
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# ordered: first match wins (GEGLU's inner Dense must not hit the
# FeedForward down-projection rule — its path has GEGLU_* in between,
# which the FeedForward rule's adjacency excludes anyway)
_RULES = (
    (re.compile(r"\['to_[qkv]'\]\['kernel'\]$"), P(None, "model")),
    (re.compile(r"\['to_out'\]\['kernel'\]$"), P("model", None)),
    (re.compile(r"\['GEGLU_\d+'\]\['Dense_\d+'\]\['kernel'\]$"),
     P(None, "model")),
    (re.compile(r"\['GEGLU_\d+'\]\['Dense_\d+'\]\['bias'\]$"), P("model")),
    (re.compile(r"\['FeedForward_\d+'\]\['Dense_\d+'\]\['kernel'\]$"),
     P("model", None)),
)


def tp_spec(path, shape, model_axis_size: int) -> P:
    """PartitionSpec for one weight leaf: the matched megatron rule if
    every sharded dim divides the model axis, else replicated."""
    key = jax.tree_util.keystr(path)
    for rx, spec in _RULES:
        if rx.search(key):
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
