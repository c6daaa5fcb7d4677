"""Device mesh + sharding rules.

Replaces the reference's NCCL data parallelism (torch Lightning DP/DDP, ref:
main.py:536-537, configs *.yaml ``accelerator: dp``) with a
``jax.sharding.Mesh``: the batch axis is sharded over the ``data`` ICI axis,
parameters are replicated, and XLA inserts the gradient all-reduce (psum)
automatically when the jitted train step consumes data-sharded inputs and
produces replicated parameter updates — the SPMD equivalent of Lightning's
DDP all-reduce at ref main.py:423-424.

A second ``model`` axis is provisioned for future tensor-parallel layouts;
the reference never shards the model (tens of millions of params), so the
default layout is pure DP — matching its capability with ICI-native
collectives instead of NCCL.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on one ``data`` axis (pure DP). Pass
    ``axes=('data', 'model')`` with an explicit ``shape`` for hybrid
    layouts.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Place a host batch onto the mesh, sharded over the batch dim.

    Works both single-process (device_put) and multi-process
    (make_array_from_process_local_data) — the JAX equivalent of
    per-rank DataLoader shards under DDP.
    """
    sharding = batch_sharding(mesh, axis)

    def put(x):
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def pad_batch_to_multiple(batch: Dict, multiple: int) -> Dict:
    """Pad the leading batch dim up to a device-count multiple so uneven
    final batches still shard."""

    def pad(x):
        b = x.shape[0]
        rem = (-b) % multiple
        if rem == 0:
            return x
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width)

    return jax.tree_util.tree_map(pad, batch)
