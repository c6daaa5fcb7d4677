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
    dcn_slices: Optional[int] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on one ``data`` axis (pure DP). Pass
    ``axes=('data', 'model')`` with an explicit ``shape`` for hybrid
    layouts.

    ``dcn_slices`` builds a MULTI-SLICE mesh: an outer ``replica`` axis
    over the DCN (one row per slice) ahead of the ICI ``axes`` within each
    slice. Batch sharding spans ('replica', *data*) so the gradient
    all-reduce decomposes hierarchically — reduce-scatter/all-gather over
    ICI inside each slice, one small cross-slice sum over DCN (the
    scaling-book data-parallel-over-DCN recipe). On real multi-slice TPU
    the per-slice grouping follows each device's ``slice_index``; on
    single-slice or virtual (CPU) devices it falls back to a deterministic
    enumeration split, which exercises identical shardings/collectives.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dcn_slices is None:
        if shape is None:
            shape = (n,) + (1,) * (len(axes) - 1)
        assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
        return Mesh(np.asarray(devices).reshape(shape), axes)

    assert n % dcn_slices == 0, f"{n} devices over {dcn_slices} slices"
    per_slice = n // dcn_slices
    if shape is None:
        shape = (per_slice,) + (1,) * (len(axes) - 1)
    assert int(np.prod(shape)) == per_slice, (
        f"per-slice mesh shape {shape} != {per_slice} devices"
    )
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if None not in slice_ids:
        # real multi-slice topology: honor the physical slice assignment —
        # and refuse a mismatched dcn_slices rather than silently reshaping
        # devices from different physical slices into one 'replica' row
        # (that would route the per-row reduce over DCN every step,
        # defeating the hierarchical layout this flag promises)
        if len(slice_ids) != dcn_slices:
            raise ValueError(
                f"dcn_slices={dcn_slices} but the devices span "
                f"{len(slice_ids)} physical slices ({sorted(slice_ids)})"
            )
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            (1,) + tuple(shape),
            (dcn_slices,) + (1,) * len(shape),
            devices,
        )
    else:
        # no slice topology (single slice / CPU virtual devices): a
        # deterministic enumeration split exercises identical shardings
        dev_array = np.asarray(devices).reshape((dcn_slices,) + tuple(shape))
    return Mesh(dev_array, ("replica",) + tuple(axes))


# mesh axes a batch's leading dim shards over (outer DCN replica axis
# first when present, then the ICI data axis)
BATCH_AXES = ("replica", "data")


def _batch_axis_names(mesh: Mesh):
    axes = tuple(a for a in mesh.axis_names if a in BATCH_AXES)
    return axes if axes else ("data",)


def batch_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis — and, on a multi-slice
    mesh, over ('replica', 'data') jointly."""
    if axis is None:
        axis = _batch_axis_names(mesh)
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, axis=None) -> Dict:
    """Place a host batch onto the mesh, sharded over the batch dim.

    Works both single-process (device_put) and multi-process
    (make_array_from_process_local_data) — the JAX equivalent of
    per-rank DataLoader shards under DDP.
    """
    sharding = batch_sharding(mesh, axis)  # multi-slice aware default

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
