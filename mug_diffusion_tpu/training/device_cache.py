"""Device-resident audio-conditioning cache for training.

The audio mel is by far the largest tensor in a training batch (a batch-48
fp16 mel batch is ~400 MB; ref mug/util.py:143 caches the same mel on the
HOST as fp16 npz). On TPU the HBM is large enough that for small/medium
datasets every chart's mel can stay resident ON DEVICE after its first
upload — later epochs assemble the batch with an on-device ``jnp.stack``
of cached rows instead of re-streaming hundreds of MB over PCIe (or the
axon tunnel, where the upload dominates the whole step). The reference has
no equivalent: its DataLoader re-ships the host npz cache to the GPU every
epoch (ref mug/data/dataset.py:214-258 -> lightning DDP H2D per step).

Correctness contract: a row is cacheable only under a deterministic key —
``dataset.load_item`` emits ``audio_key = f"{path}|r{rate}|b{bucket}"``
when no RANDOM audio augmentation fired (freq-mask / pitch-shift), and
``None`` otherwise. ``None`` rows bypass the cache (fresh upload), so
enabling the cache never changes the training distribution; it only
deduplicates uploads of byte-identical rows. Eviction is LRU under a
byte budget so arbitrarily large datasets degrade to streaming, never OOM.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class DeviceAudioCache:
    """LRU device cache of per-chart audio rows, keyed by the dataset's
    deterministic ``audio_key``.

    Single-process only (multi-process SPMD shards the batch per rank with
    ``make_array_from_process_local_data``; a per-host device cache would
    need rank-local keying — the trainer disables the cache there).
    """

    def __init__(self, max_bytes: int = 4 << 30):
        self.max_bytes = int(max_bytes)
        self._rows: OrderedDict[str, jax.Array] = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def clear(self):
        """Drop every cached row (frees its HBM). Used as OOM relief: the
        trainer clears the cache and retries when a checkpoint readback
        hits RESOURCE_EXHAUSTED — rows refill lazily on later batches, so
        the only cost is re-uploading; correctness is unaffected."""
        self._rows.clear()
        self._bytes = 0

    def _put(self, key: str, row: jax.Array):
        nbytes = int(row.size) * row.dtype.itemsize
        if nbytes > self.max_bytes:
            return
        # replacing an existing key (shape/dtype-guard re-upload path) must
        # release the old entry's bytes first or the account leaks upward
        # and evicts prematurely (advisor r4)
        old = self._rows.pop(key, None)
        if old is not None:
            self._bytes -= int(old.size) * old.dtype.itemsize
        while self._bytes + nbytes > self.max_bytes and self._rows:
            _, old = self._rows.popitem(last=False)
            self._bytes -= int(old.size) * old.dtype.itemsize
        self._rows[key] = row
        self._bytes += nbytes

    def batch(
        self,
        audio: np.ndarray,
        keys: Sequence[Optional[str]],
        sharding,
    ) -> jax.Array:
        """Assemble the device batch for ``audio`` [B, T, C]: cached rows
        are reused on device, uncached/uncacheable rows are uploaded (and
        cached when their key is deterministic)."""
        rows = []
        for i, key in enumerate(keys):
            row = None
            if key is not None:
                row = self._rows.get(key)
                # a key collision across bucket lengths can't happen (the
                # bucket is part of the key), but guard shape/dtype anyway
                if row is not None and (
                    row.shape != audio[i].shape or row.dtype != audio[i].dtype
                ):
                    row = None
            if row is None:
                self.misses += 1
                row = jax.device_put(jnp.asarray(audio[i]))
                if key is not None:
                    self._put(key, row)
            else:
                self.hits += 1
                self._rows.move_to_end(key)
            rows.append(row)
        # stack executes on device (no host round-trip); the final
        # device_put relays out onto the mesh's batch sharding
        return jax.device_put(jnp.stack(rows), sharding)
