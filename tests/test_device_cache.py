"""Device-resident audio cache (training/device_cache.py): dedupes the
per-epoch mel H2D upload. Correctness bar: enabling the cache must produce
BITWISE the same device batches as plain shard_batch, for cacheable,
uncacheable (key=None) and padded rows alike."""

import numpy as np
import pytest

import jax

from mug_diffusion_tpu.parallel.mesh import batch_sharding, create_mesh
from mug_diffusion_tpu.training.device_cache import DeviceAudioCache


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(n_devices=2)


def _audio(b, t=16, c=8, seed=0):
    return np.random.default_rng(seed).normal(size=(b, t, c)).astype(
        np.float16
    )


def test_cache_returns_identical_batches(mesh):
    cache = DeviceAudioCache()
    audio = _audio(4)
    keys = ["a", "b", None, "d"]
    sh = batch_sharding(mesh)

    out1 = np.asarray(cache.batch(audio, keys, sh))
    assert cache.hits == 0 and cache.misses == 4
    np.testing.assert_array_equal(out1, audio)

    # same rows again: cacheable rows hit, the None row re-uploads
    out2 = np.asarray(cache.batch(audio, keys, sh))
    assert cache.hits == 3 and cache.misses == 5
    np.testing.assert_array_equal(out2, audio)

    # a reordered batch gathers the right rows
    perm = [3, 0, 1, 2]
    out3 = np.asarray(
        cache.batch(audio[perm], [keys[i] for i in perm], sh)
    )
    np.testing.assert_array_equal(out3, audio[perm])


def test_cache_never_serves_stale_shapes(mesh):
    """A key re-seen at a different bucket length must re-upload, not
    serve the stale row (the bucket is in the key upstream, but the cache
    guards shape anyway)."""
    cache = DeviceAudioCache()
    sh = batch_sharding(mesh)
    cache.batch(_audio(2, t=16), ["a", "b"], sh)
    long = _audio(2, t=32, seed=1)
    out = np.asarray(cache.batch(long, ["a", "b"], sh))
    np.testing.assert_array_equal(out, long)
    assert cache.misses == 4


def test_lru_eviction_bounds_memory(mesh):
    row_bytes = 16 * 8 * 2
    cache = DeviceAudioCache(max_bytes=2 * row_bytes)
    sh = batch_sharding(mesh)
    audio = _audio(2)
    cache.batch(audio, ["a", "b"], sh)
    assert set(cache._rows) == {"a", "b"}
    # touching 'a' then inserting 'c' must evict 'b' (LRU), and the
    # byte account must stay within budget (batches sized to the mesh —
    # the trainer always pads to a device multiple before the cache)
    cache.batch(audio[[0, 0]], ["a", "a"], sh)
    cache.batch(_audio(2, seed=2), ["c", "c"], sh)
    assert set(cache._rows) == {"a", "c"}
    assert cache._bytes <= cache.max_bytes

    # a row larger than the whole budget is served but never stored
    big = DeviceAudioCache(max_bytes=row_bytes // 2)
    out = np.asarray(big.batch(audio[:2], ["huge", "huge2"], sh))
    np.testing.assert_array_equal(out, audio[:2])
    assert not big._rows


def test_trainer_device_batch_with_cache(mesh):
    """Trainer._device_batch with the cache on matches shard_batch exactly,
    including the uneven-batch pad-cycling path."""
    from mug_diffusion_tpu.parallel.mesh import shard_batch
    from mug_diffusion_tpu.training.trainer import Trainer

    trainer = Trainer.__new__(Trainer)  # no heavyweight setup needed
    trainer.mesh = mesh
    trainer._audio_cache = DeviceAudioCache()

    audio = _audio(3)
    batch = {
        "audio": audio,
        "note": np.ones((3, 4, 2), np.float32),
        "audio_key": ["a", None, "c"],
        "meta": [{}, {}, {}],
    }
    dev = trainer._device_batch(batch)
    # 3 rows pad-cycle to 4 on the 2-device mesh
    ref = shard_batch(
        {"audio": audio[[0, 1, 2, 0]],
         "note": np.ones((4, 4, 2), np.float32)},
        mesh,
    )
    np.testing.assert_array_equal(np.asarray(dev["audio"]),
                                  np.asarray(ref["audio"]))
    np.testing.assert_array_equal(np.asarray(dev["note"]),
                                  np.asarray(ref["note"]))
    assert dev["audio"].sharding.is_equivalent_to(
        ref["audio"].sharding, dev["audio"].ndim
    )

    # the cycled pad row already hit row 0's fresh entry in call one;
    # the second epoch hits a, c and the cycled a again
    trainer._device_batch(batch)
    assert trainer._audio_cache.hits == 4
    assert trainer._audio_cache.misses == 4  # a, None, c + None again
