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


def test_clear_releases_rows_and_bytes(mesh):
    cache = DeviceAudioCache()
    sh = batch_sharding(mesh)
    audio = _audio(2)
    cache.batch(audio, ["a", "b"], sh)
    assert cache._rows and cache._bytes > 0
    cache.clear()
    assert not cache._rows and cache._bytes == 0
    # the cache refills lazily and still serves byte-identical batches
    out = np.asarray(cache.batch(audio, ["a", "b"], sh))
    np.testing.assert_array_equal(out, audio)
    assert cache.misses == 4


def test_checkpoint_readback_oom_relief(mesh, monkeypatch):
    """A RESOURCE_EXHAUSTED readback (observed on v5e when the audio cache
    pins HBM to its budget) must clear the cache and retry, not kill the
    run; any other error propagates untouched."""
    from mug_diffusion_tpu.training.trainer import Trainer

    trainer = Trainer.__new__(Trainer)
    trainer._audio_cache = DeviceAudioCache()
    sh = batch_sharding(mesh)
    trainer._audio_cache.batch(_audio(2), ["a", "b"], sh)

    calls = {"n": 0}
    real_get = jax.device_get

    def flaky_get(tree):
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."
            )
        return real_get(tree)

    monkeypatch.setattr(jax, "device_get", flaky_get)
    out = trainer._device_get_relieved({"w": np.arange(3)})
    np.testing.assert_array_equal(out["w"], np.arange(3))
    assert calls["n"] == 2
    assert not trainer._audio_cache._rows  # relief actually dropped rows

    # a non-OOM JaxRuntimeError is not swallowed
    def bad_get(tree):
        raise jax.errors.JaxRuntimeError("INTERNAL: something else")

    monkeypatch.setattr(jax, "device_get", bad_get)
    with pytest.raises(jax.errors.JaxRuntimeError, match="INTERNAL"):
        trainer._device_get_relieved({"w": np.arange(3)})

    # with no cache configured, OOM propagates (nothing to relieve)
    trainer._audio_cache = None
    monkeypatch.setattr(jax, "device_get", flaky_get)
    calls["n"] = 0
    with pytest.raises(jax.errors.JaxRuntimeError, match="RESOURCE"):
        trainer._device_get_relieved({"w": np.arange(3)})


def test_validate_oom_relief_redispatches(mesh):
    """A RESOURCE_EXHAUSTED surfacing from an async val dispatch must be
    relieved by clearing the cache and RE-DISPATCHING the batch (the
    poisoned result can never be re-read), and validate() must clear the
    cache proactively on entry (the r5 stage-2 run OOM'd at its first val
    with the cache at a ~2.5 GB fill)."""
    from mug_diffusion_tpu.training.trainer import Trainer

    class _Logger:
        def log(self, *a, **k):
            pass

    trainer = Trainer.__new__(Trainer)
    trainer._audio_cache = DeviceAudioCache()
    trainer.seed = 0
    trainer.callbacks = []
    trainer.logger = _Logger()
    trainer.wandb_run = None
    trainer.global_step = 7
    trainer.task = object()  # no monitor/plateau attrs -> defaults
    trainer._local_device_multiple = lambda: 1

    sh = batch_sharding(mesh)
    trainer._audio_cache.batch(_audio(2), ["warm1", "warm2"], sh)
    assert trainer._audio_cache._rows  # pre-val fill to observe the clear

    calls = {"device_batch": 0, "dispatch": 0}

    def fake_device_batch(batch):
        calls["device_batch"] += 1
        return batch

    def fake_dispatch(dev_batch, rng, level):
        calls["dispatch"] += 1
        if calls["dispatch"] == 1:
            # proactive entry clear must have emptied the cache by the
            # time the first dispatch runs
            assert not trainer._audio_cache._rows
            trainer._audio_cache.batch(_audio(2), ["mid1", "mid2"], sh)
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."
            )
        return {"val/loss": np.float32(0.5)}

    trainer._device_batch = fake_device_batch
    trainer._dispatch_val_step = fake_dispatch

    batch = {"audio": _audio(2), "audio_key": ["a", "b"]}
    monitor = trainer.validate([batch], epoch=0)
    assert monitor == 0.5
    # one failed dispatch + one re-dispatch, each with a fresh dev batch
    assert calls == {"device_batch": 2, "dispatch": 2}

    # a second failure on the SAME batch is a real OOM and must propagate
    calls["dispatch"] = 0

    def always_oom(dev_batch, rng, level):
        raise jax.errors.JaxRuntimeError(
            "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."
        )

    trainer._dispatch_val_step = always_oom
    with pytest.raises(jax.errors.JaxRuntimeError, match="RESOURCE"):
        trainer.validate([batch], epoch=0)


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
