"""Length-bucketed training batches.

The reference pads every song's mel to [128, 32768] (~190 s)
(ref configs/mug/mug_diffusion.yaml:101-113, mug/data/dataset.py:228-244),
so a 45 s chart costs 4x its share of FLOPs and host->device bytes. With
``length_buckets`` the dataset crops each example to the smallest bucket
covering its valid window and the Loader groups homogeneous batches per
bucket (one compiled train step per bucket, XLA persistent-cached).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mug_diffusion_tpu.data.dataset import Loader, OsuDataset  # noqa: E402
from scripts.make_synthetic_dataset import write_set  # noqa: E402

BUCKETS = [64, 128, 256]  # note frames; max must equal max_audio_frame/8


@pytest.fixture(scope="module")
def bucket_dataset(tmp_path_factory):
    td = str(tmp_path_factory.mktemp("buckets"))
    paths = []
    # 2 s songs -> ~44 valid note frames -> bucket 64;
    # 8 s songs -> ~172 -> bucket 256
    for i, dur in enumerate([2.0, 2.0, 2.0, 8.0, 8.0, 8.0]):
        paths.append(write_set(td, f"s{i}", dur, 180.0, seed=i))
    txt = os.path.join(td, "beatmap.txt")
    with open(txt, "w") as f:
        f.writelines(p + "\n" for p in paths)

    def make(**kw):
        return OsuDataset(
            txt_file=[txt], sr=22050, n_fft=512, max_audio_frame=2048,
            audio_note_window_ratio=8, n_mels=16,
            cache_dir=os.path.join(td, "cache"), with_audio=True,
            length_buckets=BUCKETS, **kw,
        )

    return make


def test_items_cropped_to_smallest_covering_bucket(bucket_dataset):
    ds = bucket_dataset()
    shapes = sorted({ds[i]["note"].shape[0] for i in range(len(ds))})
    assert set(shapes) <= set(BUCKETS)
    assert len(shapes) == 2  # short and long songs land in distinct buckets
    for i in range(len(ds)):
        ex = ds[i]
        nb = ex["note"].shape[0]
        assert ex["valid_flag"].shape == (nb,)
        assert ex["audio"].shape == (nb * 8, 16)
        nz = np.nonzero(ex["valid_flag"])[0]
        assert nz.size and nz.max() < nb  # valid window fits the bucket


def test_loader_yields_homogeneous_batches(bucket_dataset):
    ds = bucket_dataset()
    loader = Loader(ds, batch_size=3, shuffle=True, num_workers=2,
                    drop_last=True)
    batches = list(loader)
    assert len(batches) == 2  # 3 short + 3 long
    sizes = sorted(b["note"].shape[1] for b in batches)
    assert all(b["note"].shape[0] == 3 for b in batches)
    assert sizes[0] < sizes[1]
    for b in batches:
        assert b["audio"].shape[1] == b["note"].shape[1] * 8


def test_loader_pads_leftovers_when_not_drop_last(bucket_dataset):
    ds = bucket_dataset()
    # batch 4 over 3+3 items: no bucket fills, so everything is a leftover,
    # padded up to the largest leftover bucket and emitted in chunks
    loader = Loader(ds, batch_size=4, shuffle=False, num_workers=2,
                    drop_last=False)
    batches = list(loader)
    assert sum(b["note"].shape[0] for b in batches) == 6
    t = {b["note"].shape[1] for b in batches}
    assert t == {max(BUCKETS)} or t == {128, 256} or len(t) == 1


def test_drop_last_merges_leftovers_before_dropping(bucket_dataset):
    """drop_last only drops the final incomplete batch AFTER merging all
    buckets' leftovers — not each bucket's remainder."""
    ds = bucket_dataset()
    loader = Loader(ds, batch_size=4, shuffle=False, num_workers=2,
                    drop_last=True)
    batches = list(loader)  # 3 short + 3 long, no bucket fills 4
    assert len(batches) == 1
    assert batches[0]["note"].shape[0] == 4  # merged + padded, 2 dropped


def test_bucket_covers_audio_tail_context(bucket_dataset):
    """The +2 s of audio context past the last note (zeroed after, like the
    reference dataset.py:241-244) must fit inside the chosen bucket — the
    crop must not truncate it."""
    ds = bucket_dataset()
    for i in range(len(ds)):
        ex = ds[i]
        nb = ex["note"].shape[0]
        nz = np.nonzero(ex["valid_flag"])[0]
        frame_ms = 128 / 22050 * 8 * 1000
        tail = int(np.ceil(2000.0 / frame_ms))
        if nz.max() + 1 + tail <= max(BUCKETS):
            assert nz.max() + 1 + tail <= nb, (nz.max(), nb)


def test_token_budget_per_bucket_batching(bucket_dataset):
    """scale_batch_by_bucket: a bucket at 1/2 the max length fills 2x the
    batch (equal token budget per step -> MFU holds at short buckets)."""
    ds = bucket_dataset()
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=2,
                    drop_last=True, scale_batch_by_bucket=True)
    assert loader._bucket_batch(256) == 2   # max bucket: base batch
    assert loader._bucket_batch(128) == 4   # half length -> double batch
    assert loader._bucket_batch(64) == 8
    batches = list(loader)
    for b in batches:
        nb = b["note"].shape[1]
        # full batches must meet the bucket's scaled size; the merged
        # leftover tail may be smaller only if drop_last kept it
        assert b["note"].shape[0] * nb <= 2 * 256 + nb  # token budget bound
    # 3 items in bucket 128 can't fill a batch of 4 -> they merge into the
    # leftover path; 3 items in bucket 256 emit one base batch of 2
    sizes = sorted((b["note"].shape[1], b["note"].shape[0]) for b in batches)
    assert (256, 2) in sizes


def test_loader_len_raises_under_buckets(bucket_dataset):
    ds = bucket_dataset()
    loader = Loader(ds, batch_size=2, shuffle=False)
    with pytest.raises(TypeError):
        len(loader)


def test_bucket_guard_on_max():
    with pytest.raises(AssertionError):
        OsuDataset(txt_file=[], max_audio_frame=2048,
                   audio_note_window_ratio=8, length_buckets=[64, 128])


def test_train_step_runs_per_bucket(bucket_dataset):
    """Two jitted loss evaluations at different bucket shapes on the tiny
    model — both finite (shape-polymorphic training)."""
    import jax

    from mug_diffusion_tpu.utils.config import instantiate_from_config
    from tests.test_pipeline import tiny_config

    ddpm = instantiate_from_config(tiny_config()["model"])
    params = ddpm.init_params(
        jax.random.PRNGKey(0), {"batch": 1, "z_length": 8, "n_mels": 16}
    )
    rng = jax.random.PRNGKey(1)
    for nb in (64, 128):
        batch = {
            "note": np.zeros((2, nb, 16), np.float32),
            "audio": np.zeros((2, nb * 8, 16), np.float16),
            "feature": np.zeros((2, 21), np.int32),
            "valid_flag": np.ones((2, nb), np.float32),
        }
        batch["note"][:, ::8, 0] = 1.0
        loss, _ = jax.jit(
            lambda p, b: ddpm.loss_fn(p, b, rng, train=True)
        )(params, batch)
        assert np.isfinite(float(loss))


def test_audio_examples_are_fp16(bucket_dataset):
    """The loader ships mel as fp16 (half the host->device bytes; the mel
    cache is fp16 anyway, ref mug/util.py:143). DDPM.wave_output upcasts."""
    ds = bucket_dataset()
    assert ds[0]["audio"].dtype == np.float16


def test_grad_accumulation_across_bucket_shapes():
    """optax.MultiSteps accumulates across micro-batches of DIFFERENT
    length buckets (grad pytrees are param-shaped, so the jitted step is
    shape-polymorphic): no update after micro 1 (bucket 64), update
    applied after micro 2 (bucket 128)."""
    import jax
    import optax

    from mug_diffusion_tpu.utils.config import instantiate_from_config
    from tests.test_pipeline import tiny_config

    ddpm = instantiate_from_config(tiny_config()["model"])
    params = ddpm.init_params(
        jax.random.PRNGKey(0), {"batch": 1, "z_length": 8, "n_mels": 16}
    )
    opt = optax.MultiSteps(optax.sgd(1e-2), every_k_schedule=2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            loss, _ = ddpm.loss_fn(p, batch, jax.random.PRNGKey(1),
                                   train=True)
            return loss

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def batch(nb):
        b = {
            "note": np.zeros((2, nb, 16), np.float32),
            "audio": 0.05 * np.random.RandomState(nb).standard_normal(
                (2, nb * 8, 16)).astype(np.float16),
            "feature": np.zeros((2, 21), np.int32),
            "valid_flag": np.ones((2, nb), np.float32),
        }
        b["note"][:, ::8, 0] = 1.0
        return b

    def snapshot(p):
        return [
            np.asarray(x).copy()
            for x in jax.tree_util.tree_leaves(p["params"]["unet_model"])
        ]

    def max_delta(a, b):
        return max(np.abs(x - y).max() for x, y in zip(a, b))

    before = snapshot(params)
    params, opt_state = step(params, opt_state, batch(64))   # accumulate
    assert max_delta(snapshot(params), before) == 0
    params, opt_state = step(params, opt_state, batch(128))  # apply
    assert max_delta(snapshot(params), before) > 0


def test_process_worker_loader_matches_thread_loader(bucket_dataset):
    """worker_type="process" (the reference's worker-process loaders,
    ref main.py:163-246 num_workers) must yield the same batch structure
    as the thread loader: same item count, same homogeneous bucket
    shapes, tensors + meta/convertor surviving the pickle round-trip."""
    ds = bucket_dataset()
    kw = dict(batch_size=3, shuffle=False, num_workers=2, drop_last=True)
    thread_batches = list(Loader(ds, worker_type="thread", **kw))
    proc_batches = list(Loader(ds, worker_type="process", **kw))
    assert len(proc_batches) == len(thread_batches) == 2
    for tb, pb in zip(thread_batches, proc_batches):
        assert pb["note"].shape == tb["note"].shape
        assert pb["audio"].shape == tb["audio"].shape
        assert pb["note"].dtype == tb["note"].dtype
        # augments are off in this fixture, so content matches exactly
        np.testing.assert_array_equal(pb["note"], tb["note"])
        assert len(pb["meta"]) == tb["note"].shape[0]
        assert all("frame_ms" in c for c in pb["convertor"])


def test_loader_rejects_unknown_worker_type(bucket_dataset):
    with pytest.raises(ValueError):
        Loader(bucket_dataset(), batch_size=2, shuffle=False,
               worker_type="greenlet")


# ---------------------- rank-synchronized bucket sharding (multi-process)


def _rank_loaders(make_ds, n=2, **kw):
    return [
        Loader(make_ds(), num_shards=n, shard_index=r, **kw) for r in range(n)
    ]


def _batch_paths(batches):
    return [m["path"] for b in batches for m in b["meta"]]


def test_rank_synchronized_bucket_sharding(bucket_dataset):
    """Two ranks over a bucketed dataset yield the SAME batch count and the
    SAME bucket-shape sequence (collective lockstep), with disjoint items
    covering the whole epoch."""
    l0, l1 = _rank_loaders(bucket_dataset, batch_size=1, shuffle=True,
                           num_workers=2, seed=7, drop_last=True)
    b0, b1 = list(l0), list(l1)
    assert len(b0) == len(b1) > 0
    for a, b in zip(b0, b1):
        assert a["note"].shape == b["note"].shape
        assert a["audio"].shape == b["audio"].shape
        assert a["note"].shape[1] in BUCKETS
    p0, p1 = _batch_paths(b0), _batch_paths(b1)
    assert not (set(p0) & set(p1))        # disjoint across ranks
    assert len(set(p0) | set(p1)) == 6    # full epoch coverage
    # deterministic: a fresh rank-0 loader replays the identical structure
    l0b = Loader(bucket_dataset(), num_shards=2, shard_index=0, batch_size=1,
                 shuffle=True, num_workers=2, seed=7, drop_last=True)
    assert [b["note"].shape for b in l0b] == [b["note"].shape for b in b0]
    # ranks stay in lockstep on the next epoch too (fresh permutation)
    e0 = [b["note"].shape for b in l0]
    e1 = [b["note"].shape for b in l1]
    assert e0 == e1


def test_rank_synchronized_token_budget_batches(bucket_dataset):
    """scale_batch_by_bucket composes global batches of
    per_rank_batch(bucket) * num_shards; ranks still agree exactly."""
    l0, l1 = _rank_loaders(bucket_dataset, batch_size=1, shuffle=False,
                           num_workers=2, drop_last=False,
                           scale_batch_by_bucket=True)
    b0, b1 = list(l0), list(l1)
    assert [b["note"].shape for b in b0] == [b["note"].shape for b in b1]
    assert not (set(_batch_paths(b0)) & set(_batch_paths(b1)))


def test_rank_synchronized_sharding_survives_bad_files(bucket_dataset,
                                                       tmp_path):
    """Bad items must not desynchronize ranks: a plan-time failure (missing
    .osu) resamples deterministically from the per-(epoch, index) RNG; a
    load-time failure the probe can't see (deleted audio) substitutes a
    replacement FORCED into the planned bucket. Both ranks still derive the
    identical batch structure; the files are quarantined."""
    import shutil

    td = str(tmp_path / "badset")
    os.makedirs(td)
    ds_probe = bucket_dataset()
    new_paths = []
    for p in ds_probe.beatmap_paths:
        dst_dir = os.path.join(td, os.path.basename(os.path.dirname(p)))
        shutil.copytree(os.path.dirname(p), dst_dir, dirs_exist_ok=True)
        new_paths.append(os.path.join(dst_dir, os.path.basename(p)))
    # load-time failure: chart parses, audio is gone
    audio_gone = new_paths[0]
    meta_dir = os.path.dirname(audio_gone)
    for f in os.listdir(meta_dir):
        if f.endswith((".wav", ".mp3", ".ogg")):
            os.remove(os.path.join(meta_dir, f))
    # plan-time failure: path in beatmap.txt doesn't exist
    missing = os.path.join(td, "nope", "missing.osu")
    txt = os.path.join(td, "beatmap.txt")
    with open(txt, "w") as f:
        f.writelines(p + "\n" for p in new_paths + [missing])

    def make():
        return OsuDataset(
            txt_file=[txt], sr=22050, n_fft=512, max_audio_frame=2048,
            audio_note_window_ratio=8, n_mels=16,
            cache_dir=os.path.join(td, "cache"), with_audio=True,
            length_buckets=BUCKETS,
        )

    l0, l1 = _rank_loaders(make, batch_size=1, shuffle=True, num_workers=2,
                           seed=3, drop_last=True)
    b0, b1 = list(l0), list(l1)
    assert len(b0) == len(b1) > 0
    assert [b["note"].shape for b in b0] == [b["note"].shape for b in b1]
    err = os.path.join(td, "cache", "error.txt")
    assert os.path.isfile(err)
    with open(err) as f:
        content = f.read()
    assert missing in content  # plan-time quarantine
    assert audio_gone in content  # load-time quarantine


def test_forced_bucket_load_shape(bucket_dataset):
    """load_item with a forced bucket always yields exactly that shape —
    larger (pad semantics via full-length arrays) and smaller (tail crop)
    than the natural bucket."""
    ds = bucket_dataset()
    params = ds.draw_convertor_params(np.random.default_rng(0))
    natural = ds.probe_bucket(0, params)
    for forced in BUCKETS:
        ex = ds.load_item(0, params, forced_bucket=forced)
        assert ex["note"].shape[0] == forced
        assert ex["audio"].shape[0] == forced * 8
    assert natural in BUCKETS


def test_plan_item_deterministic(bucket_dataset):
    ds = bucket_dataset()
    a = ds.plan_item(2, epoch_seed=11)
    b = ds.plan_item(2, epoch_seed=11)
    assert a[0] == b[0] and a[2] == b[2] and a[1] == b[1]
    c = ds.plan_item(2, epoch_seed=12)
    assert c[2] in BUCKETS
