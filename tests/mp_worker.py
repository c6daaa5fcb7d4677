"""Worker + shared helpers for the real multi-process data-parallel test.

Launched twice by tests/test_multiprocess.py (``python tests/mp_worker.py
<process_id> <port> <outdir>``): each process owns 2 CPU devices, the two
form one 4-device global mesh over JAX's distributed runtime (gloo CPU
collectives), and each feeds only its HALF of the global batch through
``shard_batch`` — exercising the ``jax.make_array_from_process_local_data``
branch that single-process tests can't reach (the JAX equivalent of the
reference's per-rank DDP DataLoader shards, ref main.py:536-537).

Process 0 writes the updated U-Net parameter leaves to ``<outdir>/w.npz``;
the pytest driver compares them against a single-device full-batch step.
"""

import os
import sys

# conftest doesn't run here: compile at -O0 and share the test compile
# cache; drop any inherited virtual-device-count flag (the worker's device
# count comes from jax_num_cpu_devices below)
_flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
if not any("xla_backend_optimization_level" in f for f in _flags):
    _flags.append("--xla_backend_optimization_level=0")
os.environ["XLA_FLAGS"] = " ".join(_flags)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

GLOBAL_BATCH = 8
Z_LEN = 16


def _configure_cpu(n_local_devices: int):
    import jax

    # sitecustomize registers the remote-TPU plugin before argv scripts
    # run, so the env var is too late — jax.config still works (backends
    # are lazy)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", n_local_devices)
    jax.config.update("jax_default_matmul_precision", "highest")
    return jax


def make_model_and_step():
    """Tiny fp32 DDPM + masked-AdamW jitted DP train step (fixed rngs, so
    every process — and the single-device reference — computes the same
    math; jax_threefry_partitionable keeps sharded noise draws identical
    to unsharded ones)."""
    import jax
    import optax

    from __graft_entry__ import _model_config
    from mug_diffusion_tpu.utils.checkpoint import trainable_mask
    from mug_diffusion_tpu.utils.config import instantiate_from_config

    cfg = _model_config(tiny=True)
    cfg["params"]["compute_dtype"] = "float32"
    ddpm = instantiate_from_config(cfg)
    variables = ddpm.init_params(
        jax.random.PRNGKey(0),
        {"batch": 1, "z_length": Z_LEN, "mel_length": Z_LEN * 4,
         "n_mels": 16},
    )
    mask = {
        "params": trainable_mask(
            variables["params"], frozen_prefixes=("first_stage_model",)
        )
    }
    optimizer = optax.chain(
        optax.adamw(1e-2),
        optax.masked(optax.set_to_zero(),
                     jax.tree_util.tree_map(lambda t: not t, mask)),
    )
    opt_state = optimizer.init(variables)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            loss, _ = ddpm.loss_fn(
                p, batch, jax.random.PRNGKey(42), train=True
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return variables, opt_state, step


def make_global_batch():
    import numpy as np

    rng = np.random.default_rng(7)
    note_len, mel_len = Z_LEN * 8, Z_LEN * 4
    return {
        "note": (rng.random((GLOBAL_BATCH, note_len, 16)) > 0.9).astype(
            np.float32),
        "audio": 0.1 * rng.standard_normal(
            (GLOBAL_BATCH, mel_len, 16)).astype(np.float32),
        "feature": np.zeros((GLOBAL_BATCH, 21), np.int32),
        "valid_flag": np.ones((GLOBAL_BATCH, note_len), np.float32),
    }


def run_trainer(jax, process_id: int, outdir: str):
    """A real 2-process Trainer.fit: per-rank local batches through
    _device_batch -> shard_batch's process-local branch, rank-zero-only
    checkpoint + metrics writes, replicated global params."""
    import numpy as np

    from __graft_entry__ import _model_config
    from mug_diffusion_tpu.parallel.mesh import create_mesh
    from mug_diffusion_tpu.training.tasks import DiffusionTask
    from mug_diffusion_tpu.training.trainer import Trainer

    mesh = create_mesh()
    z_len = Z_LEN
    batch = make_global_batch()
    half = GLOBAL_BATCH // 2

    class RankStubData:
        datasets = {"train": None}

        def train_dataloader(self):
            return [
                {k: v[process_id * half:(process_id + 1) * half]
                 for k, v in batch.items()}
            ]

    logdir = os.path.join(outdir, "run")  # SHARED dir: rank gating keeps
    trainer = Trainer(                    # rank 1 from writing into it
        DiffusionTask(_model_config(tiny=True)), logdir=logdir,
        base_learning_rate=1e-4, batch_size=half, mesh=mesh,
        scale_lr=False, max_epochs=1, log_every_n_steps=1, save_top_k=0,
        ckpt_every_n_steps=None,
    )
    assert trainer.is_main_process == (process_id == 0)
    trainer.setup(batch_spec={
        "batch": 1, "z_length": z_len, "mel_length": z_len * 4,
        "n_mels": 16,
    })
    trainer.fit(RankStubData())
    assert trainer.global_step == 1, trainer.global_step
    ckpt = os.path.join(logdir, "checkpoints", "last")
    # orbax coordinated the save across ranks: both see the written tree
    assert os.path.isdir(ckpt), f"coordinated checkpoint missing at {ckpt}"
    w = np.asarray(
        jax.tree_util.tree_leaves(trainer.params["params"]["unet_model"])[0]
    )
    assert np.isfinite(w).all()
    print(f"mp_worker {process_id}: TRAINER OK", flush=True)


def run_trainer_async(jax, process_id: int, outdir: str):
    """Multi-process ASYNC checkpointing: a 2-process fit with
    async_checkpoint=True dispatches every coordinated orbax save on a
    per-rank writer thread (epoch cadence: val -> top-k save -> save-last,
    3 epochs), overlapping writes with the next epoch's collectives. Also
    exercises the flush-before-prune path (top-k eviction with a write
    possibly in flight) under 2 ranks. Afterwards the checkpoint restores
    cleanly on both ranks with the trained step/params intact."""
    import numpy as np

    from __graft_entry__ import _model_config
    from mug_diffusion_tpu.parallel.mesh import create_mesh
    from mug_diffusion_tpu.training.tasks import DiffusionTask
    from mug_diffusion_tpu.training.trainer import Trainer
    from mug_diffusion_tpu.utils.checkpoint import load_checkpoint

    mesh = create_mesh()
    batch = make_global_batch()
    half = GLOBAL_BATCH // 2
    local = {k: v[process_id * half:(process_id + 1) * half]
             for k, v in batch.items()}

    class RankStubData:
        datasets = {"train": None, "validation": None}

        def train_dataloader(self):
            return [local]

        def val_dataloader(self):
            return [local]

    logdir = os.path.join(outdir, "run_async")
    trainer = Trainer(
        DiffusionTask(_model_config(tiny=True)), logdir=logdir,
        base_learning_rate=1e-4, batch_size=half, mesh=mesh,
        scale_lr=False, max_epochs=3, log_every_n_steps=1, save_top_k=1,
        val_every_n_epochs=1, save_last_every_n_epochs=1,
        ckpt_every_n_steps=None, async_checkpoint=True,
    )
    assert trainer.async_checkpoint  # the mp gate must be gone
    trainer.setup(batch_spec={
        "batch": 1, "z_length": Z_LEN, "mel_length": Z_LEN * 4,
        "n_mels": 16,
    })
    trainer.fit(RankStubData())
    assert trainer.global_step == 3, trainer.global_step
    assert trainer._ckpt_thread is None  # fit's finally flushed the writer

    ckpts = os.path.join(logdir, "checkpoints")
    topk = [d for d in os.listdir(ckpts) if d.startswith("epoch_")]
    assert len(topk) == 1, topk  # prune kept exactly top-1, no phantoms
    restored = load_checkpoint(os.path.join(ckpts, "last"))
    assert int(np.asarray(restored["step"])) == 3
    live = np.asarray(jax.tree_util.tree_leaves(
        trainer.params["params"]["unet_model"])[0])
    saved = np.asarray(jax.tree_util.tree_leaves(
        restored["params"]["unet_model"])[0])
    np.testing.assert_array_equal(live, saved)
    print(f"mp_worker {process_id}: ASYNC OK", flush=True)


def run_trainer_bucketed(jax, process_id: int, outdir: str):
    """Rank-synchronized bucketed loading through an unmodified 2-process
    Trainer.fit: each rank's Loader plans the identical global batch
    structure (same bucket-shape sequence -> same AOT signatures ->
    lockstep _mp_ready barriers) and loads only its own slice of every
    global batch. The pytest driver pre-writes the dataset."""
    import json

    # tests/ is sys.path[0] when run as a script: reuse the proven
    # Trainer-on-real-data tiny config (8 wave levels <-> ratio-8 datasets)
    import test_training

    from mug_diffusion_tpu.data.dataset import Loader, OsuTrainDataset
    from mug_diffusion_tpu.parallel.mesh import create_mesh
    from mug_diffusion_tpu.training.tasks import DiffusionTask
    from mug_diffusion_tpu.training.trainer import Trainer

    mesh = create_mesh()
    ds = OsuTrainDataset(
        txt_file=[os.path.join(outdir, "beatmap.txt")], sr=22050, n_fft=512,
        max_audio_frame=2048, audio_note_window_ratio=8, n_mels=16,
        with_feature=True, feature_yaml=test_training.SCHEMA,
        cache_dir=os.path.join(outdir, f"cache{process_id}"),
        with_audio=True, length_buckets=[64, 128, 256],
    )
    loader = Loader(
        ds, batch_size=1, shuffle=True, num_workers=2, seed=5,
        drop_last=True, num_shards=jax.process_count(),
        shard_index=jax.process_index(),
    )

    seen = []  # (bucket shape, paths) per step, dumped for the driver
    orig_iter = loader.__class__.__iter__

    def spying_iter(self):
        for batch in orig_iter(self):
            seen.append([
                list(batch["note"].shape),
                sorted(m["path"] for m in batch["meta"]),
            ])
            yield batch

    loader.__class__ = type("SpyLoader", (Loader,), {"__iter__": spying_iter})

    class BucketedStub:
        datasets = {"train": ds}

        def train_dataloader(self):
            return loader

    trainer = Trainer(
        DiffusionTask(test_training._tiny_model_config()),
        logdir=os.path.join(outdir, "run_bucketed"),
        base_learning_rate=1e-4, batch_size=1, mesh=mesh, scale_lr=False,
        max_epochs=1, log_every_n_steps=1, save_top_k=0,
        ckpt_every_n_steps=None,
    )
    trainer.setup(batch_spec={"batch": 1, "z_length": 8, "n_mels": 16})
    trainer.fit(BucketedStub())
    # 6 items / global batch 2: one full batch per bucket + merged leftovers
    assert trainer.global_step == 3, trainer.global_step
    assert len(trainer._mp_exec) == 2, list(trainer._mp_exec)  # 2 shapes
    with open(os.path.join(outdir, f"bucketed_{process_id}.json"), "w") as f:
        json.dump(seen, f)
    print(f"mp_worker {process_id}: BUCKETED OK steps={trainer.global_step}",
          flush=True)


def run_cli(jax, process_id: int, port: int, outdir: str):
    """The FULL CLI under 2 processes: ``main.py -b cfg -t --distributed``
    — env-configured jax.distributed.initialize, rank-0 run-name
    broadcast, per-rank loader shards, coordinated checkpoint save. The
    pytest driver pre-writes the dataset + tiny.yaml into outdir."""
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(process_id)

    import main as main_mod

    trainer = main_mod.main([
        "-b", os.path.join(outdir, "tiny.yaml"), "-t",
        "--max_steps", "1", "--max_epochs", "1",
        "-l", os.path.join(outdir, "logs"), "-n", "mpcli",
        "--distributed",
    ])
    assert jax.process_count() == 2
    assert trainer.global_step == 1
    assert trainer.is_main_process == (process_id == 0)
    runs = os.listdir(os.path.join(outdir, "logs"))
    assert len(runs) == 1, runs  # both ranks used rank 0's run name
    ckpt = os.path.join(outdir, "logs", runs[0], "checkpoints", "last")
    assert os.path.isdir(ckpt), ckpt
    print(f"mp_worker {process_id}: CLI OK logdir={runs[0]}", flush=True)


def main(process_id: int, port: int, outdir: str, mode: str = "step"):
    if mode == "cli":
        # main.py does its own jax.distributed.initialize (--distributed)
        jax = _configure_cpu(n_local_devices=2)
        run_cli(jax, process_id, port, outdir)
        return

    jax = _configure_cpu(n_local_devices=2)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    if mode == "trainer":
        run_trainer(jax, process_id, outdir)
        return

    if mode == "bucketed":
        run_trainer_bucketed(jax, process_id, outdir)
        return

    if mode == "async":
        run_trainer_async(jax, process_id, outdir)
        return

    import numpy as np

    from mug_diffusion_tpu.parallel.mesh import (
        create_mesh, replicated_sharding, shard_batch,
    )

    mesh = create_mesh()  # all 4 global devices on the data axis
    # global device order groups by process: this process's rows are the
    # contiguous half make_array_from_process_local_data expects
    assert [d.process_index for d in mesh.devices.flat] == [0, 0, 1, 1]

    params, opt_state, step = make_model_and_step()
    # multi-process jit needs GLOBAL arrays: promote the (identical,
    # deterministically seeded) per-process params/opt_state to replicated
    # arrays over the global mesh
    rep = replicated_sharding(mesh)

    def replicate(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), rep), tree
        )

    params, opt_state = replicate(params), replicate(opt_state)
    batch = make_global_batch()
    half = GLOBAL_BATCH // 2
    local = {
        k: v[process_id * half:(process_id + 1) * half]
        for k, v in batch.items()
    }
    dev_batch = shard_batch(local, mesh)  # process-local data branch
    # AOT-compile then barrier before the first dispatch (same pattern as
    # Trainer._mp_ready): gloo collective contexts handshake within ~30 s
    # of first execution, and on a contended single-core host two
    # concurrent compiles can skew the ranks past that window
    exe = step.lower(params, opt_state, dev_batch).compile()
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(
        "mp_step_ready", timeout_in_ms=3_600_000
    )
    params, opt_state, loss = exe(params, opt_state, dev_batch)
    loss = float(np.asarray(loss))
    assert np.isfinite(loss)

    if process_id == 0:
        leaves = jax.tree_util.tree_leaves_with_path(
            params["params"]["unet_model"]
        )
        np.savez(
            os.path.join(outdir, "w.npz"),
            loss=loss,
            **{jax.tree_util.keystr(p): np.asarray(v) for p, v in leaves},
        )
    print(f"mp_worker {process_id}: OK loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
         sys.argv[4] if len(sys.argv) > 4 else "step")
