"""Trainer: pjit data-parallel training loop with checkpointing + logging.

Replaces the reference's PyTorch Lightning engine (ref: main.py:432-759):
the train step is one jitted SPMD function over a ``data`` mesh axis (XLA
inserts the gradient all-reduce that Lightning DDP did via NCCL), gradient
accumulation is optax.MultiSteps (ref: main.py:697-702), LR scales with
devices*batch*accum (ref: main.py:703-707), checkpoints are orbax pytrees
with monitor-based top-k + save-last + every-N-steps snapshots
(ref: main.py:585-667), and a checkpoint is dumped on exception/interrupt
(the 'melk' hook, ref: main.py:715-740).
"""

from __future__ import annotations

import csv
import os
import signal
import time
import traceback
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mug_diffusion_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)
from mug_diffusion_tpu.utils import checkpoint as ckpt_utils


class CSVLogger:
    """Minimal CSV metrics logger (Lightning CSVLogger equivalent).
    Handles evolving key sets by rewriting the file with the union header
    when new metric names appear (train vs val rows differ)."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.csv")
        self._keys: List[str] = []
        # resume-safe: adopt an existing file's header so the first log
        # call APPENDS under it (or union-rewrites, keeping prior rows)
        # instead of truncating the run's history — a fresh process always
        # starts with empty _keys, and the pre-fix truncate branch below
        # destroyed the metrics of every resumed run
        if os.path.isfile(self.path):
            with open(self.path, newline="") as f:
                header = next(csv.reader(f), None)
            if header:
                self._keys = list(header)

    def log(self, metrics: Dict[str, Any], step: int):
        row = {"step": step}
        row.update(
            {
                k: float(v) if hasattr(v, "item") or isinstance(v, (int, float))
                else v
                for k, v in metrics.items()
            }
        )
        new_keys = [k for k in row if k not in self._keys]
        if new_keys:
            old_keys = self._keys
            self._keys = sorted(set(old_keys) | set(row.keys()))
            if old_keys and os.path.isfile(self.path):
                # rewrite existing rows under the union header
                with open(self.path, newline="") as f:
                    old_rows = list(csv.DictReader(f))
                with open(self.path, "w", newline="") as f:
                    writer = csv.DictWriter(f, fieldnames=self._keys)
                    writer.writeheader()
                    for r in old_rows:
                        writer.writerow(r)
            else:
                with open(self.path, "w", newline="") as f:
                    csv.DictWriter(f, fieldnames=self._keys).writeheader()
        with open(self.path, "a", newline="") as f:
            csv.DictWriter(f, fieldnames=self._keys).writerow(row)


def _batch_sig(dev_batch) -> tuple:
    """Stable shape/dtype signature of a device batch — the cache key for
    multi-process compile alignment (one key per distinct executable)."""
    return tuple(sorted(
        (k, tuple(v.shape), str(v.dtype))
        for k, v in dev_batch.items() if hasattr(v, "shape")
    ))


class _NullLogger:
    """Metrics sink for non-zero ranks under multi-process SPMD: every
    rank computes the (replicated) metrics — the collectives need all
    ranks — but only rank 0 should write files (Lightning's
    rank_zero_only)."""

    def log(self, metrics, step):
        pass


class Trainer:
    def __init__(
        self,
        task,
        logdir: str,
        base_learning_rate: float,
        batch_size: int,
        accumulate_grad_batches: int = 1,
        max_epochs: int = 1000,
        max_steps: Optional[int] = None,
        mesh=None,
        seed: int = 23,
        scale_lr: bool = True,
        val_every_n_epochs: int = 1,
        save_last_every_n_epochs: int = 1,
        ckpt_every_n_steps: Optional[int] = 10000,
        save_top_k: int = 3,
        callbacks: Optional[list] = None,
        log_every_n_steps: int = 50,
        use_wandb: bool = False,
        wandb_project: str = "mug-diffusion-tpu",
        profile_dir: Optional[str] = None,
        profile_steps: tuple = (10, 15),
        async_checkpoint: bool = False,
        # NOTE (advisor r4): cached rows AND the jnp.stack staging batch
        # live on the DEFAULT device only — on a multi-device mesh the
        # whole cache budget plus one pre-reshard batch land on device 0's
        # HBM before the final device_put fans out. Budget accordingly
        # (v5e: 16 GB HBM; default 4 GiB cache + ~1 GiB batch is safe for
        # the live model) or disable the cache for model-parallel layouts.
        device_audio_cache: bool = False,
        device_audio_cache_mb: int = 4096,
    ):
        self.task = task
        self.logdir = logdir
        self.mesh = mesh or create_mesh()
        n_devices = int(np.prod(self.mesh.devices.shape))
        if scale_lr:
            # ref main.py:703-707
            self.learning_rate = (
                accumulate_grad_batches * n_devices * batch_size
                * base_learning_rate
            )
            print(
                f"Setting learning rate to {self.learning_rate:.2e} = "
                f"{accumulate_grad_batches} (accumulate) * {n_devices} (devices)"
                f" * {batch_size} (batchsize) * {base_learning_rate:.2e} (base_lr)"
            )
        else:
            self.learning_rate = base_learning_rate
        self.accumulate = accumulate_grad_batches
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.seed = seed
        self.val_every_n_epochs = val_every_n_epochs
        self.save_last_every_n_epochs = max(1, save_last_every_n_epochs)
        self.ckpt_every_n_steps = ckpt_every_n_steps
        self.save_top_k = save_top_k
        # async checkpointing overlaps the orbax write with training; the
        # device->host snapshot stays synchronous (donation-safe). Under
        # multi-process SPMD the write is RANK-LOCAL: rank 0's writer
        # thread persists its (replicated, already host-resident) copy
        # with orbax coordination disabled, and peers skip the write.
        # A writer thread must never issue cross-rank barriers: they ride
        # the same gloo/coordination channels as the main thread's step
        # collectives, and concurrent collectives from two threads
        # interleave differently per rank (measured: gloo preamble
        # mismatch / device_put assert_equal pairing rank 0's writer with
        # rank 1's step_rng). _sync_ranks flushes before its barrier so
        # peers never read an in-flight checkpoint.
        self.async_checkpoint = async_checkpoint
        # device-resident audio rows (training/device_cache.py): dedupes
        # the per-epoch mel upload — the largest H2D transfer in training.
        # Single-process only: multi-process SPMD builds global arrays
        # from per-rank host shards, which a device cache would bypass.
        # HBM residency caveat: cached rows and the jnp.stack staging batch
        # live on the DEFAULT device, so on a multi-device mesh the whole
        # device_audio_cache_mb budget plus one pre-reshard batch sits on
        # device 0's HBM before the final device_put relays shards out —
        # size the budget for one chip, not the mesh (advisor r4).
        self._audio_cache = None
        if device_audio_cache and jax.process_count() == 1:
            from mug_diffusion_tpu.training.device_cache import (
                DeviceAudioCache,
            )

            self._audio_cache = DeviceAudioCache(
                max_bytes=device_audio_cache_mb << 20
            )
        self._ckpt_thread = None
        self._ckpt_error = None
        self.callbacks = callbacks or []
        self.log_every_n_steps = log_every_n_steps
        # rank-zero-only side effects under multi-process SPMD: all ranks
        # run the full compute (collectives need every rank) but only the
        # main process writes metrics/checkpoints/W&B
        self.is_main_process = jax.process_index() == 0
        self.logger = (
            CSVLogger(logdir) if self.is_main_process else _NullLogger()
        )
        os.makedirs(os.path.join(logdir, "checkpoints"), exist_ok=True)

        # optional W&B mirror of the CSV logs (ref: main.py:557-581)
        self.wandb_run = None
        if use_wandb and self.is_main_process:
            try:
                import wandb

                self.wandb_run = wandb.init(
                    project=wandb_project, dir=logdir,
                    name=os.path.basename(logdir),
                )
            except ImportError:
                print("wandb not installed; falling back to CSV only")

        # optional XLA profiler trace window (ref: Lightning profiler summary
        # at main.py:759; here a proper timeline trace)
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps

        self.global_step = 0
        self.params = None
        self.opt_state = None
        self._last_ckpt_epoch = None
        self._top_k: List[tuple] = []  # (monitor_value, path)
        # ReduceLROnPlateau state (VAE task, ref autoencoder.py:145)
        self._plateau_best = None
        self._plateau_bad_epochs = 0

    # -------------------------------------------------------------- setup

    def setup(self, batch_spec=None, restore_path: Optional[str] = None,
              resume: bool = False):
        """``resume=True`` additionally restores optimizer state and the
        global step from a full checkpoint (ref main.py:492-510 -r resume);
        otherwise a restore is a weights-only partial load with surgery."""
        rng = jax.random.PRNGKey(self.seed)
        self.params = self.task.init_params(rng, batch_spec)

        # optional checkpoint surgery restore (ckpt_path in model config)
        model_cfg_params = self.task.config.get("params", {})

        # nested first-stage restore: first_stage_config.params.ckpt_path
        # loads a pretrained (bare) VAE checkpoint into the diffusion
        # model's first_stage_model subtree — the reference does this at
        # module construction (mug/firststage/autoencoder.py:44-65
        # init_from_ckpt via first_stage_config); in flax the params are
        # an external pytree, so the graft happens here. The subtree stays
        # frozen by the optimizer mask, so this is what makes the latent
        # space a TRAINED one rather than random-init.
        fs_cfg = (model_cfg_params.get("first_stage_config") or {})
        fs_params_cfg = fs_cfg.get("params", {}) or {}
        fs_ckpt = fs_params_cfg.get("ckpt_path")
        if fs_ckpt and "first_stage_model" in self.params.get("params", {}):
            if not os.path.exists(fs_ckpt):
                raise FileNotFoundError(
                    f"first_stage_config.params.ckpt_path: {fs_ckpt}"
                )
            tree = dict(self.params["params"])
            tree["first_stage_model"] = ckpt_utils.load_with_surgery(
                fs_ckpt,
                tree["first_stage_model"],
                ignore_keys=fs_params_cfg.get("ignore_keys", ()) or (),
                remove_prefix=fs_params_cfg.get("remove_prefix"),
            )
            self.params = {"params": tree}

        ckpt_path = restore_path or model_cfg_params.get("ckpt_path")
        restored = None
        if ckpt_path and os.path.exists(ckpt_path):
            if resume:
                restored = ckpt_utils.load_checkpoint(ckpt_path)
                merged, _, _ = ckpt_utils.merge_partial(
                    self.params["params"],
                    ckpt_utils.flatten_params(restored["params"]),
                )
                self.params = {"params": merged}
                self.global_step = int(restored.get("step", 0))
            else:
                self.params = {
                    "params": ckpt_utils.load_with_surgery(
                        ckpt_path,
                        self.params["params"],
                        ignore_keys=model_cfg_params.get("ignore_keys", ())
                        or (),
                        remove_prefix=model_cfg_params.get("remove_prefix"),
                    )
                }

        self.optimizer = self.task.make_optimizer(self.params, self.learning_rate)
        if self.accumulate > 1:
            self.optimizer = optax.MultiSteps(
                self.optimizer, every_k_schedule=self.accumulate
            )
        self.opt_state = self.optimizer.init(self.params)
        if resume and restored is not None and "opt_state" in restored:
            try:
                # orbax lowers tuples/namedtuples to lists — rebuild with
                # the fresh opt_state's treedef so Adam moments and the
                # schedule count actually survive the resume
                self.opt_state = ckpt_utils.coerce_like(
                    self.opt_state, restored["opt_state"]
                )
            except Exception as e:  # structure changed; fresh opt state
                print(f"opt_state restore failed ({e}); reinitialized")
        if jax.process_count() > 1:
            # multi-process SPMD: promote the per-process (deterministically
            # seeded, so identical) params/opt_state to replicated GLOBAL
            # arrays — jit over a mesh spanning non-addressable devices
            # can't reshard process-local jax Arrays, only host data
            rep = replicated_sharding(self.mesh)

            def promote(x):
                if hasattr(x, "shape"):
                    return jax.device_put(np.asarray(x), rep)
                return x

            self.params = jax.tree_util.tree_map(promote, self.params)
            self.opt_state = jax.tree_util.tree_map(promote, self.opt_state)
        self._build_steps()
        return self

    def _build_steps(self):
        task = self.task
        optimizer = self.optimizer
        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)

        def train_step(params, opt_state, batch, rng):
            def loss_wrapper(p):
                loss, logs = task.loss_fn(p, batch, rng, train=True)
                return loss, logs

            (loss, logs), grads = jax.value_and_grad(
                loss_wrapper, has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            logs = dict(logs)
            logs["grad_norm"] = optax.global_norm(grads)
            return params, opt_state, loss, logs

        self._train_step = jax.jit(
            train_step,
            in_shardings=(rep, rep, data, rep),
            out_shardings=(rep, rep, rep, rep),
            donate_argnums=(0, 1),
        )
        # multi-process: AOT-compiled executables per batch signature (see
        # _mp_ready)
        self._mp_exec = {}
        self._mp_val_exec = {}
        self._rep_sharding = rep

        # one jitted executable for ALL noise-decile levels (bounds traced;
        # a static level would compile the live model up to 10 times at
        # minutes each on TPU). Jitting also avoids eager flax dispatch,
        # which would materialize complex S4 constants on-device — the
        # remote-TPU tunnel cannot transfer those.
        import functools

        if hasattr(task, "validation_metrics_traced"):

            @jax.jit
            def val_step_traced(params, batch, rng, min_step, max_step):
                return task.validation_metrics_traced(
                    params, batch, rng, min_step, max_step
                )

            num_t = task.model.num_timesteps

            def val_step(params, batch, rng, level):
                lo = int(level / 10 * num_t)
                hi = int((level + 1) / 10 * num_t)
                metrics = val_step_traced(
                    params, batch, rng, jnp.int32(lo), jnp.int32(hi)
                )
                metrics = dict(metrics)
                metrics[f"loss_level_{level}"] = metrics.pop("loss_level")
                return metrics

            self._val_step_jit = val_step_traced
            self._val_num_t = num_t

        else:  # tasks without decile stratification (VAE, test stubs)

            @functools.partial(jax.jit, static_argnums=(3,))
            def val_step(params, batch, rng, level):
                return task.validation_metrics(params, batch, rng, level)

            self._val_step_jit = None

        self._val_step = val_step

    # ---------------------------------------------------------------- fit

    def _local_device_multiple(self) -> int:
        """The batch-divisibility requirement for THIS process's local
        batch: the number of mesh devices this process owns.
        Single-process that is the whole mesh; multi-process each rank
        feeds only its local shard (make_array_from_process_local_data
        assembles the global batch), so requiring the GLOBAL count here
        would over-pad — or, in validate(), silently skip every batch."""
        n_dev = int(np.prod(self.mesh.devices.shape))
        return max(1, n_dev // jax.process_count())

    def _device_batch(self, batch):
        tensors = {
            k: v for k, v in batch.items() if isinstance(v, np.ndarray)
        }
        # uneven final batches (drop_last=False loaders, merged bucket
        # leftovers) must still divide the mesh data axis: pad by CYCLING
        # real samples — zero rows would poison GroupNorm stats (0/0 at zero
        # variance -> NaN grads, docs/PERF.md). The repeats bias the last
        # batch's mean loss slightly, same as the reference's smaller final
        # DDP batch reweighting (ref main.py:536-537 DDP + drop_last=False).
        n_dev = self._local_device_multiple()
        b = next(iter(tensors.values())).shape[0] if tensors else 0
        keys = batch.get("audio_key")
        if b and b % n_dev != 0:
            idx = np.resize(np.arange(b), b + (-b) % n_dev)
            tensors = {k: np.asarray(v)[idx] for k, v in tensors.items()}
            if keys is not None:
                keys = [keys[i] for i in idx]
        if (
            self._audio_cache is not None
            and "audio" in tensors
            and keys is not None
        ):
            audio = tensors.pop("audio")
            out = shard_batch(tensors, self.mesh)
            out["audio"] = self._audio_cache.batch(
                audio, keys, batch_sharding(self.mesh)
            )
            return out
        return shard_batch(tensors, self.mesh)

    def fit(self, datamodule):
        train_loader = datamodule.train_dataloader()
        val_loader = (
            datamodule.val_dataloader()
            if "validation" in datamodule.datasets else None
        )
        rng = jax.random.PRNGKey(self.seed + 1)

        self._preempt_requested = False

        def melk(*args):
            # signals land on ONE host: never do a collective save here
            print("Dumping emergency checkpoint...")
            try:
                self.save_checkpoint("last", collective=False)
            except RuntimeError as e:
                if "deleted" not in str(e):
                    raise
                # the signal landed while the donated train step was in
                # flight: self.params was consumed by the executable and
                # won't be rebound until the step returns. Defer — the
                # loop saves right after the current step completes.
                self._preempt_requested = True
                print("... params in flight (donated); deferring the dump "
                      "to the end of the current step")
                return
            raise KeyboardInterrupt

        # SIGUSR1: manual dump (ref melk, main.py:715-724). SIGTERM:
        # TPU/cloud preemption notice — save and exit cleanly so -r resume
        # continues the run (the reference has no preemption handling)
        old_usr1 = signal.signal(signal.SIGUSR1, melk)
        old_term = signal.signal(signal.SIGTERM, melk)
        try:
            for epoch in range(self.max_epochs):
                epoch_start = time.time()
                for batch in train_loader:
                    dev_batch = self._device_batch(batch)
                    rng, step_rng = jax.random.split(rng)
                    if jax.process_count() > 1:
                        # AOT executables take exactly-placed inputs: the
                        # key is host-identical on every rank, promote it
                        # to a replicated global array
                        step_rng = jax.device_put(
                            np.asarray(step_rng), self._rep_sharding
                        )
                    step_fn = self._mp_ready(dev_batch, step_rng)
                    (
                        self.params, self.opt_state, loss, logs
                    ) = step_fn(
                        self.params, self.opt_state, dev_batch, step_rng,
                    )
                    self.global_step += 1
                    if self._preempt_requested:
                        # deferred signal dump: params are freshly rebound
                        self.save_checkpoint("last", collective=False)
                        raise KeyboardInterrupt
                    if self.profile_dir and self.global_step == self.profile_steps[0]:
                        jax.profiler.start_trace(self.profile_dir)
                    if self.profile_dir and self.global_step == self.profile_steps[1]:
                        jax.profiler.stop_trace()
                    if self.global_step % self.log_every_n_steps == 0:
                        logs = jax.device_get(logs)
                        logs["epoch"] = epoch
                        # the ACTUAL scheduled/plateau-scaled LR, not the
                        # constant base rate (ref LearningRateMonitor,
                        # main.py:632-638, logged the live value)
                        logs["lr"] = self._current_lr()
                        from mug_diffusion_tpu.training.callbacks import (
                            DeviceStatsCallback,
                        )

                        mem = DeviceStatsCallback.peak_memory_mb()
                        if mem is not None:
                            logs["peak_memory_mb"] = mem
                        self.logger.log(logs, self.global_step)
                        if self.wandb_run is not None:
                            self.wandb_run.log(
                                {k: v for k, v in logs.items()
                                 if isinstance(v, (int, float))},
                                step=self.global_step,
                            )
                        print(
                            f"step {self.global_step} "
                            f"loss {float(loss):.4f}"
                        )
                    if (
                        self.ckpt_every_n_steps
                        and self.global_step % self.ckpt_every_n_steps == 0
                    ):
                        self.save_checkpoint(f"step_{self.global_step}",
                                             weights_only=True)
                    if self.max_steps and self.global_step >= self.max_steps:
                        self.save_checkpoint("last")
                        self._sync_ranks()
                        return
                epoch_time = time.time() - epoch_start
                print(f"Epoch {epoch} time: {epoch_time:.1f}s")
                self.logger.log({"epoch_time": epoch_time}, self.global_step)

                if val_loader is not None and (
                    (epoch + 1) % self.val_every_n_epochs == 0
                ):
                    monitor_val = self.validate(val_loader, epoch)
                    self.maybe_save_topk(monitor_val)
                # the full last checkpoint (params + opt state) is ~860 MB
                # for the live model — remote/tunnel hosts can lower the
                # cadence (interrupt/exception/max-steps still save)
                if (epoch + 1) % self.save_last_every_n_epochs == 0:
                    self.save_checkpoint("last")
                    self._last_ckpt_epoch = epoch
            # any loop exit on an epoch whose tail wasn't just saved must
            # not lose it (off-cadence max_epochs, future break paths)
            if (
                self.max_epochs > 0
                and self._last_ckpt_epoch != self.max_epochs - 1
            ):
                self.save_checkpoint("last")
            self._sync_ranks()
        except KeyboardInterrupt:
            print("Interrupted; saving checkpoint.")
            self.save_checkpoint("last", collective=False)
        except Exception:
            traceback.print_exc()
            self.save_checkpoint("on_exception", collective=False)
            raise
        finally:
            self.flush_checkpoint_writes()
            signal.signal(signal.SIGUSR1, old_usr1)
            signal.signal(signal.SIGTERM, old_term)

    @staticmethod
    def _weighted_means(all_metrics: Dict[str, list]) -> dict:
        """Batch-size-weighted means of per-batch mean metrics: the trimmed
        final val batch can be smaller, and each ITEM (not each batch)
        should count equally in the monitor driving top-k checkpoints and
        plateau LR drops. Each key carries its own (value, weight) pairs
        because stratified keys only appear on a subset of batches."""
        return {
            k: float(np.average([v for v, _ in pairs],
                                weights=[w for _, w in pairs]))
            for k, pairs in all_metrics.items()
        }

    def validate(self, val_loader, epoch: int):
        all_metrics: Dict[str, list] = {}
        n_dev = self._local_device_multiple()
        # Proactively drop the device audio cache before validation: the
        # val executable is a fresh compile whose workspace must fit
        # alongside params/opt/cache, and the r5 stage-2 run died with
        # RESOURCE_EXHAUSTED at its FIRST val when the cache sat at a
        # ~2.5 GB fill (the error surfaces at device_get of the val
        # metrics because dispatch is async — by then the failed result
        # is poisoned and no retry can save it). Rows refill lazily from
        # the val batches themselves and then from training; the only
        # cost is ~1 epoch of re-uploads per val (val cadence is 10
        # epochs in the retrain recipe).
        if self._audio_cache is not None:
            self._audio_cache.clear()
        for batch_idx, batch in enumerate(val_loader):
            # TRIM uneven val batches to a mesh multiple instead of
            # cycle-padding: duplicated samples would bias the val means
            # that drive top-k checkpoint ranking and plateau LR drops.
            # The trim is the same every epoch (val loaders don't shuffle),
            # so rankings stay comparable; a batch smaller than the mesh is
            # skipped entirely.
            b = next(
                (v.shape[0] for v in batch.values()
                 if isinstance(v, np.ndarray)), 0,
            )
            keep = (b // n_dev) * n_dev
            if keep == 0:
                continue
            if keep < b:
                # per-item list fields (meta/convertor/audio_key) must be
                # trimmed in lockstep with the tensors, or downstream
                # row-aligned consumers (BeatmapLogger, the device audio
                # cache) would pair row i with item j
                batch = {
                    k: (
                        v[:keep]
                        if isinstance(v, np.ndarray)
                        or (isinstance(v, list) and len(v) == b)
                        else v
                    )
                    for k, v in batch.items()
                }
            # deterministic per-batch seed (ref: diffusion.py:434-436).
            # Derived from the trainer seed + batch index — stable across
            # processes and reruns (str hash() is salted per process).
            rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), batch_idx)
            try:
                dev_batch = self._device_batch(batch)
                metrics = jax.device_get(self._dispatch_val_step(
                    dev_batch, rng, batch_idx % 10
                ))
            except jax.errors.JaxRuntimeError as e:
                # reactive relief: dispatch is async, so a device OOM in
                # the val computation surfaces here as RESOURCE_EXHAUSTED
                # on the readback of a POISONED result — the fix is to
                # free HBM (drop the audio cache) and RE-DISPATCH the
                # batch, never to retry the readback (that can only
                # rethrow). Single retry: a second failure is a real OOM.
                if "RESOURCE_EXHAUSTED" not in str(e) \
                        or self._audio_cache is None:
                    raise
                n = len(self._audio_cache._rows)
                self._audio_cache.clear()
                print(f"val batch {batch_idx} hit RESOURCE_EXHAUSTED; "
                      f"cleared {n} device-cached audio rows and "
                      f"re-dispatching")
                dev_batch = self._device_batch(batch)
                metrics = jax.device_get(self._dispatch_val_step(
                    dev_batch, rng, batch_idx % 10
                ))
            for k, v in metrics.items():
                all_metrics.setdefault(k, []).append((float(v), keep))
            for cb in self.callbacks:
                if hasattr(cb, "on_validation_batch_end"):
                    cb.on_validation_batch_end(
                        self, batch, batch_idx, split="val"
                    )
        means = self._weighted_means(all_metrics)
        means["epoch"] = epoch
        self.logger.log(means, self.global_step)
        if self.wandb_run is not None:
            self.wandb_run.log(means, step=self.global_step)
        monitor = getattr(self.task, "monitor", "val/loss")
        monitor_val = means.get(monitor, means.get("val/loss"))
        self._maybe_reduce_lr_on_plateau(monitor_val)
        return monitor_val

    def _current_lr(self) -> float:
        """The learning rate actually in effect this step: the injected
        plateau-scaled LR from opt_state (VAE task), else the task's
        schedule evaluated at the optimizer's inner update count (diffusion
        LambdaLinear warmup — MultiSteps applies one inner update per
        ``accumulate`` steps), else the constant scaled base rate."""

        def find_injected(state):
            if hasattr(state, "hyperparams") and \
                    "learning_rate" in state.hyperparams:
                return float(state.hyperparams["learning_rate"])
            if isinstance(state, tuple):
                for s in state:
                    r = find_injected(s)
                    if r is not None:
                        return r
            return None

        injected = find_injected(self.opt_state)
        if injected is not None:
            return injected
        lr_fn = getattr(self.task, "lr_fn", None)
        if lr_fn is not None:
            # global_step is already incremented when logging fires; the
            # update just executed used optax's pre-update count
            step = max(self.global_step - 1, 0)
            return float(lr_fn(step // self.accumulate))
        return float(self.learning_rate)

    def _maybe_reduce_lr_on_plateau(self, monitor_val):
        """ReduceLROnPlateau for tasks exposing plateau_factor/patience
        (ref: autoencoder.py:145). Requires inject_hyperparams optimizers."""
        factor = getattr(self.task, "plateau_factor", None)
        patience = getattr(self.task, "plateau_patience", None)
        if factor is None or patience is None or monitor_val is None:
            return
        if self._plateau_best is None or monitor_val < self._plateau_best:
            self._plateau_best = monitor_val
            self._plateau_bad_epochs = 0
            return
        self._plateau_bad_epochs += 1
        if self._plateau_bad_epochs <= patience:
            return
        self._plateau_bad_epochs = 0
        # find and scale the injected learning_rate hyperparam in opt_state
        def scale(state):
            if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
                state.hyperparams["learning_rate"] = (
                    state.hyperparams["learning_rate"] * factor
                )
                return True
            if isinstance(state, tuple):
                return any(scale(s) for s in state)
            return False

        if scale(self.opt_state):
            print(f"ReduceLROnPlateau: lr scaled by {factor}")

    # --------------------------------------------------------- checkpoints

    def _mp_ready(self, dev_batch, rng):
        """The train step to dispatch for this batch signature.

        Single-process: the jitted step. Multi-process: cross-process
        collective (gloo/ICI) contexts initialize lazily at a step's FIRST
        execution with a ~30 s handshake timeout, while each rank's jit
        compile of a new batch shape can skew ranks apart by minutes
        (cache hit vs miss). So for every new signature: AOT-compile on every
        rank (no collectives execute during compilation), BARRIER on the
        coordination service, and only then dispatch — ranks enter the
        handshake together. validate() applies the same treatment to the
        val executable's signatures."""
        if jax.process_count() <= 1:
            return self._train_step
        sig = _batch_sig(dev_batch)
        exe = self._mp_exec.get(sig)
        if exe is None:
            exe = self._train_step.lower(
                self.params, self.opt_state, dev_batch, rng
            ).compile()
            self._mp_barrier(f"mug_step_ready_{len(self._mp_exec)}")
            self._mp_exec[sig] = exe
        return exe

    def _dispatch_val_step(self, dev_batch, rng, level: int):
        """Run the validation step for one batch.

        Single-process: the jitted wrapper. Multi-process: the same
        compile-skew hazard as _mp_ready — each new executable's
        collective contexts handshake within ~30 s of first execution —
        so per signature the step is AOT-compiled, rank-barriered, STORED,
        and dispatched directly (no jit re-dispatch, no reliance on the
        persistent compile cache being writable on every host). The
        traced-bounds path keys by batch signature (one executable serves
        all 10 deciles); the static-level path (VAE task) keys by
        (signature, level)."""
        if jax.process_count() <= 1:
            return self._val_step(self.params, dev_batch, rng, level)

        rng = jax.device_put(np.asarray(rng), self._rep_sharding)
        sig = _batch_sig(dev_batch)
        if self._val_step_jit is not None:
            lo = int(level / 10 * self._val_num_t)
            hi = int((level + 1) / 10 * self._val_num_t)
            lo_hi = tuple(
                jax.device_put(np.int32(v), self._rep_sharding)
                for v in (lo, hi)
            )
            exe = self._mp_val_exec.get(sig)
            if exe is None:
                exe = self._val_step_jit.lower(
                    self.params, dev_batch, rng, *lo_hi
                ).compile()
                self._mp_barrier(f"mug_val_ready_{len(self._mp_val_exec)}")
                self._mp_val_exec[sig] = exe
            metrics = dict(exe(self.params, dev_batch, rng, *lo_hi))
            metrics[f"loss_level_{level}"] = metrics.pop("loss_level")
            return metrics
        key = (sig, level)
        exe = self._mp_val_exec.get(key)
        if exe is None:
            exe = self._val_step.lower(
                self.params, dev_batch, rng, level
            ).compile()
            self._mp_barrier(f"mug_val_ready_{len(self._mp_val_exec)}")
            self._mp_val_exec[key] = exe
        return exe(self.params, dev_batch, rng)  # level is baked (static)

    @staticmethod
    def _mp_barrier(name: str, timeout_ms: int = 3_600_000):
        """Coordination-service barrier (NOT a device collective — gloo
        contexts have their own 30 s handshake, which is the very problem
        these barriers solve)."""
        from jax._src import distributed

        client = getattr(distributed.global_state, "client", None)
        if client is not None:
            client.wait_at_barrier(name, timeout_in_ms=timeout_ms)

    def _sync_ranks(self):
        """Leave fit in lockstep under multi-process SPMD: rank 0's
        checkpoint write takes long enough that other (rank-gated) ranks
        would otherwise reach the distributed-runtime shutdown barrier
        alone and time it out, killing the job at the finish line. No-op
        single-process; intentionally NOT called on exception paths (a
        dying rank must not make the others block on a barrier). Flushes
        the pending async write FIRST so peers released by the barrier
        never read a checkpoint rank 0 is still writing."""
        if jax.process_count() > 1:
            self.flush_checkpoint_writes()
            self._mp_barrier("mug_fit_end", timeout_ms=600_000)

    def _device_get_relieved(self, tree):
        """``jax.device_get`` with HBM-pressure relief: a large-corpus
        device audio cache can pin HBM right up to its budget, and the
        readback's device-side staging then fails with RESOURCE_EXHAUSTED
        (observed on v5e with a 4 GiB cache + full train state: the r5
        stage-2 run died at its first ``save_checkpoint("last")``). On
        that error, drop the cache (rows refill lazily, training
        distribution unchanged) and retry once instead of losing the run.
        """
        try:
            return jax.device_get(tree)
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e) \
                    or self._audio_cache is None:
                raise
            n = len(self._audio_cache._rows)
            self._audio_cache.clear()
            print(f"checkpoint readback hit RESOURCE_EXHAUSTED; cleared "
                  f"{n} device-cached audio rows and retrying")
            return jax.device_get(tree)

    def save_checkpoint(self, name: str, weights_only: bool = False,
                        collective: bool = True):
        # a pending async write must land before ANY new save touches the
        # tree — including emergency/sync paths, which could otherwise run
        # a second orbax save on the same 'last' directory concurrently
        # with the ckpt-writer thread. Emergency saves tolerate (print) a
        # failed previous write instead of raising: they must still dump.
        self.flush_checkpoint_writes(raise_on_error=collective)
        # EVERY rank calls this under multi-process SPMD: orbax
        # coordinates the save itself (primary host writes, the others
        # participate in its barriers) — rank-gating it deadlocks rank 0
        # waiting for peers that never joined. ``collective=False`` is for
        # exception/interrupt paths, where only ONE rank may be alive: a
        # collective save from a single rank would deadlock against peers
        # still blocked inside the train-step collective, so it falls back
        # to a rank-local npz dump of the (replicated) params instead.
        path = os.path.join(self.logdir, "checkpoints", name)
        if not collective and jax.process_count() > 1:
            rank = jax.process_index()
            path = os.path.join(
                self.logdir, "checkpoints",
                f"{name}_rank{rank}_emergency.npz",
            )
            flat, _ = jax.tree_util.tree_flatten_with_path(
                jax.device_get(self.params)["params"]
            )
            np.savez(
                path, step=self.global_step,
                **{jax.tree_util.keystr(p): np.asarray(v) for p, v in flat},
            )
            print(f"rank {rank}: emergency params dump at {path}")
            return path
        multiproc = jax.process_count() > 1
        if self.async_checkpoint and collective and multiproc \
                and not self.is_main_process:
            # rank-local async: ONLY rank 0 writes (the params are
            # replicated, so its addressable copy is the whole tree —
            # exactly what coordinated orbax would persist). Peers skip
            # even the device_get; cross-rank ordering comes from the
            # main-thread barriers (_sync_ranks flushes rank 0's writer
            # before releasing peers). A write failure is surfaced on
            # rank 0's next flush; peers cannot observe it.
            return path
        payload = {"params": self._device_get_relieved(self.params)["params"],
                   "step": self.global_step}
        if not weights_only and self.opt_state is not None:
            # opt_state stored separately to keep partial restores simple
            payload["opt_state"] = self._device_get_relieved(self.opt_state)
        # emergency paths (collective=False) must land before the process
        # can die -> always synchronous
        if self.async_checkpoint and collective:
            import threading

            def work():
                try:
                    # local_only: the writer thread must never touch the
                    # gloo/coordination channels the main thread is using
                    ckpt_utils.save_checkpoint(path, payload,
                                               local_only=multiproc)
                except BaseException as e:  # surfaced by the next flush
                    self._ckpt_error = e

            self._ckpt_error = None
            self._ckpt_thread = threading.Thread(
                target=work, daemon=True, name="ckpt-writer",
            )
            self._ckpt_thread.start()
        else:
            ckpt_utils.save_checkpoint(path, payload)
        return path

    def flush_checkpoint_writes(self, raise_on_error: bool = True):
        """Block until the pending async checkpoint write (if any) lands.

        A failed write re-raises here (the writer thread can't) so a full
        disk is not silently mistaken for a saved checkpoint — in
        particular maybe_save_topk must not evict a real checkpoint in
        favor of a phantom one; its pre-prune flush hits this raise first.
        """
        if self._ckpt_thread is not None:
            self._ckpt_thread.join()
            self._ckpt_thread = None
        err = getattr(self, "_ckpt_error", None)
        self._ckpt_error = None
        if err is not None:
            if raise_on_error:
                raise RuntimeError(
                    "async checkpoint write failed"
                ) from err
            print(f"async checkpoint write failed (continuing): {err!r}")

    def maybe_save_topk(self, monitor_value):
        if monitor_value is None:
            return
        path = self.save_checkpoint(
            f"epoch_{self.global_step}_m{monitor_value:.4f}", weights_only=True
        )
        self._top_k.append((monitor_value, path))
        self._top_k.sort(key=lambda x: x[0])
        if len(self._top_k) > self.save_top_k:
            # never rmtree a directory a pending async write may still be
            # filling (the evicted one could be the save just dispatched)
            self.flush_checkpoint_writes()
        while len(self._top_k) > self.save_top_k:
            _, worst = self._top_k.pop()
            if self.is_main_process:  # peers would race the delete
                import shutil

                shutil.rmtree(worst, ignore_errors=True)
