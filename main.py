"""Trainer driver CLI.

TPU-native equivalent of the reference driver (ref: main.py): layered YAML
configs merged left-to-right with CLI dot-list overrides, run logdir with
config snapshots, resume support, LR scaling, and the same callback set
(checkpointing / beatmap logging / device stats).

Usage:
    python main.py -b configs/mug/mug_diffusion_tpu.yaml -t
    python main.py -b cfg.yaml -t model.params.timesteps=500
    python main.py -r logs/<run>  (resume)
"""

from __future__ import annotations

import argparse
import datetime
import glob
import os
import sys

import jax
import yaml

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mug_diffusion_tpu.parallel.mesh import create_mesh
from mug_diffusion_tpu.training.callbacks import BeatmapLogger
from mug_diffusion_tpu.training.datamodule import DataModuleFromConfig
from mug_diffusion_tpu.training.tasks import build_task
from mug_diffusion_tpu.training.trainer import Trainer
from mug_diffusion_tpu.utils.seed import seed_everything
from mug_diffusion_tpu.utils.config import (
    apply_dotlist,
    instantiate_from_config,
    load_config,
)


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-b", "--base", nargs="*", default=[],
                   help="base config yaml(s), merged left-to-right")
    p.add_argument("-t", "--train", action="store_true", help="train")
    p.add_argument("-r", "--resume", type=str, default="",
                   help="resume from logdir or checkpoint")
    p.add_argument("-n", "--name", type=str, default="")
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("--devices", type=int, default=None,
                   help="number of devices for the data mesh")
    p.add_argument("--dcn_slices", type=int, default=None,
                   help="multi-slice TPU: number of slices; builds a "
                        "(replica, data) hybrid mesh — batch shards over "
                        "both axes, gradient reduce runs ICI-first then "
                        "one cross-slice DCN sum")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host SPMD: jax.distributed.initialize() "
                        "from the cluster environment (TPU pods "
                        "auto-detect; elsewhere set JAX_COORDINATOR_"
                        "ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID). "
                        "Every host runs this same command; loaders "
                        "shard per rank automatically")
    p.add_argument("--scale_lr", type=bool, default=True)
    p.add_argument("--max_epochs", type=int, default=1000)
    p.add_argument("--max_steps", type=int, default=None)
    return p


def main(argv=None):
    parser = get_parser()
    opt, unknown = parser.parse_known_args(argv)

    if opt.distributed:
        # must run before any device access; forms the global multi-host
        # runtime the mesh/loaders/trainer then pick up via
        # jax.process_count()/process_index() (ref DDP: main.py:536-537).
        # On TPU pods/SLURM the cluster auto-detects; generic clusters set
        # JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES + JAX_PROCESS_ID.
        kw = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kw = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kw)
        print(
            f"distributed: process {jax.process_index()}/"
            f"{jax.process_count()}, {len(jax.local_devices())} local / "
            f"{len(jax.devices())} global devices"
        )

    if opt.resume:
        if os.path.isfile(opt.resume):
            logdir = os.path.dirname(os.path.dirname(opt.resume))
            ckpt = opt.resume
        else:
            logdir = opt.resume.rstrip("/")
            ckpt = os.path.join(logdir, "checkpoints", "last")
        base_configs = sorted(
            glob.glob(os.path.join(logdir, "configs", "*.yaml"))
        )
        opt.base = base_configs + opt.base
        nowname = os.path.basename(logdir)
    else:
        ckpt = None
        now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
        cfg_name = (
            os.path.splitext(os.path.basename(opt.base[0]))[0]
            if opt.base else "run"
        )
        nowname = now + ("_" + opt.name if opt.name else "_" + cfg_name)
        if opt.distributed:
            # ranks start at slightly different wall-clocks: every rank
            # must use rank 0's timestamped run name or the coordinated
            # checkpoint saves would target different directories
            from jax._src import distributed

            client = getattr(distributed.global_state, "client", None)
            if client is not None and jax.process_count() > 1:
                if jax.process_index() == 0:
                    client.key_value_set("mug_nowname", nowname)
                nowname = client.blocking_key_value_get(
                    "mug_nowname", timeout_in_ms=60_000
                )
        logdir = os.path.join(opt.logdir, nowname)

    config = load_config(*opt.base)
    config = apply_dotlist(config, [u for u in unknown if "=" in u])

    os.makedirs(os.path.join(logdir, "configs"), exist_ok=True)
    if not opt.distributed or jax.process_index() == 0:
        # rank-0-only on shared filesystems: identical-content races are
        # still races
        with open(
            os.path.join(logdir, "configs", "project.yaml"), "w"
        ) as f:
            yaml.safe_dump(config, f)

    model_config = config["model"]
    data_config = config["data"]
    lightning_config = config.get("lightning", {})

    # global determinism: Python/NumPy RNGs + PYTHONHASHSEED
    # (ref: Lightning seed_everything, main.py:525)
    seed_everything(opt.seed)

    task = build_task(model_config)
    data: DataModuleFromConfig = instantiate_from_config(data_config)
    data.setup()

    callbacks = []
    cb_cfgs = lightning_config.get("callbacks", {})
    for name, cb_cfg in cb_cfgs.items():
        if "beatmap_logger" in name:
            callbacks.append(instantiate_from_config(cb_cfg))

    trainer_cfg = lightning_config.get("trainer", {})
    mesh = create_mesh(n_devices=opt.devices, dcn_slices=opt.dcn_slices)
    trainer = Trainer(
        task=task,
        logdir=logdir,
        base_learning_rate=model_config.get("base_learning_rate", 1e-4),
        batch_size=data_config["params"]["batch_size"],
        accumulate_grad_batches=trainer_cfg.get("accumulate_grad_batches", 1),
        val_every_n_epochs=trainer_cfg.get("val_every_n_epochs", 1),
        save_last_every_n_epochs=trainer_cfg.get(
            "save_last_every_n_epochs", 1
        ),
        ckpt_every_n_steps=trainer_cfg.get("ckpt_every_n_steps", 10000),
        save_top_k=trainer_cfg.get("save_top_k", 3),
        async_checkpoint=trainer_cfg.get("async_checkpoint", False),
        device_audio_cache=trainer_cfg.get("device_audio_cache", False),
        device_audio_cache_mb=trainer_cfg.get("device_audio_cache_mb", 4096),
        log_every_n_steps=trainer_cfg.get("log_every_n_steps", 50),
        max_epochs=opt.max_epochs,
        max_steps=opt.max_steps,
        mesh=mesh,
        seed=opt.seed,
        scale_lr=opt.scale_lr,
        callbacks=callbacks,
    )

    common = data_config["params"].get("common_params", {})
    batch_spec = {
        "batch": min(2, data_config["params"]["batch_size"]),
        "n_mels": common.get("n_mels", 128),
        "audio_note_window_ratio": common.get("audio_note_window_ratio", 8),
    }
    trainer.setup(batch_spec=batch_spec, restore_path=ckpt,
                  resume=bool(opt.resume))

    if opt.train:
        trainer.fit(data)
    return trainer


if __name__ == "__main__":
    main()
