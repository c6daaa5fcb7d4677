"""Data module: builds train/valid loaders from layered config.

ref: main.py:163-246 DataModuleFromConfig — ``common_params`` merge into each
split's params, then reflection-instantiate the dataset classes.
"""

from __future__ import annotations

from typing import Optional

from mug_diffusion_tpu.data.dataset import Loader
from mug_diffusion_tpu.utils.config import instantiate_from_config


class DataModuleFromConfig:
    def __init__(
        self,
        batch_size: int,
        train=None,
        validation=None,
        test=None,
        common_params=None,
        wrap=False,
        num_workers: Optional[int] = None,
        scale_batch_by_bucket: bool = False,
        worker_type: str = "thread",
    ):
        self.batch_size = batch_size
        self.num_workers = num_workers if num_workers is not None else 2
        self.scale_batch_by_bucket = scale_batch_by_bucket
        # "process" = the reference's worker-process loaders (main.py:163-246
        # num_workers) for multi-core hosts; see data/dataset.py Loader
        self.worker_type = worker_type
        self.common_params = dict(common_params or {})
        self.dataset_configs = {}
        if train is not None:
            self.dataset_configs["train"] = train
        if validation is not None:
            self.dataset_configs["validation"] = validation
        if test is not None:
            self.dataset_configs["test"] = test
        self.datasets = {}

    @staticmethod
    def _process_shard():
        """Per-rank loader shard under multi-process SPMD (the reference's
        DistributedSampler under DDP): (num_shards, shard_index) from the
        JAX runtime, (1, 0) single-process."""
        import jax

        return jax.process_count(), jax.process_index()

    def setup(self):
        for split, cfg in self.dataset_configs.items():
            params = dict(cfg.get("params", {}) or {})
            merged = dict(self.common_params)
            merged.update(params)
            cfg = dict(cfg)
            cfg["params"] = merged
            self.datasets[split] = instantiate_from_config(cfg)
        return self

    def train_dataloader(self) -> Loader:
        num_shards, shard_index = self._process_shard()
        return Loader(
            self.datasets["train"], self.batch_size, shuffle=True,
            num_workers=self.num_workers,
            scale_batch_by_bucket=self.scale_batch_by_bucket,
            worker_type=self.worker_type,
            num_shards=num_shards, shard_index=shard_index,
        )

    def val_dataloader(self) -> Loader:
        # constant batch size for validation: Trainer.validate averages
        # per-batch means, so bucket-scaled (unequal) batches would weight
        # short-chart items ~batch_scale times less in the val monitor
        num_shards, shard_index = self._process_shard()
        return Loader(
            self.datasets["validation"], self.batch_size, shuffle=False,
            num_workers=self.num_workers, drop_last=False,
            scale_batch_by_bucket=False,
            worker_type=self.worker_type,
            num_shards=num_shards, shard_index=shard_index,
        )
