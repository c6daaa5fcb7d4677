"""Validation-time generative probes and device stats.

ref: mug/data/dataset.py:295-330 BeatmapLogger (full ancestral sampling on a
val batch, dumping intermediate .osu files) and main.py:404-429 CUDACallback
(epoch wall time + peak memory).
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

import jax
import numpy as np

from mug_diffusion_tpu.data import convertor


class BeatmapLogger:
    """Every few validations, run the full ancestral sampler on a val batch
    and dump decoded .osu charts at each log_every_t step
    (ref: dataset.py:295-330 + diffusion.py:228-316 log_beatmap)."""

    def __init__(self, log_batch_idx, count, splits=None, log_images_kwargs=None):
        self.log_batch_idx = (
            log_batch_idx if isinstance(log_batch_idx, (list, tuple))
            else [log_batch_idx]
        )
        self.splits = splits or ["val"]
        self.count = count
        self.log_index = 0

    def on_validation_batch_end(self, trainer, batch, batch_idx, split="val"):
        if batch_idx not in self.log_batch_idx or split not in self.splits:
            return
        task = trainer.task
        if not hasattr(task, "model") or not hasattr(task.model, "ancestral_sample"):
            return self._log_vae(trainer, batch)
        self.log_index += 1
        if self.log_index % 5 != 2:  # ref: diffusion.py:229-231
            return

        ddpm = task.model
        import jax.numpy as jnp

        audio = jnp.asarray(batch["audio"])
        feature = jnp.asarray(batch["feature"])
        c, w = ddpm.encode_conditioning(trainer.params, audio, feature)
        B = audio.shape[0]
        rng = jax.random.PRNGKey(self.log_index)
        shape = (B, ddpm.z_length, ddpm.z_channels)
        x, intermediates = ddpm.ancestral_sample(
            trainer.params, c, w, rng, shape
        )
        valid = np.asarray(batch["valid_flag"])[:, :, None]

        save_root = os.path.join(
            trainer.logdir, "beatmaps", str(self.log_index)
        )
        # name intermediates by their actual diffusion timestep
        T = ddpm.num_timesteps
        log_ts = [
            i for i in range(T - 1, -1, -1)
            if i % ddpm.log_every_t == 0 or i == T - 1
        ]
        decoded = [
            (np.asarray(ddpm.decode(trainer.params, z)) * valid, t_step)
            for t_step, z in zip(log_ts, np.asarray(intermediates))
        ]
        metas = batch.get("meta", [])
        convs = batch.get("convertor", [])
        for i in range(min(B, self.count, len(metas))):
            path = metas[i]["path"]
            save_dir = os.path.join(
                save_root, os.path.basename(os.path.dirname(path))
            )
            os.makedirs(save_dir, exist_ok=True)
            convertor_params = dict(convs[i])
            convertor_params["from_logits"] = True
            try:
                _, meta = convertor.parse_osu_file(path, convertor_params)
                shutil.copyfile(
                    path, os.path.join(save_dir, os.path.basename(path))
                )
                for x_dec, t in decoded:
                    target = os.path.join(
                        save_dir,
                        os.path.basename(path).replace(".osu", f"_step={t}.osu"),
                    )
                    convertor.save_osu_file(
                        meta, x_dec[i].T, target,
                        {"Version": f"{meta.version}, step={t}"},
                    )
            except Exception as e:  # noqa: BLE001
                print(f"BeatmapLogger failed for {path}: {e}")

        # recurring chart-quality gate: mini-jack counts and note totals of
        # the fully denoised (step=0) samples vs their ground-truth charts,
        # logged as metrics.csv columns per validation so quality TRENDS are
        # visible across checkpoints — the reference only had the one-off
        # offline script (ref scripts/jack_speed_statistics.py)
        try:
            quality = self._quality_metrics(save_root)
            if quality:
                trainer.logger.log(quality, trainer.global_step)
                if getattr(trainer, "wandb_run", None) is not None:
                    trainer.wandb_run.log(quality, step=trainer.global_step)
        except Exception as e:  # noqa: BLE001
            print(f"BeatmapLogger quality metrics failed: {e}")

    @staticmethod
    def _quality_metrics(save_root, jack_interval_ms: float = 100.0):
        """Walk one probe dump: mini-jack counts (<100 ms same-column) and
        note counts for generated step=0 charts vs the copied originals."""
        from collections import defaultdict

        def stats(osu_path):
            hit_objects, meta = convertor.parse_osu_file(osu_path, None)
            # column width from the chart's own key count (CircleSize);
            # 4K default if absent
            width = 512.0 / (int(meta.cs) if meta.cs else 4)
            per_col = defaultdict(list)
            for line in hit_objects:
                p = line.split(",")
                per_col[int(int(float(p[0])) / width)].append(
                    int(float(p[2]))
                )
            jacks = 0
            for starts in per_col.values():
                starts.sort()
                jacks += sum(
                    1 for a, b in zip(starts, starts[1:])
                    if b - a < jack_interval_ms
                )
            return jacks, len(hit_objects)

        gen_jacks = gen_notes = ref_jacks = ref_notes = 0
        n_gen = n_ref = 0
        for root, _, files in os.walk(save_root):
            for name in files:
                if not name.endswith(".osu"):
                    continue
                path = os.path.join(root, name)
                if name.endswith("_step=0.osu"):
                    j, n = stats(path)
                    gen_jacks += j
                    gen_notes += n
                    n_gen += 1
                elif "_step=" not in name:
                    j, n = stats(path)
                    ref_jacks += j
                    ref_notes += n
                    n_ref += 1
        if n_gen == 0:
            return None
        metrics = {
            "quality/gen_jacks": gen_jacks,
            "quality/gen_notes": gen_notes,
            "quality/gen_jack_rate_per_1k": (
                1000.0 * gen_jacks / max(gen_notes, 1)
            ),
        }
        if n_ref:
            metrics.update({
                "quality/ref_jacks": ref_jacks,
                "quality/ref_notes": ref_notes,
                "quality/ref_jack_rate_per_1k": (
                    1000.0 * ref_jacks / max(ref_notes, 1)
                ),
            })
        return metrics

    def _log_vae(self, trainer, batch):
        """VAE round-trip dump: encode -> posterior sample -> decode, saving
        reconstructed .osu charts beside the originals so a human can A/B
        them in the editor (ref: autoencoder.py:147-179 log_beatmap and
        scripts/test_autoencoder.py)."""
        task = trainer.task
        vae = getattr(task, "vae", None)
        if vae is None:
            return
        self.log_index += 1
        if self.log_index % 5 != 2:  # same cadence as the diffusion probe
            return
        import jax.numpy as jnp

        notes = jnp.asarray(batch["note"])
        recon, _ = vae.apply(
            trainer.params, notes, jax.random.PRNGKey(self.log_index),
            sample_posterior=True, deterministic=True,
        )
        recon = np.asarray(recon)
        valid = np.asarray(batch["valid_flag"])[:, :, None]
        recon = recon * valid
        metas = batch.get("meta", [])
        convs = batch.get("convertor", [])
        save_root = os.path.join(
            trainer.logdir, "vae_recon", str(self.log_index)
        )
        for i in range(min(recon.shape[0], self.count, len(metas))):
            path = metas[i]["path"]
            save_dir = os.path.join(
                save_root, os.path.basename(os.path.dirname(path))
            )
            os.makedirs(save_dir, exist_ok=True)
            convertor_params = dict(convs[i])
            convertor_params["from_logits"] = True
            try:
                _, meta = convertor.parse_osu_file(path, convertor_params)
                shutil.copyfile(
                    path, os.path.join(save_dir, os.path.basename(path))
                )
                convertor.save_osu_file(
                    meta, recon[i].T,
                    os.path.join(
                        save_dir,
                        os.path.basename(path).replace(".osu", "_recon.osu"),
                    ),
                    {"Version": f"{meta.version} recon"},
                )
            except Exception as e:  # noqa: BLE001
                print(f"BeatmapLogger VAE dump failed for {path}: {e}")


class DeviceStatsCallback:
    """Peak device memory per epoch (ref: main.py:404-429 CUDACallback)."""

    @staticmethod
    def peak_memory_mb() -> Optional[float]:
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats and "peak_bytes_in_use" in stats:
                return stats["peak_bytes_in_use"] / 2 ** 20
        except Exception:  # noqa: BLE001
            pass
        return None
