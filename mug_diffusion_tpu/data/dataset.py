"""Training dataset + host-side data loader.

NumPy port of ref: mug/data/dataset.py OsuDataset — same augmentation
surface (mirror / random column shuffle / shift / rate / pitch-shift /
freq-mask / feature dropout), same sqlite ``feature.db`` + live MinaCalc
relabeling at train time (ref: dataset.py:105-194), same md5-ordered 90/10
train/valid split and error-quarantine-with-resample behavior.

Replaces the torch DataLoader with a thread-pool prefetch loader feeding
NumPy batches; device placement/sharding happens in
mug_diffusion_tpu.parallel.shard_batch.

Tensor layout: examples are channels-last — note [T, 4K], audio [Tmel, 128]
(the codec's [4K, T] is transposed here once, on the host).
"""

from __future__ import annotations

import hashlib
import multiprocessing
import os
import random
import sqlite3
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Iterator, List

import numpy as np
import yaml

from mug_diffusion_tpu.data.convertor import parse_osu_file
from mug_diffusion_tpu.ops.mel import load_audio
from mug_diffusion_tpu.utils import feature_codec

try:  # our C++ MinaCalc binding (native/minacalc)
    import minacalc

    HAS_MINACALC = True
except ImportError:
    HAS_MINACALC = False

ETT_KEYS = [
    "overall", "stream", "jumpstream", "handstream", "stamina",
    "jackspeed", "chordjack", "technical",
]


def _resize_audio_rate(audio: np.ndarray, t: int) -> np.ndarray:
    """Linear time-resize of a [n_mels, T] mel image (ref dataset.py:228-230
    uses cv2.resize; identical bilinear semantics)."""
    import cv2

    n_mels = audio.shape[0]
    return cv2.resize(audio.reshape(n_mels, -1, 1).astype(np.float32), (t, n_mels))


class OsuDataset:
    """ref: mug/data/dataset.py:24-274."""

    def __init__(
        self,
        txt_file,
        feature_yaml=None,
        sr=22050,
        n_fft=2048,
        max_audio_frame=16384,
        audio_note_window_ratio=2,
        n_mels=128,
        mirror_p=0,
        random_p=0,
        shift_p=0,
        rate_p=0,
        pitch_p=0,
        feature_dropout_p=0,
        mirror_at_interval_p=0,
        freq_mask_p=0,
        freq_mask_num=15,
        rate=None,
        test_txt_file=None,
        with_audio=False,
        with_feature=False,
        cache_dir=None,
        length_buckets=None,
    ):
        txt_file_paths = [txt_file] if isinstance(txt_file, str) else txt_file
        self.beatmap_paths: List[str] = []
        for p in txt_file_paths:
            with open(p, "r", encoding="utf-8") as f:
                self.beatmap_paths.extend(f.read().splitlines())
        # md5-keyed deterministic shuffle (ref: dataset.py:57)
        self.beatmap_paths = sorted(
            self.beatmap_paths,
            key=lambda x: int(hashlib.md5(x.encode("utf-8")).hexdigest(), 16),
        )
        self.beatmap_paths = self.filter_beatmap_paths(self.beatmap_paths)

        self.feature_yaml = None
        self.with_feature = with_feature
        self.feature_dropout_p = feature_dropout_p
        if feature_yaml is not None and with_feature:
            with open(feature_yaml) as f:
                self.feature_yaml = yaml.safe_load(f)

        if test_txt_file is not None:
            with open(test_txt_file, "r", encoding="utf-8") as f:
                self.beatmap_paths = f.read().splitlines() + self.beatmap_paths

        self.audio_hop_length = n_fft // 4
        self.audio_frame_duration = self.audio_hop_length / sr
        self.audio_note_window_ratio = audio_note_window_ratio
        self.convertor_params = {
            "frame_ms": self.audio_frame_duration * audio_note_window_ratio * 1000,
            "max_frame": max_audio_frame // audio_note_window_ratio,
        }
        self.mirror_p = mirror_p
        self.random_p = random_p
        self.shift_p = shift_p
        self.rate_p = rate_p
        self.pitch_p = pitch_p
        self.freq_mask_p = freq_mask_p
        self.freq_mask_num = freq_mask_num
        self.mirror_at_interval_p = mirror_at_interval_p
        self.with_audio = with_audio
        self.rate = rate
        self.sr = sr
        self.n_mels = n_mels
        self.max_audio_frame = max_audio_frame
        self.n_fft = n_fft
        self.max_duration = self.audio_frame_duration * max_audio_frame
        # length-bucketed examples (NOTE frames, ascending, each a divisor-
        # friendly multiple of 8*note_window so the VAE/wave pyramids tile):
        # a chart is cropped to the smallest bucket covering its valid
        # window instead of always padding to max_audio_frame. The Loader
        # then groups batches per bucket — the reference pads every song to
        # ~190 s ([128, 32768] mel, mug_diffusion.yaml:101-113), spending
        # 4x the FLOPs + transfer on a 45 s song. None disables (= ref
        # behavior).
        self.length_buckets = (
            sorted(int(b) for b in length_buckets) if length_buckets else None
        )
        if self.length_buckets:
            assert self.length_buckets[-1] == self.convertor_params[
                "max_frame"
            ], "largest bucket must equal max_audio_frame/ratio"
        self.cache_dir = cache_dir
        self.error_files: List[str] = []
        if cache_dir is not None:
            os.makedirs(cache_dir, exist_ok=True)
            error_path = os.path.join(cache_dir, "error.txt")
            if os.path.isfile(error_path):
                with open(error_path) as f:
                    self.error_files = [x.strip() for x in f.readlines()]

    def __len__(self):
        return len(self.beatmap_paths)

    def filter_beatmap_paths(self, beatmap_paths):
        return beatmap_paths

    # ---------------------------------------------------------- features

    def load_feature(self, path, objs, dropout_prob=0.0, rate=1.0):
        """sqlite features + live MinaCalc relabel (ref: dataset.py:105-194).

        Without the native minacalc module, the feature.db values (written
        by scripts/prepare_beatmap_features.py) are used as-is.
        """
        name = os.path.basename(path)
        set_name = os.path.basename(os.path.dirname(path))
        feature_conn = sqlite3.Connection(
            os.path.join(os.path.dirname(os.path.dirname(path)), "feature.db")
        )
        cursor = feature_conn.execute(
            "SELECT * FROM Feature WHERE name = ? AND set_name = ?",
            [name, set_name],
        )
        column_names = [d[0] for d in cursor.description]
        result = cursor.fetchone()
        assert result is not None, "junk files"

        feature_dict = {}
        for i, col in enumerate(column_names):
            feature_dict[col] = result[i]
            if col == "sr" and rate != 1.0:
                assert 0.5 <= result[i], "too easy"
                assert result[i] <= 9, "too hard"
                # empirical osu! SR scaling under rate change (ref :157-165)
                if rate > 1:
                    star_ratio = 0.8184 * (rate - 1) + 1
                else:
                    star_ratio = 1 / (0.8184 * (1 / rate - 1) + 1)
                feature_dict[col] = result[i] * star_ratio

        if HAS_MINACALC:
            notes = []
            max_note_time = min(self.max_duration, self.max_duration * rate) * 1000
            for line in objs:
                if line.strip() == "":
                    continue
                try:
                    params = line.split(",")
                    start = int(float(params[2]))
                    if start >= max_note_time:
                        continue
                    column = int(int(float(params[0])) / int(512 / 4))
                    assert column <= 3, "invalid column"
                    notes.append((start, column))
                except Exception:
                    pass
            notes.sort(key=lambda x: x[0])
            scores = dict(zip(ETT_KEYS, minacalc.calc_skill_set(rate, notes)))
            patterns = {
                k: v for k, v in scores.items()
                if k not in ("overall", "stamina")
            }
            max_score = max(patterns.values())
            feature_dict.update({"ett": scores["overall"]})
            for k in ETT_KEYS[1:]:
                feature_dict[f"{k}_ett"] = scores[k]
                # dominant pattern: within 1 MSD of the best (ref :178-184)
                feature_dict[k] = int(max_score - scores[k] <= 1)
            feature_dict["stamina_ett"] = scores["stamina"]
            feature_dict["stamina"] = int(max_score - scores["stamina"] <= 1)

        feature_dict_dropout = {
            k: v for k, v in feature_dict.items()
            if random.random() >= dropout_prob
        }
        emb_ids = feature_codec.feature_dict_to_embedding_ids(
            feature_dict_dropout, self.feature_yaml
        )
        return feature_dict_dropout, emb_ids

    # ---------------------------------------------------------- examples

    def draw_convertor_params(self, rng=None) -> dict:
        """One item's augmentation draw (ref: dataset.py:198-257 head).

        ``rng=None`` draws from the global np.random/random streams — the
        legacy ``__getitem__`` path, identical draw order to before. Passing
        a ``np.random.Generator`` gives a deterministic per-(epoch, index)
        stream: the basis for rank-synchronized bucket sharding, where every
        SPMD process must derive the identical (rate, shift) — and hence the
        identical length bucket — for the same item.
        """
        randf = np.random.random if rng is None else rng.random
        p = self.convertor_params.copy()
        p["mirror"] = randf() < self.mirror_p
        p["random"] = randf() < self.random_p
        p["mirror_at_interval_prob"] = self.mirror_at_interval_p
        p["offset_ms"] = 0
        p["rate"] = 1.0
        if self.rate is not None and randf() < self.rate_p:
            p["rate"] = randf() * (self.rate[1] - self.rate[0]) + self.rate[0]
        if randf() < self.shift_p:
            assert not self.with_audio, "Cannot shift audio currently!"
            hi = int(p["max_frame"] * p["frame_ms"] / 2)
            if rng is None:
                p["offset_ms"] = random.randint(0, hi)
            else:
                p["offset_ms"] = int(rng.integers(0, hi + 1))
        return p

    def _choose_bucket(self, valid_flag, frame_ms: float) -> int:
        nz = np.nonzero(valid_flag)[0]
        needed = int(nz.max()) + 1 if nz.size else 1
        # +2 s: the audio context past the last note is kept (zeroed
        # after, see load_item) like the reference — the bucket must
        # cover it, not crop it (charts ending just under a bucket
        # boundary would otherwise lose their tail context)
        tail = int(np.ceil(2000.0 / frame_ms))
        return next(
            (b for b in self.length_buckets if b >= needed + tail),
            self.length_buckets[-1],
        )

    def __getitem__(self, i):
        convertor_params = self.draw_convertor_params()
        try:
            return self.load_item(i, convertor_params)
        except Exception as e:  # quarantine + resample (ref :265-271)
            self._record_error(self.beatmap_paths[i], e)
            return self.__getitem__(random.randint(0, len(self.beatmap_paths) - 1))

    def load_item(self, i, convertor_params, forced_bucket=None):
        """Load one example under the given augmentation params; raises on
        bad files (callers quarantine/resample).

        ``forced_bucket`` overrides the length-bucket choice (note frames).
        Since the codec always materializes the full ``max_frame`` arrays
        before cropping, any forced bucket yields exactly that shape — used
        by rank-synchronized sharding, where the batch shape is planned
        before loading and an error-substitute item must keep it (a chart
        longer than the forced bucket is tail-cropped).
        """
        path = self.beatmap_paths[i]
        objs, beatmap_meta = parse_osu_file(path, convertor_params)
        obj_array, valid_flag = beatmap_meta.convertor.objects_to_array(
            objs, beatmap_meta
        )
        nb = None  # bucketed note-frame count (None = full max_frame)
        if self.length_buckets:
            nb = (
                forced_bucket
                if forced_bucket is not None
                else self._choose_bucket(
                    valid_flag, convertor_params["frame_ms"]
                )
            )
        example = {
            "meta": beatmap_meta.for_batch(),
            "convertor": convertor_params,
            "note": obj_array.T[:nb].astype(np.float32),  # [T, 4K]
            "valid_flag": valid_flag[:nb].astype(np.float32),
        }
        if self.with_audio:
            audio = load_audio(
                self.cache_dir, beatmap_meta.audio, self.n_mels,
                self.audio_hop_length, self.n_fft, self.sr,
                self.max_duration,
            ).astype(np.float32)

            if convertor_params["rate"] != 1.0:
                t = int(round(audio.shape[1] / convertor_params["rate"]))
                audio = _resize_audio_rate(audio, t)

            t = audio.shape[1]
            if t < self.max_audio_frame:
                audio = np.concatenate(
                    [
                        audio,
                        np.zeros(
                            (self.n_mels, self.max_audio_frame - t),
                            dtype=np.float32,
                        ),
                    ],
                    axis=1,
                )
            elif t > self.max_audio_frame:
                audio = audio[:, : self.max_audio_frame]

            # zero audio beyond the chart's valid window (+2 s)
            max_length_ms = (
                np.sum(valid_flag) * convertor_params["frame_ms"] + 2000
            )
            max_valid_length = (
                int(max_length_ms / self.audio_frame_duration / 1000) + 1
            )
            if max_valid_length < audio.shape[1]:
                audio[:, max_valid_length:] = 0

            audio_randomized = False
            if np.random.random() < self.freq_mask_p:
                f = int(np.random.uniform(0, self.freq_mask_num))
                f0 = random.randint(0, self.n_mels - f)
                audio[f0 : f0 + f, :] = 0
                audio_randomized = True

            if np.random.random() < self.pitch_p:
                shift = np.random.randint(1, 5)
                zeros = np.zeros((shift, audio.shape[1]), dtype=np.float32)
                if np.random.random() < 0.5:
                    audio = np.concatenate([audio[shift:, :], zeros], axis=0)
                else:
                    audio = np.concatenate([zeros, audio[:-shift, :]], axis=0)
                audio_randomized = True

            if nb is not None:  # crop to the item's length bucket
                audio = audio[:, : nb * self.audio_note_window_ratio]

            # fp16 over the host->device link: the mel cache is fp16
            # anyway (ref mug/util.py:143) and a batch-48 mel batch is
            # 805 MB at fp32 — the single biggest transfer in training.
            # DDPM.wave_output upcasts before the encoder (ddpm.py:50).
            example["audio"] = audio.T.astype(np.float16)  # [Tmel, 128]
            # deterministic identity of this row for the trainer's
            # device-resident audio cache (training/device_cache.py):
            # (path, rate, bucket) fully determine the mel unless a
            # RANDOM augment fired above — then None = not cacheable
            # full-precision rate in the key: the mel depends on rate via
            # int(round(T/rate)) resize + valid-length zeroing, so two
            # draws in the same rounded bin are different mels of the same
            # final padded shape — a rounded key could serve a misaligned
            # cached row (advisor r4)
            example["audio_key"] = (
                None if audio_randomized
                else f"{path}|r{float(convertor_params['rate']).hex()}|b{nb}"
            )

        if self.with_feature:
            _, feature = self.load_feature(
                beatmap_meta.path, objs, self.feature_dropout_p,
                convertor_params["rate"],
            )
            example["feature"] = np.asarray(feature, dtype=np.int32)
        return example

    def _record_error(self, path: str, e: Exception):
        """Quarantine a bad file (ref: dataset.py:265-271)."""
        if self.cache_dir is None or path in self.error_files:
            return
        error_path = os.path.join(self.cache_dir, "error.txt")
        # re-read before appending: process-pool workers each hold
        # a pickled dataset copy whose in-memory error_files never
        # syncs back to the parent — without this a persistent bad
        # file gains a duplicate line per worker per epoch
        try:
            with open(error_path) as f:
                self.error_files.extend(
                    ln.split(": ", 1)[0] for ln in f
                )
        except OSError:
            pass
        if path not in self.error_files:
            with open(error_path, "a+") as f:
                f.write(f"{path}: {e}\n")
            self.error_files.append(path)

    # ---------------------- rank-synchronized bucketed loading (SPMD)

    def probe_bucket(self, i: int, convertor_params: dict) -> int:
        """Length bucket an item lands in under the given augmentation
        params — a parse-only pre-pass (no audio decode, no features), so
        every SPMD rank can cheaply derive the full epoch's bucket plan."""
        objs, meta = parse_osu_file(self.beatmap_paths[i], convertor_params)
        _, valid_flag = meta.convertor.objects_to_array(objs, meta)
        return self._choose_bucket(valid_flag, convertor_params["frame_ms"])

    def plan_item(self, i: int, epoch_seed: int, max_resample: int = 20):
        """Deterministic (index, convertor_params, bucket) plan for one
        item. Augmentations and error-resampling both draw from a
        per-(epoch_seed, index) Generator, so every rank computes the
        IDENTICAL plan — the foundation of rank-synchronized bucket
        batching (unequal per-rank batch structures would deadlock the
        collectives inside the jitted step)."""
        rng = np.random.default_rng((int(epoch_seed), int(i)))
        j = int(i)
        for _ in range(max_resample):
            params = self.draw_convertor_params(rng)
            try:
                return j, params, self.probe_bucket(j, params)
            except Exception as e:
                self._record_error(self.beatmap_paths[j], e)
                j = int(rng.integers(0, len(self.beatmap_paths)))
        raise RuntimeError(
            f"plan_item: {max_resample} consecutive unparseable files"
        )

    def load_planned(self, plan, epoch_seed: int, max_resample: int = 20):
        """Load a planned item, preserving its planned bucket shape. A
        load-time failure the parse probe could not see (audio decode,
        missing feature.db row) substitutes a deterministic replacement
        item FORCED into the same bucket — content changes, the batch
        structure every other rank planned does not."""
        j, params, bucket = plan
        rng = np.random.default_rng((int(epoch_seed), int(j), 1))
        for _ in range(max_resample):
            try:
                return self.load_item(j, params, forced_bucket=bucket)
            except Exception as e:
                self._record_error(self.beatmap_paths[j], e)
                j = int(rng.integers(0, len(self.beatmap_paths)))
                params = self.draw_convertor_params(rng)
        raise RuntimeError(
            f"load_planned: {max_resample} consecutive bad files"
        )


class OsuTrainDataset(OsuDataset):
    """First 90% in md5 order is implicitly train (valid takes the tail)."""

    def filter_beatmap_paths(self, beatmap_paths):
        return beatmap_paths[: int(len(beatmap_paths))]


class OsuValidDataset(OsuDataset):
    def filter_beatmap_paths(self, beatmap_paths):
        return beatmap_paths[int(len(beatmap_paths) * 0.9):]


TENSOR_KEYS = ("note", "valid_flag", "audio", "feature")


def _pad_example_to(e: dict, note_frames: int, ratio: int) -> dict:
    """Zero-pad an example's time axes up to ``note_frames`` (used to merge
    leftover bucketed items into one batch)."""
    cur = e["note"].shape[0]
    if cur >= note_frames:
        return e
    out = dict(e)
    pad = note_frames - cur
    out["note"] = np.pad(e["note"], ((0, pad), (0, 0)))
    out["valid_flag"] = np.pad(e["valid_flag"], (0, pad))
    if "audio" in e:
        out["audio"] = np.pad(e["audio"], ((0, pad * ratio), (0, 0)))
        # the padded row no longer matches its (path, rate, bucket)
        # identity — don't let the device cache adopt or serve it
        out["audio_key"] = None
    return out


def collate(examples: List[dict]) -> dict:
    """Stack tensor fields; keep metas as lists."""
    batch = {}
    for k in TENSOR_KEYS:
        if k in examples[0]:
            batch[k] = np.stack([e[k] for e in examples], axis=0)
    batch["meta"] = [e["meta"] for e in examples]
    batch["convertor"] = [e["convertor"] for e in examples]
    if "audio_key" in examples[0]:
        batch["audio_key"] = [e.get("audio_key") for e in examples]
    return batch


_WORKER_DS = None


def _init_loader_worker(dataset, seed):
    """Process-pool initializer: stash the (picklable) dataset once per
    worker and seed each worker's global np.random/random state (which
    the dataset's augmentations and error-resampling draw from) from the
    loader seed + the worker's pid — deterministic per epoch-seed, yet
    distinct across workers so they don't replay identical augmentation
    streams."""
    global _WORKER_DS
    _WORKER_DS = dataset
    s = (seed + os.getpid()) % (2 ** 32)
    np.random.seed(s)
    random.seed(s)


def _worker_getitem(i):
    return _WORKER_DS[i]


def _worker_plan(args):
    i, epoch_seed = args
    return _WORKER_DS.plan_item(i, epoch_seed)


def _worker_load_planned(args):
    plan, epoch_seed = args
    return _WORKER_DS.load_planned(plan, epoch_seed)


class Loader:
    """Prefetch loader (replaces torch DataLoader workers, ref config
    num_workers: 7).

    ``worker_type="thread"`` (default) suits hosts where item work is
    dominated by GIL-releasing numpy/ffmpeg (and the 1-core axon host,
    where processes can't add parallelism anyway). ``"process"`` matches
    the reference's 7 worker *processes* for multi-core production hosts
    where the cold path (parse + mel) is GIL-bound Python: a spawn-context
    pool (fork would clone live TPU-runtime threads) rebuilt per epoch —
    worker startup (~1-2 s each, once per epoch) amortizes over any real
    epoch length."""

    def __init__(self, dataset: OsuDataset, batch_size: int, shuffle: bool,
                 num_workers: int = 7, seed: int = 0, drop_last: bool = True,
                 scale_batch_by_bucket: bool = False,
                 worker_type: str = "thread",
                 num_shards: int = 1, shard_index: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last
        # per-rank dataset sharding under multi-process SPMD (the
        # reference's DistributedSampler under DDP, main.py:536-537): each
        # process sees a disjoint stride of the same epoch-seeded
        # permutation, truncated so every rank yields the SAME number of
        # items — unequal counts would deadlock the cross-process
        # collectives inside the jitted step. batch_size stays per-process
        # (global batch = batch_size * num_shards), matching the ref's
        # per-GPU batch under DDP and the trainer's n_devices LR scaling.
        if not (0 <= shard_index < num_shards):
            raise ValueError(f"shard_index {shard_index} not in "
                             f"[0, {num_shards})")
        self.num_shards = num_shards
        self.shard_index = shard_index
        # equal-token-budget batching: a bucket at half the max length gets
        # twice the batch (short buckets otherwise waste MXU on fixed
        # per-step overheads — MFU 0.13 at z=128 vs 0.25 at z=512 with a
        # constant batch, docs/PERF.md)
        self.scale_batch_by_bucket = scale_batch_by_bucket
        if worker_type not in ("thread", "process"):
            raise ValueError(f"worker_type must be thread|process, "
                             f"got {worker_type!r}")
        self.worker_type = worker_type

    def _pool_and_fetch(self):
        """Executor + per-item fetch callable for this epoch's iteration."""
        if self.worker_type == "process":
            pool = ProcessPoolExecutor(
                self.num_workers,
                mp_context=multiprocessing.get_context("spawn"),
                initializer=_init_loader_worker,
                initargs=(self.dataset, self.seed + self.epoch),
            )
            return pool, _worker_getitem
        return ThreadPoolExecutor(self.num_workers), self.dataset.__getitem__

    def _bucket_batch(self, note_frames: int) -> int:
        buckets = getattr(self.dataset, "length_buckets", None)
        if not (self.scale_batch_by_bucket and buckets):
            return self.batch_size
        ref = max(buckets)
        return max(self.batch_size,
                   self.batch_size * (ref // max(note_frames, 1)))

    def __bool__(self):
        # __len__ raises under bucketed iteration; keep `if loader:` working
        return True

    def _shard_len(self) -> int:
        n = len(self.dataset)
        if self.num_shards > 1:
            n = n // self.num_shards  # equal per-rank truncation
        return n

    def __len__(self):
        if getattr(self.dataset, "length_buckets", None):
            # batch count depends on the realized bucket distribution
            # (per-bucket grouping + leftover merging) — not knowable
            # without loading every item
            raise TypeError(
                "Loader length is data-dependent under bucketed iteration"
            )
        n = self._shard_len() // self.batch_size
        if not self.drop_last and self._shard_len() % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(len(self.dataset))
        epoch_seed = self.seed + self.epoch
        if self.shuffle:
            rng = np.random.default_rng(epoch_seed)
            rng.shuffle(order)
        self.epoch += 1

        if self.num_shards > 1 and getattr(
            self.dataset, "length_buckets", None
        ):
            # rank-synchronized bucketing works on the GLOBAL order: every
            # rank plans the identical batch structure, then loads only its
            # own slice of each global batch
            yield from self._iter_bucketed_sharded(order, epoch_seed)
            return

        if self.num_shards > 1:
            # same permutation on every rank (seed + epoch), disjoint
            # strides, truncated to equal length
            order = order[: self._shard_len() * self.num_shards]
            order = order[self.shard_index :: self.num_shards]

        if getattr(self.dataset, "length_buckets", None):
            yield from self._iter_bucketed(order)
            return

        def chunks():
            for s in range(0, len(order), self.batch_size):
                idx = order[s : s + self.batch_size]
                if len(idx) < self.batch_size and self.drop_last:
                    return
                yield idx

        pool, fetch = self._pool_and_fetch()
        with pool:
            pending = []
            it = chunks()
            # prefetch depth = num_workers
            for idx in it:
                pending.append(pool.map(fetch, idx))
                if len(pending) >= 2:
                    yield collate(list(pending.pop(0)))
            for p in pending:
                yield collate(list(p))

    def _iter_bucketed(self, order) -> Iterator[dict]:
        """Group batches by the items' length bucket so every batch is a
        homogeneous static shape (one compiled train step per bucket).
        Epoch-end leftovers from all buckets are merged (padded up to the
        largest leftover bucket) into full batches; with drop_last only
        the final still-incomplete batch is dropped — not each bucket's
        remainder, which could discard most of a small dataset."""
        from collections import defaultdict, deque

        pools: dict = defaultdict(list)

        def absorb(ex):
            b = ex["note"].shape[0]
            pools[b].append(ex)
            if len(pools[b]) >= self._bucket_batch(b):
                return collate(pools.pop(b))
            return None

        pool, fetch = self._pool_and_fetch()
        with pool:
            # strict in-flight bound: block on the oldest future once the
            # window fills (completed results hold ~MBs of mel each; token-
            # budget batches hold more items of proportionally smaller mels)
            window = max(2 * self.batch_size, 2 * self.num_workers)
            if self.scale_batch_by_bucket and \
                    getattr(self.dataset, "length_buckets", None):
                buckets = self.dataset.length_buckets
                window = max(
                    window, 2 * self._bucket_batch(min(buckets))
                )
            futures: deque = deque()
            for i in order:
                futures.append(pool.submit(fetch, int(i)))
                while len(futures) >= window or (
                    futures and futures[0].done()
                ):
                    batch = absorb(futures.popleft().result())
                    if batch is not None:
                        yield batch
            while futures:
                batch = absorb(futures.popleft().result())
                if batch is not None:
                    yield batch

        rest = [e for b in sorted(pools) for e in pools[b]]
        if not rest:
            return
        target = max(e["note"].shape[0] for e in rest)
        ratio = self.dataset.audio_note_window_ratio
        rest = [_pad_example_to(e, target, ratio) for e in rest]
        merged_bs = self._bucket_batch(target)
        for s in range(0, len(rest), merged_bs):
            chunk = rest[s : s + merged_bs]
            if len(chunk) < merged_bs and self.drop_last:
                return
            yield collate(chunk)

    def _iter_bucketed_sharded(self, order, epoch_seed: int) -> Iterator[dict]:
        """Rank-synchronized bucket batching for multi-process SPMD.

        Every rank runs the identical three stages over the identical
        global ``order``:

        1. PLAN — a parse-only pre-pass derives each item's augmentation
           params and length bucket from a per-(epoch_seed, index) RNG
           (``OsuDataset.plan_item``); no audio decode, so it is cheap and
           bit-identical across ranks.
        2. COMPOSE — group plans into GLOBAL batches of
           ``per_rank_batch(bucket) * num_shards`` in stream order;
           epoch-end leftovers merge under the largest leftover bucket
           (forced-bucket loading reuses the codec's full-length arrays, so
           no post-hoc padding is needed).
        3. LOAD — each rank loads only its contiguous slice of every
           global batch (audio + features), two batches in flight.

        Batch count, bucket-shape sequence, and per-rank batch size are
        equal on every rank by construction, keeping the jitted step's
        collectives in lockstep (the reference's DistributedSampler
        equivalent, ref main.py:536-537, generalized to bucketed shapes).
        With ``drop_last=False`` an uneven final global batch is truncated
        to a multiple of ``num_shards`` (dropping at most num_shards-1
        items) — collectives require equal per-rank batches.
        """
        from collections import defaultdict

        n = self.num_shards
        pool, _ = self._pool_and_fetch()
        with pool:
            if self.worker_type == "process":
                plans = list(pool.map(
                    _worker_plan,
                    [(int(i), epoch_seed) for i in order],
                    chunksize=32,
                ))
            else:
                plans = list(pool.map(
                    lambda i: self.dataset.plan_item(int(i), epoch_seed),
                    order,
                ))

            by_bucket: dict = defaultdict(list)
            gbatches = []  # (bucket, [plan, ...]) in stream order
            for plan in plans:
                b = plan[2]
                by_bucket[b].append(plan)
                if len(by_bucket[b]) >= self._bucket_batch(b) * n:
                    gbatches.append((b, by_bucket.pop(b)))
            rest = [p for b in sorted(by_bucket) for p in by_bucket[b]]
            if rest:
                target = max(p[2] for p in rest)
                rest = [(j, params, target) for (j, params, _) in rest]
                gb = self._bucket_batch(target) * n
                for s in range(0, len(rest), gb):
                    chunk = rest[s : s + gb]
                    if len(chunk) < gb:
                        if self.drop_last:
                            break
                        chunk = chunk[: (len(chunk) // n) * n]
                        if not chunk:
                            break
                    gbatches.append((target, chunk))

            def submit(chunk):
                pb = len(chunk) // n
                mine = chunk[self.shard_index * pb:(self.shard_index + 1) * pb]
                if self.worker_type == "process":
                    return [
                        pool.submit(_worker_load_planned, (p, epoch_seed))
                        for p in mine
                    ]
                return [
                    pool.submit(self.dataset.load_planned, p, epoch_seed)
                    for p in mine
                ]

            pending = []
            for _, chunk in gbatches:
                pending.append(submit(chunk))
                if len(pending) >= 2:
                    yield collate([f.result() for f in pending.pop(0)])
            for futs in pending:
                yield collate([f.result() for f in futs])
