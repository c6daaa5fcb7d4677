"""Chart codec: .osu file parsing/serialization and the note<->tensor codec.

Pure NumPy symbolic layer (not on the TPU hot path). Numerics-parity port of
the reference codec (ref: mug/data/convertor.py): the tensor layout, rounding
and LN-reconstruction rules must match exactly, since decoded charts are the
framework's user-facing output.

Tensor layout (``[4*K, T]`` with K=key_count, T=max_frame):
    planes [0,   K)  is_start      0/1 per key
    planes [K,  2K)  offset_start  0..1 fraction of a frame, valid if is_start
    planes [2K, 3K)  is_holding    0/1 (excl. start, incl. end frame)
    planes [3K, 4K)  offset_end    0..1, valid on the last holding frame
"""

from __future__ import annotations

import os
import random
import string
from dataclasses import asdict, dataclass, field
from typing import List, Optional, Tuple

import numpy as np

_VALID_CHARS = "-_.()[]/\\' %s%s" % (string.ascii_letters, string.digits)


def slugify(text: str) -> str:
    """Filename fallback normalizer (ref: mug/data/convertor.py:33-36)."""
    return "".join(c for c in text if c in _VALID_CHARS)


def read_item(line: str) -> str:
    return line.split(":")[-1].strip()


@dataclass
class BeatmapMeta:
    """Parsed .osu metadata (ref: mug/data/convertor.py:11-27)."""

    path: str
    audio: str = ""
    game_mode: int = 0
    convertor: "OsuManiaConvertor" = None
    cs: float = 0
    version: str = ""
    set_id: int = -1
    file_meta: List[str] = field(default_factory=list)
    timing_points: List[str] = field(default_factory=list)

    def for_batch(self) -> dict:
        result = asdict(self)
        for k in ("convertor", "file_meta", "timing_points"):
            result.pop(k, None)
        return result


def parse_osu_file(
    osu_path: str, convertor_params: Optional[dict]
) -> Tuple[List[str], BeatmapMeta]:
    """Section-parse a .osu file into hit-object lines + metadata
    (ref: mug/data/convertor.py:38-91). Audio path resolution tries the raw
    name, its slugified form, the lowercase name, and the slugified
    lowercase name, in that order."""
    with open(osu_path, "r", encoding="utf-8") as f:
        data = f.read().split("\n")
    parsing_context = ""
    hit_objects: List[str] = []
    meta = BeatmapMeta(path=osu_path)
    for line in data:
        line = line.strip()

        if parsing_context == "[HitObjects]" and "," in line:
            hit_objects.append(line)
        elif parsing_context == "[TimingPoints]" and "," in line:
            meta.file_meta.append(line)
            meta.timing_points.append(line)
        else:
            if line != "[HitObjects]":
                meta.file_meta.append(line)

            if parsing_context == "[General]":
                if line.startswith("AudioFilename"):
                    audio_item = read_item(line)
                    base = os.path.dirname(osu_path)
                    for candidate in (
                        audio_item,
                        slugify(audio_item),
                        audio_item.lower(),
                        slugify(audio_item.lower()),
                    ):
                        meta.audio = os.path.join(base, candidate)
                        if os.path.isfile(meta.audio):
                            break
                elif line.startswith("Mode"):
                    meta.game_mode = int(read_item(line))
                    if convertor_params is not None:
                        meta.convertor = MOD_CONVERTOR[meta.game_mode](
                            **convertor_params
                        )
            elif parsing_context == "[Metadata]":
                if line.startswith("Version"):
                    meta.version = read_item(line)
                elif line.startswith("BeatmapSetID"):
                    meta.set_id = int(read_item(line))
            elif parsing_context == "[Difficulty]":
                if line.startswith("CircleSize"):
                    meta.cs = float(read_item(line))

        if line.startswith("["):
            parsing_context = line

    return hit_objects, meta


def save_osu_file(
    meta: BeatmapMeta,
    note_array: np.ndarray,
    path: str = None,
    override: Optional[dict] = None,
    gridify=None,
):
    """Serialize a decoded note tensor back to a .osu file
    (ref: mug/data/convertor.py:94-120). ``gridify`` optionally snaps raw
    millisecond times to a detected BPM grid and rewrites [TimingPoints]."""
    convertor = meta.convertor
    hit_objects = convertor.array_to_objects(note_array, meta)
    bpm, offset = 120, 0
    if gridify is not None:
        try:
            bpm, offset, hit_objects = gridify(hit_objects)
        except Exception:
            import traceback

            traceback.print_exc()
            bpm, offset = 120, 0

    with open(path, "w", encoding="utf8") as f:
        for line in meta.file_meta:
            if override is not None:
                for k, v in override.items():
                    if line.startswith(k + ":"):
                        line = f"{k}: {v}"
                        break
            f.write(line + "\n")

        if gridify is not None:
            f.write(f"[TimingPoints]\n{offset},{60000 / bpm},4,2,1,20,1,0\n\n")
        f.write("[HitObjects]\n")

        for hit_object in hit_objects:
            f.write(hit_object + "\n")


class OsuManiaConvertor:
    """osu!mania note-list <-> tensor codec with symbolic augmentations
    (ref: mug/data/convertor.py:123-320).

    Augmentations (applied in ``objects_to_array``): ``mirror`` flips
    columns, ``random`` shuffles the column map, ``rate`` time-stretches,
    ``offset_ms`` shifts, ``mirror_at_interval_prob`` re-mirrors at gaps
    >= 10 frames.
    """

    def __init__(
        self,
        frame_ms: float,
        max_frame: int,
        mirror: bool = False,
        from_logits: bool = False,
        offset_ms: float = 0,
        random: bool = False,
        rate: float = 1.0,
        mirror_at_interval_prob: float = 0.0,
    ):
        self.frame_ms = frame_ms
        self.max_frame = max_frame
        self.mirror = mirror
        self.from_logits = from_logits
        self.offset_ms = offset_ms
        self.random = random
        self.rate = rate
        self.mirror_at_interval_prob = mirror_at_interval_prob

    def read_time(self, text) -> Tuple[int, int, float]:
        """ms string -> (rounded ms, frame index, in-frame offset)
        (ref: mug/data/convertor.py:125-129)."""
        t = int(float(text)) / self.rate + self.offset_ms
        index = int(t / self.frame_ms)
        offset = (t - index * self.frame_ms) / self.frame_ms
        return int(round(t)), index, offset

    def is_binary_positive(self, x) -> np.ndarray:
        return x > 0 if self.from_logits else x > 0.5

    def objects_to_array(
        self, hit_objects: List[str], meta: BeatmapMeta
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Note lines -> ([4K, max_frame] tensor, [max_frame] valid flag)
        (ref: mug/data/convertor.py:266-320)."""
        key_count = int(meta.cs)
        column_width = int(512 / key_count)
        array_length = min(self.max_frame, int(self.max_frame / self.rate))
        array = np.zeros((array_length, key_count * 4), dtype=np.float32)
        max_index = 0

        column_map = list(range(key_count))
        if self.mirror:
            column_map = [key_count - column_map[i] - 1 for i in range(key_count)]
        if self.random:
            random.shuffle(column_map)

        for line in hit_objects:
            params = line.split(",")

            _, start_index, start_offset = self.read_time(params[2])
            if start_index >= len(array):
                continue
            if start_index - max_index >= 10 and self.mirror_at_interval_prob != 0:
                if random.random() < self.mirror_at_interval_prob:
                    column_map = [
                        key_count - column_map[i] - 1 for i in range(key_count)
                    ]

            column = int(int(float(params[0])) / column_width)
            if column >= key_count or column < 0:
                continue
            column = column_map[column]

            array[start_index, column] = 1
            array[start_index, column + key_count] = start_offset
            max_index = max(start_index, max_index)

            if int(params[3]) == 128:  # long note (hold)
                _, end_index, end_offset = self.read_time(params[5].split(":")[0])
                if end_index >= len(array):
                    end_index = len(array) - 1
                    end_offset = 1
                array[start_index + 1 : end_index + 1, column + key_count * 2] = 1
                array[end_index, column + key_count * 3] = end_offset
                max_index = max(end_index, max_index)

        if len(array) < self.max_frame:
            array = np.concatenate(
                [
                    array,
                    np.zeros(
                        (self.max_frame - len(array), array.shape[1]),
                        dtype=np.float32,
                    ),
                ],
                axis=0,
            )
        valid_flag = np.zeros((len(array),))
        valid_flag[:max_index] = 1
        return np.transpose(array), valid_flag

    def array_to_objects(
        self, note_array: np.ndarray, meta: BeatmapMeta
    ) -> List[str]:
        """[4K, T] tensor -> sorted hit-object lines; reconstructs LNs by
        scanning is_holding runs (ref: mug/data/convertor.py:232-264)."""
        note_array = note_array.transpose()  # [T, 4K]
        hit_object_with_start = []
        key_count = int(meta.cs)
        column_width = int(512 / key_count)
        T = len(note_array)
        for column in range(key_count):
            start_indices = np.where(
                self.is_binary_positive(note_array[:, column])
            )[0]
            for start_index in start_indices:
                start_offset = np.clip(
                    note_array[start_index, column + key_count], 0, 1
                )
                start = int(round((start_index + start_offset) * self.frame_ms))
                end = -1

                if start_index != T - 1:
                    i = start_index + 1
                    while (
                        i < T
                        and self.is_binary_positive(
                            note_array[i, column + key_count * 2]
                        )
                        and not self.is_binary_positive(note_array[i, column])
                    ):
                        i += 1
                    end_index = i - 1
                    if end_index != start_index:
                        end_offset = np.clip(
                            note_array[end_index, column + key_count * 3], 0, 1
                        )
                        end = int(
                            round((end_index + end_offset) * self.frame_ms)
                        )

                column_num = int(round((column + 0.5) * column_width))
                if end == -1:
                    line = f"{column_num},192,{start},1,0,0:0:0:0:"
                else:
                    line = f"{column_num},192,{start},128,0,{end}:0:0:0:0:"
                hit_object_with_start.append((line, start))
        hit_object_with_start.sort(key=lambda x: x[1])
        return [x[0] for x in hit_object_with_start]

    def timing_to_array(self, meta: BeatmapMeta):
        """Timing points -> beat array (ref: mug/data/convertor.py:151-209).
        Kept for parity; unused in the live training path."""
        if len(meta.timing_points) == 0:
            return None, False

        red_lines = []  # (st, bpm)
        segment_list = []  # (st, visual_bpm, true_bpm)
        last_true_bpm = None

        for line in meta.timing_points:
            time_ms, timing = line.split(",")[:2]
            timing = float(timing)
            time_ms = float(time_ms)
            if timing < 0:  # green line: SV multiplier
                true_bpm = last_true_bpm * 100 / -timing
            else:  # red line: real BPM
                true_bpm = 60000 / timing
                last_true_bpm = true_bpm
                if len(red_lines) == 0 or red_lines[-1][1] != true_bpm:
                    red_lines.append((time_ms, true_bpm))
            segment_list.append((time_ms, true_bpm, last_true_bpm))

        cur_bpm = None
        has_sv = False
        if len(red_lines) > 1:
            for i in range(len(segment_list) - 1):
                if abs(segment_list[i][0] - segment_list[i + 1][0]) <= 1:
                    continue
                if cur_bpm is None:
                    cur_bpm = segment_list[i][1]
                elif abs(cur_bpm - segment_list[i][1]) > 0.00001:
                    has_sv = True
                    break

        array_length = min(self.max_frame, int(self.max_frame / self.rate))
        array = np.zeros((array_length, 2), dtype=np.float32)
        for i, (start_time_ms, true_bpm, _) in enumerate(segment_list):
            while true_bpm < 150:
                true_bpm = true_bpm * 2
            while true_bpm >= 300:
                true_bpm = true_bpm / 2

            if i == len(segment_list) - 1:
                end_time_ms = self.frame_ms * self.max_frame
            else:
                end_time_ms = segment_list[i + 1][0]
            beat_ms = start_time_ms
            while beat_ms <= end_time_ms:
                _, idx, offset = self.read_time(beat_ms)
                if idx < array_length:
                    array[idx, 0] = 1
                    array[idx, 1] = offset
                beat_ms += 60000 / true_bpm / 2

        return array, has_sv


MOD_CONVERTOR = {3: OsuManiaConvertor}
