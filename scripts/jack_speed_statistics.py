"""Quality metric: count <100 ms same-column mini-jacks in AI-generated vs
ground-truth charts across training-run beatmap logs
(ref: /root/reference/scripts/jack_speed_statistics.py).

Usage: python scripts/jack_speed_statistics.py logs/<run> [logs/<run2> ...]
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mug_diffusion_tpu.data.convertor import parse_osu_file


def jack_speed_count(osu_path: str, interval_ms: float = 100) -> int:
    hit_objects, _ = parse_osu_file(osu_path, None)
    key_to_starts = defaultdict(list)
    column_width = int(512 / 4)
    for line in hit_objects:
        params = line.split(",")
        start = int(float(params[2]))
        column = int(int(float(params[0])) / column_width)
        key_to_starts[column].append(start)

    count = 0
    for starts in key_to_starts.values():
        starts.sort()
        for a, b in zip(starts, starts[1:]):
            if b - a < interval_ms:
                count += 1
    return count


def main(run_dirs):
    for p in run_dirs:
        beatmap_path = os.path.join(p, "beatmaps")
        if not os.path.isdir(beatmap_path):
            print(f"{p}: no beatmaps dir")
            continue
        counts = sorted(os.listdir(beatmap_path), key=int)
        real_jack_counts = []
        ai_jack_counts = []
        for i in counts:
            path = os.path.join(beatmap_path, i)
            real = ai = 0
            for set_name in os.listdir(path):
                set_path = os.path.join(path, set_name)
                for osu_name in os.listdir(set_path):
                    osu_path = os.path.join(set_path, osu_name)
                    if osu_name.endswith("_step=0.osu"):
                        ai += jack_speed_count(osu_path)
                    elif osu_name.endswith(".osu") and "_step=" not in osu_name:
                        real += jack_speed_count(osu_path)
            real_jack_counts.append(real)
            ai_jack_counts.append(ai)
        print(p)
        print("AI:  ", ai_jack_counts)
        print("Real:", real_jack_counts)


if __name__ == "__main__":
    main(sys.argv[1:])
