"""Dataset prep: deduplicate charts by note-content md5 and drop rate-variant
charts detected from filename patterns (ref:
/root/reference/scripts/filter_beatmap.py). Appends clean paths to clean.txt.

Usage: python scripts/filter_beatmap.py data/beatmap_4k/beatmap.txt
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mug_diffusion_tpu.data.convertor import parse_osu_file

RATE_PATTERNS = [
    "1.1", "1.2", "1.3", "1.4", "1.05", "1.15", "1.25", "1.35", "1.45",
    "0.7", "0.75", "0.8", "0.85", "0.9", "0.95",
]


def is_rate_variant(path: str) -> bool:
    for number in RATE_PATTERNS:
        for n in (number, number.replace(".", ",")):
            if f"{n}x" in path or f"x{n}" in path or f"{n}]" in path:
                return True
    return False


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path", nargs="+", type=str)
    parser.add_argument("--out", type=str, default="clean.txt")
    opt, _ = parser.parse_known_args()

    md5_to_path = {}
    paths = []
    for path in opt.path:
        with open(path) as f:
            paths.extend(f.readlines())

    kept = 0
    for path in paths:
        try:
            path = path.strip()
            if path == "":
                continue
            hit_objects, _ = parse_osu_file(path, None)
            column_width = int(512 / 4)

            notes = []
            for line in hit_objects:
                params = line.split(",")
                start = int(float(params[2]))
                end = None
                column = int(int(float(params[0])) / column_width)
                if int(params[3]) == 128:
                    end = int(float(params[5].split(":")[0]))
                notes.append((start, end, column))
            if len(notes) == 0:
                continue
            notes.sort(key=lambda x: x[0] * 100 + x[-1])
            offset = notes[0][0]
            notes = tuple(
                (x[0] - offset, None if x[1] is None else x[1] - offset, x[2])
                for x in notes
            )
            md5 = int(hashlib.md5(str(notes).encode("utf-8")).hexdigest(), 16)
            if md5 in md5_to_path:
                print("duplicate:", md5_to_path[md5], path)
            elif is_rate_variant(path):
                print("rate variant:", path)
            else:
                with open(opt.out, "a+") as f:
                    f.write(path + "\n")
                kept += 1
            md5_to_path[md5] = path
        except Exception:
            traceback.print_exc()
    print(f"Kept {kept} charts -> {opt.out}")


if __name__ == "__main__":
    main()
