"""Dataset prep: scan an osu! Songs directory for 4K mania charts and copy
chart+audio into a training directory, emitting beatmap.txt
(ref: /root/reference/scripts/prepare_beatmap.py).

Usage: python scripts/prepare_beatmap.py -s ~/osu/Songs -m 3 -o data/beatmap_4k --cs 4
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mug_diffusion_tpu.data.convertor import read_item


def safe_copy(src_file, dest_dir):
    os.makedirs(dest_dir, exist_ok=True)
    new_path = os.path.join(dest_dir, os.path.basename(src_file))
    if os.path.isfile(new_path):
        return new_path
    shutil.copyfile(src_file, new_path)
    return new_path


def prepare_local_beatmaps(song_dir, mode_int, out_dir, cs=None,
                           min_mtime=None):
    set_names = []
    for x in os.listdir(song_dir):
        try:
            if min_mtime is None or os.path.getmtime(
                os.path.join(song_dir, x)
            ) >= min_mtime:
                set_names.append(x)
        except OSError:
            pass

    results = []
    for set_name in set_names:
        set_path = os.path.join(song_dir, set_name)
        try:
            file_names = os.listdir(set_path)
        except OSError:
            continue
        for file_name in file_names:
            if not file_name.endswith(".osu"):
                continue
            path = os.path.join(set_path, file_name)
            hit_mode = False
            hit_cs = True
            audio_name = None
            try:
                with open(path, encoding="utf-8") as f:
                    for line in f:
                        line = line.lower().strip()
                        if line.startswith("mode"):
                            hit_mode = int(read_item(line)) == mode_int
                        elif line.startswith("circlesize"):
                            hit_cs = (
                                cs is None or cs < 0
                                or float(cs) == float(read_item(line))
                            )
                        elif line.startswith("audiofilename"):
                            audio_name = os.path.join(
                                set_path, read_item(line)
                            )
            except OSError:
                continue
            if (
                hit_mode and hit_cs and audio_name
                and os.path.isfile(audio_name)
            ):
                new_dir = os.path.join(out_dir, set_name)
                new_path = safe_copy(path, new_dir)
                safe_copy(audio_name, new_dir)
                results.append(new_path + "\n")

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "beatmap.txt"), "w", encoding="utf-8") as f:
        f.writelines(results)
    print(f"Wrote {len(results)} charts to {out_dir}/beatmap.txt")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--song_dir", "-s", type=str, required=True)
    parser.add_argument("--mode_int", "-m", type=int, default=3)
    parser.add_argument("--out_dir", "-o", type=str, required=True)
    parser.add_argument("--cs", default=-1, type=float)
    parser.add_argument("--min_mtime", default=None, type=float,
                        help="only include sets modified after this epoch")
    opt, _ = parser.parse_known_args()
    prepare_local_beatmaps(
        opt.song_dir, opt.mode_int, opt.out_dir, opt.cs, opt.min_mtime
    )
