"""Dataset prep: convert Malody .mcz/.mc 4K charts to .osu
(ref: /root/reference/scripts/convert_malody.py).

Usage: python scripts/convert_malody.py -b ~/malody_charts -f data/beatmap_4k
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import zipfile
from dataclasses import dataclass
from typing import List, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEMPLATE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "template.osu",
)


@dataclass
class MalodyBPMStamp:
    time: float
    bpm: float
    beat_value: float


def beat2time(beat_value: float, last: MalodyBPMStamp) -> float:
    return (beat_value - last.beat_value) * 60000 / last.bpm + last.time


def beat2time_with_bpm(beat_value: float, bpm_list: List[MalodyBPMStamp]):
    position = len(bpm_list)
    for i, x in enumerate(bpm_list):
        if x.beat_value > beat_value:
            position = i
            break
    position -= 1
    return beat2time(beat_value, bpm_list[position])


def get_beat_value(beat_array):
    return beat_array[0] + float(beat_array[1]) / beat_array[2] + 1


def mc_file_2_osu(template_path, mc_path, out_dir, raw_set_name):
    """ref: convert_malody.py:42-143 (BPM stamps -> ms, LN support)."""
    with open(mc_path, encoding="utf8") as f:
        data = json.load(f)
    meta = data["meta"]
    if meta["mode"] != 0 or meta["mode_ext"]["column"] != 4:
        return None
    key = 4
    title = meta["song"]["title"]
    artist = meta["song"]["artist"]
    version = meta["version"]
    creator = meta["creator"]

    bpm_list: List[MalodyBPMStamp] = []
    time_list = sorted(data["time"], key=lambda x: get_beat_value(x["beat"]))
    for i, time_obj in enumerate(time_list):
        cur_beat = get_beat_value(time_obj["beat"])
        cur_bpm = time_obj["bpm"]
        if i == 0:
            bpm_list.append(MalodyBPMStamp(0.0, cur_bpm, cur_beat))
        else:
            bpm_list.append(
                MalodyBPMStamp(beat2time(cur_beat, bpm_list[-1]), cur_bpm,
                               cur_beat)
            )

    note_list = []
    column_width = int(512 / key)
    offset: Optional[float] = None
    sound: Optional[str] = None
    for x in sorted(data["note"], key=lambda x: get_beat_value(x["beat"])):
        column = x.get("column", None)
        if column is None and "sound" in x:
            sound = x["sound"]
            offset = x.get("offset", 0)
            continue
        start_time = beat2time_with_bpm(get_beat_value(x["beat"]), bpm_list)
        column_num = int(round((column + 0.5) * column_width))
        if "endbeat" in x:
            end_time = beat2time_with_bpm(
                get_beat_value(x["endbeat"]), bpm_list
            )
            note_list.append((column_num, start_time, end_time))
        else:
            note_list.append((column_num, start_time, None))

    assert offset is not None and sound is not None

    set_dir = os.path.join(out_dir, raw_set_name)
    os.makedirs(set_dir, exist_ok=True)
    osu_path = os.path.join(
        set_dir, f"{os.path.basename(mc_path).replace('.mc', '')}.osu"
    )
    out_song = os.path.join(set_dir, sound)
    in_song = os.path.join(os.path.dirname(mc_path), sound)
    if not os.path.exists(out_song) and os.path.exists(in_song):
        shutil.copyfile(in_song, out_song)

    hit_objects = []
    for column_num, start_time, end_time in note_list:
        start = int(round(start_time - offset))
        if end_time is not None:
            end = int(round(end_time - offset))
            hit_objects.append(f"{column_num},192,{start},128,0,{end}:0:0:0:0:")
        else:
            hit_objects.append(f"{column_num},192,{start},1,0,0:0:0:0:")

    with open(template_path) as f:
        templates = f.read().split("\n")
    override = {
        "Creator": creator, "Version": version, "AudioFilename": sound,
        "Title": title, "TitleUnicode": title, "Artist": artist,
        "ArtistUnicode": artist,
    }
    with open(osu_path, "w", encoding="utf8") as f:
        for line in templates:
            if line.startswith("[HitObjects]"):
                continue
            for k, v in override.items():
                if line.startswith(k + ":"):
                    line = f"{k}: {v}"
                    break
            f.write(line + "\n")
        f.write(
            f"[TimingPoints]\n{-offset},{60000 / bpm_list[0].bpm},4,2,1,20,1,0\n\n"
        )
        f.write("[HitObjects]\n")
        for hit_object in hit_objects:
            f.write(hit_object + "\n")
    return osu_path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--malody_dir", "-b", type=str, required=True)
    parser.add_argument("--output_dir", "-f", type=str, required=True)
    parser.add_argument("--template", type=str, default=TEMPLATE)
    opt, _ = parser.parse_known_args()

    tmp_dir = os.path.join(opt.output_dir, "temp")
    for name in os.listdir(opt.malody_dir):
        path = os.path.join(opt.malody_dir, name)
        if not path.endswith(".mcz"):
            continue
        zipfile.ZipFile(path).extractall(tmp_dir)
        for root, _, files in os.walk(tmp_dir):
            for file in files:
                if file.endswith(".mc"):
                    mc_path = os.path.join(root, file)
                    try:
                        mc_file_2_osu(opt.template, mc_path, opt.output_dir,
                                      name.replace(".mcz", ""))
                    except Exception:
                        print("Error:", path, mc_path)
        shutil.rmtree(tmp_dir)


if __name__ == "__main__":
    main()
