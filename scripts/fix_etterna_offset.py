"""Dataset prep: fix the systematic -26 ms offset of Etterna converts by
re-encoding the audio and shifting all note times
(ref: /root/reference/scripts/fix_etterna_offset.py, which used bundled
win32 sox under wine; here ffmpeg does the re-encode).

Usage: python scripts/fix_etterna_offset.py --dir data/etterna_converts
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mug_diffusion_tpu.data.convertor import parse_osu_file

OFFSET_MS = -26  # empirical Etterna->osu audio offset (ref :102-105)


def reencode_audio(src: str, dst: str) -> bool:
    """Re-encode through ffmpeg to normalize container/padding differences
    (the reference piped sox -> ffmpeg for the same purpose)."""
    proc = subprocess.run(
        ["ffmpeg", "-hide_banner", "-loglevel", "error", "-y", "-i", src,
         "-c:a", "libmp3lame", "-q:a", "2", dst],
        capture_output=True,
    )
    return proc.returncode == 0


def shift_osu_times(path: str, offset_ms: int):
    with open(path, encoding="utf-8") as f:
        lines = f.read().split("\n")
    out = []
    section = ""
    for line in lines:
        stripped = line.strip()
        if stripped.startswith("["):
            section = stripped
            out.append(line)
            continue
        if section == "[HitObjects]" and "," in stripped:
            params = stripped.split(",")
            params[2] = str(int(float(params[2])) + offset_ms)
            if int(params[3]) == 128:
                e = params[5].split(":")
                e[0] = str(int(float(e[0])) + offset_ms)
                params[5] = ":".join(e)
            out.append(",".join(params))
        elif section == "[TimingPoints]" and "," in stripped:
            params = stripped.split(",")
            params[0] = str(float(params[0]) + offset_ms)
            out.append(",".join(params))
        else:
            out.append(line)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", type=str, required=True)
    parser.add_argument("--offset_ms", type=int, default=OFFSET_MS)
    opt, _ = parser.parse_known_args()

    for root, _, files in os.walk(opt.dir):
        for file in files:
            if not file.endswith(".osu"):
                continue
            path = os.path.join(root, file)
            try:
                _, meta = parse_osu_file(path, None)
                if meta.audio and os.path.isfile(meta.audio):
                    tmp = meta.audio + ".reenc.mp3"
                    if reencode_audio(meta.audio, tmp):
                        shutil.move(tmp, meta.audio)
                shift_osu_times(path, opt.offset_ms)
                print("fixed", path)
            except Exception as e:  # noqa: BLE001
                print("skip", path, e)


if __name__ == "__main__":
    main()
