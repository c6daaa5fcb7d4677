"""Generate a synthetic training dataset (charts + tone audio + feature.db)
for smoke-training without osu! data.

Creates N beatmap sets with rhythmically coherent 4K patterns over simple
tone mixtures, then builds feature.db via the prep pipeline.

Usage: python scripts/make_synthetic_dataset.py -o data/synthetic -n 16
"""

from __future__ import annotations

import argparse
import os
import sqlite3
import sys
import wave as wave_mod

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 22050


def write_set(root, set_name, duration_s, bpm, seed, density=1.0):
    rng = np.random.default_rng(seed)
    set_dir = os.path.join(root, set_name)
    os.makedirs(set_dir, exist_ok=True)

    # audio: tone mixture with beat clicks at the chart BPM
    t = np.arange(int(SR * duration_s)) / SR
    f0 = rng.uniform(110, 440)
    y = 0.35 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
    beat = 60.0 / bpm
    click_env = ((t % beat) < 0.02).astype(np.float32)
    y = (y + 0.3 * click_env * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    with wave_mod.open(os.path.join(set_dir, "audio.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((y * 20000).astype(np.int16).tobytes())

    # chart: streams/jumps on the beat grid
    gap = 60000 / bpm / 4
    lines = []
    tm = 500.0
    last_col = -1
    while tm < duration_s * 1000 - 500:
        if rng.random() < 0.85 * density:
            if rng.random() < 0.2:  # jump
                cols = rng.choice(4, size=2, replace=False)
            else:
                choices = [c for c in range(4) if c != last_col]
                cols = [int(rng.choice(choices))]
                last_col = cols[0]
            for c in cols:
                lines.append(f"{int((c + 0.5) * 128)},192,{int(tm)},1,0,0:0:0:0:")
        tm += gap

    osu_path = os.path.join(set_dir, "chart.osu")
    with open(osu_path, "w") as f:
        f.write(
            "osu file format v14\n\n[General]\nAudioFilename: audio.wav\n"
            f"Mode: 3\n\n[Metadata]\nTitle:{set_name}\nVersion:synth\n"
            "BeatmapSetID:1\n\n[Difficulty]\nCircleSize: 4\n\n"
            f"[TimingPoints]\n0,{60000 / bpm},4,2,1,20,1,0\n\n"
            "[HitObjects]\n" + "\n".join(lines) + "\n"
        )
    return osu_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", "-o", type=str, required=True)
    p.add_argument("--count", "-n", type=int, default=16)
    p.add_argument("--duration", type=float, default=30.0)
    p.add_argument("--seed", type=int, default=0)
    opt = p.parse_args()

    os.makedirs(opt.out_dir, exist_ok=True)
    rng = np.random.default_rng(opt.seed)
    paths = []
    for i in range(opt.count):
        bpm = float(rng.uniform(150, 220))
        paths.append(
            write_set(opt.out_dir, f"synth{i:03d}", opt.duration, bpm,
                      seed=opt.seed + i)
        )
    txt = os.path.join(opt.out_dir, "beatmap.txt")
    with open(txt, "w") as f:
        f.writelines(p_ + "\n" for p_ in paths)

    # feature.db (sr filled with a heuristic since osu-tools is absent)
    from scripts.prepare_beatmap_features import prepare_features

    prepare_features(txt, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "mug", "mania_beatmap_features.yaml",
    ))
    conn = sqlite3.connect(os.path.join(opt.out_dir, "feature.db"))
    conn.execute("UPDATE Feature SET sr = COALESCE(ett, 10.0) / 4.0")
    conn.commit()
    print(f"wrote {len(paths)} sets + feature.db under {opt.out_dir}")


if __name__ == "__main__":
    main()
