"""Dataset prep: histogram the offset between detected audio onsets and chart
note times to spot systematically shifted converts
(ref: /root/reference/scripts/fix_offset.py, which used librosa beat
tracking; here onset strength comes from our own mel frontend).

Usage: python scripts/fix_offset.py --dir data/malody --out result.png
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mug_diffusion_tpu.data.convertor import parse_osu_file
from mug_diffusion_tpu.ops.mel import load_audio_wave, melspectrogram

SR = 22050
HOP = 128


def onset_times_ms(audio_path: str, duration: float = 20.0) -> np.ndarray:
    """Spectral-flux onset peaks from the log-mel spectrogram."""
    y, sr = load_audio_wave(audio_path, SR, max_duration=duration)
    mel = melspectrogram(y).astype(np.float32)  # [128, T]
    flux = np.maximum(0, np.diff(mel, axis=1)).mean(axis=0)
    if flux.size == 0:
        return np.asarray([])
    thr = flux.mean() + flux.std()
    peaks = []
    for i in range(1, len(flux) - 1):
        if flux[i] > thr and flux[i] >= flux[i - 1] and flux[i] >= flux[i + 1]:
            peaks.append(i + 1)
    frame_ms = HOP / SR * 1000
    return np.asarray(peaks) * frame_ms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", type=str, required=True)
    parser.add_argument("--out", type=str, default="result.png")
    opt, _ = parser.parse_known_args()

    data = []
    for root, _, files in os.walk(opt.dir):
        for file in files:
            if not file.endswith(".osu"):
                continue
            p = os.path.join(root, file)
            try:
                hit_objects, meta = parse_osu_file(p, None)
                hit_objects.sort(key=lambda x: float(x.split(",")[2]))
                note_times = np.asarray(
                    [float(line.split(",")[2]) for line in hit_objects]
                )
                offsets = []
                for t in onset_times_ms(meta.audio):
                    diffs = note_times - t
                    near = diffs[np.abs(diffs) <= 50]
                    if near.size:
                        offsets.append(near[np.argmin(np.abs(near))])
                if offsets:
                    data.append(float(np.mean(offsets)))
            except Exception as e:  # noqa: BLE001
                print(f"skip {p}: {e}")

    print(f"{len(data)} charts, mean offset {np.mean(data):.1f} ms"
          if data else "no charts analyzed")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.hist(data, bins=20)
        plt.xlabel("note - onset offset (ms)")
        plt.savefig(opt.out)
        print(f"wrote {opt.out}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
