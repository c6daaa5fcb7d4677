"""Generate a synthetic training dataset (charts + audio + feature.db)
for training without osu! data.

Corpus v2 (round 5): per-skillset PATTERN FAMILIES (stream / jumpstream /
handstream / chordjack / jackspeed / technical — the MinaCalc skillset
vocabulary, ref scripts/MinaCalc NoteDataStructures.h:12-24), LONG NOTES
(type-128 hit objects with end times, ref mug/data/convertor.py:244-262)
at controlled per-chart LN ratios, and varied BPM / density / duration.

The audio is synthesized FROM the chart so the audio->chart mapping is
well-posed: a click at every note onset, a sustained column-pitched tone
over every hold body, plus a background tone bed and quarter-beat ticks.
This gives the conditioning model a learnable onset/hold signal and keeps
the beat grid audible for the onset-alignment quality gate.

Usage: python scripts/make_synthetic_dataset.py -o data/synthetic -n 768
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

FAMILIES = (
    "stream", "jumpstream", "handstream", "chordjack", "jackspeed",
    "technical",
)


def _gen_events(rng, family, duration_s, bpm, density, key_count=4):
    """Chart skeleton: list of (t_ms, col) note starts on the beat grid.

    Each family mirrors the structural signature its MinaCalc skillset
    measures, so the feature-db labels (ett scores + dominant-pattern
    bools) genuinely vary across the corpus.
    """
    quarter = 60000.0 / bpm
    gap = quarter / 4.0  # 1/4-snap (16ths) base grid
    # start ON a beat line (timing point anchors at 0) so ground-truth
    # charts are exactly on-grid for the onset-alignment quality gate
    t0 = quarter * np.ceil(500.0 / quarter)
    t1 = duration_s * 1000.0 - 500.0
    events = []
    last_cols: set = set()
    k = 0
    tm = t0

    if family == "technical":
        # mixed snaps per measure: 16ths / 12ths / 24ths
        snap_gaps = [quarter / 4, quarter / 3, quarter / 6]

    jack_col = int(rng.integers(key_count))
    jack_left = 0

    while tm < t1:
        cols: list = []
        r = rng.random()
        if family == "stream":
            if r < density:
                choices = [c for c in range(key_count) if c not in last_cols]
                cols = [int(rng.choice(choices or range(key_count)))]
        elif family == "jumpstream":
            if r < density:
                if k % 2 == 0 and rng.random() < 0.55:
                    cols = list(rng.choice(key_count, size=2, replace=False))
                else:
                    choices = [c for c in range(key_count)
                               if c not in last_cols]
                    cols = [int(rng.choice(choices or range(key_count)))]
        elif family == "handstream":
            if r < density:
                if k % 4 == 0 and rng.random() < 0.6:
                    cols = list(rng.choice(key_count, size=3, replace=False))
                elif k % 2 == 0 and rng.random() < 0.4:
                    cols = list(rng.choice(key_count, size=2, replace=False))
                else:
                    choices = [c for c in range(key_count)
                               if c not in last_cols]
                    cols = [int(rng.choice(choices or range(key_count)))]
        elif family == "chordjack":
            # chords every 8th with deliberate column overlap between
            # consecutive chords (the CJ signature)
            if k % 2 == 0 and r < density:
                size = int(rng.integers(2, key_count + 1))
                cols = list(rng.choice(key_count, size=size, replace=False))
                if last_cols and not (set(cols) & last_cols):
                    cols[0] = int(rng.choice(sorted(last_cols)))
                    cols = sorted(set(cols))
        elif family == "jackspeed":
            if r < density:
                if jack_left <= 0:
                    jack_col = int(rng.integers(key_count))
                    jack_left = int(rng.integers(3, 7))
                cols = [jack_col]
                if rng.random() < 0.15:  # occasional companion minijack
                    other = int(rng.integers(key_count))
                    if other != jack_col:
                        cols.append(other)
                jack_left -= 1
        else:  # technical
            gap = snap_gaps[(k // 8) % len(snap_gaps)]
            if r < density * 0.85:
                if rng.random() < 0.2:
                    cols = list(rng.choice(key_count, size=2, replace=False))
                else:
                    choices = [c for c in range(key_count)
                               if c not in last_cols]
                    cols = [int(rng.choice(choices or range(key_count)))]

        for c in cols:
            events.append((tm, int(c)))
        last_cols = set(cols) if cols else last_cols
        tm += gap
        k += 1
    return events


def _apply_lns(rng, events, ln_ratio, bpm, key_count=4):
    """Convert a fraction of note starts into holds: (t, col) ->
    (t, col, end_ms) with end clipped below the column's next note.
    Returns list of (t_ms, col, end_ms_or_-1)."""
    quarter = 60000.0 / bpm
    gap = quarter / 4.0
    by_col = {c: [] for c in range(key_count)}
    for t, c in events:
        by_col[c].append(t)
    next_start = {}
    for c, ts in by_col.items():
        ts.sort()
        for i, t in enumerate(ts):
            next_start[(t, c)] = ts[i + 1] if i + 1 < len(ts) else None
    out = []
    for t, c in events:
        end = -1.0
        if rng.random() < ln_ratio:
            hold = gap * float(rng.integers(2, 9))
            nxt = next_start[(t, c)]
            limit = (nxt - max(0.5 * gap, 30.0)) if nxt is not None else t + hold
            end = min(t + hold, limit)
            if end - t < 40.0:  # too short to be a meaningful hold
                end = -1.0
        out.append((t, c, end))
    return out


def _synthesize_audio(notes, duration_s, bpm, seed):
    """Audio FROM the chart: note-onset clicks + hold sustains + tone bed
    + quarter-beat ticks."""
    rng = np.random.default_rng(seed)
    n = int(SR * duration_s)
    t = np.arange(n) / SR
    f0 = float(rng.uniform(110, 330))
    # tone bed with slow harmonic movement
    y = (0.22 * np.sin(2 * np.pi * f0 * t)
         + 0.12 * np.sin(2 * np.pi * 1.5 * f0 * t + 0.7)).astype(np.float32)
    # quarter-beat ticks (the gridify/BPM-detection anchor)
    beat = 60.0 / bpm
    tick = ((t % beat) < 0.015).astype(np.float32)
    y += 0.12 * tick * np.sin(2 * np.pi * 1500 * t).astype(np.float32)

    # note-onset clicks: 18 ms exponentially-decaying 1 kHz burst
    click_len = int(0.018 * SR)
    env = np.exp(-np.arange(click_len) / (0.004 * SR)).astype(np.float32)
    burst = env * np.sin(2 * np.pi * 1000 * np.arange(click_len) / SR).astype(
        np.float32
    )
    onset_amp = np.zeros(n, np.float32)
    for start_ms, _, _ in notes:
        i = int(start_ms / 1000.0 * SR)
        if 0 <= i < n - click_len:
            onset_amp[i:i + click_len] += burst
    y += 0.35 * np.clip(onset_amp, -2.0, 2.0)

    # hold sustains: column-pitched tone across the hold body
    for start_ms, col, end_ms in notes:
        if end_ms <= start_ms:
            continue
        i0 = int(start_ms / 1000.0 * SR)
        i1 = min(int(end_ms / 1000.0 * SR), n)
        if i1 <= i0:
            continue
        fc = 440.0 * (2.0 ** (col / 4.0))
        seg = np.arange(i1 - i0) / SR
        y[i0:i1] += 0.16 * np.sin(2 * np.pi * fc * seg).astype(np.float32)

    peak = float(np.abs(y).max()) or 1.0
    return (y / peak * 0.85).astype(np.float32)


def write_set(root, set_name, duration_s, bpm, seed, family="stream",
              density=1.0, ln_ratio=0.0):
    rng = np.random.default_rng(seed)
    set_dir = os.path.join(root, set_name)
    os.makedirs(set_dir, exist_ok=True)

    events = _gen_events(rng, family, duration_s, bpm, density)
    notes = _apply_lns(rng, events, ln_ratio, bpm)

    y = _synthesize_audio(notes, duration_s, bpm, seed)
    with wave_mod.open(os.path.join(set_dir, "audio.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((y * 28000).astype(np.int16).tobytes())

    lines = []
    for start_ms, col, end_ms in sorted(notes):
        x = int((col + 0.5) * 128)
        if end_ms > start_ms:
            lines.append(f"{x},192,{int(start_ms)},128,0,"
                         f"{int(end_ms)}:0:0:0:0:")
        else:
            lines.append(f"{x},192,{int(start_ms)},1,0,0:0:0:0:")

    osu_path = os.path.join(set_dir, "chart.osu")
    with open(osu_path, "w") as f:
        f.write(
            "osu file format v14\n\n[General]\nAudioFilename: audio.wav\n"
            f"Mode: 3\n\n[Metadata]\nTitle:{set_name}\nVersion:{family}\n"
            "BeatmapSetID:1\n\n[Difficulty]\nCircleSize: 4\n\n"
            f"[TimingPoints]\n0,{60000 / bpm},4,2,1,20,1,0\n\n"
            "[HitObjects]\n" + "\n".join(lines) + "\n"
        )
    return osu_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", "-o", type=str, required=True)
    p.add_argument("--count", "-n", type=int, default=16)
    p.add_argument("--duration", type=float, default=None,
                   help="fixed duration (default: vary 20-40 s per chart)")
    p.add_argument("--seed", type=int, default=0)
    opt = p.parse_args()

    os.makedirs(opt.out_dir, exist_ok=True)
    rng = np.random.default_rng(opt.seed)
    paths = []
    for i in range(opt.count):
        bpm = float(rng.uniform(120, 240))
        family = FAMILIES[i % len(FAMILIES)]
        density = float(rng.uniform(0.6, 1.0))
        # LN mixture: rice / moderate LN / LN-heavy
        u = rng.random()
        if u < 0.30:
            ln_ratio = 0.0
        elif u < 0.70:
            ln_ratio = float(rng.uniform(0.1, 0.5))
        else:
            ln_ratio = float(rng.uniform(0.5, 0.9))
        duration = (opt.duration if opt.duration
                    else float(rng.uniform(20.0, 40.0)))
        paths.append(
            write_set(opt.out_dir, f"synth{i:04d}", duration, bpm,
                      seed=opt.seed * 100003 + i, family=family,
                      density=density, ln_ratio=ln_ratio)
        )
        if (i + 1) % 100 == 0:
            print(f"  {i + 1}/{opt.count} sets written")
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
