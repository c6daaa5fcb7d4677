"""Aggregate a bench_train perfetto trace by op/fusion name.

Produce the trace first:

    BENCH_TRAIN_PROFILE=/tmp/train_profile BENCH_TRAIN_STEPS=2 \
        python scripts/bench_train.py

then:

    python scripts/profile_train.py /tmp/train_profile

Prints the TPU device-time composition of the training step (fwd+bwd+
optimizer) so the next MFU lever is data, not guesswork (docs/PERF.md
logs the history; the serving equivalent is scripts/profile_serving.py).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def aggregate(log_dir: str, top: int = 40):
    traces = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        print("no perfetto trace under", log_dir, "— files:",
              glob.glob(os.path.join(log_dir, "**", "*"), recursive=True)[:10])
        return
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", trace if isinstance(trace, list) else [])
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    # restrict to the per-op lane: the 'XLA Modules' lane is one span per
    # executable covering the whole step, so summing it alongside 'XLA Ops'
    # would double the device total and halve every op's percentage
    tpu_threads = {
        k for k, v in tid_name.items()
        if "tpu" in pid_name.get(k[0], "").lower()
    }
    ops_threads = {
        k for k in tpu_threads if "xla ops" in tid_name[k].lower()
    }

    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e["pid"], "")
        tname = tid_name.get((e["pid"], e.get("tid")), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if ops_threads:
            if (e["pid"], e.get("tid")) not in ops_threads:
                continue
        elif "step" in tname.lower() or "module" in tname.lower():
            continue
        dur = e.get("dur", 0) / 1e6
        by_name[e.get("name", "?")] += dur
        total += dur

    print(f"TPU device total: {total*1000:.1f} ms")
    print(f"{'ms':>9}  {'%':>5}  op")
    shown = 0.0
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur*1000:9.2f}  {100*dur/max(total,1e-9):5.1f}  {name[:110]}")
        shown += dur
    print(f"(top-{top} covers {100*shown/max(total,1e-9):.1f}%)")


if __name__ == "__main__":
    aggregate(sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_profile")
