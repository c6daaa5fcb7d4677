"""Profile the fused serving executable on TPU and print the device-time
composition aggregated by op category.

Writes a perfetto trace (parseable JSON) via jax.profiler, then aggregates
TPU-track slice durations by fusion/op name. Use this to find the next
kernel worth optimizing (docs/PERF.md logs the history).
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _model_config
    from mug_diffusion_tpu.apps.serving import build_fused_generate
    from mug_diffusion_tpu.utils.config import instantiate_from_config

    count, steps, scale, z_length = 4, 100, 5.0, 512
    sr, seconds = 22050, 180

    ddpm = instantiate_from_config(_model_config(tiny=False))
    params = ddpm.init_params(
        jax.random.PRNGKey(0), {"batch": 1, "z_length": 64,
                                "num_features": 21}
    )
    t = np.arange(seconds * sr) / sr
    wave_dev = jnp.asarray(
        (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    )
    feature = jnp.zeros((count, 21), jnp.int32)
    uc = jnp.zeros((count, 21), jnp.int32)

    fused = build_fused_generate(
        ddpm, steps=steps, scale=scale, count=count, z_length=z_length,
    )

    def run(seed):
        return np.asarray(
            fused(params, wave_dev, feature, uc, jax.random.PRNGKey(seed))
        )

    run(0)  # compile

    log_dir = "/tmp/mug_profile"
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir, create_perfetto_trace=True):
        run(1)
        run(2)

    traces = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        print("no perfetto trace written; xplane files:",
              glob.glob(os.path.join(log_dir, "**", "*"), recursive=True))
        return
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", trace if isinstance(trace, list) else [])
    # find TPU device tracks (process names carry the device)
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e["pid"], "")
        tname = tid_name.get((e["pid"], e.get("tid")), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if "step" in tname.lower():
            continue  # step markers duplicate the op slices
        dur = e.get("dur", 0) / 1e6  # us -> s
        by_name[e.get("name", "?")] += dur
        total += dur

    print(f"TPU device tracks total: {total*1000:.1f} ms over 2 runs")
    print(f"{'ms':>9}  {'%':>5}  op")
    shown = 0.0
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur*1000:9.2f}  {100*dur/max(total,1e-9):5.1f}  {name[:100]}")
        shown += dur
    print(f"(top-40 covers {100*shown/max(total,1e-9):.1f}%)")


if __name__ == "__main__":
    main()
