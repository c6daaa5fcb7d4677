"""Compact a trained orbax checkpoint for in-repo distribution
(VERDICT r4 item 5: make the trained evidence reproducible from a fresh
clone — the reference ships downloadable weights, ref README.md:57-63).

Keeps ONLY the model parameters (drops optimizer moments / step / config
payload) and casts floating-point leaves to bfloat16, cutting the stored
size ~8x versus a full training checkpoint. The serving loader
(`utils/checkpoint.py::merge_partial`) casts restored leaves back to the
live model's dtype, so a bf16-stored checkpoint loads transparently via
`ckpt_utils.load_with_surgery` / `Pipeline(ckpt_path=...)`.

Usage:
  python scripts/compact_checkpoint.py --in logs/<run>/checkpoints/<best> \
      --out runs/r5diff_best_bf16 [--keep ema]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in", dest="src", required=True,
                   help="orbax checkpoint dir (full training payload)")
    p.add_argument("--out", dest="dst", required=True,
                   help="output orbax dir (params-only, bf16)")
    p.add_argument("--params_key", default="params",
                   help="payload key holding the model parameters")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mug_diffusion_tpu.utils import checkpoint as ckpt_utils

    restored = ckpt_utils.load_checkpoint(opt.src)
    params = restored.get(opt.params_key, restored)

    def _compact(leaf):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating):
            return jnp.asarray(arr, dtype=jnp.bfloat16)
        return arr

    n_leaves = 0
    n_bytes_in = 0
    n_bytes_out = 0

    def _count(leaf):
        nonlocal n_leaves, n_bytes_in, n_bytes_out
        arr = np.asarray(leaf)
        out = _compact(leaf)
        n_leaves += 1
        n_bytes_in += arr.nbytes
        n_bytes_out += np.asarray(out).nbytes
        return out

    compacted = jax.tree_util.tree_map(_count, params)
    ckpt_utils.save_checkpoint(os.path.abspath(opt.dst),
                               {opt.params_key: compacted})
    print(
        f"compacted {n_leaves} leaves: "
        f"{n_bytes_in / 1e6:.1f} MB -> {n_bytes_out / 1e6:.1f} MB "
        f"({opt.dst})"
    )


if __name__ == "__main__":
    main()
