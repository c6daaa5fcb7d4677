"""Convert a reference PyTorch checkpoint (Keytoyze/Mug-Diffusion
model.ckpt) into this framework's orbax format so trained weights run
natively on TPU.

Usage:
    python scripts/convert_checkpoint.py \
        --torch_ckpt models/ckpt/model.ckpt \
        --model_config configs/mug/mug_diffusion_tpu.yaml \
        --out models/ckpt/model
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from mug_diffusion_tpu.utils import checkpoint as ckpt_utils
from mug_diffusion_tpu.utils.config import instantiate_from_config, load_config
from mug_diffusion_tpu.utils.torch_import import (
    convert_reference_checkpoint,
    load_torch_checkpoint,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", type=str, required=True)
    p.add_argument("--model_config", type=str,
                   default="configs/mug/mug_diffusion_tpu.yaml")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--strict", action="store_true")
    opt = p.parse_args()

    config = load_config(opt.model_config)
    ddpm = instantiate_from_config(config["model"])

    print("initializing target parameter structure...")
    target = ddpm.init_params(jax.random.PRNGKey(0))

    print(f"loading {opt.torch_ckpt}...")
    sd = load_torch_checkpoint(opt.torch_ckpt)
    print(f"{len(sd)} torch tensors")

    variables = convert_reference_checkpoint(
        sd, config["model"], target, strict=opt.strict
    )

    payload = {"params": jax.device_get(variables)["params"], "step": 0}
    ckpt_utils.save_checkpoint(os.path.abspath(opt.out), payload)
    print(f"wrote {opt.out}")


if __name__ == "__main__":
    main()
