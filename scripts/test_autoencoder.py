"""VAE round-trip harness: encode one real chart, sample the posterior,
decode N reconstructions and save them beside a raw re-encode for A/B
inspection in the game editor (ref: /root/reference/scripts/test_autoencoder.py).

Usage: python scripts/test_autoencoder.py --beatmap path/to/chart.osu \
    --model_config configs/mug/autoencoder_tpu.yaml --ckpt logs/<run>/checkpoints/last
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mug_diffusion_tpu.data.convertor import parse_osu_file, save_osu_file
from mug_diffusion_tpu.models.autoencoder import AutoencoderKL
from mug_diffusion_tpu.utils import checkpoint as ckpt_utils
from mug_diffusion_tpu.utils.config import load_config, instantiate_from_config

SR, N_FFT, RATIO, MAX_AUDIO_FRAME = 22050, 512, 8, 32768


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--beatmap", type=str, required=True)
    parser.add_argument("--model_config", type=str,
                        default="configs/mug/autoencoder_tpu.yaml")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--count", type=int, default=4)
    parser.add_argument("--outdir", type=str, default="outputs/autoencoder")
    opt = parser.parse_args()

    config = load_config(opt.model_config)
    vae: AutoencoderKL = instantiate_from_config(config["model"])

    frame_ms = N_FFT / SR / 4 * RATIO * 1000
    convertor_params = {
        "frame_ms": frame_ms,
        "max_frame": MAX_AUDIO_FRAME // RATIO,
        "from_logits": True,
    }
    hit_objects, meta = parse_osu_file(opt.beatmap, convertor_params)
    arr, valid = meta.convertor.objects_to_array(hit_objects, meta)
    note = jnp.asarray(arr.T[None])  # [1, T, 16]

    rng = jax.random.PRNGKey(0)
    variables = vae.init(rng, note, rng)
    if opt.ckpt and os.path.exists(opt.ckpt):
        variables = {
            "params": ckpt_utils.load_with_surgery(
                opt.ckpt, variables["params"]
            )
        }

    os.makedirs(opt.outdir, exist_ok=True)
    base = os.path.basename(opt.beatmap).replace(".osu", "")

    # raw re-encode for A/B
    save_osu_file(
        meta, (arr * 2 - 1) * 10, os.path.join(opt.outdir, f"{base}_raw.osu"),
        {"Version": f"{meta.version}_raw"},
    )

    posterior = vae.apply(variables, note, method=AutoencoderKL.encode)
    for i in range(opt.count):
        z = posterior.sample(jax.random.PRNGKey(i))
        dec = vae.apply(variables, z, method=AutoencoderKL.decode)
        recon = np.asarray(dec)[0].T * np.asarray(valid)[None, :]
        out = os.path.join(opt.outdir, f"{base}_autoencoder_{i}.osu")
        save_osu_file(meta, recon, out,
                      {"Version": f"{meta.version}_autoencoder_{i}"})
        print("wrote", out)


if __name__ == "__main__":
    main()
