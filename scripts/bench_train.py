"""Training-throughput benchmark: full live-model training step on the
current device (wave encoder over 32768 mel frames with remat, frozen VAE
encode, U-Net fwd+bwd, masked AdamW).

Prints one JSON line: {"metric", "value", "unit", "detail"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _model_config
    from mug_diffusion_tpu.utils.checkpoint import trainable_mask
    from mug_diffusion_tpu.utils.config import instantiate_from_config

    B = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
    z_len = 512
    note_len = z_len * 8
    mel_len = z_len * 64

    ddpm = instantiate_from_config(_model_config(tiny=False))
    rng = jax.random.PRNGKey(0)
    params = ddpm.init_params(
        rng, {"batch": 1, "z_length": 64, "num_features": 21}
    )
    mask = {
        "params": trainable_mask(
            params["params"], frozen_prefixes=("first_stage_model",)
        )
    }
    opt = optax.chain(
        optax.adamw(1e-4),
        optax.masked(
            optax.set_to_zero(),
            jax.tree_util.tree_map(lambda t: not t, mask),
        ),
    )
    opt_state = opt.init(params)

    batch = {
        "note": jnp.zeros((B, note_len, 16)),
        "audio": jnp.zeros((B, mel_len, 128)),
        "feature": jnp.zeros((B, 21), jnp.int32),
        "valid_flag": jnp.ones((B, note_len)),
    }

    @jax.jit
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            loss, _ = ddpm.loss_fn(p, batch, rng, train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state, batch,
                                   jax.random.PRNGKey(1))
    jax.block_until_ready(loss)

    t0 = time.time()
    n = 10
    for i in range(n):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(i))
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / n

    print(json.dumps({
        "metric": "train_step_live_model",
        "value": round(dt * 1000, 1),
        "unit": "ms",
        "detail": {
            "batch": B,
            "charts_per_sec_per_chip": round(B / dt, 1),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
