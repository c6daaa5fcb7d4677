"""MuG Diffusion TPU — a TPU-native (JAX/XLA) rhythm-game charting
diffusion framework.

Re-implements the full capability surface of Keytoyze/Mug-Diffusion
(audio -> controllable 4K osu!mania charts via latent diffusion) with a
TPU-first design: channels-last tensors, jit-compiled whole-sampler loops,
and pjit/shard_map data parallelism over ICI meshes. (Pallas kernels for
attention and the S4 Cauchy contraction were built, A/B-measured, and
removed — XLA's own fusion wins at this model's op sizes; docs/PERF.md.)

Layer map (mirrors reference SURVEY.md section 1):
  apps/      CLI + WebUI entry points           (ref: webui.py, scripts/mapping.py)
  training/  trainer loop, callbacks            (ref: main.py)
  diffusion/ DDPM core, schedules, DDIM sampler (ref: mug/diffusion/)
  models/    UNet, VAE, wave encoder, embedder  (ref: mug/diffusion/unet.py, mug/firststage/, mug/cond/)
  ops/       mel frontend, FFT (XLA)            (ref: librosa frontend + s4 cauchy ext)
  parallel/  mesh + sharding rules              (ref: Lightning DP/DDP via NCCL)
  data/      chart codec, dataset, post-process (ref: mug/data/)
  utils/     config reflection, feature codec   (ref: mug/util.py)
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persist XLA executables across processes — whole-sampler compiles
    take minutes; reruns should not pay twice."""
    cache_dir = _os.environ.get(
        "MUG_JAX_CACHE_DIR", _os.path.expanduser("~/.cache/mug_jax_cache")
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - jax unavailable or too old
        pass


_enable_compilation_cache()
