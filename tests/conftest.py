"""Test harness config: run all tests on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware.

Note: this image's sitecustomize registers the remote-TPU ('axon') PJRT
plugin at interpreter startup, so JAX is partially imported before conftest
runs and JAX_PLATFORMS env overrides are too late. jax.config.update still
works because backends initialize lazily on first use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# This host has a single CPU core; full XLA optimization makes each compile
# take minutes. Tests only check numerics, so compile at -O0.
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()

# The environment's TPU plugin lowers the global default matmul precision to
# bfloat16; numerics golden tests need full f32 matmuls.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

# Persistent compilation cache: XLA compiles are slow on this host (~2-6s per
# op); cache them across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend()
)
