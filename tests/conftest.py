"""Test configuration: force CPU with 8 virtual devices *before* jax imports.

Multi-chip sharding paths are exercised on a virtual 8-device CPU mesh; the
real TPU is reserved for bench.py.
"""

import os

# Force CPU: the harness exports JAX_PLATFORMS=axon (the real-TPU tunnel),
# which must never be initialised from unit tests (single chip, slow/locking).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The image's sitecustomize registers the axon (real-TPU tunnel) PJRT plugin
# at interpreter boot — before this conftest — and the env exports
# JAX_PLATFORMS=axon, so the os.environ override above is not enough once
# jax is pre-imported.  Pin the platform through the config API too (must
# happen before the first backend initialisation).
jax.config.update("jax_platforms", "cpu")

# Numerical parity tests need true f32 matmuls (the environment's default
# matmul precision is bf16-grade even on CPU).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: makes repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng():
    return np.random.default_rng(233)
