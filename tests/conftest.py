"""Test configuration: run JAX on CPU with 8 virtual devices.

Mirrors the reference's strategy of testing distributed code paths without a
cluster (SparkSessionTestWrapper.scala:24-46 uses local[*] with tiny input
splits); here an 8-device host-platform mesh exercises the sharded paths.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache makes repeated suite runs much faster.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
