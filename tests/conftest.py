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
# NOTE: do NOT enable the persistent compile cache for CPU runs — XLA:CPU
# AOT cache entries have been observed to load across host-feature detection
# differences (+prefer-no-scatter/+prefer-no-gather) and SILENTLY COMPUTE
# WRONG RESULTS. The cache is only safe for the TPU backend.

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
