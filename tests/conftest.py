"""Test harness: force an 8-virtual-device CPU mesh before JAX import.

Mirrors the driver's multi-chip validation approach: sharding correctness
is tested on a virtual CPU mesh (xla_force_host_platform_device_count),
the real TPU chip is only used by bench.py.
"""

import os

# LIA_RAL_TPU_TEST_PLATFORM=axon runs the suite on the real chip (used
# for the @slow at-shape tier, test_at_shape_slow.py); default is the
# 8-virtual-device CPU mesh.
_plat = os.environ.get("LIA_RAL_TPU_TEST_PLATFORM", "cpu")

os.environ["JAX_PLATFORMS"] = _plat
flags = os.environ.get("XLA_FLAGS", "")
if _plat == "cpu" and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The image's sitecustomize registers the axon TPU PJRT plugin at
# interpreter start and pins jax_platforms=axon; override it back
# before any backend is instantiated.
import jax

jax.config.update("jax_platforms", _plat)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted")
