"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths compile
and execute without TPU hardware. Must be set before JAX initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from learn_region_grow_tpu.data.synthetic import generate_rooms  # noqa: E402


@pytest.fixture(scope="session")
def tiny_rooms():
    """Two small synthetic rooms (8-col layout), deterministic."""
    return generate_rooms(2, seed=0, scale=0.35)
