"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths compile
and execute without TPU hardware. Must be set before JAX initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU even when a TPU plugin (axon) already imported jax at
# interpreter start — env vars are too late then, the live config isn't.
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from learn_region_grow_tpu.data.synthetic import generate_rooms  # noqa: E402


@pytest.fixture(scope="session")
def tiny_rooms():
    """Two small synthetic rooms (8-col layout), deterministic."""
    return generate_rooms(2, seed=0, scale=0.35)
