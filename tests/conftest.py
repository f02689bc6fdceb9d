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


@pytest.fixture(scope="session")
def trained(tiny_rooms):
    """A briefly-trained 128/128 LrgNet on the tiny synthetic rooms
    (shared across engine/local-search tests; ~1 min once per session)."""
    from learn_region_grow_tpu.data.simulator import stage_rooms
    from learn_region_grow_tpu.train.trainer import (SampleSet, TrainConfig,
                                                     make_train_step)
    rooms = [r[:, :6] for r in tiny_rooms]
    staged = stage_rooms(rooms, [r[:, 6] for r in tiny_rooms],
                         [r[:, 7] for r in tiny_rooms], resolution=0.1,
                         seed=0)
    cfg = TrainConfig(batch_size=16, num_inlier=128, num_neighbor=128,
                      multiseed=0)
    ss = SampleSet(*staged.split())
    init_fn, train_step, _ = make_train_step(cfg)
    params, opt = init_fn(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    for _ in range(150):
        idx = rng.choice(len(ss), 16, replace=False)
        params, opt, _m = train_step(params, opt, ss.batch(idx, 128, 128, rng))
    return params, cfg.model_config()
