"""Multi-chip sharding paths on the 8-device virtual CPU mesh."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, ".")


def test_graft_entry_single():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (8, 512, 2)
    assert out[1].shape == (8, 512, 2)


@pytest.mark.parametrize("n", [8, 4])
def test_dryrun_multichip(n):
    import __graft_entry__ as g
    g.dryrun_multichip(n)


def test_dp_matches_single_device():
    """Sharded train step must produce the same loss as unsharded."""
    from learn_region_grow_tpu.parallel.mesh import make_mesh, shard_batch
    from learn_region_grow_tpu.train.trainer import TrainConfig, make_train_step

    cfg = TrainConfig(batch_size=8, num_inlier=32, num_neighbor=32)
    rng = np.random.RandomState(0)
    batch = {
        "inlier": rng.randn(8, 32, 13).astype(np.float32),
        "neighbor": rng.randn(8, 32, 13).astype(np.float32),
        "add": rng.randint(0, 2, (8, 32)).astype(np.int32),
        "remove": rng.randint(0, 2, (8, 32)).astype(np.int32),
    }

    init_fn, step, _ = make_train_step(cfg, mesh=None)
    p0, o0 = init_fn(jax.random.PRNGKey(0))
    p0, o0, m0 = step(p0, o0, batch)
    p0, o0, m0b = step(p0, o0, batch)

    mesh = make_mesh(tp=2)
    init_fn, step_sh, _ = make_train_step(cfg, mesh)
    p1, o1 = init_fn(jax.random.PRNGKey(0))
    sb = shard_batch(batch, mesh)
    p1, o1, m1 = step_sh(p1, o1, sb)
    p1, o1, m1b = step_sh(p1, o1, sb)

    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m0b["loss"]), float(m1b["loss"]),
                               rtol=1e-4)
