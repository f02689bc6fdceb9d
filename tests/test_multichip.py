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


def test_sharded_inference_bit_identical(trained, tiny_rooms):
    """The flagship grow engine dp-sharded over the 8-device mesh must give
    BIT-identical committed cluster labels vs single-device (per-lane PRNG
    keys derive from global lane offsets; no cross-lane reductions)."""
    from learn_region_grow_tpu.core import prepare_room
    from learn_region_grow_tpu.engine.grow import GrowConfig, segment_rooms
    from learn_region_grow_tpu.models import lrgnet
    from learn_region_grow_tpu.parallel.mesh import make_mesh

    params, mdl_kwargs = trained
    mcfg = lrgnet.LrgNetConfig(**mdl_kwargs) if isinstance(mdl_kwargs, dict) \
        else mdl_kwargs
    feats = [prepare_room(r[:, :6], r[:, 6], r[:, 7], resolution=0.1)
             for r in tiny_rooms]
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128, max_steps=30)

    single = segment_rooms(params, mcfg, feats, gcfg)
    mesh = make_mesh(tp=1)
    sharded = segment_rooms(params, mcfg, feats, gcfg, mesh=mesh)
    for a, b in zip(single, sharded):
        assert a.num_clusters == b.num_clusters
        np.testing.assert_array_equal(a.cluster_label, b.cluster_label)

    # multi-seed + restart lanes shard the same way
    multi = segment_rooms(params, mcfg, feats, gcfg, num_parallel_seeds=2,
                          num_restarts=2)
    multi_sh = segment_rooms(params, mcfg, feats, gcfg, num_parallel_seeds=2,
                             num_restarts=2, mesh=mesh)
    for a, b in zip(multi, multi_sh):
        np.testing.assert_array_equal(a.cluster_label, b.cluster_label)


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


def test_tp4_training_shards_params_and_matches():
    """tp=4 over the 8-device mesh: the wide conv/head weights must be
    GENUINELY sharded (per-device shards hold cout/tp columns), the Adam
    moments must follow the weight sharding after an update, and a 4-step
    training run must track the single-device run numerically — i.e. the
    tp axis is exercised end to end, not just at placement time."""
    from learn_region_grow_tpu.parallel.mesh import (TP_AXIS, make_mesh,
                                                     shard_batch)
    from learn_region_grow_tpu.train.trainer import TrainConfig, make_train_step

    cfg = TrainConfig(batch_size=8, num_inlier=32, num_neighbor=32)
    rng = np.random.RandomState(1)

    def mk_batch():
        return {
            "inlier": rng.randn(8, 32, 13).astype(np.float32),
            "neighbor": rng.randn(8, 32, 13).astype(np.float32),
            "add": rng.randint(0, 2, (8, 32)).astype(np.int32),
            "remove": rng.randint(0, 2, (8, 32)).astype(np.int32),
        }
    batches = [mk_batch() for _ in range(4)]

    init_fn, step, _ = make_train_step(cfg, mesh=None)
    p0, o0 = init_fn(jax.random.PRNGKey(0))

    mesh = make_mesh(num_devices=8, tp=4)
    init_sh, step_sh, _ = make_train_step(cfg, mesh)
    p1, o1 = init_sh(jax.random.PRNGKey(0))

    # wide final conv (512-out) genuinely split 4 ways on its output dim
    w_wide = p1["inlier_mlp"][4]["w"]
    assert w_wide.shape[-1] == 512
    shard_shapes = {s.data.shape for s in w_wide.addressable_shards}
    assert shard_shapes == {(w_wide.shape[0], 512 // 4)}, shard_shapes
    spec = w_wide.sharding.spec
    assert TP_AXIS in str(spec)

    losses0, losses1 = [], []
    for b in batches:
        p0, o0, m0 = step(p0, o0, b)
        p1, o1, m1 = step_sh(p1, o1, shard_batch(b, mesh))
        losses0.append(float(m0["loss"]))
        losses1.append(float(m1["loss"]))
    np.testing.assert_allclose(losses0, losses1, rtol=5e-4)

    # params keep their tp sharding across updates (no silent resharding)
    w_after = p1["inlier_mlp"][4]["w"]
    assert {s.data.shape for s in w_after.addressable_shards} == {
        (w_after.shape[0], 512 // 4)}
    # Adam moments follow the weight sharding after the jitted updates
    mu_wide = o1[0].mu["inlier_mlp"][4]["w"]
    assert {s.data.shape for s in mu_wide.addressable_shards} == {
        (mu_wide.shape[0], 512 // 4)}


def test_fused_kernel_dp_sharded_matches_single(tiny_rooms, trained):
    """The fused whole-room kernel dp-shards over the room axis (interpret
    mode on the virtual CPU mesh) and produces bit-identical labels vs the
    unsharded call — per-room PRNG streams depend only on the room seed."""
    from learn_region_grow_tpu.core import prepare_room
    from learn_region_grow_tpu.engine.grow import (GrowConfig,
                                                   segment_rooms_fused)
    from learn_region_grow_tpu.parallel.mesh import make_mesh

    params, mcfg = trained
    feats = [prepare_room(r[:, :6], r[:, 6], r[:, 7], resolution=0.1)
             for r in tiny_rooms]
    gcfg = GrowConfig(num_inlier=64, num_neighbor=64, max_steps=6)
    mesh = make_mesh(num_devices=8, tp=1)
    res_m = segment_rooms_fused(params, mcfg, feats, gcfg,
                                max_instances=32, interpret=True, mesh=mesh)
    res_1 = segment_rooms_fused(params, mcfg, feats, gcfg,
                                max_instances=32, interpret=True)
    for a, b in zip(res_m, res_1):
        np.testing.assert_array_equal(a.cluster_label, b.cluster_label)
        assert a.num_clusters == b.num_clusters
