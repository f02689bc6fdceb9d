"""Device-side simulator vs the host oracle.

The device simulator (``data/device_simulator.py``) must reproduce the host
simulator's trajectory exactly when the stochastic inputs coincide. With
mistake probabilities forced to 0 the growth is deterministic given the
seed order, so the staged output must be bit-identical sample-for-sample
(reference semantics from ``stage_data.py:107-223``). With the reference's
drawn probabilities, outcomes are distribution-equivalent (JAX PRNG vs
MT19937), so the second tier checks the invariants that must hold for any
draw: convergence of every instance, label consistency, schedule caps.
"""

import numpy as np
import pytest

from learn_region_grow_tpu.core.features import prepare_room
from learn_region_grow_tpu.data.device_simulator import stage_rooms_device
from learn_region_grow_tpu.data.simulator import (_Accumulator,
                                                  simulate_room)
from learn_region_grow_tpu.data.synthetic import generate_rooms


@pytest.fixture(scope="module")
def small_rooms():
    rooms, objs, clss = [], [], []
    for room in generate_rooms(2, seed=11, scale=0.25):
        rooms.append(room[:, :6])
        objs.append(room[:, 6].astype(np.int32))
        clss.append(room[:, 7].astype(np.int32))
    return rooms, objs, clss


def _host_stage_zero_mistakes(rooms, objs, clss, seed_orders):
    acc = _Accumulator()
    for i in range(len(rooms)):
        rf = prepare_room(np.asarray(rooms[i], np.float64), objs[i], clss[i],
                          resolution=0.1, feature_size=13)
        simulate_room(rf, np.random.RandomState(0), acc,
                      seed_order=seed_orders[i], mistake_probs=(0.0, 0.0))
    return acc.finalize()


def test_zero_mistake_bit_parity_with_host(small_rooms):
    """Deterministic trajectories: device staging == host staging bitwise."""
    rooms, objs, clss = small_rooms
    rng = np.random.RandomState(3)
    seed_orders = []
    feats = []
    for i in range(len(rooms)):
        rf = prepare_room(np.asarray(rooms[i], np.float64), objs[i], clss[i],
                          resolution=0.1, feature_size=13)
        feats.append(rf)
        seed_orders.append(rng.choice(len(rf.points), len(rf.points),
                                      replace=False).astype(np.int32))
        # subsampling only triggers when a step's inlier/neighbor set tops
        # 1024 points; instance sizes bound the inlier side (neighbor sets
        # are bbox+-1 slivers, far smaller on planar fixtures)
        assert np.bincount(rf.obj_id).max() < 900, \
            "fixture must avoid subsampling"

    host = _host_stage_zero_mistakes(rooms, objs, clss, seed_orders)

    from learn_region_grow_tpu.data.device_simulator import (
        simulate_rooms_device)
    results = simulate_rooms_device(feats, np.random.RandomState(5),
                                    samples_cap=512, instances_cap=64,
                                    mistake_probs=(0.0, 0.0),
                                    seed_orders=seed_orders)
    acc = _Accumulator()
    for rf, res in zip(feats, results):
        assert int(res["dropped"]) == 0
        for s in range(int(res["n_samples"])):
            tgt = int(res["s_target"][s])
            ic = int(res["inl_cnt"][s])
            ii = res["inl_idx"][s, :ic]
            acc.points.append(rf.points[ii].copy())
            acc.count.append(ic)
            acc.remove.append((rf.obj_id[ii] != tgt).astype(np.int32))
            nc = int(res["nb_cnt"][s])
            nn = res["nb_idx"][s, :nc]
            acc.neighbor_points.append(rf.points[nn].copy())
            acc.neighbor_count.append(nc)
            acc.add.append((rf.obj_id[nn] == tgt).astype(np.int32))
            acc.complete.append(float(res["complete"][s]))
        for k in range(int(res["n_instances"])):
            acc.steps.append(int(res["inst_steps"][k]))
    dev = acc.finalize()

    assert np.array_equal(host.count, dev.count)
    assert np.array_equal(host.neighbor_count, dev.neighbor_count)
    assert np.array_equal(host.points, dev.points)
    assert np.array_equal(host.neighbor_points, dev.neighbor_points)
    assert np.array_equal(host.add, dev.add)
    assert np.array_equal(host.remove, dev.remove)
    assert np.array_equal(host.steps, dev.steps)
    np.testing.assert_allclose(host.complete, dev.complete, atol=1e-6)
    assert host.num_samples() > 10


def test_mistake_path_invariants(small_rooms):
    """Drawn-probability staging converges and emits consistent labels."""
    rooms, objs, clss = small_rooms
    staged = stage_rooms_device(rooms, objs, clss, resolution=0.1, seed=0,
                                samples_cap=1024, instances_cap=128)
    n_inst = sum(len(np.unique(o)) for o in objs)
    # every instance converges (stuck forces perfect moves; decay -> 0)
    assert len(staged.steps) == n_inst
    assert staged.steps.max() <= 500
    assert staged.num_samples() >= n_inst  # mistakes prolong growth
    assert np.all(staged.complete >= 0) and np.all(staged.complete <= 1)
    # perfect-growth samples exist (trajectories reach IoU 1 and record it
    # while unvisited neighbors remain)
    assert staged.complete.max() == 1.0
    # labels are binary and ragged arrays line up
    assert set(np.unique(staged.add)) <= {0, 1}
    assert set(np.unique(staged.remove)) <= {0, 1}
    assert staged.count.sum() == len(staged.points)
    assert staged.neighbor_count.sum() == len(staged.neighbor_points)
    # recentering: xy median of every sample is ~0 (finalize ran)
    first = staged.points[:staged.count[0]]
    assert np.allclose(np.median(first[:, :2], axis=0), 0, atol=1e-5)


def test_batch_width_does_not_change_output(small_rooms):
    """Rooms are independent lanes: batching is a pure layout choice."""
    rooms, objs, clss = small_rooms
    a = stage_rooms_device(rooms, objs, clss, seed=7, batch_rooms=1,
                           samples_cap=1024, instances_cap=128)
    b = stage_rooms_device(rooms, objs, clss, seed=7, batch_rooms=2,
                           samples_cap=1024, instances_cap=128)
    assert np.array_equal(a.count, b.count)
    assert np.array_equal(a.points, b.points)
    assert np.array_equal(a.add, b.add)
    assert np.array_equal(a.steps, b.steps)


def test_stage_data_cli_device_flag(small_rooms, tmp_path):
    """End-to-end: `stage_data --device` writes a loadable staged H5 with
    the same schema and instance count as the host path."""
    import os

    from learn_region_grow_tpu.cli import stage_data
    from learn_region_grow_tpu.utils.io import load_staged_h5, save_h5_rooms

    rooms, objs, clss = small_rooms
    eight = [np.column_stack([rooms[i], objs[i][:, None], clss[i][:, None]])
             for i in range(len(rooms))]
    save_h5_rooms(str(tmp_path / "synthetic_t.h5"), eight)

    stage_data.main(["--area", "synthetic_t", "--device",
                     "--data-dir", str(tmp_path), "--samples-cap", "1024"])
    out = tmp_path / "staged_synthetic_t.h5"
    assert os.path.exists(out)
    dev = load_staged_h5(str(out))

    stage_data.main(["--area", "synthetic_t", "--data-dir", str(tmp_path)])
    host = load_staged_h5(str(out))

    n_inst = sum(len(np.unique(o)) for o in objs)
    assert len(dev.steps) == len(host.steps) == n_inst
    # distribution-equivalent PRNG: sample counts in the same ballpark
    assert abs(dev.num_samples() - host.num_samples()) \
        <= 0.25 * host.num_samples()


def test_chunked_runner_bit_identical(small_rooms):
    """The re-entrant bounded-iteration runner (``_run_chunked`` — the
    2^20-bucket path where one execute outlives the remote worker's
    watchdog) is BIT-IDENTICAL to the single-execute ``_run_batch``: the
    same iteration function, merely split across executes with
    device-resident state."""
    import jax
    import jax.numpy as jnp

    from learn_region_grow_tpu.core import prepare_room
    from learn_region_grow_tpu.data.device_simulator import (
        _bucket, _run_batch, _run_chunked, make_room_simulator)

    rooms, objs, clss = small_rooms
    rf = prepare_room(rooms[0][:, :6], objs[0], clss[0], resolution=0.1)
    p = _bucket(len(rf.points))
    sim = make_room_simulator(p, 256, 64, stratified=False)
    vox = np.full((1, p, 3), 2 ** 30, np.int32)
    obj = np.full((1, p), -1, np.int32)
    valid = np.zeros((1, p), bool)
    order = np.full((1, p), p - 1, np.int32)
    n = len(rf.points)
    vox[0, :n] = rf.voxels
    obj[0, :n] = rf.obj_id
    valid[0, :n] = True
    rng = np.random.RandomState(3)
    order[0, :n] = rng.choice(n, n, replace=False).astype(np.int32)
    args = (jnp.asarray(vox), jnp.asarray(obj), jnp.asarray(valid),
            jnp.asarray(order), jnp.full((1, 2), -1.0, jnp.float32),
            jnp.stack([jax.random.PRNGKey(11)]))
    full = jax.device_get(_run_batch(sim, *args))
    # tiny chunks force MANY re-entries (state crosses executes a lot)
    chunked = jax.device_get(_run_chunked(sim, *args, p, chunk_iters=7))
    for k in full:
        np.testing.assert_array_equal(np.asarray(full[k]),
                                      np.asarray(chunked[k]), err_msg=k)
