"""Engine: masked sampling/median semantics + end-to-end segmentation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learn_region_grow_tpu.core import prepare_room
from learn_region_grow_tpu.data.simulator import stage_rooms
from learn_region_grow_tpu.engine.grow import (GrowConfig, fill_unlabeled,
                                               masked_median, masked_sample,
                                               segment_rooms)
from learn_region_grow_tpu.eval.metrics import room_metrics
from learn_region_grow_tpu.models import lrgnet


def test_masked_sample_without_replacement():
    mask = np.zeros(100, bool)
    mask[10:80] = True  # 70 masked, k=32 -> without replacement
    idx = np.asarray(masked_sample(jax.random.PRNGKey(0), jnp.asarray(mask), 32))
    assert len(np.unique(idx)) == 32
    assert mask[idx].all()


def test_masked_sample_with_fill():
    mask = np.zeros(100, bool)
    chosen = [3, 17, 42, 99]
    mask[chosen] = True  # 4 masked, k=16 -> all 4 in order + fill
    idx = np.asarray(masked_sample(jax.random.PRNGKey(1), jnp.asarray(mask), 16))
    np.testing.assert_array_equal(idx[:4], chosen)
    assert np.isin(idx[4:], chosen).all()


def test_masked_median_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(50, 5).astype(np.float32)
    mask = rng.rand(50) < 0.6
    got = np.asarray(masked_median(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(got, np.median(x[mask], axis=0), atol=1e-6)
    # odd count too
    mask2 = np.zeros(50, bool)
    mask2[[1, 5, 9]] = True
    got2 = np.asarray(masked_median(jnp.asarray(x), jnp.asarray(mask2)))
    np.testing.assert_allclose(got2, np.median(x[mask2], axis=0), atol=1e-6)


def test_fill_unlabeled():
    pts = np.array([[0.0, 0], [0.1, 0], [5, 5], [5.1, 5]], np.float32)
    lbl = np.array([1, 0, 2, 0])
    out = fill_unlabeled(pts, lbl)
    np.testing.assert_array_equal(out, [1, 1, 2, 2])


def test_segment_rooms_end_to_end(tiny_rooms, trained):
    params, mcfg = trained
    room = tiny_rooms[0]
    rf = prepare_room(room[:, :6], room[:, 6], room[:, 7], resolution=0.1)
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128, max_steps=120)
    results = segment_rooms(params, mcfg, [rf], gcfg)
    assert len(results) == 1
    res = results[0]
    lbl = res.cluster_label
    assert lbl.shape == (len(rf.points),)
    assert (lbl > 0).all()  # fill assigns every point
    assert res.num_clusters >= 1
    assert len(res.instances) >= 1
    m, _ = room_metrics(rf.obj_id, lbl)
    # quickly-trained net on synthetic boxes reaches ~0.8 NMI; 0.5 guards
    # against engine regressions without being training-noise flaky
    assert m.nmi > 0.5, f"NMI too low: {m.nmi}"


def test_segment_rooms_batches_multiple_rooms(tiny_rooms, trained):
    params, mcfg = trained
    rfs = [prepare_room(r[:, :6], r[:, 6], r[:, 7], resolution=0.1)
           for r in tiny_rooms]
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128, max_steps=120)
    results = segment_rooms(params, mcfg, rfs, gcfg)
    assert all(r is not None and (r.cluster_label > 0).all() for r in results)


def test_segment_rooms_scheduled_matches_quality(tiny_rooms, trained):
    """The lane-scheduled engine reaches the same quality as the wave
    engine on the synthetic fixture."""
    from learn_region_grow_tpu.engine.grow import segment_rooms_scheduled
    params, mcfg = trained
    room = tiny_rooms[0]
    rf = prepare_room(room[:, :6], room[:, 6], room[:, 7], resolution=0.1)
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128, max_steps=120)
    results = segment_rooms_scheduled(params, mcfg, [rf], gcfg,
                                      slots_per_room=2, chunk_steps=24)
    lbl = results[0].cluster_label
    assert (lbl > 0).all()
    m, _ = room_metrics(rf.obj_id, lbl)
    assert m.nmi > 0.5, m


def test_grow_chunk_state_roundtrip(tiny_rooms, trained):
    """grow_chunk resumes exactly: two 10-step chunks == one 20-step run
    when no lane terminates in between (same PRNG stream via packed state)."""
    import jax
    import jax.numpy as jnp
    from learn_region_grow_tpu.engine.grow import grow_chunk
    from learn_region_grow_tpu.data.synthetic import generate_rooms
    params, mcfg = trained
    room = generate_rooms(1, seed=3, scale=0.12)[0]   # few hundred points
    rf = prepare_room(room[:, :6], room[:, 6], room[:, 7], resolution=0.1)
    n = len(rf.points)
    P = 1024
    pts = np.zeros((1, P, 13), np.float32)
    pts[0, :n] = rf.points
    vox = np.zeros((1, P, 3), np.int32)
    vox[0, :n] = rf.voxels
    valid = np.zeros((1, P), bool)
    valid[0, :n] = True
    seed = int(np.argsort(rf.curvatures)[0])
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128, max_steps=500)

    def init_arrays():
        flags = (~valid).astype(np.uint8)
        flags[0, :n] |= ((rf.obj_id == rf.obj_id[seed]).astype(np.uint8) << 1)
        flags[0, seed] |= 4
        ints = np.zeros((1, 16), np.int32)
        ints[0, 0:12] = np.tile(rf.voxels[seed], 4)
        floats = np.zeros((1, 3), np.float32)
        rngs = np.array(jax.random.split(jax.random.PRNGKey(7), 1))
        return flags, ints, floats, rngs

    def run(chunks):
        flags, ints, floats, rngs = init_arrays()
        cur = None
        for c in chunks:
            cur, ints, floats, rngs = [np.asarray(jax.device_get(x)) for x in
                grow_chunk(mcfg, gcfg, c, params, jnp.asarray(pts),
                           jnp.asarray(vox), jnp.asarray(valid),
                           jnp.asarray(flags), jnp.asarray(ints),
                           jnp.asarray(floats), jnp.asarray(rngs))]
            flags = (flags & ~np.uint8(4)) | (cur.astype(np.uint8) << 2)
        return cur, ints

    cur_a, ints_a = run([20])
    cur_b, ints_b = run([10, 10])
    np.testing.assert_array_equal(cur_a, cur_b)
    np.testing.assert_array_equal(ints_a, ints_b)


def test_adaptive_tail_quality(tiny_rooms, trained):
    """tail_seeds>K must not degrade quality on the fixture."""
    params, mcfg = trained
    room = tiny_rooms[0]
    rf = prepare_room(room[:, :6], room[:, 6], room[:, 7], resolution=0.1)
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128, max_steps=120)
    base = segment_rooms(params, mcfg, [rf], gcfg, num_parallel_seeds=2)
    tail = segment_rooms(params, mcfg, [rf], gcfg, num_parallel_seeds=2,
                         tail_seeds=8)
    m0, _ = room_metrics(rf.obj_id, base[0].cluster_label)
    m1, _ = room_metrics(rf.obj_id, tail[0].cluster_label)
    assert m1.nmi > m0.nmi - 0.1, (m0.nmi, m1.nmi)


def test_reference_protocol_runner(tiny_rooms, trained):
    """The measured-baseline runner (engine/reference_loop.py) segments the
    fixture with the reference's sequential host-loop protocol and reaches
    the same quality bar as the batched engine."""
    from learn_region_grow_tpu.engine.reference_loop import (
        run_reference_protocol)
    params, mcfg = trained
    room = tiny_rooms[0]
    rf = prepare_room(room[:, :6], room[:, 6], room[:, 7], resolution=0.1)
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128, max_steps=120)
    results, timing = run_reference_protocol(params, mcfg, [rf], gcfg)
    assert len(results) == 1
    res = results[0]
    assert res.cluster_label.shape == (len(rf.points),)
    assert (res.cluster_label > 0).all()
    assert res.num_clusters >= 1
    assert set(timing) == {"net", "neighbor", "inlier"}
    assert timing["net"] > 0 and timing["inlier"] > 0
    m, _ = room_metrics(rf.obj_id, res.cluster_label)
    assert m.nmi > 0.5, f"NMI too low: {m.nmi}"


def test_large_p_single_wave(tiny_rooms, trained):
    """Scale smoke: one grow wave at a P=65,536 padded bucket (the
    ScanNet-scale bucket, BASELINE.json config #4) — shapes, bit-packing
    and bucket memory all hold; full-scale throughput lives in
    results/scale_curve.txt (val_run/run_scale.py)."""
    from learn_region_grow_tpu.engine.grow import grow_batch_rooms

    params, mcfg = trained
    room = tiny_rooms[0]
    rf = prepare_room(room[:, :6], room[:, 6], room[:, 7], resolution=0.1)
    n = len(rf.points)
    P = 65536
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128, max_steps=2)
    pts = np.zeros((1, P, 13), np.float32)
    vox = np.zeros((1, P, 3), np.int32)
    valid = np.zeros((1, P), bool)
    obj = np.full((1, P), -1, np.int32)
    pts[0, :n] = rf.points
    vox[0, :n] = rf.voxels
    valid[0, :n] = True
    obj[0, :n] = rf.obj_id
    visited = np.zeros((1, P), np.uint8)
    visited[0, n:] = 1
    seed_idx = np.array([int(np.argsort(rf.curvatures, kind="stable")[0])],
                        np.int32)
    packed, stats = grow_batch_rooms(
        mcfg, gcfg, 1, params, jnp.asarray(pts), jnp.asarray(vox),
        jnp.asarray(valid), jnp.asarray(obj), jnp.asarray(visited),
        jnp.asarray(seed_idx), jax.random.PRNGKey(0), jnp.int32(0))
    packed = np.asarray(packed)
    assert packed.shape == (1, P // 8)
    cur = np.unpackbits(packed, axis=1, bitorder="little")[0]
    assert cur[:n].sum() >= 1          # the region grew from its seed
    assert cur[n:].sum() == 0          # padding never enters a mask
    assert np.isfinite(stats).all()
