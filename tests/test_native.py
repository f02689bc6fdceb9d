"""Native C++ host kernels vs NumPy fallbacks (skipped when unbuilt)."""

import numpy as np
import pytest

from learn_region_grow_tpu.native import (HAVE_NATIVE, moments27,
                                          neighbor_gather)

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native extension not built")


def test_moments27_matches_numpy_path():
    from learn_region_grow_tpu.core.normals import voxel_moments
    from learn_region_grow_tpu.core.voxel import (NEIGHBOR_OFFSETS_27,
                                                  pack_voxels, voxel_coords)
    rng = np.random.RandomState(0)
    xyz = rng.rand(2000, 3)
    h, counts, sums, outers = voxel_moments(xyz, 0.1)
    vox = voxel_coords(xyz[:500], 0.1)
    probes = np.empty((500, 27), np.int64)
    for oi, off in enumerate(NEIGHBOR_OFFSETS_27):
        probes[:, oi], _, _ = pack_voxels(vox + off, h.origin, h.dims)
    n_nat, s_nat, o_nat = moments27(
        np.ascontiguousarray(h.sorted_keys), np.ascontiguousarray(counts),
        np.ascontiguousarray(sums),
        np.ascontiguousarray(outers.reshape(-1, 9)),
        np.ascontiguousarray(probes))
    # NumPy oracle
    acc_n = np.zeros(500)
    acc_s = np.zeros((500, 3))
    acc_o = np.zeros((500, 9))
    for oi in range(27):
        slot = h.lookup(probes[:, oi])
        hit = slot >= 0
        acc_n[hit] += counts[slot[hit]]
        acc_s[hit] += sums[slot[hit]]
        acc_o[hit] += outers.reshape(-1, 9)[slot[hit]]
    np.testing.assert_allclose(n_nat, acc_n)
    np.testing.assert_allclose(s_nat, acc_s, rtol=1e-12)
    np.testing.assert_allclose(o_nat, acc_o, rtol=1e-12)


def test_neighbor_gather_validity():
    from learn_region_grow_tpu.core.voxel import (NEIGHBOR_OFFSETS_27,
                                                  build_voxel_hash,
                                                  pack_voxels, voxel_coords)
    rng = np.random.RandomState(0)
    xyz = rng.rand(800, 3)
    h = build_voxel_hash(xyz, 0.3)
    vox = voxel_coords(xyz, 0.3)
    probes = np.empty((800, 27), np.int64)
    for oi, off in enumerate(NEIGHBOR_OFFSETS_27):
        probes[:, oi], _, _ = pack_voxels(vox + off, h.origin, h.dims)
    sel = neighbor_gather(np.ascontiguousarray(h.sorted_keys),
                          np.ascontiguousarray(h.slot_start),
                          np.ascontiguousarray(h.member_idx),
                          np.ascontiguousarray(probes), 16, 1234)
    assert sel.shape == (800, 16)
    # every sampled neighbor must lie within 3*0.3 Chebyshev of its point
    d = np.abs(xyz[sel] - xyz[:, None, :]).max(axis=2)
    assert d.max() < 0.3 * 2 + 1e-9
    # determinism
    sel2 = neighbor_gather(np.ascontiguousarray(h.sorted_keys),
                           np.ascontiguousarray(h.slot_start),
                           np.ascontiguousarray(h.member_idx),
                           np.ascontiguousarray(probes), 16, 1234)
    np.testing.assert_array_equal(sel, sel2)
    # without-replacement when enough candidates: row uniqueness where the
    # neighborhood is dense
    dense = np.array([len(np.unique(sel[i])) for i in range(50)])
    assert (dense >= 10).mean() > 0.5


def test_normals_use_native_and_match():
    """estimate_normals_curvature: native vs forced-fallback paths agree."""
    import learn_region_grow_tpu.native as native_mod
    from learn_region_grow_tpu.core.normals import estimate_normals_curvature
    rng = np.random.RandomState(3)
    cloud = rng.rand(3000, 3) * 0.8
    eq_xyz = cloud[:400]
    n1, c1 = estimate_normals_curvature(eq_xyz, cloud, 0.1)
    saved = native_mod.HAVE_NATIVE
    try:
        native_mod.HAVE_NATIVE = False
        n2, c2 = estimate_normals_curvature(eq_xyz, cloud, 0.1)
    finally:
        native_mod.HAVE_NATIVE = saved
    np.testing.assert_allclose(c1, c2, atol=1e-10)
    np.testing.assert_allclose(np.abs((n1 * n2).sum(1)), 1.0, atol=1e-8)
