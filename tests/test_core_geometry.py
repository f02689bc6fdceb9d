"""Core geometry vs naive dict/loop oracles (reference semantics)."""

import itertools

import numpy as np
import pytest

from learn_region_grow_tpu.core import (build_voxel_hash, equalize_resolution,
                                        estimate_normals_curvature,
                                        prepare_room, voxel_coords)

RES = 0.1


def _oracle_equalize(xyz, resolution):
    """First-point-per-voxel in scan order, plus inverse map (oracle)."""
    equalized_idx = []
    unequalized_idx = []
    seen = {}
    for i in range(len(xyz)):
        k = tuple(np.round(xyz[i, :3] / resolution).astype(int))
        if k not in seen:
            seen[k] = len(equalized_idx)
            equalized_idx.append(i)
        unequalized_idx.append(seen[k])
    return np.array(equalized_idx), np.array(unequalized_idx)


def _oracle_normals(eq_xyz, raw_xyz, resolution):
    grid = {}
    for i in range(len(raw_xyz)):
        k = tuple(np.round(raw_xyz[i, :3] / resolution).astype(int))
        grid.setdefault(k, []).append(i)
    normals, curvatures = [], []
    for i in range(len(eq_xyz)):
        k = tuple(np.round(eq_xyz[i, :3] / resolution).astype(int))
        neighbors = []
        for off in itertools.product([-1, 0, 1], repeat=3):
            kk = (k[0] + off[0], k[1] + off[1], k[2] + off[2])
            if kk in grid:
                neighbors.extend(grid[kk])
        acc_a = np.zeros((3, 3))
        acc_b = np.zeros(3)
        for n in neighbors:
            p = raw_xyz[n, :3]
            acc_a += np.outer(p, p)
            acc_b += p
        cov = acc_a / len(neighbors) - np.outer(acc_b, acc_b) / len(neighbors) ** 2
        _, s, vh = np.linalg.svd(cov)
        normals.append(np.fabs(vh[2]))
        curvatures.append(np.fabs(s[2] / (s[0] + s[1] + s[2])))
    curvatures = np.array(curvatures)
    return np.array(normals), curvatures / curvatures.max()


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.RandomState(3)
    # uniform box, dense enough that no 27-voxel neighborhood is a single
    # point (the reference oracle divides by zero there)
    return (rng.rand(3000, 3) * 0.8 - 0.4).astype(np.float64)


def test_equalize_matches_oracle(cloud):
    eq, uneq = equalize_resolution(cloud, RES)
    eq_o, uneq_o = _oracle_equalize(cloud, RES)
    np.testing.assert_array_equal(eq, eq_o)
    np.testing.assert_array_equal(uneq, uneq_o)


def test_voxel_hash_lookup(cloud):
    h = build_voxel_hash(cloud, RES)
    vox = voxel_coords(cloud, RES)
    # every point's own voxel must be found and contain that point
    from learn_region_grow_tpu.core import pack_voxels
    keys, _, _ = pack_voxels(vox, h.origin, h.dims)
    slots = h.lookup(keys)
    assert (slots >= 0).all()
    for i in [0, 17, 199]:
        members = h.member_idx[h.slot_start[slots[i]]:h.slot_start[slots[i] + 1]]
        assert i in members
    # an absent voxel returns -1
    far_key, _, _ = pack_voxels(vox.max(axis=0)[None] + 1, h.origin, h.dims)
    assert h.lookup(far_key)[0] == -1


def test_normals_match_oracle(cloud):
    eq, _ = equalize_resolution(cloud, RES)
    normals, curv = estimate_normals_curvature(cloud[eq], cloud, RES)
    normals_o, curv_o = _oracle_normals(cloud[eq], cloud, RES)
    np.testing.assert_allclose(curv, curv_o, atol=1e-8)
    # SVD sign/degenerate-direction ambiguity: compare |dot| of normals
    dots = np.abs(np.sum(normals * normals_o, axis=1))
    assert (dots > 1 - 1e-6).mean() > 0.99


def test_prepare_room_shapes(tiny_rooms):
    room = tiny_rooms[0]
    rf = prepare_room(room[:, :6], room[:, 6], room[:, 7], resolution=0.1)
    n = len(rf.points)
    assert rf.points.shape == (n, 13)
    assert rf.voxels.shape == (n, 3)
    assert rf.unequalized_idx.shape == (len(room),)
    assert rf.unequalized_idx.max() == n - 1
    # room-normalized coords in [0, 1]
    assert rf.points[:, 3:6].min() >= 0 and rf.points[:, 3:6].max() <= 1
    # curvature of planar walls mostly low
    assert np.median(rf.curvatures) < 0.2
    # flat surfaces: normals near axis-aligned for most points
    axis_aligned = (rf.points[:, 9:12].max(axis=1) > 0.95).mean()
    assert axis_aligned > 0.8


def test_feature_size_variants(tiny_rooms):
    room = tiny_rooms[0]
    for fs in (6, 9, 12, 13):
        rf = prepare_room(room[:, :6], room[:, 6], room[:, 7],
                          resolution=0.1, feature_size=fs)
        assert rf.points.shape[1] == fs
