"""Device feature prep vs the host oracle (CPU backend).

``prepare_room_device`` must reproduce the host ``prepare_room`` exactly on
everything integer (equalization set + order, voxel coords, inverse map)
and to f32 tolerance on normals/curvature (the host pipeline is f64).
"""

import numpy as np
import pytest

from learn_region_grow_tpu.core import prepare_room
from learn_region_grow_tpu.core.device_features import (DENSE_MAX,
                                                        prepare_room_device)
from learn_region_grow_tpu.data.synthetic import (generate_furnished_room,
                                                  generate_rooms)


@pytest.mark.parametrize("kind", ["box", "furnished"])
def test_matches_host_oracle(kind):
    if kind == "box":
        room = generate_rooms(1, seed=5, scale=0.4)[0]
    else:
        rng = np.random.RandomState(3)
        room = generate_furnished_room(3.0, 3.0, 2.5, rng)
    a = prepare_room(room[:, :6], room[:, 6], room[:, 7], resolution=0.1)
    b = prepare_room_device(room[:, :6], room[:, 6], room[:, 7],
                            resolution=0.1)
    # integer-exact: the equalized SET and ORDER define which points exist
    np.testing.assert_array_equal(a.equalized_idx, b.equalized_idx)
    np.testing.assert_array_equal(a.voxels, b.voxels)
    np.testing.assert_array_equal(a.unequalized_idx, b.unequalized_idx)
    np.testing.assert_array_equal(a.obj_id, b.obj_id)
    np.testing.assert_array_equal(a.cls_id, b.cls_id)
    # xyz/room/rgb features: f32 cast of the same values
    np.testing.assert_allclose(a.points[:, :9], b.points[:, :9], atol=5e-6)
    # normals/curvature: f32 closed-form eigen vs f64 LAPACK SVD
    assert np.abs(a.curvatures - b.curvatures).max() < 5e-4
    nd = np.abs(a.points[:, 9:12] - b.points[:, 9:12])
    # near-degenerate covariances may disagree more in direction; the bulk
    # must agree tightly
    assert np.quantile(nd, 0.999) < 1e-3
    assert nd.max() < 0.05


def test_float32_cloud_equalization_matches_host():
    """Real dataset H5s store float32 clouds; voxel rounding must follow the
    host rule in the INPUT dtype (an f64 upcast rounds boundary points into
    different voxels — review finding)."""
    rng = np.random.RandomState(9)
    room = generate_rooms(1, seed=8, scale=0.4)[0].astype(np.float32)
    # plant exact-boundary coordinates where f32/f64 rounding diverges
    room[:64, 0] = np.float32(0.05)
    room[64:128, 1] = np.float32(0.15)
    a = prepare_room(room[:, :6], room[:, 6], room[:, 7], resolution=0.1)
    b = prepare_room_device(room[:, :6], room[:, 6], room[:, 7],
                            resolution=0.1)
    np.testing.assert_array_equal(a.equalized_idx, b.equalized_idx)
    np.testing.assert_array_equal(a.voxels, b.voxels)
    np.testing.assert_array_equal(a.unequalized_idx, b.unequalized_idx)


def test_feature_size_prefixes():
    room = generate_rooms(1, seed=6, scale=0.35)[0]
    full = prepare_room_device(room[:, :6], room[:, 6], room[:, 7])
    for fs in (6, 9, 12):
        part = prepare_room_device(room[:, :6], room[:, 6], room[:, 7],
                                   feature_size=fs)
        np.testing.assert_array_equal(part.points, full.points[:, :fs])


def test_oversize_grid_falls_back_to_host():
    room = generate_rooms(1, seed=7, scale=0.35)[0]
    # a resolution small enough that the padded grid exceeds DENSE_MAX
    res = float((room[:, :3].max() - room[:, :3].min()) / DENSE_MAX ** 0.5)
    a = prepare_room(room[:, :6], room[:, 6], room[:, 7], resolution=res)
    b = prepare_room_device(room[:, :6], room[:, 6], room[:, 7],
                            resolution=res)
    np.testing.assert_array_equal(a.equalized_idx, b.equalized_idx)
    np.testing.assert_array_equal(a.points, b.points)
