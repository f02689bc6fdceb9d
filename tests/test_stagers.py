"""Dataset stagers: KITTI pieces, vKITTI clustering, BIM sampling, JSIS3D."""

import os

import numpy as np
import pytest

from learn_region_grow_tpu.data.bim import (parse_obj_groups,
                                            sample_triangles,
                                            stage_obj_building)
from learn_region_grow_tpu.data.convert_scannet import room_to_blocks
from learn_region_grow_tpu.data.kitti import (KittiConfig, VoxelRGBCache,
                                              parse_calib, parse_poses,
                                              project_rgb, relabel_sample)
from learn_region_grow_tpu.data.vkitti import (
    class_constrained_voxel_clusters, stage_vkitti_scene)


def test_kitti_calib_and_poses(tmp_path):
    calib_txt = tmp_path / "calib.txt"
    calib_txt.write_text(
        "P2: 1 0 0 0 0 1 0 0 0 0 1 0\n"
        "Tr: 1 0 0 1 0 1 0 2 0 0 1 3\n")
    calib = parse_calib(str(calib_txt))
    assert calib["P2"][0, 0] == 1 and calib["Tr"][2, 3] == 3
    poses_txt = tmp_path / "poses.txt"
    poses_txt.write_text("1 0 0 5 0 1 0 0 0 0 1 0\n")
    poses = parse_poses(str(poses_txt), calib["Tr"])
    assert len(poses) == 1
    # Tr_inv @ pose @ Tr keeps the translation for identity rotations
    np.testing.assert_allclose(poses[0][:3, 3], [5, 0, 0], atol=1e-9)


def test_kitti_rgb_projection_and_cache():
    img = np.zeros((10, 20, 3), np.uint8)
    img[5, 7] = [10, 20, 30]
    p2 = np.eye(4)
    tr = np.eye(4)
    xyz = np.array([[7.0, 5.0, 1.0],    # projects to (7,5)
                    [0.0, 0.0, -1.0]])  # behind camera
    rgb, valid = project_rgb(xyz, img, p2, tr)
    assert valid[0] and not valid[1]
    np.testing.assert_array_equal(rgb[0], [10, 20, 30])
    cache = VoxelRGBCache()
    vox = np.array([[0, 0, 0], [0, 0, 0]])
    out = cache.update_and_fill(vox, rgb, valid)
    # invalid point inherits the cached voxel color
    np.testing.assert_array_equal(out[1], [10, 20, 30])


def test_kitti_relabel_sample():
    rng = np.random.RandomState(0)
    # labeled cluster A + unlabeled blob of same class forming a new cluster
    pts = np.zeros((400, 8))
    pts[:200, :3] = rng.rand(200, 3) * 2
    pts[:200, 6] = 7          # labeled instance
    pts[:200, 7] = 1
    pts[200:, :3] = rng.rand(200, 3) * 2 + 10   # far unlabeled blob
    pts[200:, 6] = 0
    pts[200:, 7] = 2
    out = relabel_sample(pts.copy(), KittiConfig(min_cluster=10))
    labels = set(out[:, 6].tolist())
    assert 0 not in labels
    assert len(labels) == 2  # relabeled original + one CC cluster


def test_vkitti_clustering():
    rng = np.random.RandomState(0)
    a = rng.rand(300, 3) * 0.5
    b = rng.rand(300, 3) * 0.5 + 5.0
    xyz = np.vstack([a, b])
    cls = np.zeros(600, int)
    labels = class_constrained_voxel_clusters(xyz, cls, 0.2, 50)
    assert set(labels) == {1, 2}
    # same voxel area but different class -> separate clusters
    cls2 = np.concatenate([np.zeros(300, int), np.ones(300, int)])
    xyz2 = np.vstack([a, a])
    labels2 = class_constrained_voxel_clusters(xyz2, cls2, 0.2, 50)
    assert labels2[:300].max() != labels2[300:].max()


def test_vkitti_scene_stage():
    rng = np.random.RandomState(1)
    pcd = np.zeros((500, 7))
    pcd[:, :3] = rng.rand(500, 3)
    pcd[:, 3:6] = rng.randint(0, 255, (500, 3))
    pcd[:, 6] = 3
    out = stage_vkitti_scene(pcd, min_cluster_size=20)
    assert out.shape[1] == 8
    assert (out[:, 3:6] >= -0.5).all() and (out[:, 3:6] <= 0.5).all()
    assert (out[:, 7] == 3).all()


def test_bim_obj_parse_and_sample(tmp_path):
    obj = tmp_path / "test.obj"
    obj.write_text(
        "g wall\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3\nf 1 3 4\n"
        "g Light-SurfaceX\n"
        "v 0 0 5\nv 1 0 5\nv 0 1 5\n"
        "f 1 2 3\n")
    groups = parse_obj_groups(str(obj))
    assert len(groups) == 2
    assert groups[0][0] == "wall" and len(groups[0][2]) == 2
    cloud = stage_obj_building(str(obj), density=0.01)
    assert len(cloud) > 50
    # all sampled points on the z=0 unit square (skipped group excluded)
    assert np.abs(cloud[:, 2]).max() < 1e-9
    rng = np.random.RandomState(0)
    pts = sample_triangles(groups[0][1], groups[0][2], 0.01, rng)
    assert (pts[:, 0] >= -1e-9).all() and (pts[:, 0] <= 1 + 1e-9).all()


def test_convert_scannet_blocks():
    rng = np.random.RandomState(0)
    cloud = np.zeros((5000, 8))
    cloud[:, :3] = rng.rand(5000, 3) * np.array([3, 3, 2])
    cloud[:, 3:6] = rng.rand(5000, 3) - 0.5
    cloud[:, 6] = rng.randint(1, 5, 5000)
    cloud[:, 7] = rng.randint(0, 13, 5000)
    batch = room_to_blocks(cloud, num_points=256)
    assert batch is not None
    assert batch.shape[1:] == (256, 14)
    # block-normalized xy centered near 0
    assert np.abs(batch[:, :, 3:5]).max() <= 1.0
    # room-normalized in [0, 1]
    assert batch[:, :, 9:12].min() >= 0 and batch[:, :, 9:12].max() <= 1 + 1e-9


def test_embedding_staging(tiny_rooms):
    """19-d embedding-conditioned features + staged growth samples."""
    import jax
    from learn_region_grow_tpu.data.embedding_staging import (
        EMBEDDING_FEATURE_SIZE, build_embedding_features,
        stage_embedding_rooms)
    from learn_region_grow_tpu.models.mcpnet import MCPNetConfig, init_params

    cfg = MCPNetConfig(num_neighbors=10)
    params = init_params(jax.random.PRNGKey(0), cfg)
    room = tiny_rooms[0]
    rf = build_embedding_features(room[:, :6], room[:, 6], room[:, 7],
                                  params, cfg, resolution=0.1)
    assert rf.points.shape[1] == EMBEDDING_FEATURE_SIZE
    # embedding block is L2-normalized per point
    norms = np.linalg.norm(rf.points[:, 9:19], axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
    staged = stage_embedding_rooms([room[:, :6]], [room[:, 6]],
                                   [room[:, 7]], params, cfg)
    assert staged.points.shape[1] == EMBEDDING_FEATURE_SIZE
    assert staged.num_samples() > 0
