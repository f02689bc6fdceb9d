"""Virtual KITTI staging (reference ``tools/stage_vkitti.py``).

Per .npy scene: downsample at 0.05, drop points in sparse 0.2-voxels
(< 3 members), then class-constrained voxel-BFS clustering at 0.2 (min
cluster 50) assigns instance IDs; rgb rescaled to [-0.5, 0.5]; writes the
room-H5 layout. The reference's voxel-BFS is equivalent to connected
components over (voxel, class) nodes with 26-adjacency — implemented that
way, vectorized.
"""

from __future__ import annotations

import glob
import os
from typing import List

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import connected_components as _cc

from ..core.voxel import (NEIGHBOR_OFFSETS_27, equalize_resolution,
                          pack_voxels, voxel_coords)
from ..utils.io import save_h5_rooms


def class_constrained_voxel_clusters(xyz: np.ndarray, class_id: np.ndarray,
                                     resolution: float,
                                     min_cluster_size: int) -> np.ndarray:
    """Instance labels 1..K; 0 = dropped (small cluster)."""
    n = len(xyz)
    vox = voxel_coords(xyz, resolution)
    keys, origin, dims = pack_voxels(vox)
    # node = unique (voxel_key, class)
    node_key = keys * (class_id.max() + 1) + class_id
    uniq, point_node = np.unique(node_key, return_inverse=True)
    uniq_vox_key = uniq // (class_id.max() + 1)
    uniq_cls = uniq % (class_id.max() + 1)

    # decode voxel coords of each node to probe neighbors
    sort_keys = np.sort(np.unique(keys))
    key_index = {k: i for i, k in enumerate(sort_keys.tolist())}
    # adjacency between nodes: same class + 26-adjacent voxels
    z = uniq_vox_key % dims[2]
    y = (uniq_vox_key // dims[2]) % dims[1]
    x = uniq_vox_key // (dims[1] * dims[2])
    node_vox = np.stack([x, y, z], axis=1)
    import collections
    lut = collections.defaultdict(list)   # voxel key -> node ids
    for ni, vk in enumerate(uniq_vox_key.tolist()):
        lut[vk].append(ni)
    srcs, dsts = [], []
    for off in NEIGHBOR_OFFSETS_27:
        if (off == 0).all():
            continue
        shifted = node_vox + off
        nkeys = (shifted[:, 0] * dims[1] + shifted[:, 1]) * dims[2] \
            + shifted[:, 2]
        for ni, nk in enumerate(nkeys.tolist()):
            for nj in lut.get(nk, ()):
                if uniq_cls[nj] == uniq_cls[ni]:
                    srcs.append(ni)
                    dsts.append(nj)
    m = len(uniq)
    if srcs:
        g = sp.coo_matrix((np.ones(len(srcs), np.int8), (srcs, dsts)),
                          shape=(m, m))
        _, comp = _cc(g, directed=False)
    else:
        comp = np.arange(m)
    point_comp = comp[point_node]

    labels = np.zeros(n, dtype=int)
    new_id = 1
    for c in np.unique(point_comp):
        members = point_comp == c
        if members.sum() >= min_cluster_size:
            labels[members] = new_id
            new_id += 1
    return labels


def stage_vkitti_scene(pcd: np.ndarray,
                       downsample_resolution: float = 0.05,
                       cluster_resolution: float = 0.2,
                       min_cluster_size: int = 50) -> np.ndarray:
    """One (N, 7) vkitti array [xyz, rgb255, class] -> (M, 8) room points."""
    class_id = pcd[:, -1].astype(int)
    eq, _ = equalize_resolution(pcd[:, :3], downsample_resolution)
    pcd = pcd[eq]
    class_id = class_id[eq]

    # density filter: drop points in cluster-resolution voxels with < 3 pts
    vox = voxel_coords(pcd[:, :3], cluster_resolution)
    keys, _, _ = pack_voxels(vox)
    _, inv, counts = np.unique(keys, return_inverse=True, return_counts=True)
    keep = counts[inv] >= 3
    pcd = pcd[keep]
    class_id = class_id[keep]
    if len(pcd) == 0:
        return np.zeros((0, 8), np.float32)

    labels = class_constrained_voxel_clusters(pcd[:, :3], class_id,
                                              cluster_resolution,
                                              min_cluster_size)
    mask = labels > 0
    out = np.zeros((mask.sum(), 8), np.float32)
    out[:, :3] = pcd[mask, :3]
    out[:, 3:6] = pcd[mask, 3:6] / 255.0 - 0.5
    out[:, 6] = labels[mask]
    out[:, 7] = class_id[mask]
    return out


def stage_vkitti(dataset_dir: str, output: str,
                 areas: List[int] = (1, 2, 3, 4, 5, 6),
                 one_scene_per_area: bool = True):
    """Stage vkitti3d .npy scenes (``tools/stage_vkitti.py:16-121``; the
    reference breaks after the first scene per area)."""
    rooms = []
    for area in areas:
        files = sorted(glob.glob(os.path.join(dataset_dir,
                                              "0%d" % area, "*.npy")))
        for fn in files:
            print("Processing", fn)
            out = stage_vkitti_scene(np.load(fn))
            print("%d points %d clusters" % (len(out),
                                             int(out[:, 6].max()) if len(out)
                                             else 0))
            if len(out):
                rooms.append(out)
            if one_scene_per_area:
                break
    save_h5_rooms(output, rooms)
    print("wrote %d scenes to %s" % (len(rooms), output))
