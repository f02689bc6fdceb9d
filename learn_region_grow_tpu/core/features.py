"""Room feature preparation: equalize + normals + 13-d feature assembly.

Produces the per-room inputs every driver needs (reference inlines this block
in ``stage_data.py:58-104`` and ``test_region_grow.py:119-175``):

feature layout (FEATURE_SIZE=13):
  [0:3]   xyz (metric)
  [3:6]   room-normalized xyz in [0, 1]
  [6:9]   rgb
  [9:12]  |normal|
  [12]    curvature (max-normalized per room)

Smaller FEATURE_SIZE values keep the prefix: 6 = xyz+room, 9 = +rgb,
12 = +normals.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .normals import estimate_normals_curvature
from .voxel import equalize_resolution, voxel_coords


@dataclasses.dataclass
class RoomFeatures:
    points: np.ndarray           # (N, feature_size) float32
    voxels: np.ndarray           # (N, 3) int64 voxel coords of equalized pts
    obj_id: np.ndarray           # (N,) int64
    cls_id: np.ndarray           # (N,) int64
    curvatures: np.ndarray       # (N,) float64 (max-normalized)
    equalized_idx: np.ndarray    # (N,) int64 into the raw cloud
    unequalized_idx: np.ndarray  # (N_raw,) int64 inverse map


def prepare_room(
    raw_points: np.ndarray,
    obj_id: np.ndarray,
    cls_id: np.ndarray,
    resolution: float = 0.1,
    feature_size: int = 13,
) -> RoomFeatures:
    """Equalize resolution and build per-point features for one room.

    ``raw_points`` is (N_raw, 6) [xyz, rgb].
    """
    raw_points = np.asarray(raw_points)
    eq_idx, uneq_idx = equalize_resolution(raw_points[:, :3], resolution)
    pts = raw_points[eq_idx]
    obj = np.asarray(obj_id)[eq_idx].astype(np.int64)
    cls = np.asarray(cls_id)[eq_idx].astype(np.int64)

    xyz = pts[:, :3]
    rgb = pts[:, 3:6]
    span = xyz.max(axis=0) - xyz.min(axis=0)
    span = np.where(span == 0, 1.0, span)
    room_coordinates = (xyz - xyz.min(axis=0)) / span

    normals, curvatures = estimate_normals_curvature(
        xyz, raw_points[:, :3], resolution)

    if feature_size == 6:
        feats = np.hstack((xyz, room_coordinates))
    elif feature_size == 9:
        feats = np.hstack((xyz, room_coordinates, rgb))
    elif feature_size == 12:
        feats = np.hstack((xyz, room_coordinates, rgb, normals))
    elif feature_size == 13:
        feats = np.hstack((xyz, room_coordinates, rgb, normals,
                           curvatures.reshape(-1, 1)))
    else:
        raise ValueError(f"unsupported feature_size {feature_size}")

    return RoomFeatures(
        points=feats.astype(np.float32),
        voxels=voxel_coords(xyz, resolution),
        obj_id=obj,
        cls_id=cls,
        curvatures=curvatures,
        equalized_idx=eq_idx,
        unequalized_idx=uneq_idx,
    )
