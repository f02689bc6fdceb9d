"""Point-cloud I/O: room H5 files, staged-sample H5 files, PLY/PCD writers.

File formats are byte/layout-compatible with the reference so its datasets and
visualization tooling interoperate:

* room H5:   ``points (sum_N, 8) float32`` = [xyz, rgb, obj_id, cls_id] and
  ``count_room (R,) int32``   (reference ``learn_region_grow_util.py:11-31``)
* staged H5: ``points/count/neighbor_points/neighbor_count/add/remove/steps/
  complete``                  (reference ``stage_data.py:242-256``)
* PLY/PCD ascii writers       (reference ``learn_region_grow_util.py:33-73``)
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Sequence, Tuple

import h5py
import numpy as np


def load_h5_rooms(filename: str, load_labels: bool = True):
    """Load a room H5 into per-room arrays.

    Returns ``(rooms, obj_ids, cls_ids)`` where ``rooms[i]`` is ``(N_i, 6)``
    [xyz, rgb] float, or the raw per-room arrays if ``load_labels`` is False.
    """
    with h5py.File(filename, "r") as f:
        all_points = f["points"][:]
        count_room = f["count_room"][:]
    splits = np.cumsum(count_room)[:-1]
    per_room = np.split(all_points, splits)
    if not load_labels:
        return per_room
    rooms = [p[:, :-2] for p in per_room]
    obj_ids = [p[:, -2].astype(np.int64) for p in per_room]
    cls_ids = [p[:, -1].astype(np.int64) for p in per_room]
    return rooms, obj_ids, cls_ids


def save_h5_rooms(filename: str, rooms: Sequence[np.ndarray]):
    """Write rooms (each ``(N_i, 8)``) into the flat room-H5 layout."""
    counts = np.array([len(r) for r in rooms], dtype=np.int32)
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    with h5py.File(filename, "w") as f:
        f.create_dataset("points", data=np.vstack(rooms).astype(np.float32),
                         compression="gzip", compression_opts=4)
        f.create_dataset("count_room", data=counts,
                         compression="gzip", compression_opts=4)


@dataclasses.dataclass
class StagedSamples:
    """Variable-length staged training samples (one per grow step).

    ``points``/``remove`` are ragged, flattened with ``count`` prefix sums;
    likewise ``neighbor_points``/``add`` with ``neighbor_count``.
    """

    points: np.ndarray            # (sum_count, F) float32
    count: np.ndarray             # (S,) int32
    neighbor_points: np.ndarray   # (sum_ncount, F) float32
    neighbor_count: np.ndarray    # (S,) int32
    add: np.ndarray               # (sum_ncount,) int32
    remove: np.ndarray            # (sum_count,) int32
    steps: np.ndarray             # (num_instances,) int32
    complete: np.ndarray          # (S,) float32

    def num_samples(self) -> int:
        return len(self.count)

    def split(self) -> Tuple[List[np.ndarray], List[np.ndarray],
                             List[np.ndarray], List[np.ndarray]]:
        """Return per-sample lists (inlier_pts, remove, neighbor_pts, add)."""
        po = np.split(self.points, np.cumsum(self.count)[:-1])
        rm = np.split(self.remove, np.cumsum(self.count)[:-1])
        npo = np.split(self.neighbor_points, np.cumsum(self.neighbor_count)[:-1])
        ad = np.split(self.add, np.cumsum(self.neighbor_count)[:-1])
        return po, rm, npo, ad


def save_staged_h5(filename: str, samples: StagedSamples):
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    with h5py.File(filename, "w") as f:
        kw = dict(compression="gzip", compression_opts=4)
        f.create_dataset("points", data=samples.points.astype(np.float32), **kw)
        f.create_dataset("count", data=samples.count.astype(np.int32), **kw)
        f.create_dataset("neighbor_points",
                         data=samples.neighbor_points.astype(np.float32), **kw)
        f.create_dataset("neighbor_count",
                         data=samples.neighbor_count.astype(np.int32), **kw)
        f.create_dataset("add", data=samples.add.astype(np.int32), **kw)
        f.create_dataset("remove", data=samples.remove.astype(np.int32), **kw)
        f.create_dataset("steps", data=samples.steps.astype(np.int32), **kw)
        f.create_dataset("complete", data=samples.complete.astype(np.float32), **kw)


def load_staged_h5(filename: str, feature_size: int | None = None) -> StagedSamples:
    with h5py.File(filename, "r") as f:
        points = f["points"][:]
        if feature_size is not None:
            points = points[:, :feature_size]
        neighbor_points = f["neighbor_points"][:]
        if feature_size is not None:
            neighbor_points = neighbor_points[:, :feature_size]
        return StagedSamples(
            points=points,
            count=f["count"][:],
            neighbor_points=neighbor_points,
            neighbor_count=f["neighbor_count"][:],
            add=f["add"][:],
            remove=f["remove"][:],
            steps=f["steps"][:],
            complete=f["complete"][:],
        )


def save_ply(filename: str, points: np.ndarray):
    """ASCII PLY writer; ``points`` is (N, 6) [xyz, rgb 0-255]."""
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    with open(filename, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex %d\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n" % len(points)
        )
        for p in points:
            f.write("%f %f %f %d %d %d\n" % (p[0], p[1], p[2], p[3], p[4], p[5]))
    print("Saved to %s: (%d points)" % (filename, len(points)))


def save_pcd(filename: str, points: np.ndarray):
    """ASCII PCD writer with packed-int RGB; ``points`` is (N, 6)."""
    if len(points) == 0:
        return
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    n = len(points)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
        "FIELDS x y z rgb\nSIZE 4 4 4 4\nTYPE F F F I\nCOUNT 1 1 1 1\n"
        "WIDTH %d\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS %d\nDATA ascii\n"
        % (n, n)
    )
    with open(filename, "w") as f:
        f.write(header)
        for p in points:
            rgb = (int(p[3]) << 16) | (int(p[4]) << 8) | int(p[5])
            f.write("%f %f %f %d\n" % (p[0], p[1], p[2], rgb))
    print("Saved %d points to %s" % (n, filename))
