"""Region-growing simulator: generates staged training samples.

Reproduces the reference training-data generator (``stage_data.py``): for
every room, grow each ground-truth instance from a random seed with a
bounding-box-expansion neighbor rule, deliberately injecting add/remove
mistakes with a decaying probability so the network learns to recover
(domain-level fault injection — a first-class feature, SURVEY.md §5). At each
step the current inlier set, the neighbor candidate set, and per-point
add/remove labels are recorded (subsampled to ``max_points``), along with the
IoU-vs-GT ``complete`` score. Samples are recentered by the inlier median
(xy + feature channels) before writing.

Semantics preserved exactly, including the quirky-but-load-bearing bits:
* first-point-per-voxel equalization order,
* +-1-voxel bbox neighborhood (not kNN),
* ``stuck`` forcing perfect moves once the bbox stops expanding,
* 500-step growth cap, cluster_threshold on early termination,
* the reference's float-division seed-augmentation rule
  (``stage_data.py:50-56``): xy-swap for odd seeds, x-flip only for seeds
  where ``seed/2 % 2 == 1`` (true division, i.e. 2, 6, ...), y-flip only for
  ``seed == 4``.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..core.features import RoomFeatures, prepare_room
from ..utils.io import StagedSamples, load_h5_rooms, save_staged_h5


def apply_seed_augmentation(points: np.ndarray, seed: int) -> np.ndarray:
    """In the reference's (float-division) augmentation semantics."""
    pts = points.copy()
    if seed % 2 == 1:
        pts[:, 0], pts[:, 1] = points[:, 1].copy(), points[:, 0].copy()
    if seed / 2 % 2 == 1:
        pts[:, 0] = -pts[:, 0]
    if seed / 4 == 1:
        pts[:, 1] = -pts[:, 1]
    return pts


class _Accumulator:
    def __init__(self):
        self.points: List[np.ndarray] = []
        self.count: List[int] = []
        self.neighbor_points: List[np.ndarray] = []
        self.neighbor_count: List[int] = []
        self.add: List[np.ndarray] = []
        self.remove: List[np.ndarray] = []
        self.steps: List[int] = []
        self.complete: List[float] = []

    def finalize(self) -> StagedSamples:
        # per-sample recentering by inlier xy-median + feature median
        # (stage_data.py:233-240)
        for i in range(len(self.points)):
            center = np.median(self.points[i][:, :2], axis=0)
            feature_center = np.median(self.points[i][:, 6:], axis=0)
            self.points[i][:, :2] -= center
            self.points[i][:, 6:] -= feature_center
            if len(self.neighbor_points[i]) > 0:
                self.neighbor_points[i][:, :2] -= center
                self.neighbor_points[i][:, 6:] -= feature_center
        return StagedSamples(
            points=np.vstack(self.points) if self.points else np.zeros((0, 13), np.float32),
            count=np.array(self.count, np.int32),
            neighbor_points=(np.vstack(self.neighbor_points)
                             if self.neighbor_points else np.zeros((0, 13), np.float32)),
            neighbor_count=np.array(self.neighbor_count, np.int32),
            add=(np.concatenate(self.add) if self.add
                 else np.zeros(0, np.int32)).astype(np.int32),
            remove=(np.concatenate(self.remove) if self.remove
                    else np.zeros(0, np.int32)).astype(np.int32),
            steps=np.array(self.steps, np.int32),
            complete=np.array(self.complete, np.float32),
        )


def simulate_room(rf: RoomFeatures, rng: np.random.RandomState,
                  acc: _Accumulator,
                  max_points: int = 1024,
                  cluster_threshold: int = 10,
                  max_steps: int = 500,
                  verbose: bool = False,
                  room_tag: str = "",
                  seed_order: Optional[np.ndarray] = None,
                  mistake_probs=None):
    """Simulate mistake-injected growth of every instance in one room.

    ``seed_order``/``mistake_probs`` override the drawn seed permutation and
    per-instance mistake probabilities — test hooks for comparing against
    the device simulator (with probabilities 0 the trajectory is
    deterministic); defaults preserve the reference's draws.
    """
    points = rf.points
    obj_id = rf.obj_id
    point_voxels = rf.voxels
    n = len(points)
    visited = np.zeros(n, dtype=bool)

    if seed_order is None:
        seed_order = rng.choice(n, n, replace=False)
    for seed_id in seed_order:
        if visited[seed_id]:
            continue
        target_id = obj_id[seed_id]
        gt_mask = obj_id == target_id

        current = np.zeros(n, dtype=bool)
        current[seed_id] = True
        min_dims = point_voxels[seed_id].copy()
        max_dims = point_voxels[seed_id].copy()
        steps = 0
        stuck = False
        if mistake_probs is None:
            add_mistake_prob = rng.randint(2, 5) * 0.1
            remove_mistake_prob = rng.randint(2, 5) * 0.1
        else:
            add_mistake_prob, remove_mistake_prob = mistake_probs

        while True:
            neighbor_mask = (
                np.all(point_voxels >= min_dims - 1, axis=1)
                & np.all(point_voxels <= max_dims + 1, axis=1)
                & ~current & ~visited
            )
            expand_points = points[neighbor_mask]
            expand_class = obj_id[neighbor_mask] == target_id
            nb_idx = np.nonzero(neighbor_mask)[0]
            if stuck:
                expand_id = nb_idx[expand_class]
            else:
                mistake = rng.random_sample(len(nb_idx)) < add_mistake_prob
                expand_id = nb_idx[np.logical_xor(expand_class, mistake)]

            reject_class = obj_id[current] != target_id
            cur_idx = np.nonzero(current)[0]
            if stuck:
                reject_id = cur_idx[reject_class]
            else:
                mistake = rng.random_sample(len(cur_idx)) < remove_mistake_prob
                reject_id = cur_idx[np.logical_xor(reject_class, mistake)]

            iou = 0.0
            if len(expand_points) > 0:
                current_points = points[current]
                rec_reject = reject_class
                if len(current_points) > max_points:
                    subset = rng.choice(len(current_points), max_points,
                                        replace=False)
                    current_points = current_points[subset]
                    rec_reject = reject_class[subset]
                acc.points.append(current_points.copy())
                acc.count.append(len(current_points))
                acc.remove.append(rec_reject.astype(np.int32))

                rec_expand = expand_class
                rec_expand_points = expand_points
                if len(expand_points) > max_points:
                    subset = rng.choice(len(expand_points), max_points,
                                        replace=False)
                    rec_expand_points = expand_points[subset]
                    rec_expand = expand_class[subset]
                acc.neighbor_points.append(rec_expand_points.copy())
                acc.neighbor_count.append(len(rec_expand_points))
                acc.add.append(rec_expand.astype(np.int32))

                iou = (np.sum(current & gt_mask)
                       / max(1, np.sum(current | gt_mask)))
                acc.complete.append(float(iou))
                steps += 1
                add_mistake_prob = max(add_mistake_prob - 0.01, 0.0)
                remove_mistake_prob = max(remove_mistake_prob - 0.01, 0.0)

            if np.array_equal(current, gt_mask):
                visited[current] = True
                acc.steps.append(steps)
                if verbose:
                    print("%s target %d: %d steps %d/%d (%.2f IOU)" % (
                        room_tag, target_id, steps, current.sum(),
                        gt_mask.sum(), iou))
                break
            if steps < max_steps and (expand_class.any() or reject_class.any()):
                current[expand_id] = True
                if len(reject_id) < len(cur_idx):
                    current[reject_id] = False
                next_min = point_voxels[current].min(axis=0)
                next_max = point_voxels[current].max(axis=0)
                if not (next_min < min_dims).any() and not (next_max > max_dims).any():
                    stuck = True
                min_dims, max_dims = next_min, next_max
            else:
                if current.sum() > cluster_threshold:
                    visited[current] = True
                    acc.steps.append(steps)
                    if verbose:
                        print("%s target %d: %d steps %d/%d (early)" % (
                            room_tag, target_id, steps, current.sum(),
                            gt_mask.sum()))
                break


def stage_rooms(rooms, obj_ids, cls_ids,
                resolution: float = 0.1,
                seed: Optional[int] = None,
                max_points: int = 1024,
                cluster_threshold: int = 10,
                verbose: bool = False) -> StagedSamples:
    """Stage a list of rooms into training samples (one area's worth)."""
    rng = np.random.RandomState(seed if seed is not None else 0)
    acc = _Accumulator()
    for room_id in range(len(rooms)):
        raw = np.asarray(rooms[room_id], dtype=np.float64)
        if seed is not None:
            raw = apply_seed_augmentation(raw, seed)
        rf = prepare_room(raw, obj_ids[room_id], cls_ids[room_id],
                          resolution=resolution, feature_size=13)
        simulate_room(rf, rng, acc, max_points=max_points,
                      cluster_threshold=cluster_threshold,
                      verbose=verbose, room_tag=f"room {room_id}")
    return acc.finalize()


def staged_output_path(data_dir: str, area: str, seed: Optional[int]) -> str:
    if area.startswith("synthetic"):
        return os.path.join(data_dir, f"staged_{area}.h5")
    if seed is None:
        return os.path.join(data_dir, f"staged_area{area}.h5")
    return os.path.join(data_dir, "multiseed", f"seed{seed}_area{area}.h5")


def area_input_path(data_dir: str, area: str, seed: Optional[int]) -> str:
    """Input room-H5 naming (``stage_data.py:27-34``)."""
    if area.startswith("synthetic") or area in ("s3dis", "scannet", "kitti_val"):
        return os.path.join(data_dir, f"{area}.h5")
    if area == "kitti_train":
        return os.path.join(data_dir, f"{area}_{seed:02d}.h5")
    return os.path.join(data_dir, f"s3dis_area{area}.h5")


def stage_area(data_dir: str, area: str, seed: Optional[int] = None,
               resolution: float = 0.1, verbose: bool = False,
               device: bool = False, samples_cap: int = 4096) -> str:
    """Full ETL for one area: read room H5, simulate, write staged H5.

    ``device=True`` runs the simulation as a jitted device program with all
    rooms in parallel lanes (``data/device_simulator.py``) instead of the
    serial host loop; same semantics, JAX PRNG draws.
    """
    rooms, obj_ids, cls_ids = load_h5_rooms(area_input_path(data_dir, area, seed))
    if device:
        from .device_simulator import stage_rooms_device
        samples = stage_rooms_device(rooms, obj_ids, cls_ids,
                                     resolution=resolution, seed=seed,
                                     verbose=verbose, samples_cap=samples_cap)
    else:
        samples = stage_rooms(rooms, obj_ids, cls_ids, resolution=resolution,
                              seed=seed, verbose=verbose)
    out = staged_output_path(data_dir, area, seed)
    save_staged_h5(out, samples)
    print(f"Staged {samples.num_samples()} samples -> {out}")
    return out
