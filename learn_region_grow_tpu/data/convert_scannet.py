"""ScanNet -> JSIS3D block-format converter
(reference ``tools/convert_scannet.py``): re-blocks ``scannet.h5`` rooms
into JSIS3D's (B, 4096, 14) sliding-window format, one H5 per room with
``coords/points/labels`` datasets."""

from __future__ import annotations

import os
from typing import Optional

import h5py
import numpy as np

from ..utils.io import load_h5_rooms


def sample_cloud(cloud: np.ndarray, num_samples: int,
                 rng: np.random.RandomState) -> np.ndarray:
    n = len(cloud)
    if n >= num_samples:
        idx = rng.choice(n, num_samples, replace=False)
    else:
        idx = np.concatenate([np.arange(n),
                              rng.choice(n, num_samples - n, replace=True)])
    return cloud[idx]


def room_to_blocks(cloud: np.ndarray, num_points: int = 4096,
                   size: float = 1.0, stride: float = 0.5,
                   threshold: int = 100,
                   rng: Optional[np.random.RandomState] = None
                   ) -> Optional[np.ndarray]:
    """One (N, 8) room -> (B, num_points, 14) JSIS3D batch."""
    rng = rng or np.random.RandomState(0)
    cloud = np.asarray(cloud, np.float64).copy()
    origin = cloud[:, :3].min(axis=0)
    cloud[:, :3] -= origin
    cloud[:, 3:6] += 0.5
    # [obj, cls] -> [sem(=old obj), ins(=0)] column shuffle per reference
    cloud[:, 7] = cloud[:, 6]
    cloud[:, 6] = 0

    limit = cloud[:, :3].max(axis=0)
    width = int(np.ceil((limit[0] - size) / stride)) + 1
    depth = int(np.ceil((limit[1] - size) / stride)) + 1
    blocks = []
    for x in range(width):
        for y in range(depth):
            x0, y0 = x * stride, y * stride
            cond = ((cloud[:, 0] >= x0) & (cloud[:, 0] <= x0 + size)
                    & (cloud[:, 1] >= y0) & (cloud[:, 1] <= y0 + size))
            if cond.sum() < threshold:
                continue
            blocks.append(sample_cloud(cloud[cond], num_points, rng))
    if not blocks:
        return None
    blocks = np.stack(blocks)
    b = len(blocks)
    batch = np.zeros((b, num_points, 14))
    for i in range(b):
        minx = blocks[i, :, 0].min()
        miny = blocks[i, :, 1].min()
        batch[i, :, 3] = blocks[i, :, 0] - (minx + size * 0.5)
        batch[i, :, 4] = blocks[i, :, 1] - (miny + size * 0.5)
        batch[i, :, 9] = blocks[i, :, 0] / limit[0]
        batch[i, :, 10] = blocks[i, :, 1] / limit[1]
        batch[i, :, 11] = blocks[i, :, 2] / limit[2]
    batch[:, :, 0:3] = blocks[:, :, 0:3]
    batch[:, :, 5:9] = blocks[:, :, 2:6]
    batch[:, :, 12:] = blocks[:, :, 6:8]
    return batch


def convert_scannet(scannet_h5: str, out_dir: str, num_points: int = 4096):
    rooms, objs, clss = load_h5_rooms(scannet_h5)
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for rid in range(len(rooms)):
        cloud = np.hstack([np.asarray(rooms[rid]),
                           objs[rid][:, None], clss[rid][:, None]])
        batch = room_to_blocks(cloud, num_points=num_points, rng=rng)
        if batch is None:
            continue
        out = os.path.join(out_dir, f"ScanNet_room_{rid}.h5")
        with h5py.File(out, "w") as fp:
            fp.create_dataset("coords", data=batch[:, :, 0:3],
                              compression="gzip", dtype="float32")
            fp.create_dataset("points", data=batch[:, :, 3:12],
                              compression="gzip", dtype="float32")
            fp.create_dataset("labels", data=batch[:, :, 12:14],
                              compression="gzip", dtype="int64")
        print(rid, cloud.shape, batch.shape)
