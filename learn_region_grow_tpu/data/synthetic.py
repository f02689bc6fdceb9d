"""Synthetic box-room generator (deterministic test/train fixture).

Samples axis-aligned box rooms — floor, ceiling, four walls, six instances —
with dimension and color statistics measured from S3DIS (constants and
behavior per reference ``tools/generate_synthetic_rooms.py:35-128``). Rooms
use the standard 8-column layout [xyz, rgb, obj_id, cls_id].
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..utils.io import save_h5_rooms

ROOM_MIN = np.array([1.0619999, 1.0630007, 2.073])
ROOM_MAX = np.array([44.094, 46.835, 7.647])
ROOM_DIMENSIONS = np.array([5.133024, 5.169554, 3.0433161])
ROOM_VARIATION = np.array([4.2353425, 5.5636344, 0.58006])
COLOR_VARIATION = np.array([0.15274304, 0.15051211, 0.15046296])


def generate_room(width: float, length: float, height: float,
                  rng: np.random.RandomState,
                  density: float = 0.05,
                  xyz_noise: float = 0.01) -> np.ndarray:
    """One box room: 6 planar instances (obj_id 1..6, cls_id 0)."""
    n_flat = max(1, int(width * length / density ** 2))
    n_back = max(1, int(width * height / density ** 2))
    n_side = max(1, int(length * height / density ** 2))

    # (n_points, free_axis_a, scale_a, free_axis_b, scale_b, fixed_axis, fixed_value)
    surfaces = [
        (n_flat, 0, width, 1, length, 2, 0.0),      # floor
        (n_flat, 0, width, 1, length, 2, height),   # ceiling
        (n_back, 0, width, 2, height, 1, 0.0),      # back wall
        (n_back, 0, width, 2, height, 1, length),   # front wall
        (n_side, 1, length, 2, height, 0, 0.0),     # left wall
        (n_side, 1, length, 2, height, 0, width),   # right wall
    ]
    parts = []
    for obj, (n, ax_a, sc_a, ax_b, sc_b, ax_f, val_f) in enumerate(surfaces, 1):
        pcd = np.zeros((n, 8))
        pcd[:, ax_a] = rng.random_sample(n) * sc_a
        pcd[:, ax_b] = rng.random_sample(n) * sc_b
        pcd[:, ax_f] = val_f
        pcd[:, :3] += rng.randn(n, 3) * xyz_noise
        mean_color = rng.random_sample(3) - 0.5
        pcd[:, 3:6] = np.clip(
            mean_color + rng.randn(n, 3) * COLOR_VARIATION * 0.5, -0.5, 0.5)
        pcd[:, 6] = obj
        parts.append(pcd)
    return np.vstack(parts)


def generate_rooms(num_rooms: int, seed: int = 0,
                   scale: float = 1.0) -> List[np.ndarray]:
    """Sample rooms from the S3DIS dimension statistics.

    ``scale`` < 1 shrinks rooms (useful for fast test fixtures while keeping
    realistic geometry).
    """
    rng = np.random.RandomState(seed)
    rooms = []
    for _ in range(num_rooms):
        wlh = ROOM_DIMENSIONS + rng.randn(3) * ROOM_VARIATION
        wlh = np.clip(wlh, ROOM_MIN, ROOM_MAX) * scale
        rooms.append(generate_room(wlh[0], wlh[1], wlh[2], rng))
    return rooms


def write_synthetic_dataset(train_path: str, test_path: str,
                            num_train: int = 20, num_test: int = 5,
                            seed: int = 0, scale: float = 1.0):
    rooms = generate_rooms(num_train + num_test, seed=seed, scale=scale)
    save_h5_rooms(train_path, rooms[:num_train])
    save_h5_rooms(test_path, rooms[num_train:])
