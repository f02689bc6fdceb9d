"""MCPNet data staging: per-point neighbor sets + local training chunks.

Parity with ``train_mcpnet.py:70-150`` / ``test_mcpnet.py:61-107``:
rooms are recentered (xy by bbox center, z by min), equalized at 0.1, then
every point gets ``num_neighbors`` relative neighbors sampled from a 0.3m
coarse grid's 27-neighborhood (with replacement when short). Training chunks
pick 2m-local sets of ``2 * batch_size`` points until the room is used up.

The reference's coarse grid only indexes the FIRST point per fine voxel
(``coarse_map`` built inside the equalization pass) — preserved here.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..core.voxel import (NEIGHBOR_OFFSETS_27, build_voxel_hash, pack_voxels,
                          voxel_coords)
from ..core.voxel import equalize_resolution


def recenter_room(points: np.ndarray) -> np.ndarray:
    """xy -> bbox-center origin, z -> floor at 0 (``train_mcpnet.py:84-86``)."""
    out = np.asarray(points, dtype=np.float64).copy()
    centroid = 0.5 * (out[:, :2].min(axis=0) + out[:, :2].max(axis=0))
    out[:, :2] -= centroid
    out[:, 2] -= out[:, 2].min()
    return out


def neighbor_sets(points: np.ndarray, num_neighbors: int = 50,
                  neighbor_radii: float = 0.3,
                  rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """(N, 6) equalized points -> (N, num_neighbors, 6) relative neighbors."""
    rng = rng or np.random.RandomState(0)
    n = len(points)
    h = build_voxel_hash(points[:, :3], neighbor_radii)
    vox = voxel_coords(points[:, :3], neighbor_radii)
    out = np.zeros((n, num_neighbors, 6), dtype=np.float64)

    from ..native import HAVE_NATIVE, neighbor_gather
    if HAVE_NATIVE and n:
        probes = np.empty((n, 27), np.int64)
        for oi, off in enumerate(NEIGHBOR_OFFSETS_27):
            probes[:, oi], _, _ = pack_voxels(vox + off, h.origin, h.dims)
        sel = neighbor_gather(np.ascontiguousarray(h.sorted_keys),
                              np.ascontiguousarray(h.slot_start),
                              np.ascontiguousarray(h.member_idx),
                              np.ascontiguousarray(probes),
                              num_neighbors, int(rng.randint(1, 2 ** 31)))
        out[:] = points[sel, :6] - points[:, None, :6]
        return out

    # NumPy fallback: candidate neighbor ids per point from the 27 voxels
    slot_members = [h.member_idx[h.slot_start[j]:h.slot_start[j + 1]]
                    for j in range(len(h.sorted_keys))]
    slots = np.full((n, 27), -1, np.int64)
    for oi, off in enumerate(NEIGHBOR_OFFSETS_27):
        keys, _, _ = pack_voxels(vox + off, h.origin, h.dims)
        slots[:, oi] = h.lookup(keys)
    for i in range(n):
        cand: List[np.ndarray] = [slot_members[s] for s in slots[i] if s >= 0]
        cand_arr = np.concatenate(cand)
        sel = rng.choice(cand_arr, num_neighbors,
                         replace=len(cand_arr) < num_neighbors)
        out[i] = points[sel, :6] - points[i, :6]
    return out


def stage_room_mcp(raw_points: np.ndarray,
                   obj_id: np.ndarray,
                   resolution: float = 0.1,
                   num_neighbors: int = 50,
                   neighbor_radii: float = 0.3,
                   rng: Optional[np.random.RandomState] = None):
    """Returns (points (N,6), obj_id (N,), neighbor_array (N,K,6),
    unequalized_idx) for one recentered, equalized room."""
    rng = rng or np.random.RandomState(0)
    pts = recenter_room(raw_points)
    eq_idx, uneq_idx = equalize_resolution(pts[:, :3], resolution)
    pts = pts[eq_idx]
    obj = np.asarray(obj_id)[eq_idx]
    nbr = neighbor_sets(pts, num_neighbors, neighbor_radii, rng)
    return pts, obj, nbr, uneq_idx


def local_chunks(points: np.ndarray, obj_id: np.ndarray,
                 neighbor_array: np.ndarray, chunk_size: int,
                 local_range: float = 2.0,
                 rng: Optional[np.random.RandomState] = None
                 ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """2m-local training chunks of ``chunk_size`` points
    (``train_mcpnet.py:119-141``)."""
    rng = rng or np.random.RandomState(0)
    n = len(points)
    available = np.ones(n, dtype=bool)
    chunks = []
    for i in range(n):
        if not available[i]:
            continue
        center = points[i, :2]
        tmp_range = local_range
        while True:
            mask = np.sum((points[:, :2] - center) ** 2, axis=1) \
                < tmp_range * tmp_range
            mask &= available
            cand = np.nonzero(mask)[0]
            if len(cand) >= chunk_size:
                break
            tmp_range *= 1.5
        sel = rng.choice(cand, chunk_size, replace=False)
        chunks.append((points[sel, 2:6], neighbor_array[sel], obj_id[sel]))
        available[sel] = False
        if available.sum() < chunk_size:
            break
    return chunks


def even_sampling(labels: np.ndarray, batch_size: int,
                  samples_per_instance: int,
                  rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Per-instance even batch sampling (``train_mcpnet.py:53-68``)."""
    rng = rng or np.random.RandomState(0)
    pool = {i: set(np.nonzero(labels == i)[0]) for i in set(labels.tolist())}
    idx: List[int] = []
    while pool and len(idx) < batch_size:
        keys = list(pool.keys())
        c = keys[rng.randint(len(keys))]
        if len(pool[c]) > samples_per_instance:
            inliers = set(rng.choice(list(pool[c]), samples_per_instance,
                                     replace=False).tolist())
            idx.extend(inliers)
            pool[c] -= inliers
        else:
            idx.extend(pool[c])
            del pool[c]
    return np.array(idx[:batch_size], dtype=np.int64)
