"""Voxel-grid primitives (host tier, vectorized NumPy).

The reference builds voxel grids with per-point Python dict loops
(``stage_data.py:59-73``, ``test_region_grow.py:119-133``). Here the grid is a
sorted-key table built with vectorized NumPy: voxel coordinates are packed
into a single int64 key so membership / first-occurrence / neighbor lookups
become ``searchsorted`` calls. Semantics match the reference exactly,
including the "first point in scan order wins" equalization rule.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np


def voxel_coords(xyz: np.ndarray, resolution: float) -> np.ndarray:
    """Integer voxel coordinates: ``round(xyz / resolution)`` (banker's
    rounding via np.round, matching the reference)."""
    return np.round(np.asarray(xyz)[:, :3] / resolution).astype(np.int64)


def pack_voxels(vox: np.ndarray, origin: np.ndarray | None = None,
                dims: np.ndarray | None = None):
    """Pack (N,3) integer voxel coords into scalar int64 keys.

    Returns ``(keys, origin, dims)``. ``dims`` is padded by 2 on both sides of
    every axis so that +-1 neighbor offsets of any in-range voxel still pack
    into unique, in-range keys.
    """
    vox = np.asarray(vox, dtype=np.int64)
    if origin is None:
        origin = vox.min(axis=0) - 2
    if dims is None:
        dims = vox.max(axis=0) - origin + 3
    shifted = vox - origin
    keys = (shifted[:, 0] * dims[1] + shifted[:, 1]) * dims[2] + shifted[:, 2]
    return keys, origin, dims


class VoxelHash(NamedTuple):
    """Sorted unique voxel keys with prefix offsets of their member points.

    ``member_idx[slot_start[j]:slot_start[j+1]]`` are the indices (in scan
    order) of all input points falling in unique voxel ``j``.
    """

    sorted_keys: np.ndarray   # (M,) int64, ascending
    slot_start: np.ndarray    # (M+1,) int64
    member_idx: np.ndarray    # (N,) int64
    origin: np.ndarray        # (3,) int64
    dims: np.ndarray          # (3,) int64

    def lookup(self, keys: np.ndarray) -> np.ndarray:
        """Map packed keys -> unique-voxel slot, or -1 if absent."""
        pos = np.searchsorted(self.sorted_keys, keys)
        pos = np.minimum(pos, len(self.sorted_keys) - 1)
        hit = self.sorted_keys[pos] == keys
        return np.where(hit, pos, -1)


def build_voxel_hash(xyz: np.ndarray, resolution: float) -> VoxelHash:
    vox = voxel_coords(xyz, resolution)
    keys, origin, dims = pack_voxels(vox)
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    # boundaries of equal-key runs
    is_new = np.empty(len(sk), dtype=bool)
    if len(sk):
        is_new[0] = True
        is_new[1:] = sk[1:] != sk[:-1]
    starts = np.nonzero(is_new)[0]
    slot_start = np.concatenate([starts, [len(sk)]]).astype(np.int64)
    return VoxelHash(sk[starts], slot_start, order.astype(np.int64),
                     origin, dims)


def equalize_resolution(xyz: np.ndarray, resolution: float
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Voxel-grid downsample keeping the FIRST point (scan order) per voxel.

    Returns ``(equalized_idx, unequalized_idx)``:
    * ``equalized_idx`` — indices of kept points, in original scan order;
    * ``unequalized_idx`` — for every input point, the position of its
      voxel's representative within ``equalized_idx`` (the inverse map used
      to upsample results back to the full cloud,
      reference ``test_region_grow.py:122-134``).
    """
    vox = voxel_coords(xyz, resolution)
    keys, _, _ = pack_voxels(vox)
    # first occurrence of each unique key, preserving scan order
    uniq, first_idx, inverse = np.unique(keys, return_index=True,
                                         return_inverse=True)
    order = np.argsort(first_idx, kind="stable")
    equalized_idx = first_idx[order]
    # rank[k] = position of unique-key k's representative in equalized_idx
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq))
    unequalized_idx = rank[inverse]
    return equalized_idx.astype(np.int64), unequalized_idx.astype(np.int64)


# 27-neighborhood offsets in the same (x, y, z) product order the reference
# iterates (itertools.product([-1,0,1]^3)).
NEIGHBOR_OFFSETS_27 = np.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=np.int64,
)
