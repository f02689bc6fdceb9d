"""Voxel-adjacency graph construction + connected components.

The reference builds python dict voxel maps and networkx graphs
(``test_mcpnet.py:121-145``, ``benchmarks.py:251-416``); here adjacency
candidates come from vectorized voxel-hash lookups and components from
``scipy.sparse.csgraph`` (union-find scale, no networkx).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import connected_components as _cc

from ..core.voxel import (NEIGHBOR_OFFSETS_27, build_voxel_hash, pack_voxels,
                          voxel_coords)


def voxel_adjacency_edges(xyz: np.ndarray, resolution: float
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """26-neighborhood adjacency among equalized points (one per voxel).

    Returns ``(src, dst)`` index arrays covering every ordered pair of
    voxel-adjacent points (both directions, like the reference's offset
    scan at ``test_mcpnet.py:126-133``).
    """
    h = build_voxel_hash(xyz, resolution)
    vox = voxel_coords(xyz, resolution)
    n = len(vox)
    # slot -> point index (equalized clouds have exactly one point per voxel)
    slot_to_point = h.member_idx[h.slot_start[:-1]]
    srcs, dsts = [], []
    for off in NEIGHBOR_OFFSETS_27:
        if (off == 0).all():
            continue
        keys, _, _ = pack_voxels(vox + off, h.origin, h.dims)
        slot = h.lookup(keys)
        hit = slot >= 0
        srcs.append(np.nonzero(hit)[0])
        dsts.append(slot_to_point[slot[hit]])
    return (np.concatenate(srcs) if srcs else np.zeros(0, np.int64),
            np.concatenate(dsts) if dsts else np.zeros(0, np.int64))


def connected_component_labels(n: int, src: np.ndarray, dst: np.ndarray,
                               min_cluster_size: int = 10) -> np.ndarray:
    """Cluster labels 1..C from an edge list; isolated points and small
    components get label 0 (the reference keeps only components above
    ``min_cluster_size``, ``test_mcpnet.py:138-146``).

    Matches networkx semantics: nodes with no edges are NOT part of any
    component (nx.Graph(edges) only contains endpoint nodes).
    """
    if len(src) == 0:
        return np.zeros(n, dtype=int)
    g = sp.coo_matrix((np.ones(len(src), np.int8), (src, dst)), shape=(n, n))
    _, comp = _cc(g, directed=False)
    has_edge = np.zeros(n, dtype=bool)
    has_edge[src] = True
    has_edge[dst] = True
    labels = np.zeros(n, dtype=int)
    cluster_id = 1
    comp_of_edges = comp[has_edge]
    uniq, counts = np.unique(comp_of_edges, return_counts=True)
    # preserve the reference's ordering: components numbered by first
    # appearance among connected nodes
    order = {}
    for i in np.nonzero(has_edge)[0]:
        c = comp[i]
        if c not in order:
            order[c] = len(order)
    size = dict(zip(uniq.tolist(), counts.tolist()))
    for c in sorted(order, key=order.get):
        if size.get(c, 0) > min_cluster_size:
            labels[(comp == c) & has_edge] = cluster_id
            cluster_id += 1
    return labels
