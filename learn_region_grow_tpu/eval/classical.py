"""Classical segmentation baselines (vectorized).

Reproduces the edge-construction modes of the reference ``benchmarks.py``
(``:251-416``) without per-point Python dict loops: adjacency candidates
come from the voxel hash, per-mode gates are vectorized, components from
scipy. Modes:

* ``normal``     normal dot > threshold (0.99)
* ``curvature``  |curvature diff| < threshold (0.01, RAW curvature)
* ``color``      squared rgb distance < threshold (0.005)
* ``feature``    normal & curvature & color combined (0.98 / 0.1 / 0.1)
* ``fpfh``       normalized-FPFH dot > threshold (0.985; native FPFH-33
                 descriptors from ``eval/fpfh.py``)
* ``edge``       SVM over pairwise features + non-max suppression
* ``smoothness`` Rabbani-style stack-based region growing by normal dot with
                 low-curvature seeds (0.98 indoor / 0.985 scannet)
* ``pointnet``/``pointnet2``  semantic class equality after grid-block
                 inference (driver supplies per-point class labels)

Default thresholds per ``benchmarks.py:127-144``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from .components import connected_component_labels, voxel_adjacency_edges

DEFAULT_THRESHOLDS: Dict[str, float] = {
    "normal": 0.99, "curvature": 0.01, "color": 0.005, "fpfh": 0.985,
    "feature": 0.98, "smoothness": 0.98, "pointnet": 0.99, "pointnet2": 0.99,
}
FEATURE_THRESHOLD2 = 0.1
FEATURE_THRESHOLD3 = 0.1
MIN_CLUSTER_SIZE = 10


def gate_edges(mode: str, src, dst, points, normals=None, curvatures=None,
               class_labels=None, fpfh=None, threshold: float = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Apply the per-mode similarity gate to candidate adjacency edges."""
    thr = DEFAULT_THRESHOLDS[mode] if threshold is None else threshold
    if mode == "normal":
        keep = np.sum(normals[src] * normals[dst], axis=1) > thr
    elif mode == "curvature":
        keep = np.abs(curvatures[src] - curvatures[dst]) < thr
    elif mode == "color":
        keep = np.sum((points[src, 3:6] - points[dst, 3:6]) ** 2, axis=1) < thr
    elif mode == "feature":
        keep = ((np.sum(normals[src] * normals[dst], axis=1) > thr)
                & (np.abs(curvatures[src] - curvatures[dst])
                   < FEATURE_THRESHOLD2)
                & (np.sum((points[src, 3:6] - points[dst, 3:6]) ** 2, axis=1)
                   < FEATURE_THRESHOLD3))
    elif mode == "fpfh":
        keep = np.sum(fpfh[src] * fpfh[dst], axis=1) > thr
    elif mode in ("pointnet", "pointnet2"):
        keep = class_labels[src] == class_labels[dst]
    else:
        raise ValueError(f"no edge gate for mode {mode}")
    return src[keep], dst[keep]


def _adjacency_lists(n: int, src: np.ndarray, dst: np.ndarray):
    """CSR-style neighbor lists from directed candidate edges."""
    order = np.argsort(src, kind="stable")
    s = src[order]
    d = dst[order]
    starts = np.searchsorted(s, np.arange(n + 1))
    return starts, d


def smoothness_region_growing(points: np.ndarray, normals: np.ndarray,
                              curvatures: np.ndarray, resolution: float,
                              threshold: float,
                              min_cluster_size: int = MIN_CLUSTER_SIZE
                              ) -> np.ndarray:
    """Rabbani et al. smoothness-constrained growing
    (``benchmarks.py:380-404``): seeds in ascending curvature order, a stack
    expands over voxel-adjacent points whose normal agrees with the *current*
    point (not the seed)."""
    n = len(points)
    src, dst = voxel_adjacency_edges(points[:, :3], resolution)
    starts, neigh = _adjacency_lists(n, src, dst)
    visited = np.zeros(n, dtype=bool)
    cluster_label = np.zeros(n, dtype=int)
    cluster_id = 1
    for seed in np.argsort(curvatures, kind="stable"):
        if visited[seed]:
            continue
        stack = [int(seed)]
        members = []
        while stack:
            i = stack.pop()
            members.append(i)
            visited[i] = True
            nb = neigh[starts[i]:starts[i + 1]]
            nb = nb[~visited[nb]]
            if len(nb):
                ok = nb[np.sum(normals[nb] * normals[i], axis=1) > threshold]
                stack.extend(int(x) for x in ok)
        members = np.unique(members)
        if len(members) > min_cluster_size:
            cluster_label[members] = cluster_id
            cluster_id += 1
    return cluster_label


def edge_svm_features(E: np.ndarray, points: np.ndarray,
                      neighbor_min: np.ndarray, neighbor_max: np.ndarray
                      ) -> np.ndarray:
    """Pairwise edge features for the SVM mode (``benchmarks.py:308-330``)."""
    p1 = points[E[:, 0], :6]
    p2 = points[E[:, 1], :6]
    return np.hstack((
        0.5 * (p1[:, 2:] + p2[:, 2:]),
        np.minimum(p1[:, 2:], p2[:, 2:]),
        np.maximum(p1[:, 2:], p2[:, 2:]),
        np.abs(p1 - p2),
        np.maximum(np.abs(p1 - neighbor_min[E[:, 1]]),
                   np.abs(p2 - neighbor_min[E[:, 0]])),
        np.maximum(np.abs(p1 - neighbor_max[E[:, 1]]),
                   np.abs(p2 - neighbor_max[E[:, 0]])),
    ))


def neighborhood_stats(n: int, E: np.ndarray, points: np.ndarray):
    """Per-point min/max over {self} + adjacent points
    (``benchmarks.py:331-337``)."""
    nmin = points[:, :6].copy()
    nmax = points[:, :6].copy()
    for a, b in ((E[:, 0], E[:, 1]), (E[:, 1], E[:, 0])):
        np.minimum.at(nmin, a, points[b, :6])
        np.maximum.at(nmax, a, points[b, :6])
    return nmin, nmax


def edge_svm_segment(points: np.ndarray, resolution: float, svc,
                     min_cluster_size: int = MIN_CLUSTER_SIZE
                     ) -> np.ndarray:
    """SVM-gated edges with non-max suppression + BFS label fill
    (``benchmarks.py:308-353,420-436``)."""
    n = len(points)
    src, dst = voxel_adjacency_edges(points[:, :3], resolution)
    E = np.stack([src, dst], axis=1)
    nmin, nmax = neighborhood_stats(n, E, points)
    F = edge_svm_features(E, points, nmin, nmax)
    probs = svc.predict_proba(F)[:, 1]

    # per-point max prob over incident edges (floor 0 like the reference's
    # seeded [0] lists)
    pmax = np.zeros(n)
    np.maximum.at(pmax, E[:, 0], probs)
    np.maximum.at(pmax, E[:, 1], probs)
    keep = ((probs > 0.99 * pmax[E[:, 0]]) & (probs > 0.99 * pmax[E[:, 1]])
            & (probs > 0.9))
    labels = connected_component_labels(n, E[keep, 0], E[keep, 1],
                                        min_cluster_size)

    # BFS through best-prob neighbors to fill unlabeled points
    starts, neigh = _adjacency_lists(
        n, np.concatenate([E[:, 0], E[:, 1]]),
        np.concatenate([E[:, 1], E[:, 0]]))
    eprob = np.concatenate([probs, probs])
    order = np.argsort(eprob, kind="stable")
    for i in np.nonzero(labels == 0)[0]:
        visited = set()
        stack = [int(i)]
        while stack:
            q = stack.pop()
            if q in visited:
                continue
            if labels[q] > 0:
                labels[i] = labels[q]
                break
            visited.add(q)
            nb = neigh[starts[q]:starts[q + 1]]
            pr = eprob[starts[q]:starts[q + 1]]
            stack.extend(int(x) for x in nb[np.argsort(pr, kind="stable")])
    return labels


def classical_segment(mode: str, points: np.ndarray, resolution: float,
                      normals=None, curvatures=None, class_labels=None,
                      fpfh=None, threshold: Optional[float] = None,
                      min_cluster_size: int = MIN_CLUSTER_SIZE) -> np.ndarray:
    """Full clustering for the similarity-gated modes."""
    if mode == "smoothness":
        thr = DEFAULT_THRESHOLDS[mode] if threshold is None else threshold
        return smoothness_region_growing(points, normals, curvatures,
                                         resolution, thr, min_cluster_size)
    src, dst = voxel_adjacency_edges(points[:, :3], resolution)
    src, dst = gate_edges(mode, src, dst, points, normals, curvatures,
                          class_labels, fpfh, threshold)
    return connected_component_labels(len(points), src, dst,
                                      min_cluster_size)
