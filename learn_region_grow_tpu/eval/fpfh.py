"""Native FPFH-33 point descriptors (Rusu et al., ICRA 2009).

The reference's ``fpfh`` benchmark mode shells out to external PCL binaries
(``benchmarks.py:354-367`` — ``pcl_fpfh_estimation`` +
``pcl_convert_pcd_ascii_binary``) and therefore only works where PCL is
installed. This module computes the same 33-bin descriptor natively
(vectorized NumPy + cKDTree radius search) so the mode is self-contained.

Conventions follow PCL's ``FPFHEstimation``:

* pair features use the Darboux frame with the source point chosen so its
  normal has the SMALLER angle to the connecting line (``computePairFeatures``):
  ``u = n_src``, ``v = (d x u)/|d x u|``, ``w = u x v``, then
  ``alpha = v . n_tgt`` in [-1, 1], ``phi = u . d/|d|`` in [-1, 1],
  ``theta = atan2(w . n_tgt, u . n_tgt)`` in [-pi, pi];
* 11 bins per feature, descriptor layout ``[alpha | phi | theta]``, each
  section normalized to sum 100;
* ``FPFH(p) = SPFH(p) + (1/k) sum_q SPFH(q)/omega(q)`` with
  ``omega = squared distance`` (PCL's weighting of the radius-search dists).

One deviation, by design: PCL's CLI estimates normals internally from the
same radius search, while this framework already owns per-point normals from
the reference's 27-voxel covariance rule (``core/normals.py``,
``test_region_grow.py:141-163``) — those are used directly, keeping the
whole benchmark suite on a single normal definition.
"""

from __future__ import annotations

import numpy as np

NR_BINS = 11
FPFH_SIZE = 3 * NR_BINS


def pair_features(p_src, n_src, p_dst, n_dst):
    """Darboux-frame features per point pair (vectorized).

    Returns ``(alpha, phi, theta, ok)``; ``ok`` flags non-degenerate pairs
    (distinct points, connecting line not parallel to the source normal).
    The source/target swap rule makes the result independent of argument
    order, so a pair computed once serves both endpoints' SPFH.
    """
    p_src = np.asarray(p_src, np.float64)
    p_dst = np.asarray(p_dst, np.float64)
    n_src = np.asarray(n_src, np.float64)
    n_dst = np.asarray(n_dst, np.float64)
    d = p_dst - p_src
    dist = np.linalg.norm(d, axis=1)
    ok = dist > 0
    dn = d / np.maximum(dist, 1e-300)[:, None]
    # swap when the destination normal is better aligned with the line
    # (PCL: swap if acos|n1.d| > acos|n2.d|, i.e. |n1.d| < |n2.d|)
    swap = np.abs(np.sum(n_src * dn, axis=1)) < np.abs(
        np.sum(n_dst * dn, axis=1))
    u = np.where(swap[:, None], n_dst, n_src)
    nt = np.where(swap[:, None], n_src, n_dst)
    dn = np.where(swap[:, None], -dn, dn)
    phi = np.sum(u * dn, axis=1)
    v = np.cross(dn, u)
    vn = np.linalg.norm(v, axis=1)
    ok &= vn > 1e-12
    v = v / np.maximum(vn, 1e-300)[:, None]
    w = np.cross(u, v)
    alpha = np.sum(v * nt, axis=1)
    theta = np.arctan2(np.sum(w * nt, axis=1), np.sum(u * nt, axis=1))
    return alpha, phi, theta, ok


def _bin(values: np.ndarray, lo: float, hi: float) -> np.ndarray:
    idx = np.floor(NR_BINS * (values - lo) / (hi - lo)).astype(np.int64)
    return np.clip(idx, 0, NR_BINS - 1)


def compute_fpfh_native(xyz: np.ndarray, normals: np.ndarray,
                        radius: float) -> np.ndarray:
    """(n, 33) float64 FPFH descriptors; rows of all-zero for isolated
    points. Sections are normalized to sum 100 like PCL's (callers gating
    on descriptor similarity should L2-normalize)."""
    from scipy.spatial import cKDTree

    xyz = np.asarray(xyz, np.float64)
    n = len(xyz)
    if n == 0:
        return np.zeros((0, FPFH_SIZE))
    tree = cKDTree(xyz)
    pairs = tree.query_pairs(radius, output_type="ndarray")
    if len(pairs) == 0:
        return np.zeros((n, FPFH_SIZE))
    i, j = pairs[:, 0], pairs[:, 1]
    alpha, phi, theta, ok = pair_features(xyz[i], normals[i],
                                          xyz[j], normals[j])
    i, j = i[ok], j[ok]
    cols = np.stack([
        _bin(alpha[ok], -1.0, 1.0),
        NR_BINS + _bin(phi[ok], -1.0, 1.0),
        2 * NR_BINS + _bin(theta[ok], -np.pi, np.pi),
    ], axis=1)

    # SPFH: each pair feeds BOTH endpoints' histograms (the swap rule makes
    # the feature value direction-independent)
    spfh = np.zeros((n, FPFH_SIZE))
    rows = np.concatenate([i, j])
    both_cols = np.concatenate([cols, cols], axis=0)
    np.add.at(spfh, (rows[:, None], both_cols), 1.0)
    counts = np.bincount(rows, minlength=n).astype(np.float64)
    nz = counts > 0
    spfh[nz] *= (100.0 / counts[nz])[:, None]  # per-section sum = 100

    # FPFH: add the (1/omega)-weighted neighbor SPFH mean, omega = d^2
    d2 = np.sum((xyz[i] - xyz[j]) ** 2, axis=1)
    wgt = 1.0 / np.maximum(d2, 1e-300)
    acc = np.zeros((n, FPFH_SIZE))
    np.add.at(acc, i, spfh[j] * wgt[:, None])
    np.add.at(acc, j, spfh[i] * wgt[:, None])
    fpfh = spfh.copy()
    fpfh[nz] += acc[nz] / counts[nz, None]

    # renormalize each 11-bin section to sum 100 (PCL output convention)
    for s in range(3):
        sec = fpfh[:, s * NR_BINS:(s + 1) * NR_BINS]
        tot = sec.sum(axis=1, keepdims=True)
        sec /= np.where(tot == 0, 1.0, tot / 100.0)
    return fpfh
