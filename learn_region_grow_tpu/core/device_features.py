"""TPU-resident room feature preparation (equalize + normals + features).

Device counterpart of ``core.features.prepare_room`` (which mirrors the
reference blocks ``stage_data.py:58-104`` / ``test_region_grow.py:119-175``).
The host pipeline costs ~1.2 s per 400k-point room on this box's single CPU
core (27-neighborhood moment gathering + a 110k-batch 3x3 SVD); here the
whole pipeline is one jitted program built from TPU-friendly primitives:

* voxelization keys are computed ON HOST in f64 (f32 division rounds
  boundary points into different voxels than the reference) and shipped as
  packed int32 cell ids;
* first-point-per-voxel equalization is a lexicographic (key, index)
  ``lax.sort`` (EXACT reference order semantics — ties keep scan order,
  equalized points are ordered by first occurrence);
* per-voxel moments accumulate into a DENSE flat cell grid with one
  scatter-add, in VOXEL-LOCAL coordinates (|x| <= res/2) so f32 suffers no
  cancellation (the host path needs f64 absolute coords for the same
  numbers);
* the 27-cell neighborhood reduce is three SEPARABLE axis passes of
  flat ``jnp.roll`` adds with the parallel-axis shift algebra — no gathers,
  no binary searches (a searchsorted-per-offset formulation compiled for
  20 minutes and ran 27 s on the axon backend);
* the per-cell 3x3 symmetric eigenproblem is solved in closed form
  (trigonometric eigenvalues + largest-column eigenvector) densely on the
  VPU instead of a LAPACK SVD batch.

Numerical note: normals/curvature are f32 here vs the host's f64; values
agree to ~1e-5 (a few near-degenerate covariance points reach ~1e-3 in the
normal direction — the reference SVD direction is equally ill-conditioned
there). Curvature ORDER (the seed order) can therefore differ on
near-ties between the two paths — trajectories are stochastic anyway; the
quality gate (NMI) is the equivalence criterion. Equalization indices,
voxel coords and the inverse map are bit-exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .features import RoomFeatures

I32MAX = np.int32(2 ** 31 - 1)
DENSE_MAX = 1 << 23          # flat dense cell-grid capacity (static)


def _sym_eig3_smallest(a00, a11, a22, a01, a02, a12):
    """Closed-form smallest eigenvalue + eigenvector of symmetric 3x3.

    All args (...,) f32. Returns (lmin, lsum, v (..., 3)). Degenerate
    (near-isotropic) matrices get an arbitrary stable direction — the
    reference SVD is equally arbitrary there and the consumer takes
    componentwise |v|.
    """
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    c00, c11, c22 = b00 / p, b11 / p, b22 / p
    c01, c02, c12 = a01 / p, a02 / p, a12 / p
    detb = (c00 * (c11 * c22 - c12 * c12)
            - c01 * (c01 * c22 - c12 * c02)
            + c02 * (c01 * c12 - c11 * c02))
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l1 = q + 2.0 * p * jnp.cos(phi)                       # largest
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)   # smallest
    l2 = 3.0 * q - l1 - l3

    def col(m0, m1, m2, n0, n1, n2):
        return m0 * n0 + m1 * n1 + m2 * n2

    r100, r111, r122 = a00 - l1, a11 - l1, a22 - l1
    r200, r211, r222 = a00 - l2, a11 - l2, a22 - l2
    v0 = jnp.stack([col(r100, a01, a02, r200, a01, a02),
                    col(a01, r111, a12, r200, a01, a02),
                    col(a02, a12, r122, r200, a01, a02)], axis=-1)
    v1 = jnp.stack([col(r100, a01, a02, a01, r211, a12),
                    col(a01, r111, a12, a01, r211, a12),
                    col(a02, a12, r122, a01, r211, a12)], axis=-1)
    v2 = jnp.stack([col(r100, a01, a02, a02, a12, r222),
                    col(a01, r111, a12, a02, a12, r222),
                    col(a02, a12, r122, a02, a12, r222)], axis=-1)
    n0 = jnp.sum(v0 * v0, axis=-1)
    n1 = jnp.sum(v1 * v1, axis=-1)
    n2 = jnp.sum(v2 * v2, axis=-1)
    v = jnp.where((n0 >= n1)[..., None] & (n0 >= n2)[..., None], v0,
                  jnp.where((n1 >= n2)[..., None], v1, v2))
    nbest = jnp.maximum(jnp.maximum(n0, n1), n2)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True),
                                1e-30))
    v = v / norm
    # degenerate fallbacks to SOME unit vector (host SVD is equally
    # arbitrary there): fully isotropic (p2 ~ 0) AND exactly rank-1
    # covariances (l2 == l3 -> the (A-l1)(A-l2) product vanishes and all
    # candidate columns are ~zero)
    bad = ((p2 < 1e-20) | (nbest < 1e-24))[..., None]
    v = jnp.where(bad, jnp.array([0.0, 0.0, 1.0], jnp.float32), v)
    return l3, l1 + l2 + l3, v


def _axis_pass(dense, stride, d, axis_sel):
    """One separable stencil pass: aggregate each cell's -1/0/+1 neighbors
    along one axis (flat roll by ``stride``) into the cell's own frame.

    dense (C, 10) channels [n, S1(3), S2(xx,xy,xz,yy,yz,zz)]; ``d`` the
    metric offset magnitude (resolution), ``axis_sel`` one-hot (3,) f32 for
    the axis. The grid's 2-cell empty margins make roll wrap-around hit
    empty cells only. Shift algebra (parallel axis): moving a voxel's
    moments by offset vector t: S1' = S1 + n t; S2'ab = S2ab + ta S1b +
    tb S1a + n ta tb.
    """
    def shifted(sign):
        # neighbor cell at +sign contributes to center with t = -sign*d*e?
        # points in neighbor v = c + sign*e have coords (rel + t) in c's
        # frame with t = (v - c)*res = sign*d*e.
        rolled = jnp.roll(dense, -sign * stride, axis=0)
        n = rolled[:, 0]
        s1 = rolled[:, 1:4]
        s2 = rolled[:, 4:10]
        t = sign * d * axis_sel                          # (3,)
        s1p = s1 + n[:, None] * t[None, :]
        ta, tb, tc = t[0], t[1], t[2]
        sx, sy, sz = s1[:, 0], s1[:, 1], s1[:, 2]
        s2p = jnp.stack([
            s2[:, 0] + 2 * ta * sx + n * ta * ta,
            s2[:, 1] + ta * sy + tb * sx + n * ta * tb,
            s2[:, 2] + ta * sz + tc * sx + n * ta * tc,
            s2[:, 3] + 2 * tb * sy + n * tb * tb,
            s2[:, 4] + tb * sz + tc * sy + n * tb * tc,
            s2[:, 5] + 2 * tc * sz + n * tc * tc,
        ], axis=1)
        return jnp.concatenate([n[:, None], s1p, s2p], axis=1)

    return dense + shifted(-1) + shifted(1)


@functools.partial(jax.jit, static_argnames=("dense_cap",))
def _prepare_kernel(xyz, rgb, key, origin, dims, valid, resolution,
                    dense_cap=DENSE_MAX):
    """All-device room prep. Inputs padded to (Np,): xyz/rgb (Np, 3) f32,
    key (Np,) int32 packed flat cell ids (host-computed, < dense_cap),
    origin/dims (3,) int32, valid (Np,) bool, resolution () f32;
    ``dense_cap`` the static flat-grid capacity bucket. Returns a dict of
    padded arrays (see ``prepare_room_device``)."""
    npad = xyz.shape[0]
    idx = jnp.arange(npad, dtype=jnp.int32)

    # unpack keys -> shifted voxel coords -> absolute voxel coords
    z = key % dims[2]
    rem = key // dims[2]
    y = rem % dims[1]
    x = rem // dims[1]
    big3 = jnp.int32(2 ** 20)
    vox = jnp.where(valid[:, None],
                    jnp.stack([x, y, z], axis=1) + origin[None, :], big3)

    # --- equalization: lexicographic (key, index) sort -------------------
    sk, order = jax.lax.sort((key, idx), dimension=0, num_keys=2)
    vsorted = valid[order]
    is_new = jnp.concatenate([vsorted[:1],
                              (sk[1:] != sk[:-1]) & vsorted[1:]])
    sid = jnp.cumsum(is_new.astype(jnp.int32)) - 1   # compact voxel id
    dump = npad - 1
    sid = jnp.where(vsorted, sid, dump)
    m_count = jnp.sum(is_new.astype(jnp.int32))

    first_idx = jax.ops.segment_min(jnp.where(vsorted, order, I32MAX), sid,
                                    num_segments=npad)
    ucell = jax.ops.segment_min(jnp.where(vsorted, sk, I32MAX), sid,
                                num_segments=npad)
    uvox = jax.ops.segment_min(jnp.where(vsorted[:, None], vox[order], big3),
                               sid, num_segments=npad)

    # reference equalized order = ascending first occurrence
    eq_order = jnp.argsort(first_idx)
    equalized_idx = first_idx[eq_order]              # (Np,) pads I32MAX
    eqvox = uvox[eq_order]
    eqcell = ucell[eq_order]
    eq_valid = equalized_idx < I32MAX

    # raw point -> equalized position (inverse map); all permutations are
    # inverted with argsort (no arbitrary scatters)
    inv_eq = jnp.argsort(eq_order).astype(jnp.int32)
    inv_order = jnp.argsort(order).astype(jnp.int32)
    unequalized_idx = inv_eq[sid[inv_order]]

    # --- dense moment grid + separable 27-neighborhood stencil -----------
    voxcenter = vox.astype(jnp.float32) * resolution
    rel = jnp.where(valid[:, None], xyz - voxcenter, 0.0)
    ones = valid.astype(jnp.float32)
    data = jnp.concatenate([
        ones[:, None], rel,
        rel[:, 0:1] * rel, rel[:, 1:2] * rel[:, 1:3],
        rel[:, 2:3] * rel[:, 2:3],
    ], axis=1)                                       # (Np, 10)
    cell = jnp.where(valid, key, dense_cap)
    dense = jnp.zeros((dense_cap + 8, 10), jnp.float32).at[cell].add(data)

    e0 = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    e1 = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    e2 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    dense = _axis_pass(dense, dims[1] * dims[2], resolution, e0)
    dense = _axis_pass(dense, dims[2], resolution, e1)
    dense = _axis_pass(dense, jnp.int32(1), resolution, e2)

    # --- dense covariance + closed-form eigen -----------------------------
    n_cell = dense[:, 0]
    inv = 1.0 / jnp.maximum(n_cell, 1.0)
    mean = dense[:, 1:4] * inv[:, None]
    c00 = dense[:, 4] * inv - mean[:, 0] * mean[:, 0]
    c01 = dense[:, 5] * inv - mean[:, 0] * mean[:, 1]
    c02 = dense[:, 6] * inv - mean[:, 0] * mean[:, 2]
    c11 = dense[:, 7] * inv - mean[:, 1] * mean[:, 1]
    c12 = dense[:, 8] * inv - mean[:, 1] * mean[:, 2]
    c22 = dense[:, 9] * inv - mean[:, 2] * mean[:, 2]
    lmin, lsum, v = _sym_eig3_smallest(c00, c11, c22, c01, c02, c12)
    dense_nc = jnp.concatenate(
        [jnp.abs(v),
         jnp.where(lsum > 0, jnp.abs(lmin) / jnp.maximum(lsum, 1e-30),
                   0.0)[:, None]], axis=1)           # (C, 4)

    # --- per-equalized-point outputs --------------------------------------
    safe_cell = jnp.where(eq_valid, eqcell, dense_cap)
    nc = dense_nc[safe_cell]                          # (Np, 4)
    normals = jnp.where(eq_valid[:, None], nc[:, :3], 0.0)
    curv = jnp.where(eq_valid, nc[:, 3], 0.0)
    cmax = jnp.max(curv)
    curv = jnp.where(cmax > 0, curv / cmax, curv)

    safe_eq = jnp.minimum(equalized_idx, npad - 1)
    eq_xyz = xyz[safe_eq]
    eq_rgb = rgb[safe_eq]
    span_lo = jnp.min(jnp.where(eq_valid[:, None], eq_xyz, jnp.inf), axis=0)
    span_hi = jnp.max(jnp.where(eq_valid[:, None], eq_xyz, -jnp.inf), axis=0)
    span = jnp.where(span_hi > span_lo, span_hi - span_lo, 1.0)
    room = (eq_xyz - span_lo) / span

    feats = jnp.concatenate(
        [eq_xyz, room, eq_rgb, normals, curv[:, None]], axis=1)  # (Np, 13)
    return {
        "feats": feats, "eqvox": eqvox, "equalized_idx": equalized_idx,
        "unequalized_idx": unequalized_idx, "curv": curv,
        "m_count": m_count, "eq_valid": eq_valid,
    }


def prepare_room_device(raw_points, obj_id, cls_id, resolution: float = 0.1,
                        feature_size: int = 13,
                        min_bucket: int = 4096) -> RoomFeatures:
    """Drop-in ``prepare_room`` running the whole pipeline on device.

    Pads the raw cloud to a power-of-2 bucket (one compile per bucket),
    returns the standard host ``RoomFeatures``. Equalization/voxels/inverse
    map are bit-identical to the host path; normals/curvature agree to f32
    tolerance (see module docstring). Falls back to the host path for
    scenes whose padded voxel grid exceeds ``DENSE_MAX`` cells (~2 km^2 of
    indoor scene at 0.1 m).
    """
    from .voxel import pack_voxels, voxel_coords

    raw_points = np.asarray(raw_points)
    n = len(raw_points)
    # voxelize with the SHARED host rule (voxel_coords rounds in the input
    # dtype — f32 clouds round boundary points differently than f64, and
    # the host/device equalized SETS must match bit-exactly)
    vox_h = (voxel_coords(raw_points[:n], resolution) if n
             else np.zeros((0, 3), np.int64))
    keys64, origin, dims = pack_voxels(vox_h) if n else (
        np.zeros(0, np.int64), np.zeros(3, np.int64), np.full(3, 3, np.int64))
    if float(np.prod(dims)) >= DENSE_MAX:
        from .features import prepare_room
        return prepare_room(raw_points, obj_id, cls_id,
                            resolution=resolution, feature_size=feature_size)
    npad = max(min_bucket, 1 << max(0, (n - 1)).bit_length())

    xyz = np.zeros((npad, 3), np.float32)
    rgb = np.zeros((npad, 3), np.float32)
    xyz[:n] = raw_points[:, :3]
    if raw_points.shape[1] >= 6:
        rgb[:n] = raw_points[:, 3:6]
    valid = np.zeros(npad, bool)
    valid[:n] = True
    keys = np.full(npad, I32MAX, np.int32)
    keys[:n] = keys64.astype(np.int32)

    dense_cap = max(1 << 20, 1 << int(np.prod(dims) + 8).bit_length())
    out = _prepare_kernel(jnp.asarray(xyz), jnp.asarray(rgb),
                          jnp.asarray(keys),
                          jnp.asarray(origin.astype(np.int32)),
                          jnp.asarray(dims.astype(np.int32)),
                          jnp.asarray(valid), jnp.float32(resolution),
                          dense_cap=dense_cap)
    out = jax.device_get(out)
    m = int(out["m_count"])
    eq_idx = out["equalized_idx"][:m].astype(np.int64)
    feats13 = out["feats"][:m].astype(np.float32)
    if feature_size not in (6, 9, 12, 13):
        raise ValueError(f"unsupported feature_size {feature_size}")
    feats = feats13[:, :feature_size]
    return RoomFeatures(
        points=feats,
        voxels=out["eqvox"][:m].astype(np.int64),
        obj_id=np.asarray(obj_id)[eq_idx].astype(np.int64),
        cls_id=np.asarray(cls_id)[eq_idx].astype(np.int64),
        curvatures=out["curv"][:m].astype(np.float64),
        equalized_idx=eq_idx,
        unequalized_idx=out["unequalized_idx"][:n].astype(np.int64),
    )
