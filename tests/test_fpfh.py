"""Native FPFH-33 (eval/fpfh.py): PCL-convention properties + the fpfh
benchmark mode end to end (reference ``benchmarks.py:354-367`` shells out
to PCL; the native path must make the mode self-contained)."""

import numpy as np
import pytest

from learn_region_grow_tpu.eval.fpfh import (FPFH_SIZE, NR_BINS,
                                             compute_fpfh_native,
                                             pair_features)


def _rot(rng):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _plane_cloud(rng, n=400):
    xyz = np.zeros((n, 3))
    xyz[:, :2] = rng.rand(n, 2)
    normals = np.tile([0.0, 0.0, 1.0], (n, 1))
    return xyz, normals


def test_pair_features_direction_independent():
    """The source-swap rule makes pair features independent of argument
    order — the property that lets one pair feed both SPFH rows."""
    rng = np.random.RandomState(0)
    p1, p2 = rng.randn(64, 3), rng.randn(64, 3)
    n1 = rng.randn(64, 3)
    n1 /= np.linalg.norm(n1, axis=1, keepdims=True)
    n2 = rng.randn(64, 3)
    n2 /= np.linalg.norm(n2, axis=1, keepdims=True)
    a, p, t, ok = pair_features(p1, n1, p2, n2)
    a2, p2_, t2, ok2 = pair_features(p2, n2, p1, n1)
    np.testing.assert_array_equal(ok, ok2)
    np.testing.assert_allclose(a[ok], a2[ok], atol=1e-12)
    np.testing.assert_allclose(p[ok], p2_[ok], atol=1e-12)
    np.testing.assert_allclose(t[ok], t2[ok], atol=1e-12)


def test_section_sums_and_shape():
    rng = np.random.RandomState(1)
    xyz, normals = _plane_cloud(rng)
    f = compute_fpfh_native(xyz, normals, radius=0.15)
    assert f.shape == (len(xyz), FPFH_SIZE)
    # every non-isolated point: each 11-bin section sums to 100
    nz = f.sum(axis=1) > 0
    assert nz.mean() > 0.9
    for s in range(3):
        sums = f[nz, s * NR_BINS:(s + 1) * NR_BINS].sum(axis=1)
        np.testing.assert_allclose(sums, 100.0, rtol=1e-9)


def test_rotation_invariance():
    """FPFH is a relative-angle descriptor: a rigid rotation of the cloud
    (and its normals) leaves it unchanged up to bin-edge jitter."""
    rng = np.random.RandomState(2)
    xyz = rng.rand(300, 3)
    normals = rng.randn(300, 3)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    f0 = compute_fpfh_native(xyz, normals, radius=0.25)
    R = _rot(rng)
    f1 = compute_fpfh_native(xyz @ R.T, normals @ R.T, radius=0.25)
    n0 = f0 / np.maximum(np.linalg.norm(f0, axis=1, keepdims=True), 1e-12)
    n1 = f1 / np.maximum(np.linalg.norm(f1, axis=1, keepdims=True), 1e-12)
    cos = np.sum(n0 * n1, axis=1)
    assert np.median(cos) > 0.99
    assert cos.mean() > 0.97


def test_plane_vs_corner_discrimination():
    """Descriptors on a flat plane match each other far better than they
    match points on a 90-degree corner — the signal the 0.985-dot edge
    gate relies on."""
    rng = np.random.RandomState(3)
    plane_xyz, plane_n = _plane_cloud(rng, 300)
    # corner: two orthogonal half-planes meeting at x=0
    m = 300
    corner = np.zeros((m, 3))
    corner[: m // 2, 0] = -rng.rand(m // 2)
    corner[: m // 2, 1] = rng.rand(m // 2)
    corner_n = np.zeros((m, 3))
    corner_n[: m // 2, 2] = 1.0
    corner[m // 2:, 1] = rng.rand(m - m // 2)
    corner[m // 2:, 2] = rng.rand(m - m // 2)
    corner_n[m // 2:, 0] = 1.0
    fp = compute_fpfh_native(plane_xyz, plane_n, radius=0.2)
    fc = compute_fpfh_native(corner, corner_n, radius=0.2)

    def unit(f):
        keep = f.sum(axis=1) > 0
        f = f[keep]
        return f / np.linalg.norm(f, axis=1, keepdims=True)

    up, uc = unit(fp), unit(fc)
    within_plane = (up[:50] @ up[50:100].T).mean()
    # corner points near the fold (mixed-normal neighborhoods)
    near = uc[np.abs(np.concatenate([corner[fc.sum(1) > 0, 0]])) < 0.25]
    cross = (up[:50] @ near.T).mean() if len(near) else 0.0
    assert within_plane > 0.99
    assert within_plane - cross > 0.005


def test_isolated_points_zero():
    xyz = np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
    normals = np.tile([0.0, 0.0, 1.0], (2, 1))
    f = compute_fpfh_native(xyz, normals, radius=0.5)
    np.testing.assert_array_equal(f, 0.0)


def test_fpfh_mode_end_to_end(tiny_rooms, tmp_path, capsys):
    """cli.benchmarks --mode fpfh runs without PCL and produces
    non-degenerate clusters on the synthetic fixture."""
    from learn_region_grow_tpu.cli import benchmarks as bm
    from learn_region_grow_tpu.utils.io import save_h5_rooms

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    save_h5_rooms(str(data_dir / "s3dis_area7.h5"), [tiny_rooms[0]])
    bm.main(["--mode", "fpfh", "--area", "7",
             "--data-dir", str(data_dir)])
    out = capsys.readouterr().out
    assert "NMI:" in out
    nmi = float(out.split("NMI: ")[1].split(" ")[0])
    assert np.isfinite(nmi)
