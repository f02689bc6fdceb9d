"""Kernel-tier ops vs naive NumPy oracles (reference CUDA/CPU semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learn_region_grow_tpu.ops import (farthest_point_sample,
                                       farthest_point_sample_pallas,
                                       gather_point, group_point, knn_point,
                                       prob_sample, query_ball_point,
                                       three_interpolate, three_nn)


def _oracle_fps(xyz, npoint):
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), np.int32)
    for bi in range(b):
        td = np.full(n, np.inf)
        last = 0
        for i in range(1, npoint):
            d = np.sum((xyz[bi] - xyz[bi, last]) ** 2, axis=1)
            td = np.minimum(td, d)
            last = int(np.argmax(td))
            out[bi, i] = last
    return out


def _oracle_ball(radius, nsample, xyz1, xyz2):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    idx = np.zeros((b, m, nsample), np.int32)
    cnt = np.zeros((b, m), np.int32)
    for bi in range(b):
        for j in range(m):
            c = 0
            for k in range(n):
                if c == nsample:
                    break
                d = max(np.sqrt(np.sum((xyz2[bi, j] - xyz1[bi, k]) ** 2)),
                        1e-20)
                if d < radius:
                    if c == 0:
                        idx[bi, j, :] = k
                    idx[bi, j, c] = k
                    c += 1
            cnt[bi, j] = c
    return idx, cnt


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.RandomState(0)
    xyz1 = rng.rand(2, 128, 3).astype(np.float32)
    xyz2 = rng.rand(2, 32, 3).astype(np.float32)
    return xyz1, xyz2


def test_fps_matches_oracle(clouds):
    xyz1, _ = clouds
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz1), 16))
    want = _oracle_fps(xyz1, 16)
    np.testing.assert_array_equal(got, want)
    assert got[0, 0] == 0


def test_fps_pallas_fallback(clouds):
    # on CPU test backend this exercises the fallback path; on TPU the kernel
    xyz1, _ = clouds
    got = np.asarray(farthest_point_sample_pallas(jnp.asarray(xyz1), 16))
    want = _oracle_fps(xyz1, 16)
    np.testing.assert_array_equal(got, want)


def test_ball_query_matches_oracle(clouds):
    xyz1, xyz2 = clouds
    idx, cnt = query_ball_point(0.2, 8, jnp.asarray(xyz1), jnp.asarray(xyz2))
    idx_o, cnt_o = _oracle_ball(0.2, 8, xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(cnt), cnt_o)
    np.testing.assert_array_equal(np.asarray(idx), idx_o)


def test_ball_query_no_hits():
    xyz1 = jnp.zeros((1, 4, 3)) + 10.0
    xyz2 = jnp.zeros((1, 2, 3))
    idx, cnt = query_ball_point(0.1, 4, xyz1, xyz2)
    assert int(cnt.sum()) == 0
    np.testing.assert_array_equal(np.asarray(idx), 0)


def test_three_nn_matches_bruteforce(clouds):
    xyz1, xyz2 = clouds
    dist, idx = three_nn(jnp.asarray(xyz2), jnp.asarray(xyz1))
    d2 = np.sum((xyz2[:, :, None] - xyz1[:, None]) ** 2, -1)
    order = np.argsort(d2, axis=-1)[..., :3]
    np.testing.assert_array_equal(np.asarray(idx), order)
    np.testing.assert_allclose(np.asarray(dist),
                               np.take_along_axis(d2, order, -1), rtol=1e-5)


def test_three_interpolate_and_grad(clouds):
    rng = np.random.RandomState(1)
    points = jnp.asarray(rng.rand(2, 16, 5).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 16, (2, 10, 3)).astype(np.int32))
    w = jnp.asarray(rng.rand(2, 10, 3).astype(np.float32))
    out = three_interpolate(points, idx, w)
    assert out.shape == (2, 10, 5)
    # oracle
    want = np.zeros((2, 10, 5))
    for b in range(2):
        for j in range(10):
            for k in range(3):
                want[b, j] += np.asarray(points)[b, idx[b, j, k]] * w[b, j, k]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)
    # grad wrt points is a scatter-add: check against finite structure
    g = jax.grad(lambda p: jnp.sum(three_interpolate(p, idx, w) * 2.0))(points)
    want_g = np.zeros((2, 16, 5))
    for b in range(2):
        for j in range(10):
            for k in range(3):
                want_g[b, idx[b, j, k]] += 2.0 * float(w[b, j, k])
    np.testing.assert_allclose(np.asarray(g), want_g, rtol=1e-4)


def test_group_point_and_grad():
    rng = np.random.RandomState(2)
    points = jnp.asarray(rng.rand(2, 16, 4).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 16, (2, 8, 3)).astype(np.int32))
    out = group_point(points, idx)
    assert out.shape == (2, 8, 3, 4)
    np.testing.assert_allclose(
        np.asarray(out)[1, 5, 2], np.asarray(points)[1, int(idx[1, 5, 2])])
    g = jax.grad(lambda p: jnp.sum(group_point(p, idx)))(points)
    want = np.zeros((2, 16))
    for b in range(2):
        want[b] = np.bincount(np.asarray(idx)[b].ravel(), minlength=16)
    np.testing.assert_allclose(np.asarray(g)[..., 0], want)


def test_gather_point_grad():
    points = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 8, 3))
    idx = jnp.asarray([[1, 1, 3]], dtype=jnp.int32)
    out = gather_point(points, idx)
    assert out.shape == (1, 3, 3)
    g = jax.grad(lambda p: jnp.sum(gather_point(p, idx)))(points)
    np.testing.assert_array_equal(np.asarray(g)[0, :, 0],
                                  [0, 2, 0, 1, 0, 0, 0, 0])


def test_prob_sample_distribution():
    probs = jnp.asarray([[0.1, 0.0, 0.7, 0.2]])
    u = jax.random.uniform(jax.random.PRNGKey(0), (1, 4000))
    s = np.asarray(prob_sample(probs, u))
    freq = np.bincount(s[0], minlength=4) / 4000
    np.testing.assert_allclose(freq, [0.1, 0.0, 0.7, 0.2], atol=0.03)


def test_knn_point(clouds):
    xyz1, xyz2 = clouds
    vals, idx = knn_point(4, jnp.asarray(xyz1), jnp.asarray(xyz2))
    d2 = np.sum((xyz2[:, :, None] - xyz1[:, None]) ** 2, -1)
    want = np.sort(d2, axis=-1)[..., :4]
    np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-5)


def test_masked_sample_stratified_kernel_interpret():
    """Pallas stratified sampler (interpret mode) vs jnp oracle."""
    from learn_region_grow_tpu.ops.masked_select import (
        masked_sample_stratified_one, masked_sample_stratified_ref)
    rng = np.random.RandomState(0)
    P, K = 2048, 512
    for density in (0.4, 0.04):
        mask = rng.rand(P) < density
        u = rng.rand(1, K).astype(np.float32)
        idx = np.asarray(masked_sample_stratified_one(
            jnp.asarray(mask), jnp.asarray(u), K, interpret=True))
        want = np.asarray(masked_sample_stratified_ref(
            jnp.asarray(mask), jnp.asarray(u[0]), K))
        np.testing.assert_array_equal(np.sort(idx), np.sort(want))
        assert mask[idx].all()
