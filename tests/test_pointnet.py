"""PointNet / PointNet++: shapes, BN state, learning smoke."""

import jax
import numpy as np
import pytest

from learn_region_grow_tpu.models import pointnet as pn


def test_pointnet_shapes_and_bn_state():
    cfg = pn.PointNetConfig(num_point=64, num_class=13)
    params, bn = pn.pointnet_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(4, 64, 6).astype(np.float32)
    logits, bn1 = pn.pointnet_forward(params, bn, x, True)
    assert logits.shape == (4, 64, 13)
    # training updates BN state
    assert not np.allclose(np.asarray(bn1["mean"][0]),
                           np.asarray(bn["mean"][0]))
    # eval leaves it unchanged
    logits_e, bn2 = pn.pointnet_forward(params, bn1, x, False)
    np.testing.assert_array_equal(np.asarray(bn2["mean"][0]),
                                  np.asarray(bn1["mean"][0]))
    # train vs eval differ (different normalization stats)
    assert not np.allclose(np.asarray(logits), np.asarray(logits_e))


def test_pointnet2_shapes():
    cfg = pn.PointNet2Config(num_point=256, num_class=13)
    params = pn.pointnet2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 256, 6).astype(np.float32)
    logits = jax.jit(pn.pointnet2_forward)(params, x)
    assert logits.shape == (2, 256, 13)
    assert np.isfinite(np.asarray(logits)).all()


def test_pointnet2_gradients():
    cfg = pn.PointNet2Config(num_point=128, num_class=5)
    params = pn.pointnet2_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    x = rng.rand(2, 128, 6).astype(np.float32)
    y = rng.randint(0, 5, (2, 128)).astype(np.int32)

    def loss(p):
        return pn.seg_loss(pn.pointnet2_forward(p, x), y)[0]

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(np.abs(np.asarray(l)).sum()) > 0 for l in leaves) \
        > len(leaves) * 0.8


def test_stage_blocks_and_jitter():
    rng = np.random.RandomState(0)
    pts = np.zeros((5000, 6))
    pts[:, :2] = rng.rand(5000, 2) * 3.0   # spans multiple 1m grid cells
    pts[:, 2] = rng.rand(5000) + 5.0
    cls = rng.randint(0, 13, 5000)
    blocks, labels = pn.stage_blocks(pts, cls, 1.0, num_point=256, rng=rng)
    assert len(blocks) >= 4
    for b in blocks:
        assert b.shape == (256, 6)
        # z floored at 0 per cell (before resampling, so subset min >= 0)
        assert b[:, 2].min() >= 0 and b[:, 2].min() < 0.5
        assert np.abs(b[:, :2]).max() < 1.0       # centered cell
    jp, jl = pn.jitter_blocks(np.asarray(blocks), np.asarray(labels), rng)
    assert jp.shape == np.asarray(blocks).shape


def test_pointnet_learns():
    """A separable toy problem: class = which half of the block."""
    cfg = pn.PointNetConfig(num_point=64, num_class=2)
    params, bn = pn.pointnet_init(jax.random.PRNGKey(0), cfg)
    import optax
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    rng = np.random.RandomState(0)

    @jax.jit
    def step(params, bn, opt, x, y):
        def lf(p, b):
            logits, nb = pn.pointnet_forward(p, b, x, True)
            loss, acc = pn.seg_loss(logits, y)
            return loss, (acc, nb)
        (loss, (acc, nb)), g = jax.value_and_grad(lf, has_aux=True)(params, bn)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), nb, opt, loss, acc

    accs = []
    for i in range(60):
        x = rng.randn(8, 64, 6).astype(np.float32)
        y = (x[:, :, 0] > 0).astype(np.int32)
        params, bn, opt, loss, acc = step(params, bn, opt, x, y)
        accs.append(float(acc))
    assert np.mean(accs[-10:]) > 0.9, np.mean(accs[-10:])
