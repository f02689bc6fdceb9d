"""LrgNet model: shapes, loss semantics, gradient flow, lite variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learn_region_grow_tpu.models import lrgnet


@pytest.fixture(scope="module")
def cfg():
    return lrgnet.LrgNetConfig(feature_size=13)


def _rand_batch(rng, b=2, ni=64, nn=64, f=13):
    return {
        "inlier": jnp.asarray(rng.randn(b, ni, f), jnp.float32),
        "neighbor": jnp.asarray(rng.randn(b, nn, f), jnp.float32),
        "add": jnp.asarray(rng.randint(0, 2, (b, nn)), jnp.int32),
        "remove": jnp.asarray(rng.randint(0, 2, (b, ni)), jnp.int32),
    }


def test_forward_shapes(cfg):
    params = lrgnet.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    batch = _rand_batch(rng, b=3, ni=32, nn=48)
    out = lrgnet.forward(params, batch["inlier"], batch["neighbor"], cfg)
    assert out["add_logits"].shape == (3, 48, 2)
    assert out["remove_logits"].shape == (3, 32, 2)


@pytest.mark.parametrize("lite", [1, 2])
def test_lite_variants(lite):
    cfg = lrgnet.LrgNetConfig(feature_size=13, lite=lite)
    params = lrgnet.init_params(jax.random.PRNGKey(0), cfg)
    batch = _rand_batch(np.random.RandomState(0))
    out = lrgnet.forward(params, batch["inlier"], batch["neighbor"], cfg)
    assert out["add_logits"].shape == (2, 64, 2)


def test_completeness_head():
    cfg = lrgnet.LrgNetConfig(feature_size=13, completeness_head=True)
    params = lrgnet.init_params(jax.random.PRNGKey(0), cfg)
    batch = _rand_batch(np.random.RandomState(0))
    out = lrgnet.forward(params, batch["inlier"], batch["neighbor"], cfg)
    assert out["complete"].shape == (2,)
    assert (out["complete"] >= 0).all() and (out["complete"] <= 1).all()


def test_remove_loss_class_balanced(cfg):
    """All-positive remove labels must not NaN (empty-negative guard)."""
    params = lrgnet.init_params(jax.random.PRNGKey(0), cfg)
    batch = _rand_batch(np.random.RandomState(0))
    batch["remove"] = jnp.ones_like(batch["remove"])
    loss, metrics = lrgnet.loss_fn(params, batch, cfg)
    assert np.isfinite(float(loss))
    batch["remove"] = jnp.zeros_like(batch["remove"])
    loss, _ = lrgnet.loss_fn(params, batch, cfg)
    assert np.isfinite(float(loss))


def test_loss_oracle_balanced_ce(cfg):
    """Remove loss = mean CE over positives + mean CE over negatives."""
    params = lrgnet.init_params(jax.random.PRNGKey(1), cfg)
    batch = _rand_batch(np.random.RandomState(1))
    out = lrgnet.forward(params, batch["inlier"], batch["neighbor"], cfg)
    m = lrgnet.losses(out, batch["add"], batch["remove"])

    logits = np.asarray(out["remove_logits"], np.float64)
    labels = np.asarray(batch["remove"])
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ce = -np.take_along_axis(logp, labels[..., None], -1)[..., 0]
    expect = ce[labels == 1].mean() + ce[labels == 0].mean()
    np.testing.assert_allclose(float(m["remove_loss"]), expect, rtol=1e-5)

    logits = np.asarray(out["add_logits"], np.float64)
    labels = np.asarray(batch["add"])
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ce = -np.take_along_axis(logp, labels[..., None], -1)[..., 0]
    np.testing.assert_allclose(float(m["add_loss"]), ce.mean(), rtol=1e-5)


def test_gradients_flow_everywhere(cfg):
    params = lrgnet.init_params(jax.random.PRNGKey(0), cfg)
    batch = _rand_batch(np.random.RandomState(2))
    grads = jax.grad(lambda p: lrgnet.loss_fn(p, batch, cfg)[0])(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in leaves)
    assert nonzero >= len(leaves) - 2  # final biases can be near-zero but not all


def test_permutation_invariance(cfg):
    """Max-pool global feature => add logits permute with neighbor order."""
    params = lrgnet.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    batch = _rand_batch(rng, b=1)
    out1 = lrgnet.forward(params, batch["inlier"], batch["neighbor"], cfg)
    perm = rng.permutation(64)
    out2 = lrgnet.forward(params, batch["inlier"],
                          batch["neighbor"][:, perm], cfg)
    np.testing.assert_allclose(np.asarray(out1["add_logits"])[:, perm],
                               np.asarray(out2["add_logits"]), atol=1e-4)
