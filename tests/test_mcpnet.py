"""MCPNet + triplet loss + staging + CC segmentation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learn_region_grow_tpu.data.mcp_staging import (even_sampling,
                                                    local_chunks,
                                                    neighbor_sets,
                                                    stage_room_mcp)
from learn_region_grow_tpu.eval.components import (
    connected_component_labels, voxel_adjacency_edges)
from learn_region_grow_tpu.models import mcpnet
from learn_region_grow_tpu.models.metric_losses import triplet_semihard_loss


def _oracle_triplet_semihard(labels, emb, margin=1.0):
    """Direct per-pair implementation of the TF-contrib algorithm."""
    n = len(labels)
    d = np.sum((emb[:, None] - emb[None, :]) ** 2, axis=2)
    total, count = 0.0, 0
    for a in range(n):
        for p in range(n):
            if p == a or labels[a] != labels[p]:
                continue
            negs = [j for j in range(n) if labels[j] != labels[a]]
            outside = [d[a, j] for j in negs if d[a, j] > d[a, p]]
            if outside:
                d_an = min(outside)
            else:
                d_an = max(d[a, j] for j in negs)
            total += max(margin + d[a, p] - d_an, 0.0)
            count += 1
    return total / max(count, 1)


def test_triplet_semihard_matches_oracle():
    rng = np.random.RandomState(0)
    emb = rng.randn(12, 4)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = rng.randint(0, 3, 12)
    got = float(triplet_semihard_loss(jnp.asarray(labels), jnp.asarray(emb)))
    want = _oracle_triplet_semihard(labels, emb)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mcpnet_forward_normalized():
    cfg = mcpnet.MCPNetConfig()
    params = mcpnet.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    emb = mcpnet.forward(params,
                         jnp.asarray(rng.randn(8, 4), jnp.float32),
                         jnp.asarray(rng.randn(8, 50, 6), jnp.float32))
    assert emb.shape == (8, 10)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0,
                               rtol=1e-5)


def test_mcpnet_learns_separation():
    """Two synthetic instances with distinct colors must separate."""
    import optax
    cfg = mcpnet.MCPNetConfig(num_neighbors=8)
    params = mcpnet.init_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    rng = np.random.RandomState(0)

    @jax.jit
    def step(params, opt, batch):
        (loss, emb), g = jax.value_and_grad(mcpnet.loss_fn, has_aux=True)(
            params, batch)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss, emb

    for i in range(60):
        labels = rng.randint(0, 2, 32)
        base = np.where(labels[:, None] == 0, [0., 0, 0, 1.],
                        [1., 1, 1, -1.])
        pts = (base + rng.randn(32, 4) * 0.05).astype(np.float32)
        nbr = rng.randn(32, 8, 6).astype(np.float32) * 0.01
        nbr[:, :, 3] += labels[:, None]
        params, opt, loss, emb = step(params, opt, {
            "points": pts, "neighbors": nbr, "labels": labels})
    emb = np.asarray(emb)
    intra = np.mean([np.sum((emb[labels == c] - emb[labels == c].mean(0)) ** 2)
                     for c in (0, 1)])
    inter = np.sum((emb[labels == 0].mean(0) - emb[labels == 1].mean(0)) ** 2)
    assert inter > intra, (inter, intra)


def test_even_sampling():
    labels = np.array([0] * 30 + [1] * 30 + [2] * 4)
    rng = np.random.RandomState(0)
    idx = even_sampling(labels, 32, 16, rng)
    assert len(idx) == 32
    counts = np.bincount(labels[idx], minlength=3)
    assert counts[2] <= 4  # small instance fully used at most


def test_mcp_staging_and_chunks(tiny_rooms):
    room = tiny_rooms[0]
    rng = np.random.RandomState(0)
    pts, obj, nbr, uneq = stage_room_mcp(room[:, :6], room[:, 6],
                                         resolution=0.1, num_neighbors=10,
                                         rng=rng)
    assert nbr.shape == (len(pts), 10, 6)
    # relative neighbors stay within the 3x0.3 coarse neighborhood
    assert np.abs(nbr[:, :, :3]).max() < 0.3 * 3
    chunks = local_chunks(pts, obj, nbr, chunk_size=64, rng=rng)
    assert len(chunks) >= 1
    p, nb, lb = chunks[0]
    assert p.shape == (64, 4) and nb.shape == (64, 10, 6) and lb.shape == (64,)


def test_voxel_adjacency_and_components():
    # two separated 3-point strips along x
    xyz = np.array([[0, 0, 0], [0.1, 0, 0], [0.2, 0, 0],
                    [5, 5, 5], [5.1, 5, 5], [5.2, 5, 5]])
    src, dst = voxel_adjacency_edges(xyz, 0.1)
    assert len(src) > 0
    labels = connected_component_labels(6, src, dst, min_cluster_size=2)
    assert labels[0] == labels[1] == labels[2] != 0
    assert labels[3] == labels[4] == labels[5] != 0
    assert labels[0] != labels[3]
    # min cluster size filters
    labels2 = connected_component_labels(6, src, dst, min_cluster_size=5)
    assert (labels2 == 0).all()


def test_embed_room_matches_ball_query_oracle():
    """The fused whole-room device embedding (``mcpnet.embed_room``)
    reproduces a NumPy oracle of its stated semantics: an evenly-strided
    ``nsample`` sample of the query's euclidean-radius ball taken in
    x-scan order (the TPU-shaped replacement for the reference ball
    query's arbitrary first-k-in-array-order, tf_grouping_g.cu:3-36),
    then the standard MCP forward."""
    cfg = mcpnet.MCPNetConfig(num_neighbors=8)
    params = mcpnet.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(11)
    n, radius = 300, 0.45
    pts = np.hstack([rng.rand(n, 3) * np.array([2.0, 2.0, 1.0]),
                     rng.rand(n, 3)]).astype(np.float32)

    got = mcpnet.embed_room(params, cfg, pts, radius=radius, chunk=256)
    assert got.shape == (n, cfg.embedding_size)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-4)

    # oracle neighbor selection + host forward
    order = np.argsort(pts[:, 0], kind="stable")
    xs = pts[order]
    d2 = ((xs[:, None, :3] - xs[None, :, :3]) ** 2).sum(-1)
    k = cfg.num_neighbors
    nbr = np.zeros((n, k, 6), np.float32)
    for qi in range(n):
        hits = np.nonzero(d2[qi] < radius * radius)[0]   # x-scan order
        assert len(hits) > 0                             # self-hit
        sel = hits[(np.arange(k) * len(hits)) // k]
        nbr[order[qi]] = xs[sel] - xs[qi]
    want = np.asarray(mcpnet.forward(params, jnp.asarray(pts[:, 2:6]),
                                     jnp.asarray(nbr)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # deterministic
    again = mcpnet.embed_room(params, cfg, pts, radius=radius, chunk=256)
    np.testing.assert_array_equal(got, again)
