"""Ball query + top-k selection (TPU kernel tier).

``query_ball_point`` reproduces the reference CUDA semantics exactly
(``tf_ops/grouping/tf_grouping_g.cu:3-36``): for every query point, take the
FIRST ``nsample`` reference points (in index order) whose *euclidean*
distance (clamped to >= 1e-20) is strictly below ``radius``; pre-fill all
slots with the first hit so short balls repeat it; ``pts_cnt`` is the hit
count capped at ``nsample``. Queries with zero hits return index 0.

``select_top_k``/``knn_point`` mirror ``tf_grouping.py:48-73`` /
``tf_grouping_g.cu:83-123`` (k smallest distances, ascending).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(0, 1))
def query_ball_point(radius: float, nsample: int, xyz1: jnp.ndarray,
                     xyz2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """xyz1 (b, n, 3) reference cloud, xyz2 (b, m, 3) query centers
    -> idx (b, m, nsample) int32, pts_cnt (b, m) int32."""
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    d2 = jnp.sum(
        (xyz2[:, :, None, :] - xyz1[:, None, :, :]) ** 2, axis=-1)
    d = jnp.maximum(jnp.sqrt(d2), 1e-20)
    hit = d < radius                                     # (b, m, n)
    cnt = jnp.minimum(jnp.sum(hit, axis=-1), nsample).astype(jnp.int32)

    # first nsample hit indices in ascending order: sort (miss -> n)
    keys = jnp.where(hit, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    keys = jnp.broadcast_to(keys, hit.shape)
    first_k = -jax.lax.top_k(-keys, nsample)[0]          # ascending, (b,m,ns)
    first_hit = first_k[..., :1]
    has = first_hit < n
    idx = jnp.where(first_k < n, first_k,
                    jnp.where(has, first_hit, 0))
    return idx.astype(jnp.int32), cnt


@functools.partial(jax.jit, static_argnums=0)
def select_top_k(k: int, dist: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First-k-sorted selection (``tf_grouping_g.cu:83-123``): returns
    (idx, vals) of shape (b, m, n) where the first k entries along the last
    axis are the k smallest distances ascending (rest unspecified; we return
    the full ascending sort, a strict superset of the contract)."""
    vals, idx = jax.lax.sort_key_val(
        dist, jnp.broadcast_to(jnp.arange(dist.shape[-1], dtype=jnp.int32),
                               dist.shape))
    return idx, vals


@functools.partial(jax.jit, static_argnums=0)
def knn_point(k: int, xyz1: jnp.ndarray, xyz2: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors (``tf_grouping.py:48-73``): xyz1 (b, n, c)
    reference, xyz2 (b, m, c) queries -> (vals, idx) (b, m, k)."""
    d2 = jnp.sum((xyz2[:, :, None, :] - xyz1[:, None, :, :]) ** 2, axis=-1)
    neg_vals, idx = jax.lax.top_k(-d2, k)
    return -neg_vals, idx.astype(jnp.int32)
