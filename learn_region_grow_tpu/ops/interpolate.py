"""3-NN feature interpolation (TPU kernel tier).

``three_nn`` matches the reference CPU kernel
(``tf_ops/3d_interpolation/tf_interpolate.cpp:60-105``): the 3 nearest
points by SQUARED distance, ascending, ties resolved to the lower index.
``three_interpolate`` (``:107-153``) computes the weighted sum; its
gradient (scatter-add into points, ``:155-186``) comes from autodiff.

The reference registered these as CPU-only TF kernels, forcing a
device->host bounce inside every PointNet++ feature-propagation layer
(``train_pointnet.py:145-150``); here they are ordinary fused XLA on-device
ops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def three_nn(xyz1: jnp.ndarray, xyz2: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """xyz1 (b, n, 3) queries, xyz2 (b, m, 3) reference
    -> dist (b, n, 3) squared distances ascending, idx (b, n, 3) int32."""
    d2 = jnp.sum((xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2, axis=-1)
    neg, idx = jax.lax.top_k(-d2, 3)
    return -neg, idx.astype(jnp.int32)


@jax.jit
def three_interpolate(points: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """points (b, m, c), idx (b, n, 3), weight (b, n, 3) -> (b, n, c)."""
    b, m, c = points.shape
    n = idx.shape[1]
    flat = jnp.take_along_axis(points, idx.reshape(b, n * 3)[..., None],
                               axis=1).reshape(b, n, 3, c)
    return jnp.sum(flat * weight[..., None], axis=2)
