"""Point grouping (gather) with scatter-add gradients.

``group_point`` reproduces ``tf_ops/grouping/tf_grouping_g.cu:40-78``:
gather rows of a (b, n, c) feature cloud by a (b, m, nsample) index tensor.
The backward pass is a scatter-add over duplicate indices — JAX's autodiff
of ``take_along_axis`` emits exactly that (the reference needed an explicit
atomicAdd kernel + registered grad, ``tf_grouping.py:42-46``).
"""

from __future__ import annotations

import jax.numpy as jnp


def group_point(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points (b, n, c), idx (b, m, nsample) -> (b, m, nsample, c)."""
    b, n, c = points.shape
    _, m, ns = idx.shape
    flat_idx = idx.reshape(b, m * ns)
    gathered = jnp.take_along_axis(points, flat_idx[..., None], axis=1)
    return gathered.reshape(b, m, ns, c)
