"""Device mesh + sharding rules.

Parallelism design (new for TPU; the reference is single-GPU single-process,
SURVEY.md §2 parallelism row): a 2-D ``(dp, tp)`` mesh over ICI.

* ``dp`` (data parallel): batches — training samples, grow lanes, rooms — are
  sharded along their leading axis. Gradients are reduced by XLA-inserted
  ``psum`` during ``jax.grad`` under ``jit`` with sharded inputs.
* ``tp`` (tensor parallel): the wide pointwise-MLP weights (e.g. the 512-ch
  final conv / 1024-d global feature) are sharded along their output feature
  dim; XLA inserts all-gathers where the tiled global feature is consumed.

Activation shardings are deliberately LEFT TO GSPMD propagation: with the
weight output dims sharded ``P(None, tp)``, XLA propagates the channel
sharding through the pointwise conv stack and inserts the all-gather at the
pooled-global-feature concat — explicit ``with_sharding_constraint`` calls
add nothing at these sizes (verified numerically + placement-checked at
tp=4 in ``tests/test_multichip.py::test_tp4_training_shards_params_and_
matches``). For the model sizes at parity, ``tp=1`` (pure DP) is the fast
configuration — ``tp`` exists to demonstrate and test the sharding path and
for future wider variants.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(num_devices: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    dev_array = np.array(devices).reshape(n // tp, tp)
    return Mesh(dev_array, (DP_AXIS, TP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for batch pytrees."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(params, mesh: Mesh, min_shard_dim: int = 128):
    """Tensor-parallel sharding rule for LrgNet-style param pytrees.

    Weights ``w (cin, cout)`` shard ``cout`` over ``tp`` when divisible and
    wide enough; biases follow their weight. Everything else is replicated.
    """
    tp_size = mesh.shape[TP_AXIS]

    def rule(path, leaf):
        if tp_size == 1:
            return NamedSharding(mesh, P())
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        dim = leaf.shape[-1] if leaf.ndim else 1
        if dim >= min_shard_dim and dim % tp_size == 0 and name in ("w", "b"):
            if leaf.ndim == 2:
                return NamedSharding(mesh, P(None, TP_AXIS))
            if leaf.ndim == 1:
                return NamedSharding(mesh, P(TP_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch(batch, mesh: Mesh):
    """Pad-free device_put of a batch pytree with leading-axis DP sharding."""
    sh = batch_sharding(mesh)
    return jax.device_put(batch, sh)
