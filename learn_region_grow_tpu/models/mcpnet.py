"""MCPNet — Multi-view Context Pooling metric-learning embedder.

Parity with the reference (``learn_region_grow_util.py:191-232``): a
per-point 50-neighbor relative point set runs through 2 pointwise conv
layers (hidden 200) + max-pool; the context feature concats with the point's
own non-xy features (z, rgb for feature_size=6); 2 FC layers emit a 10-d
L2-normalized embedding trained with semihard triplet loss, Adam(1e-3).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .metric_losses import triplet_semihard_loss

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MCPNetConfig:
    num_neighbors: int = 50
    feature_size: int = 6        # neighbor features: xyz(+rgb)
    hidden_size: int = 200
    embedding_size: int = 10

    @property
    def point_feature_size(self) -> int:
        # the point's own feature drops xy (learn_region_grow_util.py:193)
        return self.feature_size - 2


def init_params(rng: jax.Array, cfg: MCPNetConfig) -> Params:
    init = jax.nn.initializers.glorot_uniform()
    r = jax.random.split(rng, 4)
    return {
        "k1": {"w": init(r[0], (cfg.feature_size, cfg.hidden_size)),
               "b": jnp.zeros((cfg.hidden_size,))},
        "k2": {"w": init(r[1], (cfg.hidden_size, cfg.hidden_size)),
               "b": jnp.zeros((cfg.hidden_size,))},
        "k3": {"w": init(r[2], (cfg.point_feature_size + cfg.hidden_size,
                                cfg.hidden_size)),
               "b": jnp.zeros((cfg.hidden_size,))},
        "k4": {"w": init(r[3], (cfg.hidden_size, cfg.embedding_size)),
               "b": jnp.zeros((cfg.embedding_size,))},
    }


def forward(params: Params, point_feats: jnp.ndarray,
            neighbor_feats: jnp.ndarray) -> jnp.ndarray:
    """point_feats (B, F-2), neighbor_feats (B, K, F) -> (B, E) normalized."""
    h = jax.nn.relu(jnp.einsum("bkc,cd->bkd", neighbor_feats,
                               params["k1"]["w"],
                               preferred_element_type=jnp.float32)
                    + params["k1"]["b"])
    h = jax.nn.relu(jnp.einsum("bkc,cd->bkd", h, params["k2"]["w"],
                               preferred_element_type=jnp.float32)
                    + params["k2"]["b"])
    context = jnp.max(h, axis=1)
    concat = jnp.concatenate([point_feats, context], axis=1)
    f3 = jax.nn.relu(concat @ params["k3"]["w"] + params["k3"]["b"])
    f4 = f3 @ params["k4"]["w"] + params["k4"]["b"]
    return f4 / jnp.maximum(jnp.linalg.norm(f4, axis=1, keepdims=True),
                            1e-12)


def loss_fn(params: Params, batch: Dict[str, jnp.ndarray]
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    emb = forward(params, batch["points"], batch["neighbors"])
    return triplet_semihard_loss(batch["labels"], emb), emb
