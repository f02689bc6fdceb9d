"""LrgNet — dual-branch PointNet add/remove scorer, TPU-native.

Architecture parity with the reference (``learn_region_grow_util.py:75-189``):
two independent stacks of pointwise MLPs (1x1 convs == feature-dim matmuls,
which XLA maps straight onto the MXU) over the inlier set and the neighbor
candidate set, per-set max-pool, concat to a global feature, tile back and
concat with each branch's 2nd conv activation (the skip), then two 2-logit
heads: **add** over neighbor points and **remove** over inlier points.

Capacity variants (``lite``): 0 -> [64,64,64,128,512]+[256,128],
1 -> [64,64]+[64], 2 -> [64,64,256]+[64,64].

Losses: plain softmax CE for add; class-balanced (mean-over-positives +
mean-over-negatives, empty-class guarded) CE for remove
(``learn_region_grow_util.py:164-186``). An optional completeness head
regresses the IoU-vs-GT "complete" score the simulator stages (evidence of
the published model's completeness head: ``experimental/train_region_grow_rnn.py:143``
and the ``complete`` dataset written at ``stage_data.py:256``).

Implementation is pure functional JAX: params are a pytree dict, the forward
is a jittable function of (params, inlier, neighbor). Compute dtype is
configurable (bfloat16 recommended on TPU); params stay float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LrgNetConfig:
    feature_size: int = 13
    lite: Optional[int] = None
    completeness_head: bool = False
    compute_dtype: Any = jnp.float32

    @property
    def conv_channels(self):
        if self.lite in (0, None):
            return [64, 64, 64, 128, 512]
        if self.lite == 1:
            return [64, 64]
        if self.lite == 2:
            return [64, 64, 256]
        raise ValueError(f"unknown lite variant {self.lite}")

    @property
    def conv2_channels(self):
        if self.lite in (0, None):
            return [256, 128]
        if self.lite == 1:
            return [64]
        if self.lite == 2:
            return [64, 64]
        raise ValueError(f"unknown lite variant {self.lite}")

    @property
    def global_feature_size(self) -> int:
        return self.conv_channels[-1] * 2

    @property
    def head_input_size(self) -> int:
        # tiled global feature + branch skip (2nd conv activation)
        return self.global_feature_size + self.conv_channels[1]


def _init_mlp(rng, sizes, name):
    """Stack of (w, b) with glorot-uniform init (VarianceScaling fan_avg
    uniform in the reference)."""
    layers = []
    init = jax.nn.initializers.glorot_uniform()
    for i, (cin, cout) in enumerate(zip(sizes[:-1], sizes[1:])):
        rng, sub = jax.random.split(rng)
        layers.append({
            "w": init(sub, (cin, cout), jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32),
        })
    return layers


def init_params(rng: jax.Array, cfg: LrgNetConfig) -> Params:
    cc = cfg.conv_channels
    c2 = cfg.conv2_channels
    r = jax.random.split(rng, 6)
    params = {
        "inlier_mlp": _init_mlp(r[0], [cfg.feature_size] + cc, "inlier"),
        "neighbor_mlp": _init_mlp(r[1], [cfg.feature_size] + cc, "neighbor"),
        "add_head": _init_mlp(r[2], [cfg.head_input_size] + c2 + [2], "add"),
        "remove_head": _init_mlp(r[3], [cfg.head_input_size] + c2 + [2], "rmv"),
    }
    if cfg.completeness_head:
        params["complete_head"] = _init_mlp(
            r[4], [cfg.global_feature_size, 256, 64, 1], "complete")
    return params


def _pointwise_mlp(layers, x, *, relu_last=True, dtype=jnp.float32):
    """Apply 1x1-conv stack: x (B, N, C) -> (B, N, C_out). Pure matmuls."""
    n = len(layers)
    for i, layer in enumerate(layers):
        w = layer["w"].astype(dtype)
        b = layer["b"].astype(dtype)
        x = jnp.einsum("bnc,cd->bnd", x.astype(dtype), w,
                       preferred_element_type=jnp.float32) + b
        if relu_last or i < n - 1:
            x = jax.nn.relu(x)
    return x


def _branch(layers, x, dtype):
    """Run a branch MLP keeping the skip activation (2nd conv output)."""
    skip = None
    for i, layer in enumerate(layers):
        w = layer["w"].astype(dtype)
        b = layer["b"].astype(dtype)
        x = jnp.einsum("bnc,cd->bnd", x.astype(dtype), w,
                       preferred_element_type=jnp.float32) + b
        x = jax.nn.relu(x)
        if i == 1:
            skip = x
    if skip is None:  # lite=1 has only 2 convs; skip == last activation
        skip = x
    return x, skip


def forward(params: Params, inlier: jnp.ndarray, neighbor: jnp.ndarray,
            cfg: LrgNetConfig) -> Dict[str, jnp.ndarray]:
    """Forward pass.

    inlier: (B, Ni, F); neighbor: (B, Nn, F).
    Returns dict with add_logits (B, Nn, 2), remove_logits (B, Ni, 2) in
    float32, plus complete (B,) if the completeness head is enabled.
    """
    dt = cfg.compute_dtype
    in_feat, in_skip = _branch(params["inlier_mlp"], inlier, dt)
    nb_feat, nb_skip = _branch(params["neighbor_mlp"], neighbor, dt)

    pooled = jnp.concatenate(
        [jnp.max(in_feat, axis=1), jnp.max(nb_feat, axis=1)], axis=-1)
    g = pooled.shape[-1]

    def head(layers, skip, n_points):
        # The reference concatenates the tiled global feature with the skip
        # and runs one (G+S)-wide conv (learn_region_grow_util.py:128-149).
        # The global rows are identical across points, so the first layer
        # splits algebraically into a per-region matvec (pooled @ W[:G],
        # one row) broadcast-added to the skip matmul — same arithmetic
        # result, ~6x fewer head FLOPs at S=64, G=1024.
        w0 = layers[0]["w"].astype(dt)
        b0 = layers[0]["b"].astype(dt)
        glob = jnp.einsum("bg,gd->bd", pooled.astype(dt), w0[:g],
                          preferred_element_type=jnp.float32)
        x = jnp.einsum("bnc,cd->bnd", skip.astype(dt), w0[g:],
                       preferred_element_type=jnp.float32)
        x = jax.nn.relu(x + glob[:, None, :] + b0)
        return _pointwise_mlp(layers[1:], x, relu_last=False, dtype=dt)

    out = {
        "add_logits": head(params["add_head"], nb_skip,
                           neighbor.shape[1]).astype(jnp.float32),
        "remove_logits": head(params["remove_head"], in_skip,
                              inlier.shape[1]).astype(jnp.float32),
    }
    if "complete_head" in params:
        h = pooled[:, None, :]
        c = _pointwise_mlp(params["complete_head"], h, relu_last=False, dtype=dt)
        out["complete"] = jax.nn.sigmoid(c[:, 0, 0].astype(jnp.float32))
    return out


def _softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element sparse softmax cross-entropy; logits (..., 2)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over mask; 0 when the mask is empty (the reference's NaN guard,
    ``learn_region_grow_util.py:170-171``)."""
    cnt = jnp.sum(mask)
    return jnp.where(cnt > 0, jnp.sum(x * mask) / jnp.maximum(cnt, 1), 0.0)


def losses(outputs: Dict[str, jnp.ndarray],
           add_labels: jnp.ndarray, remove_labels: jnp.ndarray,
           complete_target: Optional[jnp.ndarray] = None
           ) -> Dict[str, jnp.ndarray]:
    """Loss + precision/recall metrics, matching the reference definitions."""
    add_logits = outputs["add_logits"]
    rmv_logits = outputs["remove_logits"]
    add_labels = add_labels.astype(jnp.int32)
    remove_labels = remove_labels.astype(jnp.int32)

    add_ce = _softmax_ce(add_logits, add_labels)
    add_loss = jnp.mean(add_ce)

    rmv_ce = _softmax_ce(rmv_logits, remove_labels)
    pos = (remove_labels == 1).astype(jnp.float32)
    neg = 1.0 - pos
    remove_loss = _masked_mean(rmv_ce, pos) + _masked_mean(rmv_ce, neg)

    # metrics (denominators keep the reference's +1 smoothing)
    add_pred = jnp.argmax(add_logits, axis=-1)
    tp_add = jnp.sum((add_pred == 1) & (add_labels == 1)).astype(jnp.float32)
    add_prc = tp_add / (jnp.sum(add_pred).astype(jnp.float32) + 1.0)
    add_rcl = tp_add / (jnp.sum(add_labels).astype(jnp.float32) + 1.0)
    add_acc = jnp.mean((add_pred == add_labels).astype(jnp.float32))

    rmv_mask = jax.nn.softmax(rmv_logits, axis=-1)[..., 1] > 0.5
    tp_rmv = jnp.sum(rmv_mask & (remove_labels == 1)).astype(jnp.float32)
    rmv_prc = tp_rmv / (jnp.sum(rmv_mask.astype(jnp.float32)) + 1.0)
    rmv_rcl = tp_rmv / (jnp.sum(remove_labels).astype(jnp.float32) + 1.0)
    rmv_acc = jnp.mean((rmv_mask == (remove_labels == 1)).astype(jnp.float32))

    total = add_loss + remove_loss
    out = {
        "loss": total, "add_loss": add_loss, "remove_loss": remove_loss,
        "add_acc": add_acc, "add_prc": add_prc, "add_rcl": add_rcl,
        "remove_acc": rmv_acc, "remove_prc": rmv_prc, "remove_rcl": rmv_rcl,
    }
    if complete_target is not None and "complete" in outputs:
        comp_loss = jnp.mean((outputs["complete"] - complete_target) ** 2)
        out["complete_loss"] = comp_loss
        out["loss"] = total + comp_loss
    return out


def loss_fn(params: Params, batch: Dict[str, jnp.ndarray], cfg: LrgNetConfig
            ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """batch: inlier (B,Ni,F), neighbor (B,Nn,F), add (B,Nn), remove (B,Ni)
    [, complete (B,)]."""
    outputs = forward(params, batch["inlier"], batch["neighbor"], cfg)
    m = losses(outputs, batch["add"], batch["remove"],
               batch.get("complete"))
    return m["loss"], m
