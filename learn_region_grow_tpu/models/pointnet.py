"""PointNet & PointNet++ semantic segmentation (benchmark nets).

PointNet parity (reference ``train_pointnet.py:31-111``): 5 pointwise convs
[64,64,64,128,1024] on 6-ch input, global max-pool, a *subtractive* global
feature (per-point feature minus pooled, ``:59``) concat with the conv[1]
skip, then FC head [512,256]+num_class with the reference's custom EMA batch
norm (decay 0.9, eps 1e-3, moments over the batch axis only — i.e. per
(position, channel) statistics, ``:63-84``; faithful including that quirk),
Adam with staircase-decayed LR 2e-4 * 0.5^(step//500) (``:107-111``).

PointNet++ parity (``:113-211``): 4 set-abstraction layers
(npoint 1024/256/64/16, radius .1/.2/.4/.8, nsample 32) on the ops tier
(FPS/ball-query/group — the reference's CUDA ops), 4 feature-propagation
layers (3-NN inverse-distance interpolation — CPU-bound in the reference,
on-device here), 2-layer conv head, Adam(1e-3), no batch norm.

Functional JAX: trainable params + (for PointNet) mutable BN state threaded
explicitly. EMA shadow variables initialize at zeros/ones and update
``s = d*s + (1-d)*batch_stat`` (TF's zero-debias on tensor EMAs is not
replicated; with decay 0.9 the difference vanishes within ~50 steps).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import (farthest_point_sample, gather_point, group_point,
                   query_ball_point, three_interpolate, three_nn)

Params = Dict[str, Any]

POINTNET_CONV = [64, 64, 64, 128, 1024]
POINTNET_FC = [512, 256]
BN_DECAY = 0.9
BN_EPS = 1e-3

SA_LAYERS = [
    dict(npoint=1024, radius=0.1, nsample=32, mlp=[32, 32, 64]),
    dict(npoint=256, radius=0.2, nsample=32, mlp=[64, 64, 128]),
    dict(npoint=64, radius=0.4, nsample=32, mlp=[128, 128, 256]),
    dict(npoint=16, radius=0.8, nsample=32, mlp=[256, 256, 512]),
]
FP_LAYERS = [[256, 256], [256, 256], [256, 128], [128, 128, 128]]


def _mlp_params(rng, sizes):
    init = jax.nn.initializers.glorot_uniform()
    out = []
    for cin, cout in zip(sizes[:-1], sizes[1:]):
        rng, sub = jax.random.split(rng)
        out.append({"w": init(sub, (cin, cout), jnp.float32),
                    "b": jnp.zeros((cout,), jnp.float32)})
    return out


def _apply_mlp(layers, x, relu_last=True):
    for i, l in enumerate(layers):
        x = jnp.einsum("...c,cd->...d", x, l["w"],
                       preferred_element_type=jnp.float32) + l["b"]
        if relu_last or i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# PointNet
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PointNetConfig:
    num_point: int = 1024
    num_class: int = 13
    input_channels: int = 6


def pointnet_init(rng, cfg: PointNetConfig) -> Tuple[Params, Params]:
    r = jax.random.split(rng, 3)
    params = {
        "conv": _mlp_params(r[0], [cfg.input_channels] + POINTNET_CONV),
        "fc": _mlp_params(
            r[1], [POINTNET_CONV[-1] + POINTNET_CONV[1]] + POINTNET_FC
            + [cfg.num_class]),
        "bn_beta": [jnp.zeros((c,)) for c in POINTNET_FC],
        "bn_gamma": [jnp.ones((c,)) for c in POINTNET_FC],
    }
    bn_state = {
        "mean": [jnp.zeros((cfg.num_point, c)) for c in POINTNET_FC],
        "var": [jnp.ones((cfg.num_point, c)) for c in POINTNET_FC],
    }
    return params, bn_state


def pointnet_forward(params: Params, bn_state: Params, points: jnp.ndarray,
                     is_training: bool) -> Tuple[jnp.ndarray, Params]:
    """points (B, N, 6) -> logits (B, N, num_class), new_bn_state."""
    x = points
    feats = []
    for l in params["conv"]:
        x = jax.nn.relu(
            jnp.einsum("bnc,cd->bnd", x, l["w"],
                       preferred_element_type=jnp.float32) + l["b"])
        feats.append(x)
    pooled = jnp.max(x, axis=1, keepdims=True)
    # subtractive global feature (train_pointnet.py:59) + conv[1] skip
    concat = jnp.concatenate([x - pooled, feats[1]], axis=-1)

    new_state = {"mean": [], "var": []}
    h = concat
    for i in range(len(POINTNET_FC)):
        l = params["fc"][i]
        h = jnp.einsum("bnc,cd->bnd", h, l["w"],
                       preferred_element_type=jnp.float32) + l["b"]
        if is_training:
            mean = jnp.mean(h, axis=0)            # (N, C) — batch axis only
            var = jnp.var(h, axis=0)
            new_state["mean"].append(
                BN_DECAY * bn_state["mean"][i] + (1 - BN_DECAY) * mean)
            new_state["var"].append(
                BN_DECAY * bn_state["var"][i] + (1 - BN_DECAY) * var)
        else:
            mean = bn_state["mean"][i]
            var = bn_state["var"][i]
            new_state["mean"].append(bn_state["mean"][i])
            new_state["var"].append(bn_state["var"][i])
        h = ((h - mean) * jax.lax.rsqrt(var + BN_EPS)
             * params["bn_gamma"][i] + params["bn_beta"][i])
        h = jax.nn.relu(h)

    logits = jnp.einsum("bnc,cd->bnd", h, params["fc"][-1]["w"],
                        preferred_element_type=jnp.float32) \
        + params["fc"][-1]["b"]
    return logits, new_state


def pointnet_lr_schedule(step: jnp.ndarray, base_lr: float = 2e-4
                         ) -> jnp.ndarray:
    """Staircase exp decay: base * 0.5^(step // 500)
    (``train_pointnet.py:109``)."""
    return base_lr * jnp.power(0.5, jnp.floor(step / 500.0))


# ---------------------------------------------------------------------------
# PointNet++
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PointNet2Config:
    num_point: int = 1024
    num_class: int = 13
    input_channels: int = 6


def pointnet2_init(rng, cfg: PointNet2Config) -> Params:
    params = {"sa": [], "fp": [], "head": None}
    feat_ch = cfg.input_channels - 3
    sa_out = []
    for spec in SA_LAYERS:
        rng, sub = jax.random.split(rng)
        params["sa"].append(_mlp_params(sub, [feat_ch + 3] + spec["mlp"]))
        sa_out.append(spec["mlp"][-1])
        feat_ch = spec["mlp"][-1]
    # FP layers run top-down; input = interpolated coarse + skip fine feats
    skip_ch = [cfg.input_channels - 3] + sa_out[:-1]
    up_ch = sa_out[-1]
    for li, mlp in enumerate(FP_LAYERS):
        rng, sub = jax.random.split(rng)
        cin = up_ch + skip_ch[len(FP_LAYERS) - 1 - li]
        params["fp"].append(_mlp_params(sub, [cin] + mlp))
        up_ch = mlp[-1]
    rng, sub = jax.random.split(rng)
    params["head"] = _mlp_params(sub, [up_ch, 128, cfg.num_class])
    return params


def _sample_and_group(npoint, radius, nsample, xyz, points):
    """``train_pointnet.py:113-123`` on the ops tier."""
    new_xyz = gather_point(xyz, farthest_point_sample(xyz, npoint))
    idx, _cnt = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = group_point(xyz, idx) - new_xyz[:, :, None, :]
    if points is not None:
        grouped = jnp.concatenate([grouped_xyz, group_point(points, idx)],
                                  axis=-1)
    else:
        grouped = grouped_xyz
    return new_xyz, grouped


def _fp(xyz1, xyz2, points1, points2, mlp_params):
    """``train_pointnet.py:143-167``: inverse-distance 3-NN upsampling."""
    dist, idx = three_nn(xyz1, xyz2)
    dist = jnp.maximum(dist, 1e-10)
    inv = 1.0 / dist
    weight = inv / jnp.sum(inv, axis=2, keepdims=True)
    interp = three_interpolate(points2, idx, weight)
    if points1 is not None:
        interp = jnp.concatenate([interp, points1], axis=2)
    return _apply_mlp(mlp_params, interp)


def pointnet2_forward(params: Params, points: jnp.ndarray) -> jnp.ndarray:
    """points (B, N, 6) -> logits (B, N, num_class)."""
    xyz = [points[:, :, :3]]
    feats = [points[:, :, 3:]]
    for spec, mlp_params in zip(SA_LAYERS, params["sa"]):
        new_xyz, grouped = _sample_and_group(
            spec["npoint"], spec["radius"], spec["nsample"],
            xyz[-1], feats[-1])
        h = _apply_mlp(mlp_params, grouped)       # (B, np, ns, C)
        feats.append(jnp.max(h, axis=2))
        xyz.append(new_xyz)

    up = feats[-1]
    for li, mlp_params in enumerate(params["fp"]):
        lvl = len(SA_LAYERS) - 1 - li             # 3, 2, 1, 0
        up = _fp(xyz[lvl], xyz[lvl + 1], feats[lvl], up, mlp_params)

    return _apply_mlp(params["head"], up, relu_last=False)


# ---------------------------------------------------------------------------
# Shared loss / staging / augmentation
# ---------------------------------------------------------------------------

def seg_loss(logits: jnp.ndarray, labels: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                              axis=-1)[..., 0]
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return jnp.mean(ce), acc


def stage_blocks(points, cls_id, grid_resolution: float = 1.0,
                 num_point: int = 2048,
                 rng: Optional[Any] = None):
    """Grid-block staging (``train_pointnet.py:331-350``): round xy to a
    1m (3m KITTI) grid, recentre each cell by (cell center xy, min z),
    resample to ``num_point``."""
    import numpy as np
    rng = rng or np.random
    points = np.asarray(points)
    grid = np.round(points[:, :2] / grid_resolution).astype(int)
    out_pts, out_lbl = [], []
    uniq = np.unique(grid, axis=0)
    for g in uniq:
        m = np.all(grid == g, axis=1)
        gp = points[m, :6].copy()
        gp[:, :2] -= g * grid_resolution
        gp[:, 2] -= gp[:, 2].min()
        gl = np.asarray(cls_id)[m]
        subset = rng.choice(len(gp), num_point, replace=len(gp) < num_point)
        out_pts.append(gp[subset])
        out_lbl.append(gl[subset])
    return out_pts, out_lbl


def jitter_blocks(points, labels, rng):
    """Flip/scale/translate augmentation (``train_pointnet.py:235-246``)."""
    import numpy as np
    out = np.array(points, copy=True)
    for i in range(len(out)):
        if rng.randint(2):
            out[i, :, 0] = -out[i, :, 0]
        if rng.randint(2):
            out[i, :, 1] = -out[i, :, 1]
        c = rng.rand() * 0.5 + 0.75
        t = rng.rand(3) * 0.4 - 0.2
        out[i, :, :3] = out[i, :, :3] * c + t
    return out, labels
