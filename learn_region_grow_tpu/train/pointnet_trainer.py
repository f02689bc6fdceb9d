"""Trainer for the PointNet / PointNet++ benchmark nets.

Protocol parity with ``train_pointnet.py:293-438``: rooms are grid-block
staged to (blocks, 2048, 6) once, each step resamples 1024 points per block
without replacement, applies flip/scale/translate jitter, and optimizes
softmax CE. PointNet uses Adam with staircase LR decay 2e-4 * 0.5^(step//500)
and EMA batch-norm state; PointNet++ uses Adam(1e-3). Validation every 10
epochs; checkpoints named ``{mode}_model{val_area}``.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import List, Optional, Tuple

import jax
import numpy as np
import optax

from ..models import pointnet as pn
from ..utils.io import load_h5_rooms
from . import checkpoint as ckpt_lib


@dataclasses.dataclass
class PointNetTrainConfig:
    mode: str = "pointnet"            # pointnet | pointnet2
    batch_size: int = 100
    num_point: int = 1024
    staged_point: int = 2048
    max_epoch: int = 50
    val_step: int = 10
    num_class: int = 13
    seed: int = 0
    data_dir: str = "data"
    models_dir: str = "models"
    cross_domain: bool = False


def area_rooms_path(data_dir: str, area: str) -> str:
    if area in ("scannet", "s3dis", "kitti_train", "kitti_val") or \
            area.startswith("synthetic"):
        return os.path.join(data_dir, f"{area}.h5")
    return os.path.join(data_dir, f"s3dis_area{area}.h5")


def stage_areas(cfg: PointNetTrainConfig, areas: List[str],
                rng: np.random.RandomState
                ) -> Tuple[np.ndarray, np.ndarray]:
    pts, lbl = [], []
    for area in areas:
        rooms, _obj, cls = load_h5_rooms(area_rooms_path(cfg.data_dir, area))
        grid_res = 3.0 if "kitti" in area else 1.0
        for rid in range(len(rooms)):
            p, l = pn.stage_blocks(rooms[rid], cls[rid],
                                   grid_resolution=grid_res,
                                   num_point=cfg.staged_point, rng=rng)
            pts.extend(p)
            lbl.extend(l)
    return (np.asarray(pts, np.float32),
            np.asarray(lbl, np.int32))


def make_steps(cfg: PointNetTrainConfig):
    if cfg.mode == "pointnet":
        mcfg = pn.PointNetConfig(num_point=cfg.num_point,
                                 num_class=cfg.num_class)
        tx = optax.adam(optax.exponential_decay(2e-4, 500, 0.5,
                                                staircase=True))

        def init_fn(rng):
            params, bn = pn.pointnet_init(rng, mcfg)
            return params, bn, tx.init(params)

        def loss_fn(params, bn, batch, training):
            logits, new_bn = pn.pointnet_forward(params, bn, batch["points"],
                                                 training)
            loss, acc = pn.seg_loss(logits, batch["labels"])
            return loss, (acc, new_bn)

        @jax.jit
        def train_step(params, bn, opt_state, batch):
            (loss, (acc, new_bn)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bn, batch, True)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bn, opt_state, loss, acc

        @jax.jit
        def eval_step(params, bn, batch):
            loss, (acc, _) = loss_fn(params, bn, batch, False)
            return loss, acc

        return init_fn, train_step, eval_step

    if cfg.mode == "pointnet2":
        mcfg = pn.PointNet2Config(num_point=cfg.num_point,
                                  num_class=cfg.num_class)
        tx = optax.adam(1e-3)

        def init_fn(rng):
            params = pn.pointnet2_init(rng, mcfg)
            return params, {}, tx.init(params)

        def loss_fn(params, batch):
            logits = pn.pointnet2_forward(params, batch["points"])
            return pn.seg_loss(logits, batch["labels"])

        @jax.jit
        def train_step(params, bn, opt_state, batch):
            (loss, acc), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, bn, opt_state, loss, acc

        @jax.jit
        def eval_step(params, bn, batch):
            return loss_fn(params, batch)

        return init_fn, train_step, eval_step

    raise ValueError(f"unknown mode {cfg.mode}")


def fit(cfg: PointNetTrainConfig, train_areas: List[str],
        val_areas: Optional[List[str]] = None, verbose: bool = True):
    rng = np.random.RandomState(cfg.seed)
    train_pts, train_lbl = stage_areas(cfg, train_areas, rng)
    val_pts, val_lbl = (stage_areas(cfg, val_areas, rng)
                        if val_areas else (None, None))
    if verbose:
        print("Train Points", train_pts.shape)
        if val_pts is not None:
            print("Validation Points", val_pts.shape)

    init_fn, train_step, eval_step = make_steps(cfg)
    params, bn, opt_state = init_fn(jax.random.PRNGKey(cfg.seed))

    def make_batch(pts, lbl, sel):
        if cfg.num_point == pts.shape[1]:
            bp, bl = pts[sel], lbl[sel]
        else:
            bp = np.empty((len(sel), cfg.num_point, 6), np.float32)
            bl = np.empty((len(sel), cfg.num_point), np.int32)
            for i, s in enumerate(sel):
                sub = rng.choice(pts.shape[1], cfg.num_point, replace=False)
                bp[i] = pts[s, sub]
                bl[i] = lbl[s, sub]
        return bp, bl

    hist = {}
    for epoch in range(cfg.max_epoch):
        idx = rng.permutation(len(train_pts))
        num_batches = len(train_pts) // cfg.batch_size
        losses, accs = [], []
        t0 = time.time()
        for b in range(num_batches):
            sel = idx[b * cfg.batch_size:(b + 1) * cfg.batch_size]
            bp, bl = make_batch(train_pts, train_lbl, sel)
            bp, bl = pn.jitter_blocks(bp, bl, rng)
            params, bn, opt_state, loss, acc = train_step(
                params, bn, opt_state,
                {"points": bp, "labels": bl.astype(np.int32)})
            losses.append(float(loss))
            accs.append(float(acc))
        hist = {"loss": float(np.mean(losses)) if losses else float("nan"),
                "acc": float(np.mean(accs)) if accs else float("nan"),
                "epoch_time": time.time() - t0}
        if verbose:
            print("Epoch: %d Loss: %.3f (cls %.3f)" % (
                epoch, hist["loss"], hist["acc"]))

        if (val_pts is not None and len(val_pts)
                and epoch % cfg.val_step == cfg.val_step - 1):
            vl, va = [], []
            for b in range(max(1, len(val_pts) // cfg.batch_size)):
                sel = np.arange(b * cfg.batch_size,
                                min((b + 1) * cfg.batch_size, len(val_pts)))
                if len(sel) == 0:
                    break
                sel = np.resize(sel, cfg.batch_size)
                bp, bl = make_batch(val_pts, val_lbl, sel)
                loss, acc = eval_step(params, bn,
                                      {"points": bp,
                                       "labels": bl.astype(np.int32)})
                vl.append(float(loss))
                va.append(float(acc))
            if verbose:
                print("Validation: %d Loss: %.3f (cls %.3f)" % (
                    epoch, np.mean(vl), np.mean(va)))

    return params, bn, hist


def model_path(cfg: PointNetTrainConfig, val_area: str,
               train_area: Optional[str] = None) -> str:
    if cfg.cross_domain:
        return os.path.join(cfg.models_dir, "cross_domain",
                            f"{cfg.mode}_{train_area}.npz")
    return os.path.join(cfg.models_dir, f"{cfg.mode}_model{val_area}.npz")


def save_model(cfg: PointNetTrainConfig, params, bn, val_area: str,
               train_area: Optional[str] = None) -> str:
    path = model_path(cfg, val_area, train_area)
    tree = {"params": params}
    if bn:
        tree["bn"] = bn
    ckpt_lib.save_checkpoint(path, tree, config=dataclasses.asdict(cfg))
    print(f"Saved model to {path}")
    return path
