"""LrgNet trainer: staged-H5 in, fixed-shape device batches, sharded steps.

Mirrors the reference training protocol (``train_region_grow.py``):
* per-epoch reload of a different multiseed shard (``--multiseed``),
* empty-neighbor sample filtering,
* per-sample resampling to exactly (NUM_INLIER, NUM_NEIGHBOR) points —
  without replacement when enough points, take-all + with-replacement fill
  otherwise (``train_region_grow.py:159-174``),
* Adam(1e-3), epoch metrics line, validation every VAL_STEP epochs.

TPU-first differences: the train step is one jitted+sharded program (forward,
both losses, backward, Adam update fused by XLA); batches are data-parallel
over the ``dp`` mesh axis; resampling is vectorized host work overlapped with
device steps by JAX's async dispatch.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import lrgnet
from ..parallel import mesh as mesh_lib
from ..utils.io import load_staged_h5
from . import checkpoint as ckpt_lib


@dataclasses.dataclass
class TrainConfig:
    batch_size: int = 100
    num_inlier: int = 512
    num_neighbor: int = 512
    max_epoch: int = 50
    val_step: int = 7
    feature_size: int = 13
    multiseed: int = 8
    lite: Optional[int] = None
    learning_rate: float = 1e-3
    seed: int = 0
    data_dir: str = "data"
    models_dir: str = "models"
    cross_domain: bool = False
    completeness_head: bool = False
    compute_dtype: str = "float32"
    tp: int = 1
    # mid-training checkpoint cadence (epochs; 0 = end-only like the
    # reference) + resume. The resumed np.random stream restarts at the
    # resume epoch's permutation seed, so resumed runs are reproducible
    # given the same (seed, resume epoch) but differ from an uninterrupted
    # run's exact batch order.
    checkpoint_every: int = 0
    checkpoint_path: Optional[str] = None
    resume_from: Optional[str] = None
    # train on embedding-conditioned (19-d) staged data
    # (``embedding_area{A}.h5`` naming, cli/stage_embedding_data.py; the
    # checkpoint is named lrgnet_emb_model{val} for cli/test_region_grow_emb)
    emb: bool = False

    def model_config(self) -> lrgnet.LrgNetConfig:
        return lrgnet.LrgNetConfig(
            feature_size=self.feature_size,
            lite=self.lite,
            completeness_head=self.completeness_head,
            compute_dtype=jnp.bfloat16 if self.compute_dtype == "bfloat16"
            else jnp.float32,
        )


class SampleSet:
    """Per-sample ragged arrays (inlier pts, remove labels, neighbor pts,
    add labels[, completeness score]) with fast fixed-shape batch
    resampling."""

    def __init__(self, inlier_pts, remove, neighbor_pts, add, complete=None):
        # filter samples with empty neighbor arrays (train_region_grow.py:125-136)
        keep = [i for i in range(len(neighbor_pts)) if len(neighbor_pts[i]) > 0]
        self.inlier_pts = [np.ascontiguousarray(inlier_pts[i], np.float32) for i in keep]
        self.remove = [np.asarray(remove[i], np.int32) for i in keep]
        self.neighbor_pts = [np.ascontiguousarray(neighbor_pts[i], np.float32) for i in keep]
        self.add = [np.asarray(add[i], np.int32) for i in keep]
        if complete is not None:
            self.complete = [float(complete[i]) for i in keep]
        else:
            self.complete = None

    def __len__(self):
        return len(self.inlier_pts)

    def extend(self, other: "SampleSet"):
        self.inlier_pts += other.inlier_pts
        self.remove += other.remove
        self.neighbor_pts += other.neighbor_pts
        self.add += other.add
        if self.complete is not None and other.complete is not None:
            self.complete += other.complete

    def batch(self, idx: Sequence[int], num_inlier: int, num_neighbor: int,
              rng: np.random.RandomState,
              with_complete: bool = False) -> Dict[str, np.ndarray]:
        b = len(idx)
        f = self.inlier_pts[0].shape[1]
        inlier = np.empty((b, num_inlier, f), np.float32)
        neighbor = np.empty((b, num_neighbor, f), np.float32)
        add = np.empty((b, num_neighbor), np.int32)
        remove = np.empty((b, num_inlier), np.int32)
        for j, i in enumerate(idx):
            sub = _resample_idx(len(self.inlier_pts[i]), num_inlier, rng)
            inlier[j] = self.inlier_pts[i][sub]
            remove[j] = self.remove[i][sub]
            sub = _resample_idx(len(self.neighbor_pts[i]), num_neighbor, rng)
            neighbor[j] = self.neighbor_pts[i][sub]
            add[j] = self.add[i][sub]
        out = {"inlier": inlier, "neighbor": neighbor,
               "add": add, "remove": remove}
        if with_complete and self.complete is not None:
            out["complete"] = np.array([self.complete[i] for i in idx],
                                       np.float32)
        return out


def _resample_idx(n: int, k: int, rng: np.random.RandomState) -> np.ndarray:
    """Reference resampling rule: choice-without-replacement when n >= k,
    identity + with-replacement fill otherwise."""
    if n >= k:
        return rng.choice(n, k, replace=False)
    return np.concatenate([np.arange(n), rng.choice(n, k - n, replace=True)])


def staged_path(data_dir: str, area: str, seed: Optional[int]) -> str:
    """File naming mirroring ``train_region_grow.py:71-80`` /
    ``stage_data.py:242-248`` (npz-era H5 names kept identical)."""
    if area.startswith("synthetic"):
        return os.path.join(data_dir, f"staged_{area}.h5")
    if seed is None:
        return os.path.join(data_dir, f"staged_area{area}.h5")
    return os.path.join(data_dir, "multiseed", f"seed{seed}_area{area}.h5")


def load_sample_set(paths: Sequence[str], feature_size: int) -> SampleSet:
    merged: Optional[SampleSet] = None
    for p in paths:
        if not os.path.exists(p):
            continue
        print(f"Loading {p} ...")
        staged = load_staged_h5(p, feature_size=feature_size)
        ss = SampleSet(*staged.split(), complete=staged.complete)
        merged = ss if merged is None else (merged.extend(ss) or merged)
    if merged is None:
        merged = SampleSet([], [], [], [], complete=[])
    return merged


def make_train_step(cfg: TrainConfig, mesh=None):
    """Build (init_fn, train_step, eval_step). Steps are jitted; with a mesh
    the batch is dp-sharded and wide params tp-sharded."""
    mcfg = cfg.model_config()
    tx = optax.adam(cfg.learning_rate)

    def init_fn(rng):
        params = lrgnet.init_params(rng, mcfg)
        if mesh is not None:
            # place params under the tp sharding rule; Adam moments follow
            params = jax.device_put(params,
                                    mesh_lib.param_sharding(params, mesh))
            return params, jax.jit(tx.init)(params)
        return params, tx.init(params)

    def train_step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(
            lrgnet.loss_fn, has_aux=True)(params, batch, mcfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    def eval_step(params, batch):
        _, metrics = lrgnet.loss_fn(params, batch, mcfg)
        return metrics

    if mesh is not None:
        bs = mesh_lib.batch_sharding(mesh)
        # params/opt keep their placement (tp rule from init_fn);
        # batch is dp-sharded on its leading axis
        train_step = jax.jit(train_step, in_shardings=(None, None, bs),
                             donate_argnums=(0, 1))
        eval_step = jax.jit(eval_step, in_shardings=(None, bs))
    else:
        train_step = jax.jit(train_step, donate_argnums=(0, 1))
        eval_step = jax.jit(eval_step)
    return init_fn, train_step, eval_step


def fit(cfg: TrainConfig, train_areas: List[str],
        val_areas: Optional[List[str]] = None,
        mesh=None, verbose: bool = True) -> Tuple[dict, dict]:
    """Full training run. Returns (params, summary)."""
    rng = np.random.RandomState(cfg.seed)
    init_fn, train_step, eval_step = make_train_step(cfg, mesh)
    params, opt_state = init_fn(jax.random.PRNGKey(cfg.seed))

    start_epoch = 0
    if cfg.resume_from and os.path.exists(
            cfg.resume_from if cfg.resume_from.endswith(".npz")
            else cfg.resume_from + ".npz"):
        loaded, start_epoch, _ = ckpt_lib.load_checkpoint(cfg.resume_from)
        opt_state = ckpt_lib.load_opt_state(cfg.resume_from, opt_state)
        if mesh is not None:
            # params take the tp sharding rule; restored Adam moments start
            # replicated and follow the params' sharding after the first
            # jitted update
            loaded = jax.device_put(loaded,
                                    mesh_lib.param_sharding(loaded, mesh))
        params = loaded
        if verbose:
            print(f"Resumed from {cfg.resume_from} at epoch {start_epoch}")

    train_set: Optional[SampleSet] = None
    val_set: Optional[SampleSet] = None
    epoch_times = []
    last_metrics: Dict[str, float] = {}

    for epoch in range(start_epoch, cfg.max_epoch):
        # deterministic per-epoch permutation stream so a resumed run draws
        # the same batches for this epoch as a fresh run reaching it
        rng = np.random.RandomState(cfg.seed + 7919 * (epoch + 1))
        reload_needed = train_set is None or cfg.multiseed > 1
        if reload_needed:
            val_epoch = (
                val_areas is not None
                and (cfg.multiseed == 0 and epoch % cfg.val_step == 0
                     or cfg.multiseed > 0
                     and epoch % cfg.val_step == cfg.val_step - 1)
            )
            seed = epoch % cfg.multiseed if cfg.multiseed > 0 else None
            if cfg.emb:
                from ..data.embedding_staging import embedding_staged_path
                path_fn = embedding_staged_path
            else:
                path_fn = staged_path
            train_paths = [
                path_fn(cfg.data_dir, a,
                        seed if not a.startswith("synthetic") else None)
                for a in train_areas
            ]
            train_set = load_sample_set(train_paths, cfg.feature_size)
            if val_epoch or (val_areas and val_set is None):
                val_paths = [path_fn(cfg.data_dir, a, None)
                             for a in (val_areas or [])]
                val_set = load_sample_set(val_paths, cfg.feature_size)
        if len(train_set) < cfg.batch_size:
            if verbose:
                print(f"Epoch {epoch}: not enough samples "
                      f"({len(train_set)} < {cfg.batch_size}), skipping")
            continue

        idx = rng.permutation(len(train_set))
        num_batches = len(train_set) // cfg.batch_size
        agg = []
        t0 = time.time()
        for b in range(num_batches):
            sel = idx[b * cfg.batch_size:(b + 1) * cfg.batch_size]
            batch = train_set.batch(sel, cfg.num_inlier, cfg.num_neighbor,
                                    rng, with_complete=cfg.completeness_head)
            if mesh is not None:
                batch = mesh_lib.shard_batch(batch, mesh)
            params, opt_state, metrics = train_step(params, opt_state, batch)
            agg.append(metrics)
        epoch_times.append(time.time() - t0)
        m = {k: float(np.mean([jax.device_get(a[k]) for a in agg]))
             for k in agg[0]}
        last_metrics = m
        if verbose:
            print("Epoch %d loss %.2f add %.2f/%.2f rmv %.2f/%.2f" % (
                epoch, m["loss"], m["add_prc"], m["add_rcl"],
                m["remove_prc"], m["remove_rcl"]))

        if (val_areas is not None and val_set is not None and len(val_set)
                and epoch % cfg.val_step == cfg.val_step - 1):
            vagg = []
            vidx = np.arange(len(val_set))
            for b in range(max(1, len(val_set) // cfg.batch_size)):
                sel = vidx[b * cfg.batch_size:(b + 1) * cfg.batch_size]
                if len(sel) == 0:
                    break
                sel = np.resize(sel, cfg.batch_size)
                batch = val_set.batch(sel, cfg.num_inlier, cfg.num_neighbor,
                                      rng, with_complete=cfg.completeness_head)
                if mesh is not None:
                    batch = mesh_lib.shard_batch(batch, mesh)
                vagg.append(eval_step(params, batch))
            vm = {k: float(np.mean([jax.device_get(a[k]) for a in vagg]))
                  for k in vagg[0]}
            if verbose:
                print("Validation %d loss %.2f add %.2f/%.2f rmv %.2f/%.2f" % (
                    epoch, vm["loss"], vm["add_prc"], vm["add_rcl"],
                    vm["remove_prc"], vm["remove_rcl"]))

        if (cfg.checkpoint_every > 0 and cfg.checkpoint_path
                and (epoch + 1) % cfg.checkpoint_every == 0):
            # step records the NEXT epoch to run, so resume_from continues
            # exactly where this run stopped
            ckpt_lib.save_checkpoint(
                cfg.checkpoint_path, params,
                config=dataclasses.asdict(cfg),
                opt_state=opt_state, step=epoch + 1)
            if verbose:
                print(f"Checkpoint @ epoch {epoch + 1} -> "
                      f"{cfg.checkpoint_path}")

    summary = {
        "avg_epoch_time": float(np.mean(epoch_times)) if epoch_times else 0.0,
        "epochs": cfg.max_epoch,
        **{f"final_{k}": v for k, v in last_metrics.items()},
    }
    if verbose and epoch_times:
        print("Avg Epoch Time: %.3f" % summary["avg_epoch_time"])
    return params, summary


def save_model(cfg: TrainConfig, params, val_area: str,
               train_area: Optional[str] = None) -> str:
    path = ckpt_lib.lrgnet_model_path(
        cfg.models_dir, val_area, cfg.feature_size, cfg.num_inlier,
        cfg.num_neighbor, cfg.lite, cfg.cross_domain, train_area,
        emb=cfg.emb)
    ckpt_lib.save_checkpoint(path, params, config=dataclasses.asdict(cfg))
    print(f"Saved model to {path}")
    return path
