"""MCPNet trainer + instance-segmentation inference.

Training parity with ``train_mcpnet.py:152-227``: per epoch, iterate local
chunks in random order, even-sample batches of 256 (16 per instance), run
triplet-semihard Adam(1e-3) steps, report kNN accuracy + ANOVA F stats.

Inference parity with ``test_mcpnet.py:109-146``: per-point embeddings
(batched on device — the reference runs batch-1 per point), voxel-adjacency
edges gated by embedding dot > 0.9, connected components, min cluster 10.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import h5py
import jax
import numpy as np
import optax

from ..data.mcp_staging import (even_sampling, local_chunks, stage_room_mcp)
from ..eval.components import connected_component_labels, voxel_adjacency_edges
from ..models import mcpnet
from ..utils.io import load_h5_rooms
from . import checkpoint as ckpt_lib


@dataclasses.dataclass
class MCPTrainConfig:
    batch_size: int = 256
    num_neighbors: int = 50
    # NOTE: the shipped ``train_mcpnet.py`` is bit-rotted (it feeds
    # ``input_pl`` with the neighbor tensor and never feeds ``neighbor_pl``,
    # ``train_mcpnet.py:197`` vs ``learn_region_grow_util.py:193-195``);
    # ``test_mcpnet.py:111-117`` defines the working protocol —
    # feature_size=6, point feature = staged (z, rgb) — which we follow for
    # both training and inference.
    feature_size: int = 6
    hidden_size: int = 200
    embedding_size: int = 10
    max_epoch: int = 50
    samples_per_instance: int = 16
    local_range: float = 2.0
    resolution: float = 0.1
    neighbor_radii: float = 0.3
    seed: int = 0
    data_dir: str = "data"
    models_dir: str = "models"


def get_acc(emb: np.ndarray, lb: np.ndarray) -> float:
    """1-NN (excluding self) label accuracy (``train_mcpnet.py:26-32``)."""
    d = np.sum((emb[:, None, :] - emb[None, :, :]) ** 2, axis=2)
    np.fill_diagonal(d, np.inf)
    nearest = np.argmin(d, axis=1)
    return float(np.mean(lb == lb[nearest]))


def get_anova(emb: np.ndarray, lb: np.ndarray) -> Tuple[float, float, float]:
    """Between/within-group variance + F (``train_mcpnet.py:34-51``)."""
    lid = list(set(lb.tolist()))
    class_mean = np.stack([emb[lb == i].mean(axis=0) for i in lid])
    overall = emb.mean(axis=0)
    bg = sum(np.sum((class_mean[i] - overall) ** 2) * np.sum(lb == lid[i])
             for i in range(len(lid)))
    bg /= max(len(lid) - 1, 1)
    wg = sum(np.sum((emb[lb == lid[i]] - class_mean[i]) ** 2)
             for i in range(len(lid)))
    wg /= max(len(lb) - len(lid), 1)
    f = 0.0 if wg == 0 else bg / wg
    return float(bg), float(wg), float(f)


def mcp_area_path(data_dir: str, area: str) -> str:
    return os.path.join(data_dir, f"mcp_area{area}.h5")


def stage_mcp_area(data_dir: str, area: str, cfg: MCPTrainConfig,
                   rooms_path: Optional[str] = None) -> str:
    """Write the reference's ``mcp_area%s.h5`` chunk format."""
    rooms_path = rooms_path or (
        os.path.join(data_dir, f"{area}.h5") if area.startswith("synthetic")
        or area in ("scannet", "s3dis") else
        os.path.join(data_dir, f"s3dis_area{area}.h5"))
    rooms, obj_ids, _cls = load_h5_rooms(rooms_path)
    rng = np.random.RandomState(cfg.seed)
    sp, snp, sl = [], [], []
    for rid in range(len(rooms)):
        pts, obj, nbr, _ = stage_room_mcp(
            rooms[rid], obj_ids[rid], cfg.resolution, cfg.num_neighbors,
            cfg.neighbor_radii, rng)
        chunks = local_chunks(pts, obj, nbr, cfg.batch_size * 2,
                              cfg.local_range, rng)
        for p, nb, lb in chunks:
            sp.append(p)
            snp.append(nb)
            sl.append(lb)
        print("area %s room %d %d points %d chunks" % (
            area, rid, len(pts), len(chunks)))
    out = mcp_area_path(data_dir, area)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with h5py.File(out, "w") as f:
        kw = dict(compression="gzip", compression_opts=4)
        f.create_dataset("points", data=np.asarray(sp, np.float32), **kw)
        f.create_dataset("neighbor_points", data=np.asarray(snp, np.float32),
                         **kw)
        f.create_dataset("labels", data=np.asarray(sl, np.int32), **kw)
    return out


def make_steps(cfg: MCPTrainConfig, feature_size: int):
    mcfg = mcpnet.MCPNetConfig(
        num_neighbors=cfg.num_neighbors, feature_size=feature_size,
        hidden_size=cfg.hidden_size, embedding_size=cfg.embedding_size)
    tx = optax.adam(1e-3)

    def init_fn(rng):
        params = mcpnet.init_params(rng, mcfg)
        return params, tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch):
        (loss, emb), grads = jax.value_and_grad(
            mcpnet.loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, emb

    @jax.jit
    def embed(params, point_feats, neighbor_feats):
        return mcpnet.forward(params, point_feats, neighbor_feats)

    return init_fn, train_step, embed


def fit(cfg: MCPTrainConfig, train_areas: List[str], val_area: Optional[str],
        verbose: bool = True):
    """Train on staged mcp_area H5 files (stage first if absent)."""
    fs = cfg.feature_size
    rng = np.random.RandomState(cfg.seed)
    tp, tn, tl = [], [], []
    for area in train_areas:
        path = mcp_area_path(cfg.data_dir, area)
        if not os.path.exists(path):
            stage_mcp_area(cfg.data_dir, area, cfg)
        with h5py.File(path, "r") as f:
            print("Loading %s ..." % path)
            tp.append(f["points"][:])                      # (chunk, S, 4)
            tn.append(f["neighbor_points"][:, :, :, :fs])  # (chunk, S, K, fs)
            tl.append(f["labels"][:])
    train_points = np.vstack(tp)
    train_neighbors = np.vstack(tn)
    train_labels = np.vstack(tl)

    init_fn, train_step, _ = make_steps(cfg, fs)
    params, opt_state = init_fn(jax.random.PRNGKey(cfg.seed))
    hist = {}
    for epoch in range(cfg.max_epoch):
        stats = {"loss": [], "acc": [], "bg": [], "wg": [], "f": []}
        for i in rng.permutation(len(train_points)):
            idx = even_sampling(train_labels[i], cfg.batch_size,
                                cfg.samples_per_instance, rng)
            idx = np.resize(idx, cfg.batch_size)
            batch = {
                "points": train_points[i][idx].astype(np.float32),
                "neighbors": train_neighbors[i][idx].astype(np.float32),
                "labels": train_labels[i][idx],
            }
            params, opt_state, loss, emb = train_step(params, opt_state,
                                                      batch)
            emb = np.asarray(emb)
            stats["loss"].append(float(loss))
            stats["acc"].append(get_acc(emb, batch["labels"]))
            bg, wg, f = get_anova(emb, batch["labels"])
            stats["bg"].append(bg)
            stats["wg"].append(wg)
            stats["f"].append(f)
        hist = {k: float(np.mean(v)) for k, v in stats.items()}
        if verbose:
            print("Epoch %d loss %.2f acc %.2f bg %.2f wg %.2f F %.2f" % (
                epoch, hist["loss"], hist["acc"], hist["bg"], hist["wg"],
                hist["f"]))
    return params, hist


def segment_rooms_mcp(params, cfg: MCPTrainConfig, rooms, obj_ids,
                      dp_threshold: float = 0.9,
                      min_cluster_size: int = 10,
                      embed_batch: int = 4096):
    """Instance segmentation via embedding-gated voxel connected components.

    Returns list of (cluster_label, obj_id_equalized, unequalized_idx).
    """
    _, _, embed = make_steps(cfg, cfg.feature_size)
    rng = np.random.RandomState(cfg.seed)
    results = []
    for rid in range(len(rooms)):
        pts, obj, nbr, uneq = stage_room_mcp(
            rooms[rid], obj_ids[rid], cfg.resolution, cfg.num_neighbors,
            cfg.neighbor_radii, rng)
        n = len(pts)
        emb = np.zeros((n, cfg.embedding_size), np.float32)
        point_feats = pts[:, 2:6].astype(np.float32)
        nbr_feats = nbr[:, :, :cfg.feature_size].astype(np.float32)
        for s in range(0, n, embed_batch):
            e = min(s + embed_batch, n)
            pf = np.zeros((embed_batch, point_feats.shape[1]), np.float32)
            nf = np.zeros((embed_batch,) + nbr_feats.shape[1:], np.float32)
            pf[:e - s] = point_feats[s:e]
            nf[:e - s] = nbr_feats[s:e]
            emb[s:e] = np.asarray(embed(params, pf, nf))[:e - s]

        src, dst = voxel_adjacency_edges(pts[:, :3], cfg.resolution)
        gate = np.sum(emb[src] * emb[dst], axis=1) > dp_threshold
        labels = connected_component_labels(n, src[gate], dst[gate],
                                            min_cluster_size)
        results.append((labels, obj, uneq, emb))
    return results


def save_model(cfg: MCPTrainConfig, params, val_area: str) -> str:
    path = os.path.join(cfg.models_dir, f"mcpnet_model{val_area}.npz")
    ckpt_lib.save_checkpoint(path, params, config=dataclasses.asdict(cfg))
    print(f"Saved model to {path}")
    return path
