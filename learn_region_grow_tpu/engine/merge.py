"""Completeness-gated fragment merging (greedy-commit post-pass).

Large planar instances fragment at scale: the greedy engine commits a
region when growth stalls (the reference's stuck-twice rule,
``test_region_grow.py:208-217``), so a 170k-point floor can end up as
several clusters (results/fused_cap.txt: 58 predicted vs 29 GT at the
524k cap). The trained completeness head (``models/lrgnet.py`` complete
head, held-out r=0.91 vs the simulator's IoU-vs-GT completeness target)
scores how "finished" a region looks; this post-pass merges ADJACENT
clusters whenever the union scores decisively more complete than either
part alone:

    cp(A u B) > max(cp(A), cp(B)) + margin

iterated to a fixed point. A wrong merge (two genuinely distinct
instances) presents like an over-grown region — the very pattern the
head was trained to score low via the simulator's mistake injection —
so the gate is selective, not just a size heuristic.

Regions are presented to the network exactly as during growth
(``engine.grow.make_grow_step``): num_inlier samples from the region,
num_neighbor samples from its +-1-voxel bbox neighborhood, recentered by
the region's median over xy + feature cols 6:
(``test_region_grow.py:241-247``).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.voxel import pack_voxels
from ..models import lrgnet
from .grow import _recenter_cols


def _sample(rng: np.random.RandomState, idx: np.ndarray, k: int
            ) -> np.ndarray:
    if len(idx) >= k:
        return rng.choice(idx, k, replace=False)
    return idx[rng.randint(0, len(idx), k)]


def score_regions(params, model_cfg: lrgnet.LrgNetConfig, rf,
                  regions: List[np.ndarray], num_inlier: int = 512,
                  num_neighbor: int = 512, seed: int = 0) -> np.ndarray:
    """Completeness-head scores (B,) for B regions (index arrays into the
    room's equalized points), one batched forward."""
    if "complete_head" not in params:
        raise ValueError(
            "fragment merging needs a checkpoint trained with the "
            "completeness head (TrainConfig.completeness_head)")
    rng = np.random.RandomState(seed)
    pts = rf.points
    vox = rf.voxels
    f = pts.shape[1]
    cols = _recenter_cols(f)
    b = len(regions)
    inl = np.zeros((b, num_inlier, f), np.float32)
    nbr = np.zeros((b, num_neighbor, f), np.float32)
    for i, idx in enumerate(regions):
        inside = np.zeros(len(pts), bool)
        inside[idx] = True
        lo = vox[idx].min(axis=0) - 1
        hi = vox[idx].max(axis=0) + 1
        nb_mask = (~inside & np.all(vox >= lo, axis=1)
                   & np.all(vox <= hi, axis=1))
        nb_idx = np.flatnonzero(nb_mask)
        center = np.median(pts[idx][:, cols], axis=0)
        offset = np.zeros(f, np.float32)
        offset[cols] = center
        inl[i] = pts[_sample(rng, idx, num_inlier)] - offset
        if len(nb_idx):
            nbr[i] = pts[_sample(rng, nb_idx, num_neighbor)] - offset
        # no neighborhood (isolated region): zeros — the head still sees
        # the inlier geometry; growth would have terminated here anyway
    out = lrgnet.forward(params, jnp.asarray(inl), jnp.asarray(nbr),
                         model_cfg)
    return np.asarray(jax.device_get(out["complete"]))


def _adjacent_pairs(vox: np.ndarray, labels: np.ndarray
                    ) -> List[Tuple[int, int]]:
    """Cluster pairs with +-1-voxel adjacent members (26-neighborhood),
    via 13 half-offset searchsorted passes over the packed voxel keys."""
    keys, origin, dims = pack_voxels(vox)
    order = np.argsort(keys)
    sk = keys[order]
    sl = labels[order]
    pairs = set()
    offs = [(dx, dy, dz)
            for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
            if (dx, dy, dz) > (0, 0, 0)]
    for dx, dy, dz in offs:
        qk = sk + (dx * dims[1] + dy) * dims[2] + dz
        pos = np.searchsorted(sk, qk)
        pos = np.minimum(pos, len(sk) - 1)
        hit = sk[pos] == qk
        la, lb = sl[hit], sl[pos[hit]]
        for a, b in zip(la[la != lb], lb[la != lb]):
            pairs.add((min(a, b), max(a, b)))
    return sorted(pairs)


def merge_fragments(params, model_cfg: lrgnet.LrgNetConfig, rf,
                    labels: np.ndarray, *, num_inlier: int = 512,
                    num_neighbor: int = 512, margin: float = 0.02,
                    max_rounds: int = 8, seed: int = 0
                    ) -> Tuple[np.ndarray, Dict]:
    """Merge adjacent clusters while the union's completeness beats both
    parts by ``margin``. Returns (new_labels, report)."""
    labels = np.asarray(labels).copy()
    report = {"rounds": 0, "merges": 0, "pairs_scored": 0}
    members = {c: np.flatnonzero(labels == c)
               for c in np.unique(labels) if c > 0}
    scores = {}
    for rnd in range(max_rounds):
        report["rounds"] = rnd + 1
        pairs = [pq for pq in _adjacent_pairs(rf.voxels, labels)
                 if pq[0] > 0]
        if not pairs:
            break
        need = [c for c in members if c not in scores]
        if need:
            sc = score_regions(params, model_cfg, rf,
                               [members[c] for c in need],
                               num_inlier, num_neighbor, seed=seed)
            scores.update(dict(zip(need, sc)))
        union_sc = score_regions(
            params, model_cfg, rf,
            [np.concatenate([members[a], members[b]]) for a, b in pairs],
            num_inlier, num_neighbor, seed=seed)
        report["pairs_scored"] += len(pairs)
        gains = [union_sc[i] - max(scores[a], scores[b])
                 for i, (a, b) in enumerate(pairs)]
        cand = sorted(
            (g, a, b, u) for (a, b), g, u in zip(pairs, gains, union_sc)
            if g > margin)
        if not cand:
            break
        touched = set()
        merged_any = False
        for g, a, b, u in reversed(cand):       # best gain first
            if a in touched or b in touched:
                continue
            labels[labels == b] = a
            members[a] = np.concatenate([members[a], members.pop(b)])
            scores[a] = u
            scores.pop(b, None)
            touched.update((a, b))
            report["merges"] += 1
            merged_any = True
        if not merged_any:
            break
    return labels, report
