"""Faithful reference-protocol runner — the measured performance baseline.

Replicates the reference's inference PROTOCOL (``test_region_grow.py:183-316``)
on this stack so ``bench.py --reference-protocol`` can MEASURE the baseline
the batched engine is compared against, instead of assuming one:

* strictly sequential seeds in ascending-curvature order, one region at a
  time (no lane batching);
* ONE batch-1 network forward per grow step (a full host->device->host
  round-trip per step, like the reference's per-step ``sess.run``);
* host-side NumPy/Python bookkeeping per step: bbox candidate masking,
  ``numpy.random.choice`` resampling, full-cloud ``numpy.median`` recentering,
  Bernoulli thresholding, and the reference's VOXEL-SET update — Python sets
  of voxel tuples plus an O(N) per-point membership loop
  (``test_region_grow.py:270-287``).

Deviations (both make the measured baseline FASTER, i.e. conservative for
``vs_baseline`` claims): the forward is a jitted JAX call instead of a TF1
``sess.run`` of the full loss graph, and the unlabeled-point fill uses the
shared cKDTree helper instead of a per-point distance loop.

The runner doubles as the exact-semantics oracle for engine variants: it is
the reference algorithm verbatim (same RNG class, same update rule), so its
NMI on a fixture is the number batched/fused engines must match.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Tuple

import jax
import numpy as np

from ..core.features import RoomFeatures
from ..models import lrgnet
from .grow import GrowConfig, RoomResult, fill_unlabeled


@partial(jax.jit, static_argnums=(0,))
def _forward_confidences(model_cfg, params, inlier, neighbor):
    out = lrgnet.forward(params, inlier, neighbor, model_cfg)
    add_conf = jax.nn.softmax(out["add_logits"][0], axis=-1)[:, 1]
    rmv_conf = jax.nn.softmax(out["remove_logits"][0], axis=-1)[:, 1]
    return add_conf, rmv_conf


def _resample(n: int, k: int, rng: np.random.RandomState) -> np.ndarray:
    """Reference rule (test_region_grow.py:237-252): without replacement
    when enough points, natural order + with-replacement fill otherwise."""
    if n >= k:
        return rng.choice(n, k, replace=False)
    return np.concatenate([np.arange(n),
                           rng.choice(n, k - n, replace=True)]).astype(int)


def run_reference_protocol(params, model_cfg: lrgnet.LrgNetConfig,
                           rooms: List[RoomFeatures], cfg: GrowConfig,
                           verbose: bool = False
                           ) -> Tuple[List[RoomResult], Dict[str, float]]:
    """Segment rooms with the reference's sequential host-loop protocol.

    Returns (per-room results, phase timing dict with the reference's
    ``net/neighbor/inlier`` phase names, test_region_grow.py:40-51).
    """
    rng = np.random.RandomState(cfg.seed)
    timing = {"net": 0.0, "neighbor": 0.0, "inlier": 0.0}
    results: List[RoomResult] = []

    for rf in rooms:
        n = len(rf.points)
        points = rf.points.astype(np.float64)
        point_voxels = rf.voxels
        voxel_key = [tuple(v) for v in point_voxels]
        order = np.argsort(rf.curvatures, kind="stable")
        visited = np.zeros(n, bool)
        cluster_label = np.zeros(n, int)
        cluster_id = 1
        inst_logs: List[dict] = []
        t_room = time.time()

        for seed in order:
            if visited[seed]:
                continue
            target_id = rf.obj_id[seed]
            gt_mask = rf.obj_id == target_id
            current = np.zeros(n, bool)
            current[seed] = True
            min_dims = point_voxels[seed].copy()
            max_dims = point_voxels[seed].copy()
            seq_min = min_dims.copy()
            seq_max = max_dims.copy()
            steps = 0
            stuck = 0
            add_acc = rmv_acc = 0.0
            reason = ""

            while True:
                t0 = time.time()
                nb_mask = (np.all(point_voxels >= min_dims - 1, axis=1)
                           & np.all(point_voxels <= max_dims + 1, axis=1)
                           & ~current & ~visited)
                cur_idx = np.nonzero(current)[0]
                nb_idx = np.nonzero(nb_mask)[0]
                if len(nb_idx) == 0:
                    reason = "noneighbor"
                    break
                if steps >= cfg.max_steps:
                    reason = "maxsteps"
                    break

                in_sub = cur_idx[_resample(len(cur_idx), cfg.num_inlier, rng)]
                nb_sub = nb_idx[_resample(len(nb_idx), cfg.num_neighbor, rng)]
                center = np.median(points[cur_idx], axis=0)
                offset = np.zeros(points.shape[1])
                offset[:2] = center[:2]
                offset[6:] = center[6:]
                inlier_pts = (points[in_sub] - offset)[None].astype(np.float32)
                neighbor_pts = (points[nb_sub] - offset)[None].astype(np.float32)
                timing["neighbor"] += time.time() - t0

                t0 = time.time()
                add_conf, rmv_conf = _forward_confidences(
                    model_cfg, params, inlier_pts, neighbor_pts)
                add_conf = np.asarray(jax.device_get(add_conf))
                rmv_conf = np.asarray(jax.device_get(rmv_conf))
                timing["net"] += time.time() - t0

                t0 = time.time()
                add_dec = rng.random_sample(len(add_conf)) < add_conf
                rmv_dec = rng.random_sample(len(rmv_conf)) < rmv_conf
                add_lbl = gt_mask[nb_sub]
                rmv_lbl = ~gt_mask[in_sub]
                add_acc = float(np.mean((add_conf > 0.5) == add_lbl))
                rmv_acc = float(np.mean((rmv_conf > 0.5) == rmv_lbl))

                # the reference's voxel-set update: Python sets of voxel
                # tuples + O(N) membership loop (test_region_grow.py:270-287)
                add_set = set(voxel_key[i] for i in nb_sub[add_dec])
                rmv_set = set(voxel_key[i] for i in in_sub[rmv_dec])
                updated = False
                for i in range(n):
                    if not current[i] and voxel_key[i] in add_set:
                        current[i] = True
                        updated = True
                    if voxel_key[i] in rmv_set:
                        current[i] = False
                steps += 1
                timing["inlier"] += time.time() - t0

                if updated and current.any():
                    min_dims = point_voxels[current].min(axis=0)
                    max_dims = point_voxels[current].max(axis=0)
                    if (not np.any(min_dims < seq_min)
                            and not np.any(max_dims > seq_max)):
                        if stuck >= 1:
                            reason = "stuck"
                            break
                        stuck += 1
                    else:
                        stuck = 0
                    seq_min = np.minimum(seq_min, min_dims)
                    seq_max = np.maximum(seq_max, max_dims)
                else:
                    reason = "noexpand"
                    break

            # stop_growing marks exactly the final mask visited
            # (test_region_grow.py:212); a seed that removed itself is NOT
            # re-tried because the seed order list is traversed once
            visited[current] = True
            cnt = int(current.sum())
            rec = {"target": int(target_id), "steps": steps, "points": cnt,
                   "gt_points": int(gt_mask.sum()), "reason": reason,
                   "add_acc": add_acc, "rmv_acc": rmv_acc,
                   "kept": cnt > cfg.cluster_threshold}
            if rec["kept"]:
                cluster_label[current] = cluster_id
                cluster_id += 1
                if verbose:
                    iou = (current & gt_mask).sum() / max(
                        1, (current | gt_mask).sum())
                    print("room %d target %3d: step %3d %4d/%4d points "
                          "IOU %.3f add %.3f rmv %.3f %s" % (
                              len(results), rec["target"], steps, cnt,
                              rec["gt_points"], iou, add_acc, rmv_acc,
                              reason))
            inst_logs.append(rec)

        lbl = fill_unlabeled(rf.points, cluster_label)
        results.append(RoomResult(
            cluster_label=lbl, num_clusters=cluster_id - 1,
            instances=inst_logs,
            timing={"room": time.time() - t_room}))

    return results, timing
