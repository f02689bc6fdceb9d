"""Beam-search region growing (local-search variant).

Parity with the reference (``test_beam_search.py:160-290``): per seed, a
beam of (score, mask) candidates; each round every beam entry spawns
``search_width`` stochastic one-step rollouts; the beam keeps the top
``beam_width`` by score (``ml`` = cumulative per-decision log-prob
normalized by NUM_NEIGHBOR_POINT, ``np`` = mask point count); termination by
the stuck-check on the TOP beam entry's bbox (twice without growth) or beam
exhaustion; the committed mask is the beam head at termination.

TPU restructuring: all (room x beam x search) rollouts of a round run as one
batched device step (``single_step_batch``); the reference runs them as
serial batch-1 sess.runs.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.features import RoomFeatures
from ..models import lrgnet
from .grow import (GrowConfig, RoomResult, _bucket_size, _wave_keys,
                   fill_unlabeled, single_step_batch)


class _SeedSearch:
    """Beam state for one growing seed in one room."""

    def __init__(self, n: int, seed_idx: int, seed_vox: np.ndarray):
        mask = np.zeros(n, bool)
        mask[seed_idx] = True
        self.queue = [(0.0, mask)]
        self.seq_min = seed_vox.copy()
        self.seq_max = seed_vox.copy()
        self.stuck = 0
        self.best_mask = mask
        self.steps = 0
        self.done = False

    def round_start(self, voxels: np.ndarray) -> bool:
        """Top-entry stuck check (test_beam_search.py:175-189). Returns
        whether to terminate."""
        head = self.queue[0][1]
        vmin = voxels[head].min(axis=0)
        vmax = voxels[head].max(axis=0)
        self.best_mask = head
        if not (vmin < self.seq_min).any() and not (vmax > self.seq_max).any():
            if self.stuck >= 1:
                return True
            self.stuck += 1
        else:
            self.stuck = 0
        self.seq_min = np.minimum(self.seq_min, vmin)
        self.seq_max = np.maximum(self.seq_max, vmax)
        return False


def segment_rooms_beam(params, model_cfg: lrgnet.LrgNetConfig,
                       rooms: List[RoomFeatures], cfg: GrowConfig,
                       beam_width: int = 3, search_width: int = 3,
                       scoring: str = "np",
                       max_rounds: int = 500,
                       verbose: bool = False) -> List[RoomResult]:
    if scoring not in ("ml", "np"):
        raise ValueError(
            f"the XLA beam engine supports scoring 'ml'/'np' (got "
            f"{scoring!r}); completeness-head 'cp' scoring runs on the "
            f"fused kernel (--fused / FusedSegmenter beam mode)")
    results: List[Optional[RoomResult]] = [None] * len(rooms)
    base_rng = jax.random.PRNGKey(cfg.seed)

    buckets: Dict[int, List[int]] = {}
    for i, rf in enumerate(rooms):
        buckets.setdefault(_bucket_size(len(rf.points)), []).append(i)

    for psize, room_ids in sorted(buckets.items()):
        t_setup = time.time()
        G = len(room_ids)
        L = G * beam_width * search_width
        f = cfg.feature_size
        pts = np.zeros((G, psize, f), np.float32)
        vox_arr = np.zeros((G, psize, 3), np.int32)
        valid = np.zeros((G, psize), bool)
        curv_order = []
        for gi, ri in enumerate(room_ids):
            rf = rooms[ri]
            n = len(rf.points)
            pts[gi, :n] = rf.points
            vox_arr[gi, :n] = rf.voxels
            valid[gi, :n] = True
            curv_order.append(np.argsort(rf.curvatures, kind="stable"))
        reps = beam_width * search_width
        pts_d = jax.device_put(np.repeat(pts, reps, axis=0))
        vox_d = jax.device_put(np.repeat(vox_arr, reps, axis=0))
        valid_d = jax.device_put(np.repeat(valid, reps, axis=0))

        room_visited = [np.concatenate([
            np.zeros(len(rooms[ri].points), bool),
            np.ones(psize - len(rooms[ri].points), bool)])
            for ri in room_ids]
        cluster_label = [np.zeros(len(rooms[ri].points), int)
                         for ri in room_ids]
        cluster_id = [1] * G
        inst_logs: List[List[dict]] = [[] for _ in room_ids]
        wave = 0
        net_time = 0.0

        while True:
            # pick the next unvisited seed per room
            searches: List[Optional[_SeedSearch]] = [None] * G
            targets = [None] * G
            any_active = False
            for gi, ri in enumerate(room_ids):
                n = len(rooms[ri].points)
                unvisited = ~room_visited[gi][:n]
                if not unvisited.any():
                    continue
                order = curv_order[gi]
                s = int(order[unvisited[order]][0])
                searches[gi] = _SeedSearch(psize, s, rooms[ri].voxels[s])
                searches[gi].seed_idx = s
                targets[gi] = rooms[ri].obj_id == rooms[ri].obj_id[s]
                any_active = True
            if not any_active:
                break

            for rnd in range(max_rounds):
                # round bookkeeping on the beam heads
                live = []
                for gi in range(G):
                    ss = searches[gi]
                    if ss is None or ss.done:
                        continue
                    if ss.round_start(vox_arr[gi]):
                        ss.done = True
                        continue
                    live.append(gi)
                if not live:
                    break

                # assemble lanes: (room, beam entry, rollout)
                mask_arr = np.zeros((L, psize), bool)
                active = np.zeros(L, bool)
                visited = np.ones((L, psize), bool)
                lane_meta = {}
                for gi in live:
                    ss = searches[gi]
                    for bi, (score, mask) in enumerate(ss.queue):
                        for si in range(search_width):
                            li = (gi * beam_width + bi) * search_width + si
                            mask_arr[li] = mask
                            active[li] = True
                            visited[li] = room_visited[gi]
                            lane_meta[li] = (gi, bi, score)

                rng_keys = _wave_keys(
                    base_rng, jnp.arange(L) * 99991 + wave * 1000 + rnd)
                t0 = time.time()
                new_mask, step_lp, updated, no_nb = jax.device_get(
                    single_step_batch(model_cfg, cfg, params, pts_d, vox_d,
                                      valid_d, jax.device_put(visited),
                                      jax.device_put(mask_arr),
                                      jnp.asarray(active), rng_keys))
                net_time += time.time() - t0

                # collect candidates per room, prune to beam_width
                new_queues: Dict[int, list] = {gi: [] for gi in live}
                for li, (gi, bi, score) in lane_meta.items():
                    searches[gi].steps += 1
                    if not updated[li]:
                        continue
                    if scoring == "ml":
                        ns = score + float(step_lp[li])
                    else:
                        ns = float(new_mask[li].sum())
                    new_queues[gi].append((ns, new_mask[li].copy()))
                for gi in live:
                    ss = searches[gi]
                    cand = sorted(new_queues[gi], key=lambda x: x[0],
                                  reverse=True)[:beam_width]
                    if not cand:
                        ss.done = True   # beam exhausted (no expansion)
                    else:
                        ss.queue = cand

            # commit the beam heads
            for gi, ri in enumerate(room_ids):
                ss = searches[gi]
                if ss is None:
                    continue
                n = len(rooms[ri].points)
                mask = ss.best_mask[:n]
                if not mask.any():
                    mask = np.zeros(n, bool)
                    mask[ss.seed_idx] = True
                room_visited[gi][:n] |= mask
                cnt = int(mask.sum())
                gt = targets[gi]
                rec = {"target": int(rooms[ri].obj_id[ss.seed_idx]),
                       "steps": ss.steps, "points": cnt,
                       "gt_points": int(gt.sum()),
                       "kept": cnt > cfg.cluster_threshold}
                if rec["kept"]:
                    cluster_label[gi][mask] = cluster_id[gi]
                    cluster_id[gi] += 1
                inst_logs[gi].append(rec)
                if verbose:
                    iou = (mask & gt).sum() / max(1, (mask | gt).sum())
                    print("room %d target %3d: step %3d %4d/%4d points "
                          "IOU %.3f" % (ri, rec["target"], rec["steps"],
                                        cnt, rec["gt_points"], iou))
            wave += 1

        for gi, ri in enumerate(room_ids):
            lbl = fill_unlabeled(rooms[ri].points, cluster_label[gi])
            results[ri] = RoomResult(
                cluster_label=lbl, num_clusters=cluster_id[gi] - 1,
                instances=inst_logs[gi],
                timing={"net": net_time / max(G, 1),
                        "setup": (time.time() - t_setup) / max(G, 1)})

    return results  # type: ignore[return-value]
