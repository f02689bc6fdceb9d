"""Batched greedy region growing — the TPU restructuring of the flagship loop.

The reference (``test_region_grow.py:183-316``) runs the grow loop on the
host, one region at a time, with a batch-1 ``sess.run`` per step and O(N)
Python voxel-set bookkeeping around it. Here the ENTIRE loop is fixed-shape
masked device state advanced by ``jax.lax.while_loop``:

* one **lane** = one growing region in one room (padded to a static room
  size P); many lanes advance together in a single compiled program;
* each iteration fuses: bbox neighbor masking, reference-semantics masked
  resampling to (num_inlier, num_neighbor) points, inlier-median recentering,
  the LrgNet forward, Bernoulli add/remove sampling, scatter mask updates and
  stuck/termination bookkeeping;
* rooms are independent in the reference, so batching one active seed per
  room preserves its sequential-visited semantics exactly while filling the
  MXU with (lanes x 512 x C) matmuls.

Termination reasons match the reference: ``noneighbor`` (no candidates),
``noexpand`` (no add fired), ``stuck`` (bbox failed to grow twice).
Per-decision cumulative log-prob is tracked for the beam-search /
random-restart ``ml`` scoring variants.
"""

from __future__ import annotations

import dataclasses
import functools
import sys
import time
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.features import RoomFeatures
from ..models import lrgnet

REASON_GROWING = 0
REASON_NONEIGHBOR = 1
REASON_NOEXPAND = 2
REASON_STUCK = 3
REASON_MAXSTEPS = 4
REASON_NAMES = {1: "noneighbor", 2: "noexpand", 3: "stuck", 4: "maxsteps"}


@jax.jit
def _wave_keys(base_rng, offsets):
    """Per-lane PRNG keys; jitted once (a fresh vmap closure per wave costs
    ~100 ms of host tracing otherwise)."""
    return jax.vmap(lambda i: jax.random.fold_in(base_rng, i))(offsets)


@dataclasses.dataclass(frozen=True)
class GrowConfig:
    num_inlier: int = 512
    num_neighbor: int = 512
    feature_size: int = 13
    resolution: float = 0.1
    cluster_threshold: int = 10
    max_steps: int = 500
    seed: int = 0
    # Fast path for the two latency-dominant selection ops (see
    # docs/pallas_grow_kernel_design.md): masked resampling via the Pallas
    # stratified rank-matching kernel (ops/masked_select.py; ~94%-unique
    # stratified draws instead of exact without-replacement) and recentering
    # by the median of the 512 SAMPLED inliers instead of the full cloud
    # (quantile error ~1/sqrt(512)). OFF by default (exact reference
    # semantics); quality-validated on the synthetic record before use.
    pallas_sampling: bool = False
    # per-step GT add/remove accuracies feed only the reference's
    # per-instance log line; skipping them saves two random gathers/iter
    track_accuracy: bool = True


class LaneState(NamedTuple):
    """Per-lane device state; all arrays fixed-shape (lane-batched later)."""

    current: jnp.ndarray    # (P,) bool
    min_dims: jnp.ndarray   # (3,) int32
    max_dims: jnp.ndarray   # (3,) int32
    seq_min: jnp.ndarray    # (3,) int32
    seq_max: jnp.ndarray    # (3,) int32
    stuck: jnp.ndarray      # () int32
    steps: jnp.ndarray      # () int32
    done: jnp.ndarray       # () bool
    reason: jnp.ndarray     # () int32
    log_prob: jnp.ndarray   # () float32 — cumulative decision log-prob
    add_acc: jnp.ndarray    # () float32 — last step add accuracy vs GT
    rmv_acc: jnp.ndarray    # () float32
    rng: jnp.ndarray        # PRNG key


def masked_sample(rng: jnp.ndarray, mask: jnp.ndarray, k: int
                  ) -> jnp.ndarray:
    """Sample k indices from a boolean mask with the reference's rule
    (``test_region_grow.py:237-252``): without replacement when count >= k,
    otherwise all masked indices in natural order + with-replacement fill.
    Returns (k,) int32 indices (0 fallback when mask empty; callers guard).
    """
    p = mask.shape[0]
    cnt = jnp.sum(mask)
    r_perm, r_fill = jax.random.split(rng)

    # branch A: count >= k — k smallest random keys among masked
    keys = jnp.where(mask, jax.random.uniform(r_perm, (p,)), jnp.inf)
    _, idx_a = jax.lax.top_k(-keys, k)

    # branch B: count < k — first-count masked indices + random fill
    ordered = jnp.nonzero(mask, size=k, fill_value=0)[0]
    fill = jax.random.randint(r_fill, (k,), 0, jnp.maximum(cnt, 1))
    pos = jnp.arange(k)
    idx_b = jnp.where(pos < cnt, ordered, ordered[fill])

    return jnp.where(cnt >= k, idx_a, idx_b).astype(jnp.int32)


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """NumPy-median semantics over masked rows of x (P, F)."""
    cnt = jnp.sum(mask)
    xs = jnp.sort(jnp.where(mask[:, None], x, jnp.inf), axis=0)
    lo = jnp.clip((cnt - 1) // 2, 0, x.shape[0] - 1)
    hi = jnp.clip(cnt // 2, 0, x.shape[0] - 1)
    return 0.5 * (xs[lo] + xs[hi])


def _recenter_cols(feature_size: int) -> np.ndarray:
    """Columns the reference recenters by the inlier median: xy + feature
    cols 6: (``test_region_grow.py:241-247``); z and room-coords stay
    absolute. The median is computed ONLY over these columns (the sort is
    the grow step's hottest op)."""
    return np.array([0, 1] + list(range(6, feature_size)), np.int32)


def _recenter_offset(median_sub: jnp.ndarray, feature_size: int
                     ) -> jnp.ndarray:
    """Scatter the reduced median vector back to a full-width offset."""
    cols = _recenter_cols(feature_size)
    return jnp.zeros(feature_size, median_sub.dtype).at[cols].set(median_sub)


def make_grow_step(model_cfg: lrgnet.LrgNetConfig, cfg: GrowConfig):
    """Build the per-lane grow step (params, lane-constant arrays, state)."""

    def step(params, points, voxels, valid, gt_target, visited, state: LaneState
             ) -> LaneState:
        p, f = points.shape
        rng, r_in, r_nb, r_add, r_rmv = jax.random.split(state.rng, 5)

        neighbor_mask = (
            valid & ~state.current & ~visited
            & jnp.all(voxels >= state.min_dims - 1, axis=1)
            & jnp.all(voxels <= state.max_dims + 1, axis=1)
        )
        nb_cnt = jnp.sum(neighbor_mask)
        no_neighbor = nb_cnt == 0

        cols = jnp.asarray(_recenter_cols(f))
        if cfg.pallas_sampling and jax.default_backend() == "tpu":
            from ..ops.masked_select import masked_sample_stratified_one
            in_idx = masked_sample_stratified_one(
                state.current, jax.random.uniform(r_in, (1, cfg.num_inlier)),
                cfg.num_inlier)
            nb_idx = masked_sample_stratified_one(
                neighbor_mask,
                jax.random.uniform(r_nb, (1, cfg.num_neighbor)),
                cfg.num_neighbor)
            center = jnp.median(jnp.take(points[in_idx], cols, axis=1),
                                axis=0)
        else:
            in_idx = masked_sample(r_in, state.current, cfg.num_inlier)
            nb_idx = masked_sample(r_nb, neighbor_mask, cfg.num_neighbor)
            center = masked_median(jnp.take(points, cols, axis=1),
                                   state.current)
        offset = _recenter_offset(center, f)
        inlier_pts = points[in_idx] - offset
        neighbor_pts = points[nb_idx] - offset

        out = lrgnet.forward(params, inlier_pts[None], neighbor_pts[None],
                             model_cfg)
        add_conf = jax.nn.softmax(out["add_logits"][0], axis=-1)[:, 1]
        rmv_conf = jax.nn.softmax(out["remove_logits"][0], axis=-1)[:, 1]

        add_dec = jax.random.uniform(r_add, (cfg.num_neighbor,)) < add_conf
        rmv_dec = jax.random.uniform(r_rmv, (cfg.num_inlier,)) < rmv_conf

        # scatter decisions back to the full cloud (equalized points are
        # unique voxels, so index scatter == the reference's voxel-set update)
        add_full = jnp.zeros(p, bool).at[nb_idx].max(add_dec)
        rmv_full = jnp.zeros(p, bool).at[in_idx].max(rmv_dec)

        # ml scoring (test_random_restart.py:251-271): each slot scores by
        # VOXEL-SET membership — duplicate fill slots of one point all count
        # as selected when any copy fired — and each term is normalized by
        # NUM_NEIGHBOR_POINT for both heads.
        eps = 1e-10
        add_sel = add_full[nb_idx]
        rmv_sel = rmv_full[in_idx]
        step_lp = (
            jnp.sum(jnp.log(jnp.where(add_sel, add_conf, 1 - add_conf) + eps))
            + jnp.sum(jnp.log(jnp.where(rmv_sel, rmv_conf, 1 - rmv_conf) + eps))
        ) / cfg.num_neighbor

        # GT-vs-prediction accuracies for the reference's per-instance log line
        if cfg.track_accuracy:
            add_labels = gt_target[nb_idx]
            rmv_labels = ~gt_target[in_idx]
            add_pred = out["add_logits"][0, :, 1] > out["add_logits"][0, :, 0]
            rmv_pred = (out["remove_logits"][0, :, 1]
                        > out["remove_logits"][0, :, 0])
            add_acc = jnp.mean((add_pred == add_labels).astype(jnp.float32))
            rmv_acc = jnp.mean((rmv_pred == rmv_labels).astype(jnp.float32))
        else:
            add_acc = jnp.float32(0.0)
            rmv_acc = jnp.float32(0.0)

        new_current = (state.current | add_full) & ~rmv_full
        updated = jnp.any(add_dec)
        cur_cnt = jnp.sum(new_current)

        # bbox + stuck bookkeeping (test_region_grow.py:291-303)
        big = jnp.int32(2 ** 30)
        vmin = jnp.min(jnp.where(new_current[:, None], voxels, big), axis=0)
        vmax = jnp.max(jnp.where(new_current[:, None], voxels, -big), axis=0)
        within = (~jnp.any(vmin < state.seq_min)) & (~jnp.any(vmax > state.seq_max))
        stuck_stop = within & (state.stuck >= 1)
        new_stuck = jnp.where(within, state.stuck + 1, 0)
        new_seq_min = jnp.minimum(state.seq_min, vmin)
        new_seq_max = jnp.maximum(state.seq_max, vmax)

        steps = state.steps + 1
        hit_cap = steps >= cfg.max_steps

        # termination resolution (in reference priority order)
        done_now = no_neighbor | ~updated | (cur_cnt == 0) | stuck_stop | hit_cap
        reason = jnp.where(
            no_neighbor, REASON_NONEIGHBOR,
            jnp.where(~updated | (cur_cnt == 0), REASON_NOEXPAND,
                      jnp.where(stuck_stop, REASON_STUCK,
                                jnp.where(hit_cap, REASON_MAXSTEPS,
                                          REASON_GROWING))))

        # on noneighbor the mask update never happens (reference breaks
        # before the sess.run); keep the pre-step mask
        commit_mask = jnp.where(no_neighbor, state.current, new_current)

        def sel(new, old):
            return jnp.where(state.done, old, new)

        return LaneState(
            current=jnp.where(state.done, state.current, commit_mask),
            min_dims=sel(jnp.where(done_now, state.min_dims, vmin), state.min_dims),
            max_dims=sel(jnp.where(done_now, state.max_dims, vmax), state.max_dims),
            seq_min=sel(jnp.where(done_now, state.seq_min, new_seq_min), state.seq_min),
            seq_max=sel(jnp.where(done_now, state.seq_max, new_seq_max), state.seq_max),
            stuck=sel(jnp.where(done_now, state.stuck, new_stuck), state.stuck),
            steps=sel(jnp.where(no_neighbor, state.steps, steps), state.steps),
            done=state.done | done_now,
            reason=sel(jnp.where(done_now, reason, state.reason), state.reason),
            log_prob=sel(jnp.where(no_neighbor, state.log_prob,
                                   state.log_prob + step_lp), state.log_prob),
            add_acc=sel(jnp.where(no_neighbor, state.add_acc, add_acc), state.add_acc),
            rmv_acc=sel(jnp.where(no_neighbor, state.rmv_acc, rmv_acc), state.rmv_acc),
            rng=sel(rng, state.rng),
        )

    return step


def init_lane(points: jnp.ndarray, voxels: jnp.ndarray, seed_idx: jnp.ndarray,
              active: jnp.ndarray, rng: jnp.ndarray) -> LaneState:
    p = points.shape[0]
    current = jnp.zeros(p, bool).at[seed_idx].set(active)
    seed_vox = voxels[seed_idx]
    return LaneState(
        current=current,
        min_dims=seed_vox, max_dims=seed_vox,
        seq_min=seed_vox, seq_max=seed_vox,
        stuck=jnp.int32(0), steps=jnp.int32(0),
        done=~active, reason=jnp.int32(REASON_GROWING),
        log_prob=jnp.float32(0.0),
        add_acc=jnp.float32(0.0), rmv_acc=jnp.float32(0.0),
        rng=rng,
    )


@partial(jax.jit, static_argnums=(0, 1))
def grow_batch(model_cfg: lrgnet.LrgNetConfig, cfg: GrowConfig, params,
               points, voxels, valid, gt_target, visited, seed_idx, active,
               rng) -> LaneState:
    """Grow one region per lane to termination.

    points (L,P,F) f32; voxels (L,P,3) i32; valid/visited/gt_target (L,P)
    bool; seed_idx/active (L,); rng (L,2) keys. Returns the final LaneState
    batch (current masks, steps, reasons, log-probs, last-step accuracies).
    """
    step = make_grow_step(model_cfg, cfg)
    state = jax.vmap(init_lane)(points, voxels, seed_idx, active, rng)

    def cond(s):
        return ~jnp.all(s.done)

    def body(s):
        return jax.vmap(lambda pt, vx, vl, gt, vs, st: step(
            params, pt, vx, vl, gt, vs, st))(points, voxels, valid,
                                             gt_target, visited, s)

    return jax.lax.while_loop(cond, body, state)


def _grow_rooms_core(model_cfg: lrgnet.LrgNetConfig, cfg: GrowConfig,
                     reps: int, params, pts_rooms, vox_rooms, valid_rooms,
                     obj_rooms, visited_rooms, seed_idx, lane_offsets,
                     base_rng):
    """Room-indexed wave body (shared by the single-device jit and the
    shard_map dp variant). ``lane_offsets`` (G*reps,) int32 are the
    host-computed per-lane PRNG fold-in offsets — globally numbered, so
    sharded and single-device runs derive identical per-lane keys.
    """
    g, p, _f = pts_rooms.shape
    lanes = g * reps
    points = jnp.repeat(pts_rooms, reps, axis=0)
    voxels = jnp.repeat(vox_rooms, reps, axis=0)
    valid = jnp.repeat(valid_rooms, reps, axis=0)
    obj = jnp.repeat(obj_rooms, reps, axis=0)
    visited = jnp.repeat(visited_rooms.astype(bool), reps, axis=0)
    active = seed_idx >= 0
    seed_safe = jnp.maximum(seed_idx, 0)
    seed_obj = jnp.take_along_axis(obj, seed_safe[:, None], axis=1)
    gt_target = obj == seed_obj
    rng = _wave_keys(base_rng, lane_offsets)
    final = grow_batch(model_cfg, cfg, params, points, voxels, valid,
                       gt_target, visited, seed_safe, active, rng)
    stats = jnp.stack([
        final.steps.astype(jnp.float32),
        final.reason.astype(jnp.float32),
        final.log_prob,
        final.add_acc,
        final.rmv_acc,
        active.astype(jnp.float32),
    ], axis=1)
    packed = (final.current.reshape(lanes, p // 8, 8).astype(jnp.uint8)
              * jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
              ).sum(axis=2).astype(jnp.uint8)
    return packed, stats


@partial(jax.jit, static_argnums=(0, 1, 2))
def grow_batch_rooms(model_cfg: lrgnet.LrgNetConfig, cfg: GrowConfig,
                     reps: int, params, pts_rooms, vox_rooms, valid_rooms,
                     obj_rooms, visited_rooms, seed_idx, base_rng, wave):
    """Room-indexed, transfer-minimal wave API: per-wave host uploads shrink
    to ONE per-room visited byte-mask (G, P) + the seed vector; lane
    expansion (x ``reps`` seeds/restarts per room), gt-target derivation
    (obj == obj[seed]) and initial masks all happen ON DEVICE, and the
    result masks return BIT-PACKED ((L, P/8) uint8, 8x smaller). At wide
    tail phases this cuts wave overhead ~10x vs per-lane flag uploads.
    """
    g = pts_rooms.shape[0]
    lane_offsets = jnp.arange(g * reps) * jnp.int32(100003) + wave
    return _grow_rooms_core(model_cfg, cfg, reps, params, pts_rooms,
                            vox_rooms, valid_rooms, obj_rooms, visited_rooms,
                            seed_idx, lane_offsets, base_rng)


@functools.lru_cache(maxsize=32)
def _sharded_grow_fn(model_cfg: lrgnet.LrgNetConfig, cfg: GrowConfig,
                     reps: int, mesh):
    """dp-sharded wave over the room axis (NEW DESIGN, no reference
    counterpart — the reference is single-GPU, SURVEY.md §2 parallelism
    row). Lanes are embarrassingly parallel, so ``shard_map`` over the
    leading room axis runs each device's rooms fully locally: no
    collectives, per-device while_loops terminate independently, and
    per-lane results are bit-identical to the single-device path (lane PRNG
    keys are derived from GLOBAL lane offsets passed in from the host).
    Params are replicated; the caller pads the room count to a multiple of
    the dp size (padded rooms carry seed_idx -1 -> lanes start done).
    """
    from jax.sharding import PartitionSpec as PS

    from ..parallel.mesh import DP_AXIS

    shard = PS(DP_AXIS)
    rep = PS()
    fn = jax.shard_map(
        partial(_grow_rooms_core, model_cfg, cfg, reps),
        mesh=mesh,
        in_specs=(rep, shard, shard, shard, shard, shard, shard, shard, rep),
        out_specs=(shard, shard),
        check_vma=False,
    )
    return jax.jit(fn)


@partial(jax.jit, static_argnums=(0, 1, 2))
def grow_chunk(model_cfg: lrgnet.LrgNetConfig, cfg: GrowConfig,
               chunk_steps: int, params, points, voxels, valid, flags,
               ints, floats, rngs):
    """Resumable chunked grow for the lane SCHEDULER: advance every active
    lane by at most ``chunk_steps`` iterations, returning the full packed
    state so finished lanes can be recycled onto new seeds while long
    regions keep growing (eliminates the wave-synchronous straggler idle of
    ``grow_batch``).

    Packed state: ``flags`` uint8 (bit0 visited, bit1 gt_target, bit2
    current mask); ``ints`` (L, 16) int32 = [min(3), max(3), seq_min(3),
    seq_max(3), stuck, steps, done, reason]; ``floats`` (L, 3) f32 =
    [log_prob, add_acc, rmv_acc]; ``rngs`` (L, 2) PRNG keys. Returns
    (current (L,P) bool, ints', floats', rngs').
    """
    step = make_grow_step(model_cfg, cfg)
    visited = (flags & 1).astype(bool)
    gt_target = (flags & 2).astype(bool)
    state = LaneState(
        current=(flags & 4).astype(bool),
        min_dims=ints[:, 0:3], max_dims=ints[:, 3:6],
        seq_min=ints[:, 6:9], seq_max=ints[:, 9:12],
        stuck=ints[:, 12], steps=ints[:, 13],
        done=ints[:, 14] > 0, reason=ints[:, 15],
        log_prob=floats[:, 0], add_acc=floats[:, 1], rmv_acc=floats[:, 2],
        rng=rngs,
    )

    def cond(carry):
        s, it = carry
        return (~jnp.all(s.done)) & (it < chunk_steps)

    def body(carry):
        s, it = carry
        s = jax.vmap(lambda pt, vx, vl, gt, vs, st: step(
            params, pt, vx, vl, gt, vs, st))(points, voxels, valid,
                                             gt_target, visited, s)
        return s, it + 1

    s, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    ints_out = jnp.concatenate([
        s.min_dims, s.max_dims, s.seq_min, s.seq_max,
        s.stuck[:, None], s.steps[:, None],
        s.done.astype(jnp.int32)[:, None], s.reason[:, None]], axis=1)
    floats_out = jnp.stack([s.log_prob, s.add_acc, s.rmv_acc], axis=1)
    return s.current, ints_out, floats_out, s.rng


@partial(jax.jit, static_argnums=(0, 1))
def single_step_batch(model_cfg: lrgnet.LrgNetConfig, cfg: GrowConfig,
                      params, points, voxels, valid, visited, mask, active,
                      rng):
    """ONE stochastic grow step per lane from an explicit mask (the beam
    search building block, reference ``test_beam_search.py:205-282``).

    The bbox is recomputed from the mask (as the beam variant does each
    round). Returns (new_mask, step_log_prob, updated, no_neighbor).
    """
    def one(pt, vx, vl, vs, mk, act, key):
        p, f = pt.shape
        big = jnp.int32(2 ** 30)
        vmin = jnp.min(jnp.where(mk[:, None], vx, big), axis=0)
        vmax = jnp.max(jnp.where(mk[:, None], vx, -big), axis=0)
        neighbor_mask = (vl & ~mk & ~vs
                         & jnp.all(vx >= vmin - 1, axis=1)
                         & jnp.all(vx <= vmax + 1, axis=1))
        no_neighbor = jnp.sum(neighbor_mask) == 0

        r_in, r_nb, r_add, r_rmv = jax.random.split(key, 4)
        in_idx = masked_sample(r_in, mk, cfg.num_inlier)
        nb_idx = masked_sample(r_nb, neighbor_mask, cfg.num_neighbor)
        cols = jnp.asarray(_recenter_cols(f))
        center = masked_median(jnp.take(pt, cols, axis=1), mk)
        offset = _recenter_offset(center, f)
        out = lrgnet.forward(params, (pt[in_idx] - offset)[None],
                             (pt[nb_idx] - offset)[None], model_cfg)
        add_conf = jax.nn.softmax(out["add_logits"][0], axis=-1)[:, 1]
        rmv_conf = jax.nn.softmax(out["remove_logits"][0], axis=-1)[:, 1]
        add_dec = jax.random.uniform(r_add, (cfg.num_neighbor,)) < add_conf
        rmv_dec = jax.random.uniform(r_rmv, (cfg.num_inlier,)) < rmv_conf
        add_full = jnp.zeros(p, bool).at[nb_idx].max(add_dec)
        rmv_full = jnp.zeros(p, bool).at[in_idx].max(rmv_dec)
        eps = 1e-10
        # the reference scores slots by voxel-SET membership (duplicate
        # slots count as selected when any copy fired) and normalizes each
        # term by NUM_NEIGHBOR_POINT (test_beam_search.py:243,257)
        add_sel = add_full[nb_idx]
        rmv_sel = rmv_full[in_idx]
        step_lp = (jnp.sum(jnp.log(jnp.where(add_sel, add_conf,
                                             1 - add_conf) + eps))
                   + jnp.sum(jnp.log(jnp.where(rmv_sel, rmv_conf,
                                               1 - rmv_conf) + eps))
                   ) / cfg.num_neighbor
        new_mask = (mk | add_full) & ~rmv_full
        updated = jnp.any(add_dec) & ~no_neighbor & act
        new_mask = jnp.where(act & ~no_neighbor, new_mask, mk)
        return new_mask, step_lp, updated, no_neighbor

    return jax.vmap(one)(points, voxels, valid, visited, mask, active, rng)


# --------------------------------------------------------------------------
# Host orchestration
# --------------------------------------------------------------------------

@dataclasses.dataclass
class RoomResult:
    cluster_label: np.ndarray       # (N,) int, 0 = unassigned (pre-fill)
    num_clusters: int
    instances: List[dict]           # per-grown-instance log records
    timing: Dict[str, float]


def _bucket_size(n: int, minimum: int = 1024) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


def enable_compilation_cache(path: str = "/tmp/lrg_tpu_jit_cache"):
    """Persist XLA compilations across processes — grow_batch compiles are
    expensive through the remote-compile tunnel (tens of seconds each)."""
    import os
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fill_unlabeled(points: np.ndarray, cluster_label: np.ndarray) -> np.ndarray:
    """Assign unlabeled points the label of the nearest labeled point in
    full feature space (``test_region_grow.py:308-316``)."""
    labeled = np.nonzero(cluster_label)[0]
    unlabeled = np.nonzero(cluster_label == 0)[0]
    if len(labeled) == 0 or len(unlabeled) == 0:
        return cluster_label
    from scipy.spatial import cKDTree
    tree = cKDTree(points[labeled])
    _, nearest = tree.query(points[unlabeled])
    out = cluster_label.copy()
    out[unlabeled] = cluster_label[labeled[nearest]]
    return out


def _pick_wave_seeds(order: np.ndarray, unvisited: np.ndarray,
                     voxels: np.ndarray, k: int,
                     min_sep: int) -> List[int]:
    """Up to k unvisited seeds in curvature order, mutually separated by at
    least ``min_sep`` voxels (Chebyshev) so parallel regions rarely collide."""
    seeds: List[int] = []
    for s in order:
        if not unvisited[s]:
            continue
        if seeds and min_sep > 0:
            d = np.abs(voxels[seeds] - voxels[s]).max(axis=1)
            if (d < min_sep).any():
                continue
        seeds.append(int(s))
        if len(seeds) == k:
            break
    if not seeds:
        # fall back to the single lowest-curvature unvisited seed
        cand = order[unvisited[order]]
        if len(cand):
            seeds = [int(cand[0])]
    return seeds


def segment_rooms(params, model_cfg: lrgnet.LrgNetConfig,
                  rooms: List[RoomFeatures], cfg: GrowConfig,
                  verbose: bool = False,
                  num_restarts: int = 1,
                  scoring: str = "np",
                  num_parallel_seeds: int = 1,
                  seed_separation: int = 12,
                  min_bucket_size: int = 1024,
                  tail_seeds: int = 0,
                  tail_threshold_steps: int = 4,
                  mesh=None) -> List[RoomResult]:
    """Segment every room: all rooms of a padded-size bucket advance in
    parallel lanes, ``num_parallel_seeds`` curvature-ordered seeds per room
    per wave.

    ``num_restarts > 1`` reproduces the random-restart local-search variant
    (reference ``test_random_restart.py:169-197``) with all restarts as
    EXTRA PARALLEL LANES instead of the reference's serial re-runs; the best
    mask per seed is kept by ``scoring``: ``np`` = mask point count, ``ml``
    = cumulative decision log-prob.

    ``num_parallel_seeds > 1`` relaxes the reference's strictly sequential
    seed processing: several spatially separated seeds grow concurrently and
    commit in curvature-priority order (earlier seeds win overlaps; a seed
    swallowed by an earlier commit is discarded, as it would have been
    skipped by the reference's visited check). SURVEY.md §7 hard-part #1;
    validate NMI/AMI when raising it.

    ``tail_seeds > num_parallel_seeds`` turns on the adaptive TAIL phase:
    once a whole wave's regions terminate within ``tail_threshold_steps``
    (the many tiny leftover-fragment seeds), the per-room seed count jumps
    to ``tail_seeds``, collapsing the long fragment tail (measured: ~50 of
    79 waves on the synthetic bench are such fragments, each paying a full
    host round-trip). Lane arrays re-expand on DEVICE (no re-upload).

    ``mesh`` (a ``jax.sharding.Mesh``, tp axis size 1): dp-shard the wave
    over the room axis — each device grows its rooms' lanes fully locally
    (no collectives; see ``_sharded_grow_fn``). The room count per bucket is
    padded to a multiple of the device count with inert rooms. Per-lane
    results are bit-identical to ``mesh=None``.
    """
    if scoring not in ("ml", "np"):
        raise ValueError(
            f"the XLA lane engine supports scoring 'ml'/'np' (got "
            f"{scoring!r}); completeness-head 'cp' scoring runs on the "
            f"fused kernel (--fused / segment_rooms_fused)")
    dp = 1
    if mesh is not None:
        from ..parallel.mesh import TP_AXIS
        if mesh.shape.get(TP_AXIS, 1) != 1:
            raise ValueError("inference mesh must have tp=1 (pure DP)")
        dp = mesh.devices.size

    buckets: Dict[int, List[int]] = {}
    for i, rf in enumerate(rooms):
        buckets.setdefault(_bucket_size(len(rf.points), min_bucket_size),
                           []).append(i)

    results: List[Optional[RoomResult]] = [None] * len(rooms)
    base_rng = jax.random.PRNGKey(cfg.seed)

    for psize, room_ids in sorted(buckets.items()):
        t_setup = time.time()
        R = num_restarts
        K = num_parallel_seeds
        G = len(room_ids)
        Gp = -(-G // dp) * dp          # padded room count (inert tail rooms)
        f = cfg.feature_size
        pts_room = np.zeros((Gp, psize, f), np.float32)
        vox_room = np.zeros((Gp, psize, 3), np.int32)
        valid_room = np.zeros((Gp, psize), bool)
        obj_room = np.full((Gp, psize), -1, np.int32)  # pad obj never matches
        curv_order = []
        for gi, ri in enumerate(room_ids):
            rf = rooms[ri]
            n = len(rf.points)
            pts_room[gi, :n] = rf.points
            vox_room[gi, :n] = rf.voxels
            valid_room[gi, :n] = True
            obj_room[gi, :n] = rf.obj_id
            curv_order.append(np.argsort(rf.curvatures, kind="stable"))
        if mesh is None:
            room_sharding = None
        else:
            from jax.sharding import NamedSharding, PartitionSpec as PS
            from ..parallel.mesh import DP_AXIS
            room_sharding = NamedSharding(mesh, PS(DP_AXIS))
        pts_room_d = jax.device_put(pts_room, room_sharding)
        vox_room_d = jax.device_put(vox_room, room_sharding)
        valid_room_d = jax.device_put(valid_room, room_sharding)
        obj_room_d = jax.device_put(obj_room, room_sharding)

        lanes = Gp * K * R

        # visited tracked per ROOM; lane copies are views expanded per wave
        room_visited = [np.concatenate([
            np.zeros(len(rooms[ri].points), bool),
            np.ones(psize - len(rooms[ri].points), bool)])
            for ri in room_ids]
        cluster_label = [np.zeros(len(rooms[ri].points), int)
                         for ri in room_ids]
        cluster_id = [1] * len(room_ids)
        inst_logs: List[List[dict]] = [[] for _ in room_ids]
        net_time = 0.0
        wave = 0

        in_tail = False
        while True:
            seed_idx = np.full(lanes, -1, np.int32)
            visited_u8 = np.zeros((Gp, psize), np.uint8)
            gt_counts = np.zeros(lanes, np.int64)
            wave_seeds: List[List[int]] = [[] for _ in room_ids]
            for gi, ri in enumerate(room_ids):
                n = len(rooms[ri].points)
                visited_u8[gi] = room_visited[gi]
                unvisited = ~room_visited[gi][:n]
                if not unvisited.any():
                    continue
                seeds = _pick_wave_seeds(curv_order[gi], unvisited,
                                         rooms[ri].voxels, K,
                                         seed_separation if K > 1 else 0)
                wave_seeds[gi] = seeds
                for ki, s in enumerate(seeds):
                    gt_cnt = int((rooms[ri].obj_id
                                  == rooms[ri].obj_id[s]).sum())
                    for r in range(R):
                        li = (gi * K + ki) * R + r
                        seed_idx[li] = s
                        gt_counts[li] = gt_cnt
            if not (seed_idx >= 0).any():
                break

            t0 = time.time()
            if mesh is None:
                packed, stats = grow_batch_rooms(
                    model_cfg, cfg, K * R, params, pts_room_d, vox_room_d,
                    valid_room_d, obj_room_d, jax.device_put(visited_u8),
                    jnp.asarray(seed_idx), base_rng, jnp.int32(wave))
            else:
                lane_offsets = (np.arange(lanes, dtype=np.int32)
                                * np.int32(100003) + np.int32(wave))
                lane_sharding = NamedSharding(mesh, PS(DP_AXIS))
                packed, stats = _sharded_grow_fn(model_cfg, cfg, K * R, mesh)(
                    params, pts_room_d, vox_room_d, valid_room_d, obj_room_d,
                    jax.device_put(visited_u8, room_sharding),
                    jax.device_put(seed_idx, lane_sharding),
                    jax.device_put(lane_offsets, lane_sharding), base_rng)
            packed = np.asarray(jax.device_get(packed))
            stats = np.asarray(jax.device_get(stats))
            cur = np.unpackbits(packed, axis=1, bitorder="little")
            net_time += time.time() - t0

            for gi, ri in enumerate(room_ids):
                n = len(rooms[ri].points)
                # commit seeds in curvature-priority order
                for ki, s in enumerate(wave_seeds[gi]):
                    li0 = (gi * K + ki) * R
                    if seed_idx[li0] < 0:
                        continue
                    if ki > 0 and room_visited[gi][s]:
                        continue  # swallowed by an earlier commit this wave
                    # pick the best restart lane by the scoring rule
                    if R == 1:
                        best = li0
                    else:
                        if scoring == "ml":
                            scores = [stats[li0 + r, 2] for r in range(R)]
                        else:
                            scores = [int(cur[li0 + r, :n].sum())
                                      for r in range(R)]
                        best = li0 + int(np.argmax(scores))
                    mask = cur[best, :n].astype(bool)
                    mask &= ~room_visited[gi][:n]  # earlier commits win
                    # a lane always commits: visited over its mask (reference
                    # stop_growing marks visited regardless of cluster size)
                    if not mask.any():
                        mask = np.zeros(n, bool)
                        mask[s] = True
                        if room_visited[gi][s]:
                            continue
                    room_visited[gi][:n] |= mask
                    cnt = int(mask.sum())
                    rec = {
                        "target": int(rooms[ri].obj_id[s]),
                        "steps": int(stats[best, 0]),
                        "points": cnt,
                        "gt_points": int(gt_counts[li0]),
                        "reason": REASON_NAMES.get(int(stats[best, 1]), "?"),
                        "add_acc": float(stats[best, 3]),
                        "rmv_acc": float(stats[best, 4]),
                        "log_prob": float(stats[best, 2]),
                    }
                    if cnt > cfg.cluster_threshold:
                        cluster_label[gi][mask] = cluster_id[gi]
                        cluster_id[gi] += 1
                        rec["kept"] = True
                    else:
                        rec["kept"] = False
                    inst_logs[gi].append(rec)
                    if verbose:
                        gt = rooms[ri].obj_id == rooms[ri].obj_id[s]
                        iou = (mask & gt).sum() / max(1, (mask | gt).sum())
                        print("room %d target %3d: step %3d %4d/%4d points "
                              "IOU %.3f add %.3f rmv %.3f %s" % (
                                  ri, rec["target"], rec["steps"], cnt,
                                  rec["gt_points"], iou, rec["add_acc"],
                                  rec["rmv_acc"], rec["reason"]))
            # adaptive tail: all regions this wave were fragments -> widen K
            # for the NEXT wave (lane arrays re-expand on device)
            if (not in_tail and tail_seeds > K
                    and stats[seed_idx >= 0, 0].max(initial=0)
                    <= tail_threshold_steps):
                in_tail = True
                K = tail_seeds
                lanes = Gp * K * R
            wave += 1

        for gi, ri in enumerate(room_ids):
            lbl = fill_unlabeled(rooms[ri].points, cluster_label[gi])
            results[ri] = RoomResult(
                cluster_label=lbl,
                num_clusters=cluster_id[gi] - 1,
                instances=inst_logs[gi],
                timing={"net": net_time / max(len(room_ids), 1),
                        "setup": (time.time() - t_setup) / max(len(room_ids), 1)},
            )

    return results  # type: ignore[return-value]


def _split_program_batches(buckets: Dict[int, List[int]], dp: int,
                           budget: int = 2 << 20
                           ) -> List[Tuple[int, List[int]]]:
    """Split each bucket's room list into dp-aligned chunks of at most
    ``budget`` padded points per device program.

    The fused kernel's grid iterates rooms sequentially, and a single XLA
    execute that runs too long (~10 min) crashes the remote TPU worker
    (docs/tpu_pitfalls.md); 2M padded points/call keeps the largest
    batches to ~tens of seconds while typical eval sets (e.g. 12 x 16k)
    stay in one program. With ``dp`` devices the per-device grid is
    rooms/dp, so the cap scales by ``dp`` (and is never below it): each
    device sees at most ~``budget`` padded points per program."""
    out: List[Tuple[int, List[int]]] = []
    for psize, ids in sorted(buckets.items()):
        cap = max(dp, budget // psize * dp)
        for lo in range(0, len(ids), cap):
            out.append((psize, ids[lo:lo + cap]))
    return out


class FusedSegmenter:
    """Asynchronous fused-kernel segmentation: ``submit()`` packs rooms and
    dispatches device programs WITHOUT blocking on their results (JAX async
    dispatch); ``collect()`` materializes them. This is the prep/grow
    overlap primitive — a caller preps room group i+1 on the host while
    group i grows on the chip (``bench.py`` pipelined headline).
    ``segment_rooms_fused`` is the
    submit-everything-then-collect convenience wrapper; see its docstring
    for semantics and constraints.
    """

    def __init__(self, params, model_cfg: lrgnet.LrgNetConfig,
                 cfg: GrowConfig, *, min_bucket_size: int = 1024,
                 max_instances: int = 512, exact_median: bool = True,
                 interpret: bool = False, mesh=None, verbose: bool = False,
                 truncation_warnings: bool = True, num_restarts: int = 1,
                 scoring: str = "ml", beam_width: int = 0,
                 search_width: int = 0, num_parallel_seeds: int = 1,
                 seed_separation: int = 12, hbm_features=None,
                 shared_window=None, compact_transfer: bool = True):
        from ..ops import fused_grow as _fg

        if model_cfg.lite is not None:
            raise ValueError(
                "fused kernel supports the standard architecture")
        if cfg.num_inlier != cfg.num_neighbor:
            raise ValueError(
                "fused kernel requires num_inlier == num_neighbor")
        if cfg.feature_size > 24:
            raise ValueError("fused kernel supports feature_size <= 24")
        self.dp = 1
        if mesh is not None:
            from ..parallel.mesh import TP_AXIS
            if mesh.shape.get(TP_AXIS, 1) != 1:
                raise ValueError(
                    "fused inference mesh must have tp=1 (pure DP)")
            self.dp = mesh.devices.size
        self._fg = _fg
        self.cfg = cfg
        self.mesh = mesh
        self.min_bucket_size = min_bucket_size
        self.max_instances = max_instances
        self.exact_median = exact_median
        self.interpret = interpret
        self.verbose = verbose
        self.truncation_warnings = truncation_warnings
        if scoring not in ("ml", "np", "cp"):
            raise ValueError(f"unknown scoring {scoring!r}")
        if scoring == "cp" and "complete_head" not in params:
            raise ValueError(
                "'cp' scoring ranks attempts by the completeness head; the "
                "checkpoint has no complete_head (train with "
                "TrainConfig.completeness_head, e.g. "
                "val_run/run_completeness.py -> lrgnet_model5_cp.npz)")
        if (beam_width > 0) != (search_width > 0):
            raise ValueError(
                "beam mode needs BOTH beam_width and search_width > 0 "
                f"(got {beam_width}, {search_width})")
        if beam_width > 0:
            if num_restarts != 1:
                raise ValueError("beam and restart modes are exclusive")
            num_restarts = beam_width * search_width  # lanes per room
        self.parallel_seeds = num_parallel_seeds > 1
        self.seed_separation = seed_separation
        if self.parallel_seeds:
            # W seeds per room grow as concurrent lanes with wave-priority
            # commit — the relaxed mode of SURVEY.md §7 hard-part #1 (the
            # XLA engine's num_parallel_seeds rule, now on the fused
            # kernel); exclusive with the other lane uses
            if num_restarts != 1 or beam_width > 0:
                raise ValueError("parallel seeds are exclusive with "
                                 "restart/beam lanes")
            num_restarts = num_parallel_seeds  # lanes per room
        self.beam_width = beam_width
        self.search_width = search_width
        self.num_restarts = num_restarts
        self.hbm_features = hbm_features
        # shared-window (lane-cohort) passes: every per-step bounded pass
        # stacks ALL lanes' rows at ONE union column offset instead of one
        # dynamic offset per lane (the round-4 cost model's ~80 us/lane
        # issue overhead). Default OFF: the real-chip A/B
        # (val_run/run_shared_ab.py, 12-room bench set, min-of-5) measured
        # 0.670 s shared vs 0.628 s per-lane at identical NMI 0.988 — the
        # union window's extra slab iterations (different rooms' regions
        # sit in disjoint parts of the rank space, so the union spans most
        # of the room) outweigh the per-lane issue-overhead savings. The
        # mode stays available (bit-identical, tested) for workloads whose
        # lane windows genuinely overlap.
        self.shared_window = bool(shared_window)
        # compact-transfer packing: upload the group's rooms as UNPADDED
        # concatenated pack-order arrays and expand them into the kernel
        # slab layout on device (``ops/device_pack.py``) — bit-identical
        # inputs with ~40% fewer bytes over this box's host<->device
        # tunnel, and ONE bit-packed output fetch per program instead of
        # three (single-device path only; the dp-sharded path keeps the
        # padded per-shard device_puts)
        self.compact_transfer = bool(compact_transfer)
        # cfg.pallas_sampling means the same thing on the fused kernel as
        # on the wave engine: stratified rank sampling (one jittered draw
        # per stratum) instead of exact uniform without-replacement — the
        # fast path that skips the kernel's 33-pass threshold bisection
        # (pair with exact_median=False for full effect)
        self.stratified = bool(cfg.pallas_sampling)
        self.scoring = scoring
        self.weights = [jnp.asarray(a) for a in
                        _fg.pack_lrgnet_weights(params, cfg.feature_size,
                                                with_complete=scoring == "cp")]
        self._pending: List[dict] = []
        self._results: Dict[int, RoomResult] = {}

    def preferred_group(self, n_points: int) -> int:
        """Rooms of this size that one submit() fills best (one program)."""
        psize = _bucket_size(n_points, self.min_bucket_size)
        return self._fg.rooms_per_program_budget(
            psize, self.cfg.feature_size, self.num_restarts) * self.dp

    def submit(self, rooms: Dict[int, RoomFeatures]) -> None:
        """Pack ``rooms`` (id -> features) and dispatch their programs.

        Rooms past the VMEM cap (``MAX_FUSED_POINTS``) automatically run
        the HBM-resident-features kernel variant up to
        ``MAX_HBM_FUSED_POINTS`` (1M padded points): the feature block
        leaves VMEM and gathers DMA slab-major chunks on demand."""
        _fg = self._fg
        buckets: Dict[int, List[int]] = {}
        for i, rf in rooms.items():
            psize = _bucket_size(len(rf.points), self.min_bucket_size)
            if psize > _fg.MAX_HBM_FUSED_POINTS:
                raise ValueError(
                    f"room {i}: {len(rf.points)} points exceeds the fused "
                    f"kernel's {_fg.MAX_HBM_FUSED_POINTS}-point "
                    f"HBM-features budget; use segment_rooms")
            buckets.setdefault(psize, []).append(i)
        for psize, room_ids in _split_program_batches(buckets, self.dp):
            self._launch(psize, room_ids, rooms)

    def _launch(self, psize: int, room_ids: List[int],
                rooms: Dict[int, RoomFeatures]) -> None:
        _fg, cfg = self._fg, self.cfg
        t_setup = time.time()
        g = len(room_ids)
        # rooms per program: as many rooms as fit one program's VMEM grow
        # CONCURRENTLY (the merged multi-room kernel); pad the room count
        # so each device's grid divides evenly (inert tail rooms)
        # features leave VMEM past the VMEM cap; self.hbm_features=True
        # forces the DMA variant at any size (tests/benchmarks)
        hbm = (psize > _fg.MAX_FUSED_POINTS if self.hbm_features is None
               else self.hbm_features)
        per_dev = -(-g // self.dp)  # never pad beyond per-device rooms
        if (self.hbm_features is None and not hbm and per_dev > 1
                and self.num_restarts == 1 and self.beam_width == 0
                and not self.parallel_seeds and not self.shared_window):
            # round-5 packing auto-pick (verdict ask #4): below the VMEM
            # cap the DMA variant still frees the dominant VMEM consumer
            # (features, 4*FP bytes/pt), letting MORE rooms share one
            # program. Multi-room amortization (1.2-3.0x measured,
            # results/multiroom_sweep.txt) beats the DMA overhead
            # (0.90-1.10x, results/hbm_cap.txt parity row), so switch to
            # HBM packing whenever it raises this launch's rooms/program.
            gb_v = _fg.rooms_per_program_budget(psize, cfg.feature_size,
                                                self.num_restarts)
            gb_h = _fg.rooms_per_program_budget(psize, cfg.feature_size,
                                                self.num_restarts,
                                                hbm_features=True)
            hbm = min(gb_h, per_dev) > min(gb_v, per_dev)
        gb = min(_fg.rooms_per_program_budget(psize, cfg.feature_size,
                                              self.num_restarts,
                                              hbm_features=hbm), per_dev)
        if per_dev > gb:
            # the grid will span several programs: Mosaic double-buffers
            # every program-indexed window, so the per-program room count
            # must fit the pipelined (smaller) budget (round-4 fix: an
            # 8-room launch at P=131072 compiled 139.9/128 MB VMEM)
            gb = _fg.rooms_per_program_budget(psize, cfg.feature_size,
                                              self.num_restarts,
                                              pipelined=True,
                                              hbm_features=hbm)
        gp = -(-g // (gb * self.dp)) * (gb * self.dp)
        n_chunks = (psize // 8) // _fg.fused_chunk(psize // 8)
        shw = self.shared_window
        kw = dict(k=cfg.num_inlier, feature_size=cfg.feature_size,
                  max_steps=cfg.max_steps,
                  cluster_threshold=cfg.cluster_threshold,
                  max_instances=self.max_instances,
                  exact_median=self.exact_median,
                  interpret=self.interpret, rooms_per_program=gb,
                  lanes_per_room=self.num_restarts,
                  scoring=self.scoring,
                  beam_width=self.beam_width,
                  search_width=self.search_width,
                  parallel_seeds=self.parallel_seeds,
                  seed_separation=self.seed_separation,
                  hbm_features=hbm, stratified=self.stratified,
                  shared_window=shw)
        if self.compact_transfer and self.mesh is None:
            from ..ops import device_pack as _dp
            seeds_np = np.zeros((gp, 1), np.int32)
            for gi, ri in enumerate(room_ids):
                seeds_np[gi, 0] = cfg.seed * 1000003 + ri
            hs = _dp.stage_group([rooms[ri] for ri in room_ids],
                                 cfg.feature_size, seeds_np, gp)
            t0 = time.time()
            packed = _dp.device_pack(
                jnp.asarray(hs.feats_c), jnp.asarray(hs.vox_c),
                jnp.asarray(hs.rank_c), jnp.asarray(hs.obj_c),
                jnp.asarray(hs.eq_base), g=gp, p=psize,
                feature_size=cfg.feature_size,
                chunk=_fg.fused_chunk(psize // 8))
            labels_d, log_d, counters_d = _fg.fused_grow_rooms(
                jnp.asarray(hs.seeds), *packed, self.weights, **kw)
            buf_d = _dp.compact_outputs(
                labels_d, log_d, counters_d, jnp.asarray(hs.eq_base),
                eqcap=len(hs.feats_c))
            self._pending.append(dict(
                room_ids=room_ids,
                rooms={ri: rooms[ri] for ri in room_ids},
                compact=dict(buf_d=buf_d, eq_base=hs.eq_base,
                             pos_of_orig=hs.pos_of_orig, gp=gp),
                t_setup=t0 - t_setup, t_launch=t0))
            return
        # only the live feature rows ever leave the host (the kernel
        # zero-pads to its FP layout on device)
        feat = np.zeros((gp, cfg.feature_size, psize), np.float32)
        vox = np.full((gp, 24, psize // 8), _fg.PAD_VOX, np.int32)
        rank = np.full((gp, 8, psize // 8), 2 ** 30, np.int32)
        obj = np.zeros((gp, 8, psize // 8), np.int32)
        tbl = np.zeros((gp, 8, n_chunks), np.int32)
        seeds = np.zeros((gp, 1), np.int32)
        restores = {}
        for gi, ri in enumerate(room_ids):
            (packed, vox[gi], rank[gi], obj[gi],
             restores[gi]) = _fg.pack_room(rooms[ri], psize,
                                           cfg.feature_size)
            feat[gi] = packed[:cfg.feature_size]
            seeds[gi, 0] = cfg.seed * 1000003 + ri
        # inert pad rooms still need one valid point or the first seed
        # pick reduces over an empty candidate set
        for gi in range(g, gp):
            rank[gi, 0, 0] = 0
            vox[gi, :, 0] = 0
        for gi in range(gp):
            tbl[gi] = _fg.chunk_bounds(vox[gi], rank[gi],
                                       _fg.fused_chunk(psize // 8))
        t0 = time.time()
        if self.mesh is None:
            labels_d, log_d, counters_d = _fg.fused_grow_rooms(
                jnp.asarray(seeds), jnp.asarray(feat), jnp.asarray(vox),
                jnp.asarray(rank), jnp.asarray(obj), jnp.asarray(tbl),
                self.weights, **kw)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as PS

            from ..parallel.mesh import DP_AXIS
            sh = NamedSharding(self.mesh, PS(DP_AXIS))
            labels_d, log_d, counters_d = _fg.fused_grow_rooms_sharded(
                self.mesh, jax.device_put(seeds, sh),
                jax.device_put(feat, sh), jax.device_put(vox, sh),
                jax.device_put(rank, sh), jax.device_put(obj, sh),
                jax.device_put(tbl, sh), self.weights, **kw)
        self._pending.append(dict(
            room_ids=room_ids, rooms={ri: rooms[ri] for ri in room_ids},
            restores=restores, labels_d=labels_d, log_d=log_d,
            counters_d=counters_d, t_setup=t0 - t_setup, t_launch=t0))

    def collect(self) -> Dict[int, RoomResult]:
        """Materialize every pending program's results (launch order) and
        return ALL results accumulated since the last collect() — the
        store drains, so interleaved submit/collect cycles never return a
        room twice."""
        for rec in self._pending:
            if "compact" in rec:
                from ..ops import device_pack as _dp
                cp = rec["compact"]
                buf = np.asarray(jax.device_get(cp["buf_d"]))
                eqcap = (len(buf) - cp["gp"] * (self.max_instances * 8
                                                + 8 * 128))
                lab_eq, logs, counters = _dp.split_outputs(
                    buf, eqcap, cp["gp"], self.max_instances)
            else:
                labels = np.asarray(jax.device_get(rec["labels_d"]))
                logs = np.asarray(jax.device_get(rec["log_d"]))
                counters = np.asarray(jax.device_get(rec["counters_d"]))
            # net includes device queue wait of earlier programs (async
            # dispatch); per-room figures are diagnostics, not a benchmark
            net_time = time.time() - rec["t_launch"]
            g = len(rec["room_ids"])
            for gi, ri in enumerate(rec["room_ids"]):
                rf = rec["rooms"][ri]
                # labels come back in the sorted-interleaved layout;
                # restore maps original point index -> flat slot (compact
                # path: eq-order compact labels, pos_of_orig maps rf
                # order -> pack position)
                if "compact" in rec:
                    cp = rec["compact"]
                    b = cp["eq_base"][gi]
                    room_lab = lab_eq[b:b + len(rf.points)]
                    lbl = room_lab[cp["pos_of_orig"][gi]].astype(int)
                else:
                    lbl = labels[gi].reshape(-1)[
                        rec["restores"][gi]].astype(int)
                n_inst = int(counters[gi, 0, 1])
                if n_inst > self.max_instances and self.truncation_warnings:
                    # the kernel seeds to full coverage regardless
                    # (reference semantics) but only the first
                    # max_instances get log rows. stderr: stdout carries
                    # only reference-parity metric lines that
                    # results/*.txt parsers consume
                    print(f"warning: room {ri} grew {n_inst} instances; "
                          f"per-instance log truncated to "
                          f"{self.max_instances} rows (labels are "
                          f"complete; raise max_instances for full step "
                          f"counts)", file=sys.stderr)
                inst_logs = []
                for row in logs[gi, :min(n_inst, self.max_instances)]:
                    irec = {
                        "target": int(row[1]), "steps": int(row[2]),
                        "points": int(row[3]), "gt_points": int(row[4]),
                        "reason": REASON_NAMES.get(int(row[5]), "?"),
                        "add_acc": 0.0, "rmv_acc": 0.0,
                        "log_prob": float(row[6]), "kept": bool(row[7] > 0),
                    }
                    inst_logs.append(irec)
                    if self.verbose and irec["kept"]:
                        print("room %d target %3d: step %3d %4d/%4d points "
                              "%s" % (ri, irec["target"], irec["steps"],
                                      irec["points"], irec["gt_points"],
                                      irec["reason"]))
                self._results[ri] = RoomResult(
                    cluster_label=fill_unlabeled(rf.points, lbl),
                    num_clusters=int(counters[gi, 0, 0]),
                    instances=inst_logs,
                    timing={"net": net_time / g,
                            "setup": rec["t_setup"] / g})
        self._pending = []
        out = self._results
        self._results = {}
        return out


def segment_rooms_fused(params, model_cfg: lrgnet.LrgNetConfig,
                        rooms: List[RoomFeatures], cfg: GrowConfig,
                        min_bucket_size: int = 1024,
                        max_instances: int = 512,
                        exact_median: bool = True,
                        interpret: bool = False,
                        mesh=None,
                        verbose: bool = False,
                        truncation_warnings: bool = True,
                        num_restarts: int = 1,
                        scoring: str = "ml",
                        beam_width: int = 0,
                        search_width: int = 0,
                        num_parallel_seeds: int = 1,
                        seed_separation: int = 12,
                        hbm_features=None,
                        shared_window=None,
                        compact_transfer: bool = True) -> List[RoomResult]:
    """Segment rooms with the fused multi-room Pallas kernel
    (``ops/fused_grow.py``): the ENTIRE sequential-seed reference loop —
    seed pick in curvature order, grow-to-termination, visited/cluster
    commit — runs on-chip with zero host round-trips, and each program
    grows up to ``fused_grow.rooms_per_program_budget`` rooms CONCURRENTLY
    (rooms are independent in the reference; per-room results reproduce
    one-room-at-a-time execution up to float-ULP forward differences —
    see ``fused_grow._grow_kernel``). Exact reference
    semantics (sequential seeds, exact without-replacement sampling, exact
    masked median when ``exact_median``); the stochastic draws use the
    kernel's own counter-based PRNG stream, so per-seed trajectories
    differ from ``segment_rooms`` while the sampled distributions are
    identical.

    ``mesh`` (pure-DP): rooms shard over the dp axis; each device runs the
    multi-room kernel on its local rooms, weights replicated, no
    collectives (the room count pads to a multiple of
    device count * rooms-per-program with inert single-point rooms).

    Constraints (falling back is the caller's job): standard architecture
    (``lite=None``), ``num_inlier == num_neighbor``, feature_size <= 24
    (24-row layout covers the 19-d embedding-conditioned path),
    rooms <= ``fused_grow.MAX_FUSED_POINTS`` (524288) padded points (VMEM
    budget; per-step temporaries are column-chunked so only the room block
    itself scales with P).

    ``num_restarts`` > 1 grows that many attempts of every seed as
    concurrent kernel lanes and commits the best by ``scoring`` ('ml' =
    cumulative decision log-prob, 'np' = point count) - the reference's
    random-restart variant (``test_random_restart.py:169-197``) with a
    per-attempt rather than shared step budget.

    ``beam_width``/``search_width`` > 0 runs the reference's beam search
    (``test_beam_search.py:169-292``) instead: every round each queue
    entry spawns ``search_width`` one-step stochastic rollouts as lanes,
    the top ``beam_width`` expanding candidates survive, and Q[0]'s mask
    commits at stuck-twice termination.

    ``num_parallel_seeds`` (W) > 1 RELAXES the reference's sequential seed
    order: each wave grows the W lowest-curvature-rank seeds (>=
    ``seed_separation`` voxels apart) as concurrent lanes and commits them
    in seed-priority order — the XLA engine's ``num_parallel_seeds`` rule
    on the fused kernel. Up to ~Wx fewer sequential grow steps per room;
    validate NMI when raising it (SURVEY.md §7 hard-part #1).
    """
    seg = FusedSegmenter(
        params, model_cfg, cfg, min_bucket_size=min_bucket_size,
        max_instances=max_instances, exact_median=exact_median,
        interpret=interpret, mesh=mesh, verbose=verbose,
        truncation_warnings=truncation_warnings, num_restarts=num_restarts,
        scoring=scoring, beam_width=beam_width, search_width=search_width,
        num_parallel_seeds=num_parallel_seeds,
        seed_separation=seed_separation, hbm_features=hbm_features,
        shared_window=shared_window, compact_transfer=compact_transfer)
    seg.submit({i: rf for i, rf in enumerate(rooms)})
    res = seg.collect()
    return [res[i] for i in range(len(rooms))]


def segment_rooms_scheduled(params, model_cfg: lrgnet.LrgNetConfig,
                            rooms: List[RoomFeatures], cfg: GrowConfig,
                            slots_per_room: int = 2,
                            chunk_steps: int = 48,
                            seed_separation: int = 12,
                            min_bucket_size: int = 1024,
                            verbose: bool = False) -> List[RoomResult]:
    """Lane-scheduled greedy segmentation: each room owns ``slots_per_room``
    persistent lanes; whenever a lane's region terminates it is committed
    (curvature-priority, overlaps to earlier commits) and the lane is
    immediately re-seeded — long regions keep growing across chunk
    boundaries instead of stalling a synchronous wave. Visited masks refresh
    every chunk, so later lanes respect freshly committed regions (closer to
    the reference's sequential semantics than fixed multi-seed waves).

    MEASURED NOTE (synthetic, single v5e chip): the wave engine
    (``segment_rooms``) is FASTER here — idle lanes inside a wave's
    while_loop cost nothing extra, so its iteration count is already
    near-optimal, while this path pays per-chunk host round-trips through
    the transfer tunnel. This scheduler is kept as the resumable-state
    reference (``grow_chunk``) and for workloads with extreme per-room
    chain-length skew.
    """
    buckets: Dict[int, List[int]] = {}
    for i, rf in enumerate(rooms):
        buckets.setdefault(_bucket_size(len(rf.points), min_bucket_size),
                           []).append(i)
    results: List[Optional[RoomResult]] = [None] * len(rooms)
    base_rng = jax.random.PRNGKey(cfg.seed)
    key_counter = 0

    for psize, room_ids in sorted(buckets.items()):
        t_setup = time.time()
        G = len(room_ids)
        K = slots_per_room
        L = G * K
        f = cfg.feature_size
        pts = np.zeros((L, psize, f), np.float32)
        vox = np.zeros((L, psize, 3), np.int32)
        valid = np.zeros((L, psize), bool)
        curv_order = []
        for gi, ri in enumerate(room_ids):
            rf = rooms[ri]
            n = len(rf.points)
            for ki in range(K):
                li = gi * K + ki
                pts[li, :n] = rf.points
                vox[li, :n] = rf.voxels
                valid[li, :n] = True
            curv_order.append(np.argsort(rf.curvatures, kind="stable"))
        pts_d = jax.device_put(pts)
        vox_d = jax.device_put(vox)
        valid_d = jax.device_put(valid)

        room_visited = [np.concatenate([
            np.zeros(len(rooms[ri].points), bool),
            np.ones(psize - len(rooms[ri].points), bool)])
            for ri in room_ids]
        cluster_label = [np.zeros(len(rooms[ri].points), int)
                         for ri in room_ids]
        cluster_id = [1] * G
        inst_logs: List[List[dict]] = [[] for _ in room_ids]

        # host-side lane table
        lane_seed = np.full(L, -1, np.int64)       # -1 = idle
        lane_rank = np.zeros(L, np.int64)          # curvature rank of seed
        flags = np.zeros((L, psize), np.uint8)
        ints = np.zeros((L, 16), np.int32)
        ints[:, 14] = 1                            # all lanes start done/idle
        floats = np.zeros((L, 3), np.float32)
        rngs = np.array(jax.random.split(base_rng, L), copy=True)
        cur = np.zeros((L, psize), bool)
        net_time = 0.0

        def assign(gi: int, ki: int) -> bool:
            """Seed an idle lane of room gi; False when room exhausted."""
            nonlocal key_counter
            ri = room_ids[gi]
            n = len(rooms[ri].points)
            unvisited = ~room_visited[gi][:n]
            if not unvisited.any():
                return False
            order = curv_order[gi]
            active_seeds = [int(lane_seed[gi * K + kj])
                            for kj in range(K)
                            if kj != ki and lane_seed[gi * K + kj] >= 0]
            pick = -1
            rank = -1
            for rnk, s in enumerate(order):
                if not unvisited[s]:
                    continue
                if active_seeds and seed_separation > 0:
                    d = np.abs(rooms[ri].voxels[active_seeds]
                               - rooms[ri].voxels[s]).max(axis=1)
                    if (d < seed_separation).any():
                        continue
                pick = int(s)
                rank = rnk
                break
            if pick < 0:   # all remaining seeds too close to active ones
                return False
            li = gi * K + ki
            lane_seed[li] = pick
            lane_rank[li] = rank
            tgt = rooms[ri].obj_id == rooms[ri].obj_id[pick]
            fl = room_visited[gi].astype(np.uint8)
            fl[:n] |= tgt.astype(np.uint8) << 1
            fl[pick] |= 4                          # current = {seed}
            flags[li] = fl
            sv = rooms[ri].voxels[pick]
            ints[li, 0:3] = sv
            ints[li, 3:6] = sv
            ints[li, 6:9] = sv
            ints[li, 9:12] = sv
            ints[li, 12:16] = (0, 0, 0, 0)         # stuck, steps, done, reason
            floats[li] = 0.0
            key_counter += 1
            rngs[li] = np.asarray(jax.random.fold_in(base_rng, key_counter))
            return True

        # initial assignment
        for gi in range(G):
            for ki in range(K):
                assign(gi, ki)

        while (lane_seed >= 0).any():
            t0 = time.time()
            cur_d, ints_d, floats_d, rngs_d = grow_chunk(
                model_cfg, cfg, chunk_steps, params, pts_d, vox_d, valid_d,
                jax.device_put(flags), jnp.asarray(ints),
                jnp.asarray(floats), jnp.asarray(rngs))
            cur = np.array(jax.device_get(cur_d), copy=True)
            ints = np.array(jax.device_get(ints_d), copy=True)
            floats = np.array(jax.device_get(floats_d), copy=True)
            rngs = np.array(jax.device_get(rngs_d), copy=True)
            net_time += time.time() - t0

            # commit finished lanes in curvature-priority order per room
            for gi, ri in enumerate(room_ids):
                n = len(rooms[ri].points)
                done_slots = [ki for ki in range(K)
                              if lane_seed[gi * K + ki] >= 0
                              and ints[gi * K + ki, 14] > 0]
                for ki in sorted(done_slots,
                                 key=lambda kj: lane_rank[gi * K + kj]):
                    li = gi * K + ki
                    s = int(lane_seed[li])
                    lane_seed[li] = -1
                    if room_visited[gi][s]:
                        continue   # seed got swallowed by an earlier commit
                    mask = cur[li, :n] & ~room_visited[gi][:n]
                    if not mask.any():
                        mask = np.zeros(n, bool)
                        mask[s] = True
                    room_visited[gi][:n] |= mask
                    cnt = int(mask.sum())
                    rec = {
                        "target": int(rooms[ri].obj_id[s]),
                        "steps": int(ints[li, 13]), "points": cnt,
                        "gt_points": int((rooms[ri].obj_id
                                          == rooms[ri].obj_id[s]).sum()),
                        "reason": REASON_NAMES.get(int(ints[li, 15]), "?"),
                        "add_acc": float(floats[li, 1]),
                        "rmv_acc": float(floats[li, 2]),
                        "log_prob": float(floats[li, 0]),
                        "kept": cnt > cfg.cluster_threshold,
                    }
                    if rec["kept"]:
                        cluster_label[gi][mask] = cluster_id[gi]
                        cluster_id[gi] += 1
                    inst_logs[gi].append(rec)
                    if verbose:
                        gt = rooms[ri].obj_id == rooms[ri].obj_id[s]
                        iou = (mask & gt).sum() / max(1, (mask | gt).sum())
                        print("room %d target %3d: step %3d %4d/%4d points "
                              "IOU %.3f add %.3f rmv %.3f %s" % (
                                  ri, rec["target"], rec["steps"], cnt,
                                  rec["gt_points"], iou, rec["add_acc"],
                                  rec["rmv_acc"], rec["reason"]))

            # refresh flags for continuing lanes + re-seed idle ones
            for gi, ri in enumerate(room_ids):
                n = len(rooms[ri].points)
                vis_u8 = room_visited[gi].astype(np.uint8)
                for ki in range(K):
                    li = gi * K + ki
                    if lane_seed[li] >= 0:
                        # continuing: refreshed visited + same gt + current
                        fl = vis_u8.copy()
                        fl[:n] |= ((rooms[ri].obj_id
                                    == rooms[ri].obj_id[int(lane_seed[li])])
                                   .astype(np.uint8) << 1)
                        fl |= cur[li].astype(np.uint8) << 2
                        flags[li] = fl
                    else:
                        if not assign(gi, ki):
                            ints[li, 14] = 1      # stays idle/done

        for gi, ri in enumerate(room_ids):
            lbl = fill_unlabeled(rooms[ri].points, cluster_label[gi])
            results[ri] = RoomResult(
                cluster_label=lbl, num_clusters=cluster_id[gi] - 1,
                instances=inst_logs[gi],
                timing={"net": net_time / max(G, 1),
                        "setup": (time.time() - t_setup) / max(G, 1)})

    return results  # type: ignore[return-value]
