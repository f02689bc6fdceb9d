"""Fused whole-room Pallas grow kernel — the exact-semantics fast path.

One ``pallas_call`` segments ENTIRE rooms: the outer seed loop (lowest
unvisited curvature rank, reference ``test_region_grow.py:183-186``), the
inner grow loop (bbox neighbor masking, exact without-replacement 512/512
resampling, exact full-cloud median recentering, the LrgNet forward,
Bernoulli add/remove, stuck/termination bookkeeping, :208-306) and the
visited/cluster commit all run on-chip with the room RESIDENT in VMEM.
Zero host round-trips per room — this removes the ~15 ms/iteration serial
dispatch latency of the XLA ``while_loop`` path entirely
(docs/pallas_grow_kernel_design.md).

Design notes:
* **Layouts.** Per-point arrays are (8, P8) "sublane row-major": global
  index g = row * P8 + col (same convention as ``ops/masked_select``).
  Features are (16, P) f32 (rows = feature channels, zero-padded past F);
  voxel coords (24, P8) i32 (rows 0-7 = x, 8-15 = y, 16-23 = z).
* **Exact sampling without a sort.** k-subset = all masked points whose
  31-bit hash key <= the k-th smallest masked key, found by 33-step value
  bisection (counting passes). Slots are filled in index order via
  rank-matching (prefix-scan ranks == stratum targets); cnt < k falls back
  to the reference's natural-order + with-replacement fill.
* **Exact median** per recenter column by the same bisection on a monotone
  f32->int32 encoding: order statistics (cnt-1)//2 and cnt//2, averaged —
  identical to ``numpy.median`` / ``engine.grow.masked_median``.
* **Gather/scatter as MXU matmuls.** One-hot (k, CHUNK) slabs built by
  rank-compare; gathers are (16, CHUNK) @ (CHUNK, k) accumulations, the
  decision scatter and duplicate-slot OR (ml log-prob semantics,
  ``test_random_restart.py:251-271``) reuse the same slabs.
* **Forward in transposed space.** All matmuls are (Cout, Cin) @ (Cin, k);
  the tiled-global-feature head contraction is algebraically split into a
  per-region matvec bias (W_g @ pooled) plus a skip matmul — identical
  output, ~6x fewer head FLOPs than materializing the 1088-wide concat.
* **PRNG** is a counter-based murmur3-style integer hash (portable across
  interpret/compiled modes, deterministic per (room seed, draw counter)).
  The stochastic decisions therefore sample the same DISTRIBUTIONS as the
  reference (uniform subsets, Bernoulli thresholds) through a different
  stream — per-seed trajectories differ, quality metrics must match.
* **Range-bounded steps.** Points pack x-sorted (``pack_room``), so the
  chunks intersecting a step's bbox form one contiguous range; every
  per-step pass (prepare/bisection/sel-ranks/median/commit over 1024-col
  slabs, gathers/scatters over 128-col chunks) is bounded by it — per-step
  cost scales with the REGION footprint, not the room
  (docs/pallas_grow_kernel_design.md, "Range-bounded passes").

The kernel supports the standard architecture (lite=None) and
P <= MAX_FUSED_POINTS = 524288 (the v5e 128 MB VMEM budget: the room block
— features 32 MB, voxels/ranks/obj 10 MB, feature encodings 19 MB, masks
10 MB — plus weights and slab temporaries lands at ~115 MB at that size;
every per-step temporary is a column-chunked slab, so temporaries stay
P-independent); callers fall back to the XLA engine above the cap.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.int32(2 ** 30)
# murmur3 finalizer constants as wrapped int32
_C1 = np.int32(np.uint32(0x85EBCA6B).astype(np.int64) - 2 ** 32)
_C2 = np.int32(np.uint32(0xC2B2AE35).astype(np.int64) - 2 ** 32)
_CG = np.int32(np.uint32(0x9E3779B1).astype(np.int64) - 2 ** 32)

MAX_FUSED_POINTS = 524288


def fused_chunk(p8: int) -> int:
    """Column-chunk width shared by the kernel loops AND the host-built
    bounds table (``chunk_bounds``) — a gather slab covers 8*chunk points;
    128 keeps the (k, 8*chunk) one-hot at (512, 1024) f32 = 2 MB, reused
    across fori iterations. MUST be the single source of truth: a kernel
    chunk differing from the table chunk mis-maps every skip window."""
    return min(128, p8)

REASON_NONEIGHBOR = 1
REASON_NOEXPAND = 2
REASON_STUCK = 3
REASON_MAXSTEPS = 4


# ---------------------------------------------------------------------------
# Pure helpers (plain jnp — unit-testable on CPU, reused inside the kernel)
# ---------------------------------------------------------------------------

def hash_keys(idx: jnp.ndarray, ctr: jnp.ndarray) -> jnp.ndarray:
    """Counter-based 31-bit non-negative int32 hash of (idx, ctr).

    murmur3-style finalizer; int32 multiplies wrap (two's complement) and
    shifts are masked to behave logically.
    """
    h = idx.astype(jnp.int32) ^ (jnp.asarray(ctr, jnp.int32) * _CG)
    h = h ^ ((h >> 16) & 0xFFFF)
    h = h * _C1
    h = h ^ ((h >> 13) & 0x7FFFF)
    h = h * _C2
    h = h ^ ((h >> 16) & 0xFFFF)
    return h & jnp.int32(0x7FFFFFFF)


def uniform01(keys: jnp.ndarray) -> jnp.ndarray:
    """31-bit keys -> f32 uniforms in [0, 1) (24-bit mantissa draws)."""
    return ((keys >> 7) & 0xFFFFFF).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24))


def sortable_encode(x: jnp.ndarray) -> jnp.ndarray:
    """Monotone f32 -> int32 map: a < b (floats) <=> enc(a) < enc(b)."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return jnp.where(b >= 0, b, b ^ jnp.int32(0x7FFFFFFF))


def sortable_decode(enc: jnp.ndarray) -> jnp.ndarray:
    b = jnp.where(enc >= 0, enc, enc ^ jnp.int32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _midpoint(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """floor((lo+hi)/2) without int32 overflow (arithmetic shifts)."""
    return (lo >> 1) + (hi >> 1) + (lo & hi & 1)


def bisect_order_stat(enc: jnp.ndarray, mask: jnp.ndarray,
                      rank: jnp.ndarray, lo0: int, hi0: int) -> jnp.ndarray:
    """Smallest value v among ``enc[mask]`` with count(enc <= v) >= rank.

    enc/mask (R, C); rank scalar (1-based, >= 1, <= count). 33 counting
    passes over the masked array; exact for any int32 values in [lo0, hi0].
    """
    def body(_, carry):
        lo, hi = carry
        mid = _midpoint(lo, hi)
        c = jnp.sum(jnp.where(mask & (enc <= mid), 1, 0))
        return jnp.where(c >= rank, lo, mid + 1), jnp.where(c >= rank, mid, hi)

    lo, hi = jax.lax.fori_loop(
        0, 33, body, (jnp.int32(lo0), jnp.int32(hi0)))
    return lo


def bisect_order_stat_cols(enc: jnp.ndarray, mask_tiled: jnp.ndarray,
                           pool: jnp.ndarray, rank: jnp.ndarray,
                           lo0: int, hi0: int) -> jnp.ndarray:
    """Vectorized order statistic per column group.

    enc (G*8, C) int32 (group g occupies rows g*8..g*8+7), mask_tiled same
    shape, pool (G, G*8) 0/1 block-sum matrix, rank scalar or (G, 1) int32
    (per-group ranks — the fused-bisection path solves every per-step
    order statistic in ONE 33-pass loop). Returns (G, 1).

    EXACTNESS: the broadcast/pool matvecs move int32 values up to 2^31
    through the MXU. A plain f32 dot silently rounds the inputs (and on
    TPU a default-precision matmul truncates them to bf16's 8 mantissa
    bits — discovered as an NMI regression at room scale, where the
    mangled medians mis-centered the net inputs). Ints are therefore
    split into 16-bit halves (each exactly representable) and every dot
    runs at Precision.HIGHEST.
    """
    g = pool.shape[0]
    hp = jax.lax.Precision.HIGHEST

    def spread(v):
        """Exact (G, 1) int32 -> (G*8, 1) group broadcast via the pool."""
        up = lambda x: jnp.dot(pool.T, x.astype(jnp.float32),
                               preferred_element_type=jnp.float32,
                               precision=hp).astype(jnp.int32)
        return up(v >> 16) * 65536 + up(v & 0xFFFF)

    def body(_, carry):
        lo, hi = carry                                   # (G, 1)
        mid = _midpoint(lo, hi)
        mid_rows = spread(mid)
        ind = (mask_tiled & (enc <= mid_rows)).astype(jnp.float32)
        row_counts = jnp.sum(ind, axis=1, keepdims=True)          # (G*8, 1)
        counts = jnp.dot(pool, row_counts, preferred_element_type=jnp.float32,
                         precision=hp).astype(jnp.int32)
        take = counts >= rank
        return (jnp.where(take, lo, mid + 1), jnp.where(take, mid, hi))

    lo, hi = jax.lax.fori_loop(
        0, 33, body, (jnp.full((g, 1), lo0, jnp.int32),
                      jnp.full((g, 1), hi0, jnp.int32)))
    return lo


def prefix_ranks(sel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inclusive prefix sum of a 0/1 (8, C) array in global row-major order.

    Returns (ranks (8, C) int32, total scalar). Hillis-Steele within rows,
    static unroll across the 8 sublanes (as ops/masked_select._sample_kernel).
    """
    c = sel.shape[1]
    row_cum = sel.astype(jnp.int32)
    d = 1
    while d < c:
        shifted = jnp.concatenate(
            [jnp.zeros((8, d), jnp.int32), row_cum[:, :c - d]], axis=1)
        row_cum = row_cum + shifted
        d *= 2
    row_tot = row_cum[:, c - 1:c]                        # (8, 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    row_off = jnp.zeros((8, 1), jnp.int32)
    for r in range(1, 8):
        row_off = row_off + jnp.where(row_ids >= r, row_tot[r - 1:r], 0)
    return row_cum + row_off, row_off[7, 0] + row_tot[7, 0]


def sample_targets(cnt: jnp.ndarray, k: int, fill_u: jnp.ndarray
                   ) -> jnp.ndarray:
    """Target ranks (k, 1) for slot filling.

    cnt >= k: targets 1..k (the k selected-by-key points in index order —
    slot order is immaterial to the permutation-invariant net and the
    per-point Bernoulli outcomes). cnt < k: reference natural-order prefix
    + with-replacement uniform fill (``test_region_grow.py:237-252``).
    fill_u (k, 1) uniforms in [0, 1).
    """
    j = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    cntf = jnp.maximum(cnt, 1).astype(jnp.float32)
    fill = jnp.floor(fill_u * cntf).astype(jnp.int32) + 1
    fill = jnp.clip(fill, 1, jnp.maximum(cnt, 1))
    return jnp.where(j < jnp.minimum(cnt, k), j + 1, fill)


def select_mask(keys: jnp.ndarray, mask: jnp.ndarray, cnt: jnp.ndarray,
                k: int) -> jnp.ndarray:
    """Uniform k-subset of ``mask`` when cnt >= k (threshold at the k-th
    smallest masked key); ``mask`` itself when cnt <= k."""
    kth = bisect_order_stat(keys, mask, jnp.minimum(cnt, k), 0, 2 ** 31 - 1)
    # no jnp.where on bool vectors (Mosaic cannot legalize i1 selects)
    return mask & ((keys <= kth) | (cnt <= k))


def forward_confidences_t(w: List[jnp.ndarray], x_in: jnp.ndarray,
                          x_nb: jnp.ndarray, gb: int = 1
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transposed-space LrgNet forward.

    x_in/x_nb (16, gb*k) f32 (rows >= F zero; ``gb`` independent regions
    column-concatenated — the max-pool and the pooled-global head bias are
    per-region column blocks, everything else is per-slot so one wide MXU
    matmul serves all regions; per-column results are bit-identical to gb
    separate calls). ``w`` is the packed weight list
    (see ``pack_lrgnet_weights``). Returns (add_conf (1, gb*k),
    rmv_conf (1, gb*k)) — per-slot P(add=1)/P(remove=1), identical to
    softmax(logits)[:, 1] of ``models.lrgnet.forward`` (the tiled-global
    head is algebraically refactored into a matvec bias; same arithmetic
    result).
    """
    (in_w, nb_w, add_h, rmv_h, biases) = w
    k = x_in.shape[1] // gb

    def branch(ws, boff, x):
        skip = None
        for i, wm in enumerate(ws):
            cout = wm.shape[0]
            b = biases[0:cout, boff + i:boff + i + 1]
            x = jnp.dot(wm, x, preferred_element_type=jnp.float32) + b
            x = jnp.maximum(x, 0.0)
            if i == 1:
                skip = x
        return x, skip

    feat_in, skip_in = branch(in_w, 0, x_in)
    feat_nb, skip_nb = branch(nb_w, 5, x_nb)
    # per-region max-pool over each k-column block -> (512, gb)
    pooled_in = jnp.concatenate(
        [jnp.max(feat_in[:, g * k:(g + 1) * k], axis=1, keepdims=True)
         for g in range(gb)], axis=1)
    pooled_nb = jnp.concatenate(
        [jnp.max(feat_nb[:, g * k:(g + 1) * k], axis=1, keepdims=True)
         for g in range(gb)], axis=1)

    def head(h, boff, skip):
        wg_in, wg_nb, ws, w1, w2 = h
        b0 = biases[0:ws.shape[0], boff:boff + 1]
        bias_tot = (jnp.dot(wg_in, pooled_in,
                            preferred_element_type=jnp.float32)
                    + jnp.dot(wg_nb, pooled_nb,
                              preferred_element_type=jnp.float32) + b0)
        # broadcast each region's (256, 1) bias over its k columns
        bias_cols = jnp.concatenate(
            [jnp.broadcast_to(bias_tot[:, g:g + 1], (ws.shape[0], k))
             for g in range(gb)], axis=1)
        h1 = jnp.maximum(jnp.dot(ws, skip,
                                 preferred_element_type=jnp.float32)
                         + bias_cols, 0.0)
        b1 = biases[0:w1.shape[0], boff + 1:boff + 2]
        h2 = jnp.maximum(jnp.dot(w1, h1,
                                 preferred_element_type=jnp.float32) + b1, 0.0)
        b2 = biases[0:w2.shape[0], boff + 2:boff + 3]
        logits = jnp.dot(w2, h2, preferred_element_type=jnp.float32) + b2
        # rows 0/1 = the 2 logits; conf = softmax[..., 1] = sigmoid(l1 - l0)
        return jax.nn.sigmoid(logits[1:2, :] - logits[0:1, :])

    add_conf = head(add_h, 10, skip_nb)
    rmv_conf = head(rmv_h, 13, skip_in)
    return add_conf, rmv_conf


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------

def pack_lrgnet_weights(params, feature_size: int) -> List[np.ndarray]:
    """LrgNet params -> flat list of transposed/padded/split f32 arrays.

    Order: in_W0..4, nb_W0..4, add_{Wg_in,Wg_nb,Ws,W1,W2},
    rmv_{...}, biases (512, 16).
    Head layer-0 weights are split into global (inlier-pooled 0:512,
    neighbor-pooled 512:1024) and skip (1024:1088) row blocks of the
    reference's concat layout (``learn_region_grow_util.py:128-149``).
    """
    out: List[np.ndarray] = []
    biases = np.zeros((512, 16), np.float32)

    def branch(layers, boff):
        mats = []
        for i, layer in enumerate(layers):
            wt = np.asarray(layer["w"], np.float32).T          # (cout, cin)
            cout, cin = wt.shape
            cin_pad = 16 if i == 0 else cin
            m = np.zeros((cout, cin_pad), np.float32)
            m[:, :cin] = wt
            mats.append(m)
            biases[:cout, boff + i] = np.asarray(layer["b"], np.float32)
        return mats

    in_mats = branch(params["inlier_mlp"], 0)
    nb_mats = branch(params["neighbor_mlp"], 5)
    out.extend(in_mats)
    out.extend(nb_mats)

    def head(layers, boff):
        w0 = np.asarray(layers[0]["w"], np.float32)            # (1088, 256)
        g = w0.shape[0] - 64  # global feature width (2 * 512)
        half = g // 2
        wg_in = w0[:half].T.copy()                             # (256, 512)
        wg_nb = w0[half:g].T.copy()
        ws = w0[g:].T.copy()                                   # (256, 64)
        biases[:256, boff] = np.asarray(layers[0]["b"], np.float32)
        w1 = np.asarray(layers[1]["w"], np.float32).T.copy()   # (128, 256)
        biases[:128, boff + 1] = np.asarray(layers[1]["b"], np.float32)
        w2t = np.asarray(layers[2]["w"], np.float32).T         # (2, 128)
        w2 = np.zeros((8, 128), np.float32)
        w2[:2] = w2t
        biases[:2, boff + 2] = np.asarray(layers[2]["b"], np.float32)
        return [wg_in, wg_nb, ws, w1, w2]

    out.extend(head(params["add_head"], 10))
    out.extend(head(params["remove_head"], 13))
    out.append(biases)
    return out


PAD_VOX = 2 ** 20      # padding-slot voxel sentinel (outside any real bbox)


def pack_room(rf, p: int, feature_size: int):
    """RoomFeatures -> (feat (16,P) f32, vox (24,P8) i32, rank (8,P8) i32,
    obj (8,P8) i32, restore (n,) int64).

    Points are sorted by voxel (x, y, z) and laid out MOD-8 INTERLEAVED:
    sorted position s occupies flat slot g = (s % 8) * P8 + s // 8, so a
    column chunk [lo, hi) of the (8, P8) layout holds the CONTIGUOUS
    x-sorted span [8*lo, 8*hi) — per-chunk voxel bounds (``chunk_bounds``)
    are tight in x and the kernel can skip chunks outside a region's bbox.
    ``restore`` maps original point index -> flat slot (host un-permutes
    labels). rank = position in the stable ascending-curvature order (the
    reference's seed order); padding slots get rank BIG and PAD_VOX voxels.
    """
    n = len(rf.points)
    p8 = p // 8
    vox_in = rf.voxels.astype(np.int64)
    order = np.lexsort((vox_in[:, 2], vox_in[:, 1], vox_in[:, 0]))
    s = np.arange(n)
    slot = (s % 8) * p8 + s // 8          # flat slot of sorted position s
    feat = np.zeros((16, p), np.float32)
    feat[:feature_size, slot] = rf.points[order, :feature_size].T
    vox = np.full((3, p), PAD_VOX, np.int32)
    vox[:, slot] = rf.voxels[order].T
    vox24 = vox.reshape(3, 8, p8).reshape(24, p8)
    curv_order = np.argsort(rf.curvatures, kind="stable")
    rank_of_orig = np.empty(n, np.int64)
    rank_of_orig[curv_order] = np.arange(n)
    rank_flat = np.full(p, 2 ** 30, np.int64)
    rank_flat[slot] = rank_of_orig[order]
    rank = rank_flat.reshape(8, p8).astype(np.int32)
    obj_flat = np.full(p, -1, np.int64)
    obj_flat[slot] = rf.obj_id[order]
    obj = obj_flat.reshape(8, p8).astype(np.int32)
    pos_of_orig = np.empty(n, np.int64)
    pos_of_orig[order] = s
    restore = (pos_of_orig % 8) * p8 + pos_of_orig // 8
    return feat, vox24, rank, obj, restore


def chunk_bounds(vox24: np.ndarray, rank: np.ndarray,
                 chunk: int) -> np.ndarray:
    """Per-column-chunk voxel bounds table (8, n_chunks) i32.

    Rows 0-5 = min_x, max_x, min_y, max_y, min_z, max_z over the VALID
    points of each chunk (6-7 zero). A chunk with no valid points gets
    min BIG / max -BIG so it never intersects any bbox.
    """
    p8 = rank.shape[1]
    n_chunks = p8 // chunk
    valid = rank < BIG                                   # (8, p8)
    tbl = np.zeros((8, n_chunks), np.int32)
    for axis in range(3):
        v = vox24[axis * 8:(axis + 1) * 8]               # (8, p8)
        vr = v.reshape(8, n_chunks, chunk)
        mr = valid.reshape(8, n_chunks, chunk)
        tbl[2 * axis] = np.where(mr, vr, BIG).min(axis=(0, 2))
        tbl[2 * axis + 1] = np.where(mr, vr, -BIG).max(axis=(0, 2))
    return tbl


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _unpack_weight_refs(refs):
    in_w = [r[...] for r in refs[0:5]]
    nb_w = [r[...] for r in refs[5:10]]
    add_h = [r[...] for r in refs[10:15]]
    rmv_h = [r[...] for r in refs[15:20]]
    biases = refs[20][...]
    return (in_w, nb_w, add_h, rmv_h, biases)


def _grow_kernel(seed_ref, feat_ref, vox_ref, rank_ref, obj_ref, tbl_ref,
                 *refs, k: int, feature_size: int, max_steps: int,
                 cluster_threshold: int, max_instances: int, chunk: int,
                 exact_median: bool):
    (labels_ref, log_ref, counters_ref,
     visited_s, tried_s, current_s, sel_s, ranks_s, enc_s, enc_all_s) = (
        refs[21], refs[22], refs[23], refs[24], refs[25], refs[26],
        refs[27], refs[28], refs[29], refs[30])
    w = _unpack_weight_refs(refs[0:21])

    p8 = rank_ref.shape[2]
    p = 8 * p8
    n_chunks = p8 // chunk
    # Bounded PER-STEP passes (prepare/bisection/sel-ranks/median/commit)
    # iterate wider slabs than the gather/scatter chunk: their per-column
    # work is only 8-90 rows, so at chunk=128 the loop control dominates
    # the vector work (measured: -14% at P=65536, -30% at P=131072 when
    # first landed on 128-column slabs). 8 chunks = 1024 columns amortizes
    # the control 8x; the range bound keeps the same granularity in units
    # of slabs. n_chunks is a power of two (power-of-two buckets), so
    # slab_chunks always divides it.
    slab_chunks = min(8, n_chunks)
    n_slabs = n_chunks // slab_chunks
    sw = slab_chunks * chunk
    room_i = pl.program_id(0)
    room_seed = seed_ref[room_i, 0]
    # decorrelate adjacent room seeds with a wrapping golden-ratio
    # multiply (linear spacing would overlap counter streams)
    stream = room_seed * _CG

    rank = rank_ref[0]
    vox_x = vox_ref[0, 0:8, :]
    vox_y = vox_ref[0, 8:16, :]
    vox_z = vox_ref[0, 16:24, :]
    obj = obj_ref[0]
    valid = rank < BIG
    glob_idx = (jax.lax.broadcasted_iota(jnp.int32, (8, p8), 0) * p8
                + jax.lax.broadcasted_iota(jnp.int32, (8, p8), 1))
    kcol = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    visited_s[...] = jnp.zeros((8, p8), jnp.int32)
    tried_s[...] = jnp.zeros((8, p8), jnp.int32)
    labels_ref[...] = jnp.zeros((1, 8, p8), jnp.int32)
    log_ref[...] = jnp.zeros((1, max_instances, 8), jnp.float32)

    # recenter rows: xy + feature cols 6.. (engine.grow._recenter_cols)
    rec_rows = [0, 1] + list(range(6, feature_size))
    n_rec = len(rec_rows)
    if exact_median:
        # enc_s rows g*8+r = sortable encoding of feature rec_rows[g],
        # sublane r — built once per room
        for g, fr in enumerate(rec_rows):
            enc_row = sortable_encode(feat_ref[0, fr:fr + 1, :])   # (1, P)
            for r in range(8):
                enc_s[g * 8 + r: g * 8 + r + 1, :] = (
                    enc_row[:, r * p8:(r + 1) * p8])
        # block-sum pooling matrix pool[g, j] = (j // 8 == g), built from
        # iotas so it is not a captured constant
        pr = jax.lax.broadcasted_iota(jnp.int32, (n_rec, n_rec * 8), 0)
        pc = jax.lax.broadcasted_iota(jnp.int32, (n_rec, n_rec * 8), 1)
        pool = ((pc // 8) == pr).astype(jnp.float32)

    # fused-bisection pool: group 0 = inlier sample threshold, group 1 =
    # neighbor sample threshold, groups 2.. = recenter-feature medians
    g_all = 2 + (n_rec if exact_median else 0)
    pr_a = jax.lax.broadcasted_iota(jnp.int32, (g_all, g_all * 8), 0)
    pc_a = jax.lax.broadcasted_iota(jnp.int32, (g_all, g_all * 8), 1)
    pool_all = ((pc_a // 8) == pr_a).astype(jnp.float32)

    def chunk_intersects(cc, b):
        """Does column chunk cc's voxel-bounds box intersect bbox ``b``?

        ``b`` = (lx, hx, ly, hy, lz, hz) scalars. The per-chunk table is
        precomputed on host (``chunk_bounds``) over the x-sorted
        interleaved layout, so x bounds are tight."""
        lx, hx, ly, hy, lz, hz = b
        return ((tbl_ref[room_i, 1, cc] >= lx) & (tbl_ref[room_i, 0, cc] <= hx)
                & (tbl_ref[room_i, 3, cc] >= ly)
                & (tbl_ref[room_i, 2, cc] <= hy)
                & (tbl_ref[room_i, 5, cc] >= lz)
                & (tbl_ref[room_i, 4, cc] <= hz))

    def gather_pass(targets, b, cmin, cmax):
        """Rank-match gather over the room in column slabs (fori_loop, so
        Mosaic reuses ONE slab's temporaries — unrolled chunk loops blow
        the scoped-vmem stack at P=16384). Only chunks in the step's
        contiguous x range [cmin, cmax] are visited, and chunks whose
        voxel bounds miss the sampled set's bbox ``b`` are skipped
        entirely (the selection mask is zero there, so they contribute
        nothing).

        Reads sel/ranks from scratch via dynamic pl.ds slices (the proven
        ops/masked_select pattern). Returns (gathered (16, k) f32,
        idx_col (k, 1) f32 — the sampled points' exact global indices,
        f32-exact for P <= 2^24).
        """
        chunk_iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

        def slab(cc, carry):
            gathered, idx_col = carry
            lo = cc * chunk
            rr = ranks_s[pl.ds(0, 8), pl.ds(lo, chunk)]      # (8, chunk)
            ss = sel_s[pl.ds(0, 8), pl.ds(lo, chunk)]
            flat_rr = rr.reshape(1, 8 * chunk)
            flat_ss = ss.reshape(1, 8 * chunk)
            hit = (targets == flat_rr) & (flat_ss > 0)       # (k, 8*chunk)
            onehot = hit.astype(jnp.float32)
            feat_slab = jnp.concatenate(
                [feat_ref[0, :, pl.ds(r * p8 + lo, chunk)] for r in range(8)],
                axis=1)                                      # (16, 8*chunk)
            glob_row = jnp.concatenate(
                [r * p8 + lo + chunk_iota for r in range(8)],
                axis=1)                                      # (1, 8*chunk) i32
            # HIGHEST precision: a default-precision MXU pass would
            # truncate the gathered FEATURE VALUES to bf16
            gathered = gathered + jax.lax.dot_general(
                feat_slab, onehot, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            # index accumulation must be BIT-EXACT (equality compares drive
            # the scatter): int32 masked sum on the VPU, never the MXU
            idx_col = idx_col + jnp.sum(jnp.where(hit, glob_row, 0),
                                        axis=1, keepdims=True)
            return gathered, idx_col

        def body(cc, carry):
            return jax.lax.cond(chunk_intersects(cc, b),
                                lambda c: slab(cc, c), lambda c: c, carry)

        return jax.lax.fori_loop(
            cmin, cmax + 1, body,
            (jnp.zeros((16, k), jnp.float32), jnp.zeros((k, 1), jnp.int32)))

    def build_sel_ranks(row_off, thr, smin, smax):
        """Write the selection mask (``enc_all`` group rows <= ``thr``) and
        its 1-based global-row-major prefix ranks into sel_s / ranks_s —
        range slabs only (everything selected lies inside them; the
        gather never reads outside).

        Two bounded passes: (1) per-slab row totals, (2) in-slab row
        prefix + cross-slab and cross-row offsets. Replaces the full-room
        Hillis-Steele ``prefix_ranks`` in the per-step path."""
        thr_rows = jnp.full((8, 1), thr, jnp.int32)

        def ph1(s, rt):                                   # rt (8, n_slabs)
            slab = enc_all_s[pl.ds(row_off, 8), pl.ds(s * sw, sw)]
            t = jnp.sum((slab <= thr_rows).astype(jnp.int32), axis=1,
                        keepdims=True)                    # (8, 1)
            colmask = jax.lax.broadcasted_iota(
                jnp.int32, (8, n_slabs), 1) == s
            return rt + jnp.where(colmask, t, 0)

        rt = jax.lax.fori_loop(smin, smax + 1, ph1,
                               jnp.zeros((8, n_slabs), jnp.int32))
        # exclusive per-row prefix across slabs
        inc = rt
        d = 1
        while d < n_slabs:
            inc = inc + jnp.concatenate(
                [jnp.zeros((8, d), jnp.int32), inc[:, :n_slabs - d]],
                axis=1)
            d *= 2
        row_prior = inc - rt                              # (8, n_slabs)
        row_tot = inc[:, n_slabs - 1:n_slabs]             # (8, 1)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        row_base = jnp.zeros((8, 1), jnp.int32)
        for r in range(1, 8):
            row_base = row_base + jnp.where(row_ids >= r,
                                            row_tot[r - 1:r], 0)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (8, n_slabs), 1)

        def ph2(s, _):
            lo = s * sw
            sel = (enc_all_s[pl.ds(row_off, 8), pl.ds(lo, sw)]
                   <= thr_rows)
            cum = sel.astype(jnp.int32)
            d = 1
            while d < sw:
                cum = cum + jnp.concatenate(
                    [jnp.zeros((8, d), jnp.int32), cum[:, :sw - d]],
                    axis=1)
                d *= 2
            prior = jnp.sum(jnp.where(cidx == s, row_prior, 0), axis=1,
                            keepdims=True)                # (8, 1)
            sel_s[pl.ds(0, 8), pl.ds(lo, sw)] = sel.astype(jnp.int32)
            ranks_s[pl.ds(0, 8), pl.ds(lo, sw)] = (cum + prior
                                                   + row_base)
            return 0

        jax.lax.fori_loop(smin, smax + 1, ph2, 0)

    def sample_and_gather(row_off, thr, cnt, fill_ctr, b, cmin, cmax,
                          smin, smax):
        """Gather the k sampled feature columns + global indices for the
        selection ``enc_all[group] <= thr`` (threshold from the fused
        per-step bisection; INT32_MAX-1 when cnt <= k selects the whole
        mask). ``b`` bounds the selection; [cmin, cmax] is the step's
        chunk range, [smin, smax] the same range in slab units."""
        build_sel_ranks(row_off, thr, smin, smax)
        fill_u = uniform01(hash_keys(kcol, stream + fill_ctr))
        targets = sample_targets(cnt, k, fill_u)
        return gather_pass(targets, b, cmin, cmax)

    def scatter_pass(idx_col, dec_col, out_ref, b, cmin, cmax):
        """Decisions (k, 1) at sampled indices (k, 1) -> point mask written
        into ``out_ref`` ((8, P8) i32 scratch) + duplicate-slot-OR
        membership slot_sel (1, k).

        Column-chunked like ``gather_pass``: a full (k, P8) hit matrix is
        32 MB of VMEM at P=131072, but per (row, chunk) slab it is a
        reusable (k, chunk) temporary. Only the step's chunk range
        [cmin, cmax] is visited (the commit pass never reads outside it);
        range chunks outside bbox ``b`` (which bounds every sampled index)
        just zero-fill. ``out_ref`` reuses the sampling scratch
        (sel/ranks), dead once both gathers are done."""
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        chunk_iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        deci = dec_col > 0

        def body(cc, _):
            lo = cc * chunk
            inter = chunk_intersects(cc, b)

            @pl.when(inter)
            def _():
                res = jnp.zeros((8, chunk), jnp.int32)
                for r in range(8):
                    glob_row = r * p8 + lo + chunk_iota      # (1, chunk)
                    hit = (idx_col == glob_row) & deci       # (k, chunk)
                    row_hit = jnp.max(hit.astype(jnp.int32), axis=0,
                                      keepdims=True)         # (1, chunk)
                    res = jnp.where(rows8 == r, row_hit, res)
                out_ref[pl.ds(0, 8), pl.ds(lo, chunk)] = res

            @pl.when(~inter)
            def _():
                out_ref[pl.ds(0, 8), pl.ds(lo, chunk)] = jnp.zeros(
                    (8, chunk), jnp.int32)

            return 0

        jax.lax.fori_loop(cmin, cmax + 1, body, 0)
        idx_row = idx_col.reshape(1, k)
        dup_hit = (idx_col == idx_row) & deci                # (k, k)
        slot_sel = jnp.max(dup_hit.astype(jnp.int32), axis=0,
                           keepdims=True)                    # (1, k)
        return slot_sel

    def median_offset_from(v_lo, cnt, smin, smax):
        """(16, 1) recenter offset given the LOWER median order statistic
        ``v_lo`` (n_rec, 1) from the fused bisection.

        The upper statistic (rank cnt//2+1 = lower rank or lower rank + 1)
        is recovered with ONE bounded pass instead of a second 33-pass
        bisection: if count(enc <= v_lo) >= hi_r the upper statistic IS
        v_lo (duplicates), else it is the smallest masked value > v_lo.
        Reads ``enc_s`` masked with the current mask on the fly —
        sentinel slots (INT32_MAX) never satisfy ``<= v_lo`` and survive
        the ``> v_lo`` min as the same sentinel the old full pass used."""
        hi_r = cnt // 2 + 1
        hp = jax.lax.Precision.HIGHEST
        # exact int broadcast: 16-bit halves through HIGHEST-precision
        # dots (see bisect_order_stat_cols exactness note)
        up = lambda x: jnp.dot(pool.T, x.astype(jnp.float32),
                               preferred_element_type=jnp.float32,
                               precision=hp).astype(jnp.int32)
        v_lo_rows = up(v_lo >> 16) * 65536 + up(v_lo & 0xFFFF)

        def acc(s, carry):
            cle, rmin = carry
            lo = s * sw
            curt = jnp.concatenate(
                [current_s[pl.ds(0, 8), pl.ds(lo, sw)] > 0] * n_rec,
                axis=0)
            slab = jnp.where(
                curt, enc_s[pl.ds(0, n_rec * 8), pl.ds(lo, sw)],
                jnp.int32(2 ** 31 - 1))
            cle = cle + jnp.sum((slab <= v_lo_rows).astype(jnp.float32),
                                axis=1, keepdims=True)
            gt = jnp.where(slab > v_lo_rows, slab, jnp.int32(2 ** 31 - 1))
            rmin = jnp.minimum(rmin, jnp.min(gt, axis=1, keepdims=True))
            return cle, rmin

        cle_rows, row_min = jax.lax.fori_loop(
            smin, smax + 1, acc,
            (jnp.zeros((n_rec * 8, 1), jnp.float32),
             jnp.full((n_rec * 8, 1), 2 ** 31 - 1, jnp.int32)))
        c_le = jnp.dot(pool, cle_rows, preferred_element_type=jnp.float32,
                       precision=hp).astype(jnp.int32)       # (n_rec, 1)
        rowg = jax.lax.broadcasted_iota(jnp.int32, (n_rec, 1), 0)
        gmin = jnp.zeros((n_rec, 1), jnp.int32)
        for g in range(n_rec):
            gmin = gmin + jnp.where(rowg == g,
                                    jnp.min(row_min[g * 8:(g + 1) * 8]), 0)
        v_hi = jnp.where(c_le >= hi_r, v_lo, gmin)
        med = 0.5 * (sortable_decode(v_lo) + sortable_decode(v_hi))
        # scatter (n_rec, 1) medians to (16, 1) offset rows
        row16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        off = jnp.zeros((16, 1), jnp.float32)
        for g, fr in enumerate(rec_rows):
            off = off + jnp.where(row16 == fr, med[g, 0], 0.0)
        return off

    def _rec_rows_mask():
        row16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        rec = jnp.zeros((16, 1), dtype=bool)
        for fr in rec_rows:
            rec = rec | (row16 == fr)
        return rec

    def _bisect16_pair(enc, lo_r, hi_r):
        """Both median order statistics of each (16, k) row in ONE stacked
        33-pass bisection. A per-pass fori iteration costs ~2.4 us of loop
        overhead regardless of vector width (measured: two separate
        33-pass loops made fast mode SLOWER than the fused slab
        bisection), so the lower/upper stats bisect as 32 stacked rows.

        hi0 = 2**31 - 2 is safe because every encoding bisected here is
        strictly below INT32_MAX: sortable encodings of FINITE f32
        features reach INT32_MAX only for a NaN payload, which
        ``prepare_room`` never produces, and fill-slot sentinels clamp to
        IMAX (handled by the rank bound) — same invariant as the slab
        bisection's hi0 (see inner_body's "hi0 = IMAX-1" note)."""
        enc2 = jnp.concatenate([enc, enc], axis=0)          # (32, k)
        half = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0) < 16
        ranks = jnp.where(half, lo_r, hi_r)

        def body(_, carry):
            lo, hi = carry                                  # (32, 1)
            mid = _midpoint(lo, hi)
            c = jnp.sum((enc2 <= mid).astype(jnp.int32), axis=1,
                        keepdims=True)
            take = c >= ranks
            return (jnp.where(take, lo, mid + 1),
                    jnp.where(take, mid, hi))

        v, _ = jax.lax.fori_loop(
            0, 33, body, (jnp.full((32, 1), -2 ** 31, jnp.int32),
                          jnp.full((32, 1), 2 ** 31 - 2, jnp.int32)))
        return v[0:16], v[16:32]

    def sampled_median_offset(gathered):
        """(16, 1) offset from the 512 SAMPLED inliers (fast mode)."""
        enc = sortable_encode(gathered)                     # (16, k)
        v_lo, v_hi = _bisect16_pair(enc, jnp.int32((k - 1) // 2 + 1),
                                    jnp.int32(k // 2 + 1))
        med = 0.5 * (sortable_decode(v_lo) + sortable_decode(v_hi))
        return jnp.where(_rec_rows_mask(), med, 0.0)

    IMAX = jnp.int32(2 ** 31 - 1)

    def gathered_median_offset(gathered, cnt):
        """(16, 1) recenter offset, EXACT, for the cur_cnt <= k case.

        ``sample_targets`` fills slots [0, cnt) with ranks 1..cnt in
        natural order when cnt <= k, so the gathered block holds every
        current point exactly once there (fills beyond are duplicates).
        Masking the fill slots to the sentinel makes the full-mask order
        statistics computable from the (16, k) block in VMEM — the same
        multiset of f32 values the slab path encodes, hence bit-identical
        medians — without any slab pass."""
        enc = sortable_encode(gathered)                     # (16, k)
        slot_ok = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1) < cnt
        enc = jnp.where(slot_ok, enc, IMAX)
        v_lo, v_hi = _bisect16_pair(enc, (cnt - 1) // 2 + 1, cnt // 2 + 1)
        med = 0.5 * (sortable_decode(v_lo) + sortable_decode(v_hi))
        return jnp.where(_rec_rows_mask(), med, 0.0)

    def inner_body(carry):
        (done, steps, stuck, min_x, min_y, min_z, max_x, max_y, max_z,
         smin_x, smin_y, smin_z, smax_x, smax_y, smax_z,
         log_prob, reason, ctr) = carry
        b_in = (min_x, max_x, min_y, max_y, min_z, max_z)
        b_nb = (min_x - 1, max_x + 1, min_y - 1, max_y + 1,
                min_z - 1, max_z + 1)

        # --- contiguous chunk range covering b_nb in x --------------------
        # (the layout is x-sorted, pack_room, so chunks whose x span
        # intersects [lx, hx] form one contiguous index range; scalar scan
        # over the SMEM bounds table). Every per-step pass below is
        # bounded by [cmin, cmax] — per-step cost scales with the REGION,
        # not the room.
        def rng_body(cc, c):
            cmn, cmx = c
            inter = ((tbl_ref[room_i, 1, cc] >= b_nb[0])
                     & (tbl_ref[room_i, 0, cc] <= b_nb[1]))
            return (jnp.where(inter, jnp.minimum(cmn, cc), cmn),
                    jnp.where(inter, jnp.maximum(cmx, cc), cmx))

        cmin, cmax = jax.lax.fori_loop(
            0, n_chunks, rng_body,
            (jnp.int32(n_chunks - 1), jnp.int32(0)))
        smin = cmin // slab_chunks
        smax = cmax // slab_chunks

        # --- prepare pass: masked encodings + counts (branch-free) --------
        # enc_all rows: [0:8] inlier sample keys under the current mask,
        # [8:16] neighbor keys under the bbox-neighbor mask; sentinel IMAX
        # elsewhere. Keys
        # clamp to IMAX-1 so a (2^-31-probability) key equal to the
        # sentinel cannot alias a masked-out slot. y/z-missing chunks in
        # the x range write pure sentinel (their per-point masks are
        # all-false) — no conditionals anywhere in the bounded passes.
        def prep_body(s, c):
            lo = s * sw
            curs = current_s[pl.ds(0, 8), pl.ds(lo, sw)] > 0
            viss = visited_s[pl.ds(0, 8), pl.ds(lo, sw)] > 0
            vxs = vox_ref[0, 0:8, pl.ds(lo, sw)]
            vys = vox_ref[0, 8:16, pl.ds(lo, sw)]
            vzs = vox_ref[0, 16:24, pl.ds(lo, sw)]
            rks = rank_ref[0, pl.ds(0, 8), pl.ds(lo, sw)]
            nbs = ((rks < BIG) & ~curs & ~viss
                   & (vxs >= b_nb[0]) & (vxs <= b_nb[1])
                   & (vys >= b_nb[2]) & (vys <= b_nb[3])
                   & (vzs >= b_nb[4]) & (vzs <= b_nb[5]))
            gidx = (jax.lax.broadcasted_iota(jnp.int32, (8, sw), 0) * p8
                    + lo
                    + jax.lax.broadcasted_iota(jnp.int32, (8, sw), 1))
            ki = jnp.minimum(hash_keys(gidx, stream + ctr), IMAX - 1)
            kn = jnp.minimum(hash_keys(gidx, stream + ctr + 2), IMAX - 1)
            enc_all_s[pl.ds(0, 8), pl.ds(lo, sw)] = jnp.where(
                curs, ki, IMAX)
            enc_all_s[pl.ds(8, 8), pl.ds(lo, sw)] = jnp.where(
                nbs, kn, IMAX)
            # recenter encodings are NOT materialized: the bisection and
            # median passes mask enc_s with current_s on the fly, saving
            # an (n_rec*8, P8) VMEM slab (19 MB at P=524288 — the block
            # that used to push the 512k bucket past the 128 MB budget)
            return c + jnp.sum(jnp.concatenate([curs, nbs], axis=0)
                               .astype(jnp.int32), axis=1, keepdims=True)

        cnt2 = jax.lax.fori_loop(smin, smax + 1, prep_body,
                                 jnp.zeros((16, 1), jnp.int32))
        cur_cnt = jnp.sum(cnt2[0:8])
        nb_cnt = jnp.sum(cnt2[8:16])
        no_neighbor = nb_cnt == 0

        # --- ONE fused 33-pass bisection, range-bounded -------------------
        # solves every per-step order statistic (inlier k-subset key
        # threshold, neighbor threshold, each recenter feature's lower
        # median rank) over the sentinel-masked enc_all slabs.
        rank_rows = jax.lax.broadcasted_iota(jnp.int32, (g_all, 1), 0)
        ranks_all = (jnp.where(rank_rows == 0, jnp.minimum(cur_cnt, k), 0)
                     + jnp.where(rank_rows == 1, jnp.minimum(nb_cnt, k), 0)
                     + jnp.where(rank_rows >= 2, (cur_cnt - 1) // 2 + 1, 0))
        hp = jax.lax.Precision.HIGHEST

        def spread_all(v):
            up = lambda x: jnp.dot(pool_all.T, x.astype(jnp.float32),
                                   preferred_element_type=jnp.float32,
                                   precision=hp).astype(jnp.int32)
            return up(v >> 16) * 65536 + up(v & 0xFFFF)

        def bis_body(_, bc):
            lo_, hi_ = bc                                   # (g_all, 1)
            mid = _midpoint(lo_, hi_)
            mid_rows = spread_all(mid)

            def acc(s, rc):
                lo = s * sw
                keys = enc_all_s[pl.ds(0, 16), pl.ds(lo, sw)]
                ck = jnp.sum((keys <= mid_rows[0:16]).astype(jnp.float32),
                             axis=1, keepdims=True)
                if exact_median:
                    curt = jnp.concatenate(
                        [current_s[pl.ds(0, 8), pl.ds(lo, sw)] > 0]
                        * n_rec, axis=0)
                    em = jnp.where(
                        curt, enc_s[pl.ds(0, n_rec * 8), pl.ds(lo, sw)],
                        IMAX)
                    cm = jnp.sum((em <= mid_rows[16:]).astype(jnp.float32),
                                 axis=1, keepdims=True)
                    ck = jnp.concatenate([ck, cm], axis=0)
                return rc + ck

            rcounts = jax.lax.fori_loop(
                smin, smax + 1, acc,
                jnp.zeros((g_all * 8, 1), jnp.float32))
            counts = jnp.dot(pool_all, rcounts,
                             preferred_element_type=jnp.float32,
                             precision=hp).astype(jnp.int32)
            take = counts >= ranks_all
            return (jnp.where(take, lo_, mid + 1),
                    jnp.where(take, mid, hi_))

        # SMALL-STEP SKIP: when both candidate sets fit in k, the sample
        # thresholds are degenerate (IMAX-1 selects the whole mask) and
        # the exact medians are computable from the gathered block
        # (gathered_median_offset) — the entire slab bisection is dead
        # work. Early growth and sub-k instances take this branch, which
        # replaces 33 range-slab passes (each ~2 MXU dots + a slab scan)
        # with one stacked (32, k) in-register bisection.
        small = (cur_cnt <= k) & (nb_cnt <= k)

        def _run_bis(_):
            # hi0 = IMAX-1 keeps every probe mid strictly below the
            # sentinel
            out, _hi = jax.lax.fori_loop(
                0, 33, bis_body,
                (jnp.full((g_all, 1), -2 ** 31, jnp.int32),
                 jnp.full((g_all, 1), 2 ** 31 - 2, jnp.int32)))
            return out

        kth = jax.lax.cond(
            small, lambda _: jnp.full((g_all, 1), IMAX - 1, jnp.int32),
            _run_bis, 0)
        # cnt <= k selects the whole mask: IMAX-1 admits every non-sentinel
        thr_in = jnp.where(cur_cnt <= k, IMAX - 1, kth[0, 0])
        thr_nb = jnp.where(nb_cnt <= k, IMAX - 1, kth[1, 0])

        g_in, idx_in = sample_and_gather(0, thr_in, cur_cnt, ctr + 1,
                                         b_in, cmin, cmax, smin, smax)
        g_nb, idx_nb = sample_and_gather(8, thr_nb, nb_cnt, ctr + 3,
                                         b_nb, cmin, cmax, smin, smax)

        if exact_median:
            off = jax.lax.cond(
                small,
                lambda _: gathered_median_offset(g_in, cur_cnt),
                lambda _: median_offset_from(kth[2:, :], cur_cnt,
                                             smin, smax), 0)
        else:
            off = sampled_median_offset(g_in)
        x_in = g_in - off
        x_nb = g_nb - off

        add_conf, rmv_conf = forward_confidences_t(w, x_in, x_nb)  # (1, k)

        # decisions in column orientation (same hash values as a row draw;
        # conf reshaped (1,k)->(k,1) — the lane/sublane relayout Mosaic
        # accepts, cf. ops/masked_select t_col)
        u_add = uniform01(hash_keys(kcol, stream + ctr + 4))
        u_rmv = uniform01(hash_keys(kcol, stream + ctr + 5))
        add_dec = (u_add < add_conf.reshape(k, 1)).astype(jnp.int32)
        rmv_dec = (u_rmv < rmv_conf.reshape(k, 1)).astype(jnp.int32)

        # sel_s/ranks_s are dead after the second gather — reuse as the
        # scatter targets (chunked; no whole-room hit matrix in VMEM).
        # Scatter bounds are SLAB-ALIGNED so the slab-width commit pass
        # below never reads a stale chunk at the range edges.
        c0 = smin * slab_chunks
        c1 = (smax + 1) * slab_chunks - 1
        add_slot_sel = scatter_pass(idx_nb, add_dec, sel_s, b_nb, c0, c1)
        rmv_slot_sel = scatter_pass(idx_in, rmv_dec, ranks_s, b_in, c0, c1)

        eps = jnp.float32(1e-10)
        a_sel = add_slot_sel > 0
        r_sel = rmv_slot_sel > 0
        step_lp = (jnp.sum(jnp.log(jnp.where(a_sel, add_conf,
                                             1.0 - add_conf) + eps))
                   + jnp.sum(jnp.log(jnp.where(r_sel, rmv_conf,
                                               1.0 - rmv_conf) + eps))
                   ) / jnp.float32(k)

        # --- commit pass: mask update + reductions, range-bounded ---------
        # Outside [cmin, cmax] nothing changed: cur is empty there (range
        # covers bbox(cur)+1) and the scatters only wrote range chunks, so
        # new_cur == cur == 0 and current_s needs no write. On noneighbor
        # the reference breaks before the update — write cur back
        # unchanged (branch-free).
        keep_cur = no_neighbor

        def commit_body(s, c):
            addc, newc, mn, mx = c
            lo = s * sw
            curs = current_s[pl.ds(0, 8), pl.ds(lo, sw)] > 0
            adds = sel_s[pl.ds(0, 8), pl.ds(lo, sw)] > 0
            rmvs = ranks_s[pl.ds(0, 8), pl.ds(lo, sw)] > 0
            ncur = (curs | adds) & ~rmvs
            commit = (curs & keep_cur) | (ncur & ~keep_cur)
            current_s[pl.ds(0, 8), pl.ds(lo, sw)] = commit.astype(
                jnp.int32)
            c2 = jnp.sum(jnp.concatenate([adds, ncur], axis=0)
                         .astype(jnp.int32), axis=1, keepdims=True)
            vxyz = vox_ref[0, pl.ds(0, 24), pl.ds(lo, sw)]
            nc3 = jnp.concatenate([ncur] * 3, axis=0)       # (24, sw)
            mn = jnp.minimum(mn, jnp.min(jnp.where(nc3, vxyz, BIG),
                                         axis=1, keepdims=True))
            mx = jnp.maximum(mx, jnp.max(jnp.where(nc3, vxyz, -BIG),
                                         axis=1, keepdims=True))
            return addc + jnp.sum(c2[0:8]), newc + jnp.sum(c2[8:16]), mn, mx

        add_cnt, new_cnt, mins, maxs = jax.lax.fori_loop(
            smin, smax + 1, commit_body,
            (jnp.int32(0), jnp.int32(0),
             jnp.full((24, 1), BIG, jnp.int32),
             jnp.full((24, 1), -BIG, jnp.int32)))
        updated = add_cnt > 0
        vmin_x = jnp.min(mins[0:8])
        vmax_x = jnp.max(maxs[0:8])
        vmin_y = jnp.min(mins[8:16])
        vmax_y = jnp.max(maxs[8:16])
        vmin_z = jnp.min(mins[16:24])
        vmax_z = jnp.max(maxs[16:24])
        within = ((vmin_x >= smin_x) & (vmin_y >= smin_y) & (vmin_z >= smin_z)
                  & (vmax_x <= smax_x) & (vmax_y <= smax_y)
                  & (vmax_z <= smax_z))
        stuck_stop = within & (stuck >= 1)
        new_stuck = jnp.where(within, stuck + 1, 0)

        new_steps = steps + 1
        hit_cap = new_steps >= max_steps
        done_now = (no_neighbor | ~updated | (new_cnt == 0) | stuck_stop
                    | hit_cap)
        new_reason = jnp.where(
            no_neighbor, REASON_NONEIGHBOR,
            jnp.where(~updated | (new_cnt == 0), REASON_NOEXPAND,
                      jnp.where(stuck_stop, REASON_STUCK,
                                jnp.where(hit_cap, REASON_MAXSTEPS, 0))))

        def upd(v_new, v_old):
            return jnp.where(done_now, v_old, v_new)

        return (done | done_now,
                jnp.where(no_neighbor, steps, new_steps),
                upd(new_stuck, stuck),
                upd(vmin_x, min_x), upd(vmin_y, min_y), upd(vmin_z, min_z),
                upd(vmax_x, max_x), upd(vmax_y, max_y), upd(vmax_z, max_z),
                upd(jnp.minimum(smin_x, vmin_x), smin_x),
                upd(jnp.minimum(smin_y, vmin_y), smin_y),
                upd(jnp.minimum(smin_z, vmin_z), smin_z),
                upd(jnp.maximum(smax_x, vmax_x), smax_x),
                upd(jnp.maximum(smax_y, vmax_y), smax_y),
                upd(jnp.maximum(smax_z, vmax_z), smax_z),
                jnp.where(no_neighbor, log_prob, log_prob + step_lp),
                jnp.where(done_now, new_reason, reason),
                ctr + 8)

    def outer_body(carry):
        inst, cluster_id, ctr, _remaining = carry
        vis = visited_s[...] > 0
        tried = tried_s[...] > 0
        cand = valid & ~vis & ~tried
        seed_rank = jnp.min(jnp.where(cand, rank, BIG))
        seed_mask = cand & (rank == seed_rank)
        tried_s[...] = (tried | seed_mask).astype(jnp.int32)
        current_s[...] = seed_mask.astype(jnp.int32)
        sx = jnp.sum(jnp.where(seed_mask, vox_x, 0))
        sy = jnp.sum(jnp.where(seed_mask, vox_y, 0))
        sz = jnp.sum(jnp.where(seed_mask, vox_z, 0))
        seed_idx = jnp.sum(jnp.where(seed_mask, glob_idx, 0))
        target = jnp.sum(jnp.where(seed_mask, obj, 0))

        init = (jnp.bool_(False), jnp.int32(0), jnp.int32(0),
                sx, sy, sz, sx, sy, sz, sx, sy, sz, sx, sy, sz,
                jnp.float32(0.0), jnp.int32(0), ctr)
        final = jax.lax.while_loop(lambda c: ~c[0], inner_body, init)
        (_d, steps, _stk, *_rest) = final
        log_prob = final[15]
        reason = final[16]
        new_ctr = final[17] + 8

        cur = current_s[...] > 0
        cnt = jnp.sum(jnp.where(cur, 1, 0))
        visited_s[...] = ((visited_s[...] > 0) | cur).astype(jnp.int32)
        kept = cnt > cluster_threshold
        labels_ref[0] = jnp.where(cur & kept, cluster_id, labels_ref[0])
        gt_cnt = jnp.sum(jnp.where(valid & (obj == target), 1, 0))

        # masked instance-record write (axon rejects scalar VMEM stores)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (max_instances, 8), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (max_instances, 8), 1)
        fields = [seed_idx.astype(jnp.float32),
                  target.astype(jnp.float32),
                  steps.astype(jnp.float32),
                  cnt.astype(jnp.float32),
                  gt_cnt.astype(jnp.float32),
                  reason.astype(jnp.float32),
                  log_prob,
                  kept.astype(jnp.float32)]
        rec = jnp.zeros((max_instances, 8), jnp.float32)
        for i, f in enumerate(fields):
            rec = rec + jnp.where(col_i == i, f, 0.0)
        log_ref[0] = jnp.where(row_i == inst, rec, log_ref[0])

        vis2 = visited_s[...] > 0
        tried2 = tried_s[...] > 0
        remaining = jnp.sum(jnp.where(valid & ~vis2 & ~tried2, 1, 0))
        return (inst + 1, jnp.where(kept, cluster_id + 1, cluster_id),
                new_ctr, remaining)

    def outer_cond(carry):
        inst, _cid, _ctr, remaining = carry
        # seed until every point is visited-or-tried (the reference seeds
        # EVERY unvisited point, test_region_grow.py:186-188); the instance
        # LOG just stops recording past max_instances rows. Each iteration
        # marks >= 1 new point tried, so inst < p is a pure safety net.
        return (remaining > 0) & (inst < p)

    n_valid0 = jnp.sum(jnp.where(valid, 1, 0))
    inst, cluster_id, _ctr, _ = jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(0), jnp.int32(1), jnp.int32(0), n_valid0))

    row_c = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col_c = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    counters = (jnp.where((row_c == 0) & (col_c == 0), cluster_id - 1, 0)
                + jnp.where((row_c == 0) & (col_c == 1), inst, 0))
    counters_ref[0] = counters


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _sharded_fused_fn(mesh, k: int, feature_size: int, max_steps: int,
                      cluster_threshold: int, max_instances: int,
                      exact_median: bool, n_weights: int,
                      interpret: bool = False):
    """dp-sharded fused segmentation over the room axis: each device runs
    the whole-room kernel on its local rooms (no collectives; weights
    replicated). Callers pad the room count to a multiple of the dp size."""
    from jax.sharding import PartitionSpec as PS

    from ..parallel.mesh import DP_AXIS

    def local(seeds, feat, vox, rank, obj, tbl, *weights):
        return fused_grow_rooms(
            seeds, feat, vox, rank, obj, tbl, list(weights), k=k,
            feature_size=feature_size, max_steps=max_steps,
            cluster_threshold=cluster_threshold,
            max_instances=max_instances, exact_median=exact_median,
            interpret=interpret)

    shard = PS(DP_AXIS)
    rep = PS()
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(shard,) * 6 + (rep,) * n_weights,
        out_specs=(shard, shard, shard),
        check_vma=False)
    return jax.jit(fn)


def fused_grow_rooms_sharded(mesh, seeds, feat, vox, rank, obj, tbl,
                             weights, **kw):
    """Room-sharded ``fused_grow_rooms`` over a pure-DP mesh."""
    fn = _sharded_fused_fn(mesh, kw["k"], kw["feature_size"],
                           kw["max_steps"], kw["cluster_threshold"],
                           kw.get("max_instances", 512),
                           kw.get("exact_median", True), len(weights),
                           kw.get("interpret", False))
    return fn(seeds, feat, vox, rank, obj, tbl, *weights)


@functools.partial(jax.jit, static_argnames=(
    "k", "feature_size", "max_steps", "cluster_threshold", "max_instances",
    "exact_median", "interpret"))
def fused_grow_rooms(seeds, feat, vox, rank, obj, tbl, weights, *, k: int,
                     feature_size: int, max_steps: int,
                     cluster_threshold: int, max_instances: int = 512,
                     exact_median: bool = True, interpret: bool = False):
    """Segment G rooms (grid-sequential) fully on device.

    seeds (G, 1) i32 (per-room PRNG seeds); feat (G, 16, P) f32;
    vox (G, 24, P8) i32; rank/obj (G, 8, P8) i32;
    tbl (G, 8, n_chunks) i32 per-chunk voxel bounds (``chunk_bounds``);
    weights = pack_lrgnet_weights list.
    Returns (labels (G, 8, P8) i32, log (G, max_instances, 8) f32,
    counters (G, 8, 128) i32).
    """
    g_rooms, _, p = feat.shape
    p8 = p // 8
    chunk = fused_chunk(p8)
    if p8 % chunk != 0:
        # scatter_pass writes and gather_pass reads exactly n_chunks*chunk
        # columns of the scratch; a ragged tail would be read back stale
        raise ValueError(
            f"padded room width P={p} gives p8={p8} not divisible by the "
            f"chunk width {chunk}; use a power-of-two bucket size")
    n_rec = 2 + (feature_size - 6)

    kernel = functools.partial(
        _grow_kernel, k=k, feature_size=feature_size, max_steps=max_steps,
        cluster_threshold=cluster_threshold, max_instances=max_instances,
        chunk=chunk, exact_median=exact_median)

    w_specs = [pl.BlockSpec(wm.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for wm in weights]
    out_shapes = (
        jax.ShapeDtypeStruct((g_rooms, 8, p8), jnp.int32),
        jax.ShapeDtypeStruct((g_rooms, max_instances, 8), jnp.float32),
        jax.ShapeDtypeStruct((g_rooms, 8, 128), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec((1, 8, p8), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, max_instances, 8), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid=(g_rooms,),
        in_specs=[
            # whole (G, 1) seed table in SMEM, indexed by program_id (a
            # blocked (1, 1) SMEM spec violates the tiling constraint)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, p8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, p8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, p8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole (G, 8, n_chunks) chunk-bounds table in SMEM (scalar
            # reads drive the chunk-skip conditionals)
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((8, p8), jnp.int32),     # visited
            pltpu.VMEM((8, p8), jnp.int32),     # tried
            pltpu.VMEM((8, p8), jnp.int32),     # current
            pltpu.VMEM((8, p8), jnp.int32),     # sampling selection mask
            pltpu.VMEM((8, p8), jnp.int32),     # prefix ranks
            pltpu.VMEM((n_rec * 8, p8), jnp.int32),   # sortable feat enc
            # per-step MASKED sample keys (sentinel INT32_MAX outside each
            # group's mask): rows 0-7 inlier keys, 8-15 neighbor keys.
            # Written only for chunks in the step's bbox range; every
            # later per-step pass reads just that range. Recenter-feature
            # encodings are read straight from enc_s with the current
            # mask applied on the fly (no materialized copy).
            pltpu.VMEM((16, p8), jnp.int32),
        ],
        # the default 16 MB scoped-vmem budget is ~30 KB short at P=16384
        # (weights 3.2 MB + room 1.5 MB + slab temporaries); v5e has
        # 128 MB of VMEM and the P=524288 bucket needs ~115 MB of it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024),
        interpret=interpret,
    )(seeds, feat, vox, rank, obj, tbl, *weights)
