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
from typing import List, NamedTuple, Tuple

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
# with HBM-resident features (``hbm_features``) the 4*FP-byte/point feature
# window leaves VMEM entirely (gathers DMA slab-major chunks on demand), so
# the cap doubles; the remaining VMEM scalers (vox 12, masks/ranks 32,
# encodings 4*n_rec, keys 8 bytes/point) land ~88 MB at this size
MAX_HBM_FUSED_POINTS = 1048576


def fused_chunk(p8: int) -> int:
    """Column-chunk width shared by the kernel loops AND the host-built
    bounds table (``chunk_bounds``) — a gather slab covers 8*chunk points;
    128 keeps the (k, 8*chunk) one-hot at (512, 1024) f32 = 2 MB, reused
    across fori iterations. MUST be the single source of truth: a kernel
    chunk differing from the table chunk mis-maps every skip window."""
    return min(128, p8)

def feat_rows(feature_size: int) -> int:
    """Padded feature-row count of the device (FP, P) layout: sublane-
    aligned. 16 covers the standard 13-d features; 24 covers the 19-d
    embedding-conditioned path (C30, ``EMBEDDING_FEATURE_SIZE``,
    reference ``experimental/test_region_grow_emb.py``)."""
    if feature_size > 24:
        raise ValueError(f"feature_size {feature_size} exceeds the fused "
                         f"kernel's 24-row feature layout")
    return 16 if feature_size <= 16 else 24


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


def sample_targets_stratified(cnt: jnp.ndarray, k: int,
                              u: jnp.ndarray) -> jnp.ndarray:
    """Target ranks (k, 1) for the STRATIFIED fast path.

    cnt > k: slot j draws rank floor((j + u_j) * cnt / k) + 1 — one jittered
    pick per stratum of the masked set in global index order, the SAME
    validated semantics as the wave engine's Pallas sampler
    (``ops/masked_select.stratified_ranks``). Marginal inclusion probability
    is k/cnt like uniform without-replacement; the joint distribution is
    stratified instead (a documented relaxation — the bisection threshold
    machinery this replaces is the dominant sequential chain of the exact
    kernel's step). cnt <= k: identical to ``sample_targets`` (reference
    natural-order prefix + with-replacement fill).
    """
    j = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    cntf = jnp.maximum(cnt, 1).astype(jnp.float32)
    strat = jnp.floor((j.astype(jnp.float32) + u) * cntf
                      / jnp.float32(k)).astype(jnp.int32) + 1
    strat = jnp.clip(strat, 1, jnp.maximum(cnt, 1))
    fill = jnp.floor(u * cntf).astype(jnp.int32) + 1
    fill = jnp.clip(fill, 1, jnp.maximum(cnt, 1))
    seq = jnp.where(j < jnp.minimum(cnt, k), j + 1, fill)
    return jnp.where(cnt > k, strat, seq)


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

    A 6-element ``w`` carries the optional completeness head
    (``pack_lrgnet_weights(with_complete=True)``); the third return is then
    cp (1, gb) — per-region sigmoid completeness, identical to
    ``models.lrgnet.forward``'s ``complete`` output — else ``None``.
    """
    cp_h = None
    if len(w) == 6:
        (in_w, nb_w, add_h, rmv_h, biases, cp_h) = w
    else:
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
    if cp_h is None:
        return add_conf, rmv_conf, None
    # completeness head (models/lrgnet.py forward: [1024,256,64,1] MLP over
    # the pooled global feature, sigmoid) — per-region (1, gb) matvecs;
    # layer-0 split over the in/nb pooled halves like the add/rmv heads
    wcp_in, wcp_nb, wcp1, wcp2, bias_cp = cp_h
    h0 = jnp.maximum(
        jnp.dot(wcp_in, pooled_in, preferred_element_type=jnp.float32)
        + jnp.dot(wcp_nb, pooled_nb, preferred_element_type=jnp.float32)
        + bias_cp[0:wcp_in.shape[0], 0:1], 0.0)
    h1 = jnp.maximum(
        jnp.dot(wcp1, h0, preferred_element_type=jnp.float32)
        + bias_cp[0:wcp1.shape[0], 1:2], 0.0)
    h2 = (jnp.dot(wcp2, h1, preferred_element_type=jnp.float32)
          + bias_cp[0:wcp2.shape[0], 2:3])
    cp = jax.nn.sigmoid(h2[0:1, :])
    return add_conf, rmv_conf, cp


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------

def pack_lrgnet_weights(params, feature_size: int,
                        with_complete: bool = False) -> List[np.ndarray]:
    """LrgNet params -> flat list of transposed/padded/split f32 arrays.

    Order: in_W0..4, nb_W0..4, add_{Wg_in,Wg_nb,Ws,W1,W2},
    rmv_{...}, biases (512, 16).
    Head layer-0 weights are split into global (inlier-pooled 0:512,
    neighbor-pooled 512:1024) and skip (1024:1088) row blocks of the
    reference's concat layout (``learn_region_grow_util.py:128-149``).

    ``with_complete=True`` appends the completeness head's 5 arrays
    (cp_{Wg_in,Wg_nb,W1,W2}, bias_cp (256, 8)) — required by the fused
    kernel's 'cp' local-search scoring; ``params`` must contain
    ``complete_head`` (``LrgNetConfig.completeness_head``).
    """
    out: List[np.ndarray] = []
    biases = np.zeros((512, 16), np.float32)

    def branch(layers, boff):
        mats = []
        for i, layer in enumerate(layers):
            wt = np.asarray(layer["w"], np.float32).T          # (cout, cin)
            cout, cin = wt.shape
            cin_pad = feat_rows(feature_size) if i == 0 else cin
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
    if with_complete:
        if "complete_head" not in params:
            raise ValueError("with_complete=True needs a checkpoint trained "
                             "with the completeness head (complete_head)")
        layers = params["complete_head"]
        w0 = np.asarray(layers[0]["w"], np.float32)            # (1024, 256)
        half = w0.shape[0] // 2
        bias_cp = np.zeros((256, 8), np.float32)
        bias_cp[:256, 0] = np.asarray(layers[0]["b"], np.float32)
        w1 = np.asarray(layers[1]["w"], np.float32).T.copy()   # (64, 256)
        bias_cp[:64, 1] = np.asarray(layers[1]["b"], np.float32)
        w2t = np.asarray(layers[2]["w"], np.float32).T         # (1, 64)
        w2 = np.zeros((8, 64), np.float32)
        w2[:1] = w2t
        bias_cp[:1, 2] = np.asarray(layers[2]["b"], np.float32)
        out.extend([w0[:half].T.copy(), w0[half:].T.copy(), w1, w2,
                    bias_cp])
    return out


PAD_VOX = 2 ** 20      # padding-slot voxel sentinel (outside any real bbox)


def pack_room(rf, p: int, feature_size: int):
    """RoomFeatures -> (feat (FP,P) f32 with FP = feat_rows(feature_size),
    vox (24,P8) i32, rank (8,P8) i32,
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
    fp = feat_rows(feature_size)
    vox_in = rf.voxels.astype(np.int64)
    order = np.lexsort((vox_in[:, 2], vox_in[:, 1], vox_in[:, 0]))
    s = np.arange(n)
    slot = (s % 8) * p8 + s // 8          # flat slot of sorted position s
    feat = np.zeros((fp, p), np.float32)
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
    if len(refs) > 21:  # completeness head (5 extra arrays; 'cp' scoring)
        cp_h = [r[...] for r in refs[21:26]]
        return (in_w, nb_w, add_h, rmv_h, biases, cp_h)
    return (in_w, nb_w, add_h, rmv_h, biases)


class _RoomSt(NamedTuple):
    """Room-level state of the merged machine (scalars)."""

    fully_done: jnp.ndarray   # bool — no unvisited-untried candidates left
    need_seed: jnp.ndarray    # bool — pick a new seed next iteration
    inst: jnp.ndarray         # i32 — instances grown so far
    cluster_id: jnp.ndarray   # i32 — next cluster label (1-based)
    remaining: jnp.ndarray    # i32 — unvisited-untried valid points
    target: jnp.ndarray       # i32 — GT obj id of the current seed
    seed_idx: jnp.ndarray     # i32 — flat slot of the current seed


class _LaneSt(NamedTuple):
    """Lane-level state: one lane = one growth attempt of its room's
    current seed (``lanes_per_room`` restart attempts run concurrently;
    the reference re-runs them serially, ``test_random_restart.py:169-197``
    — parallel attempts see the same visited set, so only the step budget
    differs: per-attempt here vs the reference's shared counter)."""

    done: jnp.ndarray         # bool — this attempt terminated
    steps: jnp.ndarray        # i32
    stuck: jnp.ndarray        # i32 — consecutive non-growing-bbox steps
    mnx: jnp.ndarray          # i32 ×6 — current-attempt voxel bbox
    mny: jnp.ndarray
    mnz: jnp.ndarray
    mxx: jnp.ndarray
    mxy: jnp.ndarray
    mxz: jnp.ndarray
    smnx: jnp.ndarray         # i32 ×6 — all-steps-seen bbox (stuck test)
    smny: jnp.ndarray
    smnz: jnp.ndarray
    smxx: jnp.ndarray
    smxy: jnp.ndarray
    smxz: jnp.ndarray
    log_prob: jnp.ndarray     # f32 — cumulative decision log-prob (ml)
    ctr: jnp.ndarray          # i32 — PRNG draw counter
    score: jnp.ndarray        # f32 — restart score at termination
    cnt: jnp.ndarray          # i32 — final mask size at termination
    reason: jnp.ndarray       # i32
    cpv: jnp.ndarray          # f32 — latest completeness-head value ('cp')
    # parallel-seeds mode only (each lane grows its OWN seed):
    live: jnp.ndarray         # bool — this wave found a seed for the lane
    tgt: jnp.ndarray          # i32 — GT obj id of the lane's seed
    sidx: jnp.ndarray         # i32 — flat slot of the lane's seed


class _ParentSt(NamedTuple):
    """One beam-queue entry (mask lives in the parent scratch rows)."""

    valid: jnp.ndarray        # bool — entry exists in Q
    score: jnp.ndarray        # f32 — cumulative 'ml' log-prob or 'np' count
    cnt: jnp.ndarray          # i32 — mask size
    mnx: jnp.ndarray          # i32 ×6 — mask voxel bbox
    mny: jnp.ndarray
    mnz: jnp.ndarray
    mxx: jnp.ndarray
    mxy: jnp.ndarray
    mxz: jnp.ndarray


class _BeamSt(NamedTuple):
    """Room-level beam bookkeeping (``test_beam_search.py:155-189``):
    Q[0]'s seen-bbox drives the stuck-twice termination; ``steps`` counts
    executed rollouts for the per-instance record."""

    smnx: jnp.ndarray         # i32 ×6 — Q[0] seen bbox
    smny: jnp.ndarray
    smnz: jnp.ndarray
    smxx: jnp.ndarray
    smxy: jnp.ndarray
    smxz: jnp.ndarray
    stuck: jnp.ndarray        # i32
    steps: jnp.ndarray        # i32 — rollouts executed
    parents: tuple            # B × _ParentSt


# extra lane-stream decorrelation constant (wrapped odd int32)
_LS = np.int32(np.uint32(0xB5297A4D).astype(np.int64) - 2 ** 32)


def _grow_kernel(seed_ref, feat_ref, vox_ref, rank_ref, obj_ref, tbl_ref,
                 *refs, gb: int, lanes_per_room: int, scoring: str,
                 beam_width: int, search_width: int,
                 parallel_seeds: bool = False, seed_separation: int = 12,
                 hbm_features: bool = False, stratified: bool = False,
                 shared_window: bool = False,
                 k: int, feature_size: int, max_steps: int,
                 cluster_threshold: int, max_instances: int, chunk: int,
                 exact_median: bool):
    """Segment ``gb`` rooms CONCURRENTLY, ``lanes_per_room`` growth
    attempts per room, in one grid step.

    Multi-room batching (the round-3 headline restructuring): the reference
    loop is strictly sequential WITHIN a room (each grown region blocks
    later seeds, ``test_region_grow.py:186-188``) but rooms are independent,
    so one program interleaves gb rooms' state machines — every merged-loop
    iteration advances every live lane by one grow step. The per-step
    bounded passes (prepare / fused bisection / selection-ranks / gather /
    scatter / commit) carry a ~2.4 us fixed loop-control cost per fori
    iteration (docs/pallas_grow_kernel_design.md); stacking the lanes'
    range slabs as extra ROWS of the same pass amortizes that cost, and the
    LrgNet forward batches as column-concatenation (one wide MXU matmul for
    all lanes, ``forward_confidences_t(gb=...)``).

    ``lanes_per_room`` > 1 is the random-restart variant
    (``test_random_restart.py:169-197``): R attempts of each seed grow as
    parallel lanes over the same visited set; when all attempts of a room
    terminate, the best by ``scoring`` ('ml' cumulative decision log-prob,
    'np' point count, 'cp' completeness-head prediction) commits —
    argmax with first-tie, like the
    reference — and every lane reseeds at the next curvature rank. The
    reference runs attempts serially with a SHARED step counter; parallel
    lanes give each attempt its own ``max_steps`` budget (documented
    deviation, same as the XLA lane engine).

    Each lane's PRNG stream depends only on its room seed, lane index and
    draw counter, and every stacked pass keeps lanes in disjoint row blocks
    (block-diagonal pooling matmuls, per-lane gathers/scatters), so batched
    execution reproduces independent single-room programs: labels, counters
    and all integer log fields come out bit-identical on the test fixtures
    (tests/test_fused_grow.py batched-equivalence); the one caveat is that
    the width of the batched forward matmul can shift per-slot confidences
    by float ULPs, which in principle can flip a Bernoulli decision the way
    any PRNG-stream change would — quality metrics, not trajectories, are
    the cross-batch-size contract.

    Per-room machinery (exact reference semantics, single-room design notes
    in the module docstring): seeds in ascending curvature-rank order; one
    grow step = bbox-bounded neighbor masking, exact without-replacement
    512/512 sampling by hash-key bisection, exact full-cloud median
    recentering, the transposed LrgNet forward, Bernoulli add/remove,
    stuck/termination bookkeeping (``test_region_grow.py:183-306``). Rooms
    whose attempts all terminate commit visited/cluster labels and reseed
    in the same iteration; rooms out of candidates go inert (their lanes'
    pass rows are masked) until every room finishes.
    """
    use_cp = scoring == "cp"
    n_w = 26 if use_cp else 21  # 'cp' appends the completeness head's 5
    w = _unpack_weight_refs(refs[0:n_w])
    (labels_ref, log_ref, counters_ref,
     visited_s, tried_s, current_s, sel_s, ranks_s, enc_s, enc_all_s) = \
        refs[n_w:n_w + 10]
    beam = beam_width > 0
    extra = n_w + 10
    parent_s = None
    if beam:
        parent_s = refs[extra]
        extra += 1
    feat_stage = feat_sem = None
    if hbm_features:
        # features live in HBM as slab-major (G, n_chunks, FP, 8*chunk);
        # gathers DMA one slab at a time into this VMEM stage
        feat_stage, feat_sem = refs[extra], refs[extra + 1]
        extra += 2
    scoring_ml = scoring == "ml"
    BW, SW = beam_width, search_width

    R = lanes_per_room
    lanes = gb * R
    # padded feature rows (feat_rows); hbm layout is (G, n_chunks, FP, 8c);
    # shared-window layout is (G, FP*8, p8) — feature f's sublane r at row
    # f*8+r, so a gather chunk is ONE (FP*8, chunk) dynamic-offset read
    if hbm_features:
        FP = feat_ref.shape[2]
    elif shared_window:
        FP = feat_ref.shape[1] // 8
    else:
        FP = feat_ref.shape[1]
    p8 = rank_ref.shape[1]
    p = 8 * p8
    n_chunks = p8 // chunk
    # Bounded PER-STEP passes iterate wider slabs than the gather/scatter
    # chunk: their per-column work is rows-only, so at chunk=128 the loop
    # control dominates the vector work (measured: -14% at P=65536, -30%
    # at P=131072 when first landed on 128-column slabs). 8 chunks = 1024
    # columns amortizes the control 8x; n_chunks is a power of two, so
    # slab_chunks always divides it.
    slab_chunks = min(8, n_chunks)
    n_slabs = n_chunks // slab_chunks
    sw = slab_chunks * chunk
    base = pl.program_id(0) * gb
    # decorrelate adjacent room seeds with a wrapping golden-ratio
    # multiply (linear spacing would overlap counter streams); lanes of a
    # room shift by a second odd constant before the multiply
    streams = [(seed_ref[base + l // R, 0] + jnp.int32(l % R) * _LS) * _CG
               for l in range(lanes)]

    # recenter rows: xy + feature cols 6.. (engine.grow._recenter_cols)
    rec_rows = [0, 1] + list(range(6, feature_size))
    n_rec = len(rec_rows)
    # fused-bisection groups per lane: inlier sample threshold, neighbor
    # sample threshold, then (exact mode) each recenter feature's median
    g_all = 2 + (n_rec if exact_median else 0)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    IMAX = jnp.int32(2 ** 31 - 1)
    hp = jax.lax.Precision.HIGHEST
    glob_idx = (jax.lax.broadcasted_iota(jnp.int32, (8, p8), 0) * p8
                + jax.lax.broadcasted_iota(jnp.int32, (8, p8), 1))

    visited_s[...] = jnp.zeros((gb * 8, p8), jnp.int32)
    tried_s[...] = jnp.zeros((gb * 8, p8), jnp.int32)
    current_s[...] = jnp.zeros((lanes * 8, p8), jnp.int32)
    labels_ref[...] = jnp.zeros((gb, 8, p8), jnp.int32)
    log_ref[...] = jnp.zeros((gb, max_instances, 8), jnp.float32)

    def read_feat_slab(rm, cc):
        """Chunk cc of room rm as a (FP, 8*chunk) slab — sublane r's
        columns land at [r*chunk, (r+1)*chunk) (the one-hot gather layout).
        VMEM mode slices the resident window; HBM mode DMAs the slab-major
        chunk into the stage buffer (start+wait — the following MXU dot is
        the same order of latency, so the simple form costs ~the matmul)."""
        if hbm_features:
            dma = pltpu.make_async_copy(feat_ref.at[base + rm, cc],
                                        feat_stage, feat_sem)
            dma.start()
            dma.wait()
            return feat_stage[...]
        lo = cc * chunk
        if shared_window:
            # (FP*8, p8) layout: row f*8+r, col c is point (r*p8 + c)'s
            # feature f — the whole slab is ONE dynamic-offset read, and
            # the (FP*8, chunk) -> (FP, 8*chunk) reshape lands feature f's
            # sublane r at columns [r*chunk, (r+1)*chunk), exactly the
            # gather layout above
            return feat_ref[rm, :, pl.ds(lo, chunk)].reshape(FP, 8 * chunk)
        return jnp.concatenate(
            [feat_ref[rm, :, pl.ds(r * p8 + lo, chunk)] for r in range(8)],
            axis=1)

    if exact_median:
        # enc_s rows (g*n_rec + fi)*8 + r = sortable encoding of room g's
        # feature rec_rows[fi], sublane r — built once per program (shared
        # by all of the room's lanes, each masking with its own current)
        if hbm_features:
            # one sequential DMA sweep per room; encode each slab's rec
            # rows into the (rows, p8) layout chunk by chunk
            for g in range(gb):
                def enc_body(cc, _, g=g):
                    slab = read_feat_slab(g, cc)
                    lo = cc * chunk
                    for fi, fr in enumerate(rec_rows):
                        enc_row = sortable_encode(slab[fr:fr + 1, :])
                        for r in range(8):
                            row = (g * n_rec + fi) * 8 + r
                            enc_s[row:row + 1, pl.ds(lo, chunk)] = \
                                enc_row[:, r * chunk:(r + 1) * chunk]
                    return 0
                jax.lax.fori_loop(0, n_chunks, enc_body, 0)
        elif shared_window:
            # (FP*8, p8) layout: feature fr's 8 sublane rows are already
            # contiguous — one 8-row encode+store per (room, feature)
            for g in range(gb):
                for fi, fr in enumerate(rec_rows):
                    enc_s[pl.ds((g * n_rec + fi) * 8, 8), :] = \
                        sortable_encode(feat_ref[g, pl.ds(fr * 8, 8), :])
        else:
            for g in range(gb):
                for fi, fr in enumerate(rec_rows):
                    enc_row = sortable_encode(feat_ref[g, fr:fr + 1, :])
                    for r in range(8):
                        row = (g * n_rec + fi) * 8 + r
                        enc_s[row:row + 1, :] = \
                            enc_row[:, r * p8:(r + 1) * p8]

    def block_pool(n_groups):
        """(G, G*8) block-sum matrix pool[i, j] = (j // 8 == i), built from
        iotas so it is not a captured constant. Lanes occupy disjoint group
        blocks, so pooled reductions never mix lanes."""
        pr = jax.lax.broadcasted_iota(jnp.int32, (n_groups, n_groups * 8), 0)
        pc = jax.lax.broadcasted_iota(jnp.int32, (n_groups, n_groups * 8), 1)
        return ((pc // 8) == pr).astype(jnp.float32)

    pool_all = block_pool(lanes * g_all)
    pool_med = block_pool(lanes * n_rec) if exact_median else None

    def spread_groups(v, pool):
        """Exact (G, 1) int32 -> (G*8, 1) group broadcast via the pool.

        EXACTNESS: int32 values up to 2^31 move through the MXU as 16-bit
        halves (each f32-exact) at HIGHEST precision — a default-precision
        matmul would truncate them to bf16 (docs/tpu_pitfalls.md)."""
        up = lambda x: jnp.dot(pool.T, x.astype(jnp.float32),
                               preferred_element_type=jnp.float32,
                               precision=hp).astype(jnp.int32)
        return up(v >> 16) * 65536 + up(v & 0xFFFF)

    def stack_i32(vals, rows_each=1):
        """scalars -> (len*rows_each, 1) int32 column."""
        n = len(vals) * rows_each
        row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        out = jnp.zeros((n, 1), jnp.int32)
        for g, v in enumerate(vals):
            out = out + jnp.where((row // rows_each) == g,
                                  jnp.int32(0) + v, 0)
        return out

    def rec_rows_mask():
        rowf = jax.lax.broadcasted_iota(jnp.int32, (FP, 1), 0)
        rec = jnp.zeros((FP, 1), dtype=bool)
        for fr in rec_rows:
            rec = rec | (rowf == fr)
        return rec

    chunk_iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    # flat-slab global-index base: column j of a gather slab at chunk
    # offset lo is point (j // chunk) * p8 + lo + (j % chunk)
    _c8i = jax.lax.broadcasted_iota(jnp.int32, (1, 8 * chunk), 1)
    gbase8 = (_c8i // chunk) * p8 + (_c8i % chunk)

    if shared_window:
        def spread_exact(v, mat):
            """Exact int32 row spread ``mat @ v`` (mat 0/1 with one 1 per
            row) via 16-bit halves at HIGHEST precision (as
            spread_groups); shared-window mode only."""
            up = lambda x: jnp.dot(mat, x.astype(jnp.float32),
                                   preferred_element_type=jnp.float32,
                                   precision=hp).astype(jnp.int32)
            return up(v >> 16) * 65536 + up(v & 0xFFFF)

        # SHARED-WINDOW mode constants (R == 1, no beam): every bounded
        # per-step pass iterates ONE union slab range with full-height
        # stacked reads/writes — one dynamic column offset per iteration
        # instead of one per lane. The per-lane masks become data-driven
        # (a point outside a lane's bbox fails the voxel compares; a
        # selected point never exists outside the lane's own window), so
        # the results are bit-identical to the per-lane-window passes
        # (docs/pallas_grow_kernel_design.md, round-4 shared-offset
        # redesign: the per-lane dynamic-offset ops were ~80 us/lane/step
        # of issue overhead at ~2-3 us per op regardless of width).
        # enc_all rows are re-grouped [all-inlier | all-neighbor] so each
        # sample group reads as one contiguous block.
        rows_t = jax.lax.broadcasted_iota(jnp.int32, (lanes * 8, sw), 0)
        gbase_t = ((rows_t % 8) * p8
                   + jax.lax.broadcasted_iota(jnp.int32, (lanes * 8, sw), 1))
        # bisection compare columns: enc_all row i (keys) belongs to lane
        # i//8 group 0 (inlier) or 1 (neighbor); rec row i to lane
        # i//(n_rec*8) group 2 + (i//8) % n_rec
        _ri = jax.lax.broadcasted_iota(jnp.int32,
                                       (lanes * 16, lanes * g_all), 0)
        _ci = jax.lax.broadcasted_iota(jnp.int32,
                                       (lanes * 16, lanes * g_all), 1)
        _lane = jnp.where(_ri < lanes * 8, _ri // 8,
                          (_ri - lanes * 8) // 8)
        _grp = jnp.where(_ri < lanes * 8, 0, 1)
        sp_keys = (_ci == _lane * g_all + _grp).astype(jnp.float32)
        n_bis_rows = lanes * 16
        sp_rec = rep_rec = None
        if exact_median:
            _rr = jax.lax.broadcasted_iota(
                jnp.int32, (lanes * n_rec * 8, lanes * g_all), 0)
            _rc = jax.lax.broadcasted_iota(
                jnp.int32, (lanes * n_rec * 8, lanes * g_all), 1)
            sp_rec = (_rc == (_rr // (n_rec * 8)) * g_all + 2
                      + (_rr // 8) % n_rec).astype(jnp.float32)
            # current-mask replication lane rows -> rec rows (0/1 f32
            # matmul; > 0.5 recovers the bool exactly)
            _qr = jax.lax.broadcasted_iota(
                jnp.int32, (lanes * n_rec * 8, lanes * 8), 0)
            _qc = jax.lax.broadcasted_iota(
                jnp.int32, (lanes * n_rec * 8, lanes * 8), 1)
            rep_rec = (_qc == (_qr // (n_rec * 8)) * 8 + _qr % 8).astype(
                jnp.float32)
            n_bis_rows += lanes * n_rec * 8
        # count pooling back to (lane, group) rows: inlier block, neighbor
        # block, then rec blocks
        _pr = jax.lax.broadcasted_iota(jnp.int32,
                                       (lanes * g_all, n_bis_rows), 0)
        _pc = jax.lax.broadcasted_iota(jnp.int32,
                                       (lanes * g_all, n_bis_rows), 1)
        _src_lane = jnp.where(_pc < lanes * 8, _pc // 8,
                              jnp.where(_pc < lanes * 16,
                                        (_pc - lanes * 8) // 8,
                                        (_pc - lanes * 16) // (n_rec * 8)))
        _src_grp = jnp.where(_pc < lanes * 8, 0,
                             jnp.where(_pc < lanes * 16, 1,
                                       2 + ((_pc - lanes * 16) // 8)
                                       % max(n_rec, 1)))
        pool_shared = (_pr == _src_lane * g_all + _src_grp).astype(
            jnp.float32)

    def read_rows_dyn(ref, row, candidates):
        """ref[row:row+8, :] where ``row`` is traced but ranges over the
        static ``candidates`` row starts. Mosaic's load rule cannot take a
        dynamic start on the sublane dim — select by value over static
        reads instead (candidates are the room's few lane rows)."""
        out = ref[pl.ds(candidates[0], 8), pl.ds(0, p8)]
        for c in candidates[1:]:
            out = jnp.where(row == c, ref[pl.ds(c, 8), pl.ds(0, p8)], out)
        return out

    def chunk_intersects(rm, cc, b):
        """Does room rm's column chunk cc voxel-bounds box intersect ``b``?

        ``b`` = (lx, hx, ly, hy, lz, hz) scalars; per-chunk table built on
        host (``chunk_bounds``) over the x-sorted interleaved layout."""
        lx, hx, ly, hy, lz, hz = b
        t = lambda r: tbl_ref[base + rm, r, cc]
        return ((t(1) >= lx) & (t(0) <= hx) & (t(3) >= ly) & (t(2) <= hy)
                & (t(5) >= lz) & (t(4) <= hz))

    # ---------------------------------------------------------------------
    # Phase A: seed pick (per room, only when that room needs a seed)
    # ---------------------------------------------------------------------

    def seed_room(g, rst, lanes_g, bst=None):
        """Lowest unvisited-untried curvature rank becomes the next seed
        (reference ``test_region_grow.py:183-188``); writes tried and every
        lane's current, and resets the per-attempt lane states. In beam
        mode also resets the queue: Q = [(0, seed mask)]
        (``test_beam_search.py:162-166``) with the seed mask parked in
        parent slot 0. In parallel-seeds mode each lane gets its OWN seed:
        the R lowest-rank candidates separated by >= ``seed_separation``
        voxels (L-inf), the same wave rule as the XLA engine's
        ``_pick_wave_seeds`` — a documented relaxation of the reference's
        strictly sequential seed order (SURVEY.md §7 hard-part #1)."""
        def do(op):
            if beam:
                s, lg, b_ = op
            else:
                s, lg = op
            rank_g = rank_ref[pl.ds(g * 8, 8), :]
            vis = visited_s[pl.ds(g * 8, 8), pl.ds(0, p8)] > 0
            trd = tried_s[pl.ds(g * 8, 8), pl.ds(0, p8)] > 0
            cand = (rank_g < BIG) & ~vis & ~trd
            zi = jnp.int32(0)
            if parallel_seeds:
                vx = vox_ref[0, pl.ds(g * 8, 8), :]
                vy = vox_ref[1, pl.ds(g * 8, 8), :]
                vz = vox_ref[2, pl.ds(g * 8, 8), :]
                trd2 = trd
                lg2 = []
                for r, l in enumerate(lg):
                    seed_rank = jnp.min(jnp.where(cand, rank_g, BIG))
                    found = seed_rank < BIG
                    seed_mask = cand & (rank_g == seed_rank)
                    trd2 = trd2 | seed_mask
                    current_s[pl.ds((g * R + r) * 8, 8), pl.ds(0, p8)] = \
                        seed_mask.astype(jnp.int32)
                    sx = jnp.sum(jnp.where(seed_mask, vx, 0))
                    sy = jnp.sum(jnp.where(seed_mask, vy, 0))
                    sz = jnp.sum(jnp.where(seed_mask, vz, 0))
                    # exclude this wave's neighborhood from later picks
                    # (grown regions overlap less; _pick_wave_seeds rule)
                    near = ((jnp.abs(vx - sx) <= seed_separation)
                            & (jnp.abs(vy - sy) <= seed_separation)
                            & (jnp.abs(vz - sz) <= seed_separation))
                    cand = cand & ~seed_mask & (~near | ~found)
                    lg2.append(l._replace(
                        done=~found, steps=zi, stuck=zi,
                        mnx=sx, mny=sy, mnz=sz, mxx=sx, mxy=sy, mxz=sz,
                        smnx=sx, smny=sy, smnz=sz,
                        smxx=sx, smxy=sy, smxz=sz,
                        log_prob=jnp.float32(0.0), score=jnp.float32(0.0),
                        cnt=zi, reason=zi, cpv=jnp.float32(0.0),
                        live=found,
                        tgt=jnp.sum(jnp.where(seed_mask, obj_ref[g], 0)),
                        sidx=jnp.sum(jnp.where(seed_mask, glob_idx, 0))))
                tried_s[pl.ds(g * 8, 8), pl.ds(0, p8)] = trd2.astype(
                    jnp.int32)
                return s._replace(need_seed=jnp.bool_(False)), tuple(lg2)
            seed_rank = jnp.min(jnp.where(cand, rank_g, BIG))
            seed_mask = cand & (rank_g == seed_rank)
            tried_s[pl.ds(g * 8, 8), pl.ds(0, p8)] = (trd | seed_mask).astype(jnp.int32)
            sm32 = seed_mask.astype(jnp.int32)
            for r in range(R):
                current_s[pl.ds((g * R + r) * 8, 8), pl.ds(0, p8)] = sm32
            sx = jnp.sum(jnp.where(seed_mask, vox_ref[0, pl.ds(g * 8, 8), :],
                                   0))
            sy = jnp.sum(jnp.where(seed_mask, vox_ref[1, pl.ds(g * 8, 8), :],
                                   0))
            sz = jnp.sum(jnp.where(seed_mask, vox_ref[2, pl.ds(g * 8, 8), :],
                                   0))
            lg2 = tuple(l._replace(
                done=jnp.bool_(False), steps=zi, stuck=zi,
                mnx=sx, mny=sy, mnz=sz, mxx=sx, mxy=sy, mxz=sz,
                smnx=sx, smny=sy, smnz=sz, smxx=sx, smxy=sy, smxz=sz,
                log_prob=jnp.float32(0.0), score=jnp.float32(0.0),
                cnt=zi, reason=zi, cpv=jnp.float32(0.0)) for l in lg)
            s2 = s._replace(
                need_seed=jnp.bool_(False),
                target=jnp.sum(jnp.where(seed_mask, obj_ref[g], 0)),
                seed_idx=jnp.sum(jnp.where(seed_mask, glob_idx, 0)))
            if not beam:
                return s2, lg2
            parent_s[pl.ds(g * BW * 8, 8), pl.ds(0, p8)] = sm32
            invalid = _ParentSt(
                valid=jnp.bool_(False), score=jnp.float32(0.0), cnt=zi,
                mnx=zi, mny=zi, mnz=zi, mxx=zi, mxy=zi, mxz=zi)
            p0 = invalid._replace(valid=jnp.bool_(True), cnt=jnp.int32(1),
                                  mnx=sx, mny=sy, mnz=sz,
                                  mxx=sx, mxy=sy, mxz=sz)
            b2 = _BeamSt(smnx=sx, smny=sy, smnz=sz, smxx=sx, smxy=sy,
                         smxz=sz, stuck=zi, steps=zi,
                         parents=(p0,) + (invalid,) * (BW - 1))
            return s2, lg2, b2

        op0 = (rst, lanes_g, bst) if beam else (rst, lanes_g)
        return jax.lax.cond(rst.need_seed & ~rst.fully_done, do,
                            lambda op: op, op0)

    # ---------------------------------------------------------------------
    # Phase B: one grow step for every live lane
    # ---------------------------------------------------------------------

    def grow_step(rsts, lsts, pvalid=None, pscore=None):
        if beam:
            # a lane rolls out only while its room is mid-queue and its
            # parent slot is live
            active = [~rsts[l // R].fully_done & ~rsts[l // R].need_seed
                      & pvalid[l] for l in range(lanes)]
        else:
            active = [~rsts[l // R].fully_done & ~lsts[l].done
                      for l in range(lanes)]

        # --- contiguous chunk range covering each lane's b_nb in x -------
        # (points pack x-sorted, so intersecting chunks form one range;
        # scalar scan over the SMEM bounds table). Every bounded pass below
        # iterates i in [0, max range length); lane l reads its own slab
        # smin[l] + i (clamped), with contributions masked by i < slen[l] —
        # per-step cost scales with the LARGEST region footprint in the
        # batch, not the room size.
        def rng_body(cc, carry):
            out = []
            for l, st in enumerate(lsts):
                cmn, cmx = carry[2 * l], carry[2 * l + 1]
                rm = l // R
                inter = ((tbl_ref[base + rm, 1, cc] >= st.mnx - 1)
                         & (tbl_ref[base + rm, 0, cc] <= st.mxx + 1))
                out.append(jnp.where(inter, jnp.minimum(cmn, cc), cmn))
                out.append(jnp.where(inter, jnp.maximum(cmx, cc), cmx))
            return tuple(out)

        rng0 = (jnp.int32(n_chunks - 1), jnp.int32(0)) * lanes
        rng = jax.lax.fori_loop(0, n_chunks, rng_body, rng0)
        cmin, cmax = [], []
        for l in range(lanes):
            lo_, hi_ = rng[2 * l], rng[2 * l + 1]
            # inert lanes pin to chunk 0 (their rows are masked anyway);
            # hi >= lo keeps every clamped read in bounds
            lo_ = jnp.where(active[l], jnp.minimum(lo_, hi_), 0)
            hi_ = jnp.where(active[l], jnp.maximum(rng[2 * l + 1], lo_), 0)
            cmin.append(lo_)
            cmax.append(hi_)
        smin = [cmin[l] // slab_chunks for l in range(lanes)]
        smax = [cmax[l] // slab_chunks for l in range(lanes)]
        slen = [smax[l] - smin[l] + 1 for l in range(lanes)]
        clen = [cmax[l] - cmin[l] + 1 for l in range(lanes)]
        # slab-aligned chunk range (scatter writes / commit reads)
        ac0 = [smin[l] * slab_chunks for l in range(lanes)]
        aclen = [slen[l] * slab_chunks for l in range(lanes)]

        def list_max(xs):
            m = xs[0]
            for x in xs[1:]:
                m = jnp.maximum(m, x)
            return m

        max_slen = list_max(slen)
        max_clen = list_max(clen)
        max_aclen = list_max(aclen)

        def slab_lo(l, i):
            return (smin[l] + jnp.minimum(i, slen[l] - 1)) * sw

        if shared_window:
            # union slab window over the ACTIVE lanes: every bounded pass
            # iterates it with one shared column offset; inert lanes must
            # not drag it to slab 0 (their pins are arbitrary)
            u_lo = jnp.int32(n_slabs - 1)
            u_hi = jnp.int32(0)
            for l in range(lanes):
                u_lo = jnp.minimum(
                    u_lo, jnp.where(active[l], smin[l], n_slabs - 1))
                u_hi = jnp.maximum(u_hi, jnp.where(active[l], smax[l], 0))
            u_hi = jnp.maximum(u_hi, u_lo)
            u_len = u_hi - u_lo + 1
            # per-step per-lane scalar columns (built once; the passes
            # below consume them as broadcast compares)
            act8 = stack_i32([a.astype(jnp.int32) for a in active],
                             rows_each=8) > 0
            c_mnx = stack_i32([st.mnx - 1 for st in lsts], rows_each=8)
            c_mxx = stack_i32([st.mxx + 1 for st in lsts], rows_each=8)
            c_mny = stack_i32([st.mny - 1 for st in lsts], rows_each=8)
            c_mxy = stack_i32([st.mxy + 1 for st in lsts], rows_each=8)
            c_mnz = stack_i32([st.mnz - 1 for st in lsts], rows_each=8)
            c_mxz = stack_i32([st.mxz + 1 for st in lsts], rows_each=8)
            c_ctr_in = stack_i32(
                [streams[l] + lsts[l].ctr for l in range(lanes)],
                rows_each=8)
            c_ctr_nb = stack_i32(
                [streams[l] + lsts[l].ctr + 2 for l in range(lanes)],
                rows_each=8)

        # --- prepare pass: masked sample-key encodings + counts ----------
        # enc_all rows [l*16, l*16+8) = lane l's inlier keys under its
        # current mask, [l*16+8, l*16+16) = neighbor keys under the bbox
        # neighbor mask (shared-window mode re-groups the rows as
        # [all-inlier | all-neighbor] blocks); sentinel IMAX elsewhere.
        # Keys clamp to IMAX-1 so a key equal to the sentinel cannot alias
        # a masked-out slot.
        def prep_body_shared(i, acc):
            acc_in, acc_nb = acc
            lo = (u_lo + i) * sw
            curs = (current_s[pl.ds(0, lanes * 8), pl.ds(lo, sw)] > 0) & act8
            viss = visited_s[pl.ds(0, lanes * 8), pl.ds(lo, sw)] > 0
            vxs = vox_ref[0, pl.ds(0, lanes * 8), pl.ds(lo, sw)]
            vys = vox_ref[1, pl.ds(0, lanes * 8), pl.ds(lo, sw)]
            vzs = vox_ref[2, pl.ds(0, lanes * 8), pl.ds(lo, sw)]
            rks = rank_ref[pl.ds(0, lanes * 8), pl.ds(lo, sw)]
            nbs = ((rks < BIG) & ~curs & ~viss & act8
                   & (vxs >= c_mnx) & (vxs <= c_mxx)
                   & (vys >= c_mny) & (vys <= c_mxy)
                   & (vzs >= c_mnz) & (vzs <= c_mxz))
            gidx = gbase_t + lo
            ki = jnp.minimum(hash_keys(gidx, c_ctr_in), IMAX - 1)
            kn = jnp.minimum(hash_keys(gidx, c_ctr_nb), IMAX - 1)
            enc_all_s[pl.ds(0, lanes * 8), pl.ds(lo, sw)] = jnp.where(
                curs, ki, IMAX)
            enc_all_s[pl.ds(lanes * 8, lanes * 8), pl.ds(lo, sw)] = \
                jnp.where(nbs, kn, IMAX)
            return (acc_in + jnp.sum(curs.astype(jnp.int32), axis=1,
                                     keepdims=True),
                    acc_nb + jnp.sum(nbs.astype(jnp.int32), axis=1,
                                     keepdims=True))

        def prep_body(i, acc):
            parts = []
            for l, st in enumerate(lsts):
                rm = l // R
                ok = active[l] & (i < slen[l])
                lo = slab_lo(l, i)
                curs = current_s[pl.ds(l * 8, 8), pl.ds(lo, sw)] > 0
                viss = visited_s[pl.ds(rm * 8, 8), pl.ds(lo, sw)] > 0
                vxs = vox_ref[0, pl.ds(rm * 8, 8), pl.ds(lo, sw)]
                vys = vox_ref[1, pl.ds(rm * 8, 8), pl.ds(lo, sw)]
                vzs = vox_ref[2, pl.ds(rm * 8, 8), pl.ds(lo, sw)]
                rks = rank_ref[pl.ds(rm * 8, 8), pl.ds(lo, sw)]
                nbs = ((rks < BIG) & ~curs & ~viss
                       & (vxs >= st.mnx - 1) & (vxs <= st.mxx + 1)
                       & (vys >= st.mny - 1) & (vys <= st.mxy + 1)
                       & (vzs >= st.mnz - 1) & (vzs <= st.mxz + 1))
                gidx = (jax.lax.broadcasted_iota(jnp.int32, (8, sw), 0) * p8
                        + lo
                        + jax.lax.broadcasted_iota(jnp.int32, (8, sw), 1))
                ki = jnp.minimum(hash_keys(gidx, streams[l] + st.ctr),
                                 IMAX - 1)
                kn = jnp.minimum(hash_keys(gidx, streams[l] + st.ctr + 2),
                                 IMAX - 1)
                enc_all_s[pl.ds(l * 16, 8), pl.ds(lo, sw)] = jnp.where(
                    curs, ki, IMAX)
                enc_all_s[pl.ds(l * 16 + 8, 8), pl.ds(lo, sw)] = jnp.where(
                    nbs, kn, IMAX)
                parts.append(curs & ok)
                parts.append(nbs & ok)
            allr = jnp.concatenate(parts, axis=0).astype(jnp.int32)
            return acc + jnp.sum(allr, axis=1, keepdims=True)

        if shared_window:
            acc_in, acc_nb = jax.lax.fori_loop(
                0, u_len, prep_body_shared,
                (jnp.zeros((lanes * 8, 1), jnp.int32),
                 jnp.zeros((lanes * 8, 1), jnp.int32)))
            cur_cnt = [jnp.sum(acc_in[l * 8:(l + 1) * 8])
                       for l in range(lanes)]
            nb_cnt = [jnp.sum(acc_nb[l * 8:(l + 1) * 8])
                      for l in range(lanes)]
        else:
            cnts = jax.lax.fori_loop(0, max_slen, prep_body,
                                     jnp.zeros((lanes * 16, 1), jnp.int32))
            cur_cnt = [jnp.sum(cnts[l * 16:l * 16 + 8])
                       for l in range(lanes)]
            nb_cnt = [jnp.sum(cnts[l * 16 + 8:l * 16 + 16])
                      for l in range(lanes)]
        no_neighbor = [nb_cnt[l] == 0 for l in range(lanes)]

        # --- ONE fused 33-pass bisection for every lane's order stats ----
        # SMALL-STEP SKIP: when every live lane's candidate sets fit in
        # k, the thresholds are degenerate and exact medians come from the
        # gathered blocks — the whole slab bisection is dead work.
        small = [(cur_cnt[l] <= k) & (nb_cnt[l] <= k) for l in range(lanes)]
        all_small = small[0] | ~active[0]
        for l in range(1, lanes):
            all_small = all_small & (small[l] | ~active[l])

        rows_ga = jax.lax.broadcasted_iota(jnp.int32, (lanes * g_all, 1), 0)
        ranks_all = jnp.zeros((lanes * g_all, 1), jnp.int32)
        for l in range(lanes):
            b0 = l * g_all
            ranks_all = (
                ranks_all
                + jnp.where(rows_ga == b0, jnp.minimum(cur_cnt[l], k), 0)
                + jnp.where(rows_ga == b0 + 1, jnp.minimum(nb_cnt[l], k), 0))
            if exact_median:
                ranks_all = ranks_all + jnp.where(
                    (rows_ga >= b0 + 2) & (rows_ga < b0 + g_all),
                    (cur_cnt[l] - 1) // 2 + 1, 0)

        def bis_body_shared(_, bc):
            lo_, hi_ = bc                                # (lanes*g_all, 1)
            mid = _midpoint(lo_, hi_)
            mid_keys = spread_exact(mid, sp_keys)        # (lanes*16, 1)
            mid_rec = (spread_exact(mid, sp_rec) if exact_median else None)

            def acc(i, rc):
                lo = (u_lo + i) * sw
                keys = enc_all_s[pl.ds(0, lanes * 16), pl.ds(lo, sw)]
                out = rc[0] + jnp.sum((keys <= mid_keys).astype(jnp.float32),
                                      axis=1, keepdims=True)
                if not exact_median:
                    return (out,)
                cur_f = jnp.where(
                    (current_s[pl.ds(0, lanes * 8), pl.ds(lo, sw)] > 0)
                    & act8, jnp.float32(1.0), jnp.float32(0.0))
                curt = jnp.dot(rep_rec, cur_f,
                               preferred_element_type=jnp.float32,
                               precision=hp) > 0.5
                em = jnp.where(curt, enc_s[pl.ds(0, lanes * n_rec * 8),
                                           pl.ds(lo, sw)], IMAX)
                return (out, rc[1] + jnp.sum(
                    (em <= mid_rec).astype(jnp.float32), axis=1,
                    keepdims=True))

            init = ((jnp.zeros((lanes * 16, 1), jnp.float32),)
                    + ((jnp.zeros((lanes * n_rec * 8, 1), jnp.float32),)
                       if exact_median else ()))
            rcounts = jax.lax.fori_loop(0, u_len, acc, init)
            stacked = (jnp.concatenate(rcounts, axis=0)
                       if exact_median else rcounts[0])
            counts = jnp.dot(pool_shared, stacked,
                             preferred_element_type=jnp.float32,
                             precision=hp).astype(jnp.int32)
            take = counts >= ranks_all
            return (jnp.where(take, lo_, mid + 1), jnp.where(take, mid, hi_))

        def bis_body(_, bc):
            lo_, hi_ = bc                                # (lanes*g_all, 1)
            mid = _midpoint(lo_, hi_)
            mid_rows = spread_groups(mid, pool_all)      # (lanes*g_all*8, 1)

            def acc(i, rc):
                parts = []
                for l in range(lanes):
                    rm = l // R
                    ok = active[l] & (i < slen[l])
                    lo = slab_lo(l, i)
                    mr = mid_rows[l * g_all * 8:(l + 1) * g_all * 8]
                    keys = enc_all_s[pl.ds(l * 16, 16), pl.ds(lo, sw)]
                    parts.append((keys <= mr[0:16]) & ok)
                    if exact_median:
                        # recenter encodings are masked with the lane's
                        # current on the fly (no materialized copy)
                        curt = jnp.concatenate(
                            [current_s[pl.ds(l * 8, 8), pl.ds(lo, sw)] > 0]
                            * n_rec, axis=0)
                        em = jnp.where(
                            curt,
                            enc_s[pl.ds(rm * n_rec * 8, n_rec * 8),
                                  pl.ds(lo, sw)], IMAX)
                        parts.append((em <= mr[16:]) & ok)
                allv = jnp.concatenate(parts, axis=0).astype(jnp.float32)
                return rc + jnp.sum(allv, axis=1, keepdims=True)

            rcounts = jax.lax.fori_loop(
                0, max_slen, acc,
                jnp.zeros((lanes * g_all * 8, 1), jnp.float32))
            counts = jnp.dot(pool_all, rcounts,
                             preferred_element_type=jnp.float32,
                             precision=hp).astype(jnp.int32)
            take = counts >= ranks_all
            return (jnp.where(take, lo_, mid + 1), jnp.where(take, mid, hi_))

        def _run_bis(_):
            # hi0 = IMAX-1 keeps every probe mid strictly below the sentinel
            out, _hi = jax.lax.fori_loop(
                0, 33, bis_body_shared if shared_window else bis_body,
                (jnp.full((lanes * g_all, 1), -2 ** 31, jnp.int32),
                 jnp.full((lanes * g_all, 1), 2 ** 31 - 2, jnp.int32)))
            return out

        if stratified and not exact_median:
            # STRATIFIED fast path: selection is the whole mask (targets
            # stride the mask prefix ranks, ``sample_targets_stratified``)
            # and medians come from the sampled block — the 33-pass slab
            # bisection (the dominant sequential chain of a big-region
            # step) is statically dead
            kth = jnp.full((lanes * g_all, 1), IMAX - 1, jnp.int32)
        else:
            kth = jax.lax.cond(
                all_small,
                lambda _: jnp.full((lanes * g_all, 1), IMAX - 1, jnp.int32),
                _run_bis, 0)
        if stratified:
            thr_in = [jnp.int32(IMAX - 1)] * lanes
            thr_nb = [jnp.int32(IMAX - 1)] * lanes
        else:
            # cnt <= k selects the whole mask: IMAX-1 admits every
            # non-sentinel
            thr_in = [jnp.where(cur_cnt[l] <= k, IMAX - 1,
                                kth[l * g_all, 0]) for l in range(lanes)]
            thr_nb = [jnp.where(nb_cnt[l] <= k, IMAX - 1,
                                kth[l * g_all + 1, 0])
                      for l in range(lanes)]

        # --- selection masks + prefix ranks, range slabs only -------------
        row_id = jax.lax.broadcasted_iota(jnp.int32,
                                          (lanes * 8, lanes * 8), 0)
        col_id = jax.lax.broadcasted_iota(jnp.int32,
                                          (lanes * 8, lanes * 8), 1)
        # strictly-lower-triangular-within-lane accumulator: row_base[i] =
        # sum of same-lane earlier-sublane row totals (exact through the
        # MXU: counts < 2^24 are f32-exact)
        lower_tri = (((row_id // 8) == (col_id // 8))
                     & ((col_id % 8) < (row_id % 8))).astype(jnp.float32)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (lanes * 8, n_slabs), 1)

        def build_sel_ranks(row_off, thrs):
            """Write each lane's SELECTION-MASKED 1-based global-row-major
            prefix ranks into ranks_s rows [l*8, l*8+8) (0 on unselected
            slots — sample targets are >= 1, so the gather's rank-match
            needs no separate selection read) — two bounded passes
            (per-slab row totals, then in-slab prefix + cross-slab/
            cross-row offsets)."""
            def ph1(i, rt):
                parts = []
                for l in range(lanes):
                    ok = active[l] & (i < slen[l])
                    lo = slab_lo(l, i)
                    slab = enc_all_s[pl.ds(l * 16 + row_off, 8),
                                     pl.ds(lo, sw)]
                    t = jnp.sum((slab <= thrs[l]).astype(jnp.int32),
                                axis=1, keepdims=True)
                    s_l = smin[l] + jnp.minimum(i, slen[l] - 1)
                    colmask = (jax.lax.broadcasted_iota(
                        jnp.int32, (8, n_slabs), 1) == s_l) & ok
                    parts.append(jnp.where(colmask, t, 0))
                return rt + jnp.concatenate(parts, axis=0)

            rt = jax.lax.fori_loop(0, max_slen, ph1,
                                   jnp.zeros((lanes * 8, n_slabs),
                                             jnp.int32))
            inc = rt
            d = 1
            while d < n_slabs:
                inc = inc + jnp.concatenate(
                    [jnp.zeros((lanes * 8, d), jnp.int32),
                     inc[:, :n_slabs - d]], axis=1)
                d *= 2
            row_prior = inc - rt                        # (lanes*8, n_slabs)
            row_tot = inc[:, n_slabs - 1:n_slabs]       # (lanes*8, 1)
            row_base = jnp.dot(lower_tri, row_tot.astype(jnp.float32),
                               preferred_element_type=jnp.float32,
                               precision=hp).astype(jnp.int32)

            def ph2(i, _):
                sels = []
                for l in range(lanes):
                    lo = slab_lo(l, i)
                    sels.append(enc_all_s[pl.ds(l * 16 + row_off, 8),
                                          pl.ds(lo, sw)] <= thrs[l])
                sel = jnp.concatenate(sels, axis=0)     # (lanes*8, sw)
                cum = sel.astype(jnp.int32)
                d = 1
                while d < sw:
                    cum = cum + jnp.concatenate(
                        [jnp.zeros((lanes * 8, d), jnp.int32),
                         cum[:, :sw - d]], axis=1)
                    d *= 2
                # Mosaic workaround: reducing per-lane SLICES of the
                # narrow (lanes*8, n_slabs) arrays under a where() aborts
                # the TPU compiler's custom-call lowering pass ("Check
                # failed: limits[i] <= dim(i)", server build 2026-08-19);
                # the masked reduction must run on the FULL array against
                # a per-row target-slab column, and only the (lanes*8, 1)
                # result may be row-sliced (repro:
                # scripts/mosaic_repro_min.py — case 5 aborts, case 7
                # is this formulation).
                rowq = jax.lax.broadcasted_iota(jnp.int32,
                                                (lanes * 8, 1), 0) // 8
                s_col = jnp.zeros((lanes * 8, 1), jnp.int32)
                for l in range(lanes):
                    s_col = s_col + jnp.where(
                        rowq == l, smin[l] + jnp.minimum(i, slen[l] - 1),
                        0)
                prior_full = jnp.sum(jnp.where(cidx == s_col,
                                               row_prior, 0),
                                     axis=1, keepdims=True)
                for l in range(lanes):
                    lo = slab_lo(l, i)
                    rk = (cum[l * 8:(l + 1) * 8]
                          + prior_full[l * 8:(l + 1) * 8]
                          + row_base[l * 8:(l + 1) * 8])
                    ranks_s[pl.ds(l * 8, 8), pl.ds(lo, sw)] = jnp.where(
                        sel[l * 8:(l + 1) * 8], rk, 0)
                return 0

            jax.lax.fori_loop(0, max_slen, ph2, 0)

        def build_sel_ranks_shared(blk, thr_col):
            """Shared-window sel ranks: enc_all's regrouped layout keeps
            block ``blk`` (0 = all lanes' inlier rows, 1 = all neighbor
            rows) contiguous, so every pass is ONE full-height read/write
            at the shared union offset. thr_col (lanes*8, 1) = per-lane
            thresholds spread to sublane rows. Ranks are identical to the
            per-lane-window passes: a lane's selection is empty outside
            its own bbox range (sentinel keys), so counting over the
            union window adds exact zeros."""
            br = blk * lanes * 8

            def ph1(i, rt):
                lo = (u_lo + i) * sw
                slab = enc_all_s[pl.ds(br, lanes * 8), pl.ds(lo, sw)]
                t = jnp.sum((slab <= thr_col).astype(jnp.int32),
                            axis=1, keepdims=True)
                return rt + jnp.where(cidx == (u_lo + i), t, 0)

            rt = jax.lax.fori_loop(0, u_len, ph1,
                                   jnp.zeros((lanes * 8, n_slabs),
                                             jnp.int32))
            inc = rt
            d = 1
            while d < n_slabs:
                inc = inc + jnp.concatenate(
                    [jnp.zeros((lanes * 8, d), jnp.int32),
                     inc[:, :n_slabs - d]], axis=1)
                d *= 2
            row_prior = inc - rt
            row_tot = inc[:, n_slabs - 1:n_slabs]
            row_base = jnp.dot(lower_tri, row_tot.astype(jnp.float32),
                               preferred_element_type=jnp.float32,
                               precision=hp).astype(jnp.int32)

            def ph2(i, _):
                lo = (u_lo + i) * sw
                sel = enc_all_s[pl.ds(br, lanes * 8),
                                pl.ds(lo, sw)] <= thr_col
                cum = sel.astype(jnp.int32)
                d = 1
                while d < sw:
                    cum = cum + jnp.concatenate(
                        [jnp.zeros((lanes * 8, d), jnp.int32),
                         cum[:, :sw - d]], axis=1)
                    d *= 2
                prior_full = jnp.sum(jnp.where(cidx == (u_lo + i),
                                               row_prior, 0),
                                     axis=1, keepdims=True)
                rk = cum + prior_full + row_base
                ranks_s[pl.ds(0, lanes * 8), pl.ds(lo, sw)] = jnp.where(
                    sel, rk, 0)
                return 0

            jax.lax.fori_loop(0, u_len, ph2, 0)

        # --- rank-match gathers over bbox-intersecting chunks -------------
        def gather_pass(targets, bs):
            """Per lane: gathered (FP, k) features + (k, 1) exact global
            indices of the sampled points. One shared chunk loop; each
            lane's MXU gather dot runs under its own intersection guard,
            back-to-back with the other lanes' (shared loop control)."""
            def body(i, carry):
                out = list(carry)
                for l in range(lanes):
                    rm = l // R
                    cc = cmin[l] + jnp.minimum(i, clen[l] - 1)
                    pred = (active[l] & (i < clen[l])
                            & chunk_intersects(rm, cc, bs[l]))
                    if hbm_features:
                        # DMA hoisted out of the cond (effects must not be
                        # branch-local); a skipped lane fetches a clamped
                        # valid chunk whose data goes unused
                        feat_slab_h = read_feat_slab(rm, cc)

                    def slab(c, l=l, rm=rm, cc=cc):
                        gathered, idx_col = c
                        lo = cc * chunk
                        rr = ranks_s[pl.ds(l * 8, 8), pl.ds(lo, chunk)]
                        # masked ranks: 0 on unselected slots, and targets
                        # are >= 1 (sample_targets), so the match alone is
                        # the selection test
                        flat_rr = rr.reshape(1, 8 * chunk)
                        hit = targets[l] == flat_rr
                        onehot = hit.astype(jnp.float32)
                        feat_slab = (feat_slab_h if hbm_features
                                     else read_feat_slab(rm, cc))
                        glob_row = gbase8 + lo
                        # HIGHEST precision: default MXU would truncate the
                        # gathered FEATURE VALUES to bf16
                        gathered = gathered + jax.lax.dot_general(
                            feat_slab, onehot, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=hp)
                        # index accumulation must be BIT-EXACT (equality
                        # compares drive the scatter): int32 VPU sum
                        idx_col = idx_col + jnp.sum(
                            jnp.where(hit, glob_row, 0), axis=1,
                            keepdims=True)
                        return gathered, idx_col

                    out[l] = jax.lax.cond(pred, slab, lambda c: c, out[l])
                return tuple(out)

            init = tuple((jnp.zeros((FP, k), jnp.float32),
                          jnp.zeros((k, 1), jnp.int32))
                         for _ in range(lanes))
            return jax.lax.fori_loop(0, max_clen, body, init)

        def sample_and_gather(row_off, thrs, cnts_, fill_off, bs):
            if shared_window:
                build_sel_ranks_shared(row_off // 8,
                                       stack_i32(thrs, rows_each=8))
            else:
                build_sel_ranks(row_off, thrs)
            mk_targets = (sample_targets_stratified if stratified
                          else sample_targets)
            targets = [
                mk_targets(
                    cnts_[l], k,
                    uniform01(hash_keys(
                        kcol, streams[l] + lsts[l].ctr + fill_off)))
                for l in range(lanes)]
            return gather_pass(targets, bs)

        b_in = [(st.mnx, st.mxx, st.mny, st.mxy, st.mnz, st.mxz)
                for st in lsts]
        b_nb = [(st.mnx - 1, st.mxx + 1, st.mny - 1, st.mxy + 1,
                 st.mnz - 1, st.mxz + 1) for st in lsts]
        res_in = sample_and_gather(0, thr_in, cur_cnt, 1, b_in)
        res_nb = sample_and_gather(8, thr_nb, nb_cnt, 3, b_nb)
        g_in = [res_in[l][0] for l in range(lanes)]
        idx_in = [res_in[l][1] for l in range(lanes)]
        g_nb = [res_nb[l][0] for l in range(lanes)]
        idx_nb = [res_nb[l][1] for l in range(lanes)]

        # --- recenter offsets ---------------------------------------------
        def bisect_stack_pair(enc_stack, lo_rs, hi_rs):
            """Both order statistics of every FP-row block in ONE stacked
            33-pass bisection (rows [0:lanes*FP] lower, [lanes*FP:] upper).
            hi0 = 2**31 - 2 is safe: every encoding bisected here is
            strictly below INT32_MAX — sortable encodings of FINITE f32
            features reach INT32_MAX only for a NaN payload, which
            ``prepare_room`` never produces, and fill-slot sentinels ARE
            IMAX but sit beyond the rank bound."""
            m = enc_stack.shape[0]
            enc2 = jnp.concatenate([enc_stack, enc_stack], axis=0)
            ranks2 = jnp.concatenate([lo_rs, hi_rs], axis=0)

            def body(_, carry):
                lo, hi = carry
                mid = _midpoint(lo, hi)
                c = jnp.sum((enc2 <= mid).astype(jnp.int32), axis=1,
                            keepdims=True)
                take = c >= ranks2
                return (jnp.where(take, lo, mid + 1),
                        jnp.where(take, mid, hi))

            v, _ = jax.lax.fori_loop(
                0, 33, body, (jnp.full((2 * m, 1), -2 ** 31, jnp.int32),
                              jnp.full((2 * m, 1), 2 ** 31 - 2, jnp.int32)))
            return v[0:m], v[m:2 * m]

        rmask = rec_rows_mask()

        def gathered_median_offsets():
            """Exact (FP, 1) offsets for lanes with cur_cnt <= k: slots
            [0, cnt) hold every current point exactly once (natural-order
            fill, ``sample_targets``), so the full-mask order statistics
            are computable from the gathered blocks — bit-identical to the
            slab path — in one stacked in-register bisection."""
            slot = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
            encs, lo_rs, hi_rs = [], [], []
            for l in range(lanes):
                enc = sortable_encode(g_in[l])
                encs.append(jnp.where(slot < cur_cnt[l], enc, IMAX))
                lo_rs.append(jnp.zeros((FP, 1), jnp.int32)
                             + (cur_cnt[l] - 1) // 2 + 1)
                hi_rs.append(jnp.zeros((FP, 1), jnp.int32)
                             + cur_cnt[l] // 2 + 1)
            v_lo, v_hi = bisect_stack_pair(
                jnp.concatenate(encs, axis=0),
                jnp.concatenate(lo_rs, axis=0),
                jnp.concatenate(hi_rs, axis=0))
            med = 0.5 * (sortable_decode(v_lo) + sortable_decode(v_hi))
            return [jnp.where(rmask, med[l * FP:(l + 1) * FP], 0.0)
                    for l in range(lanes)]

        def sampled_median_offsets():
            """(FP, 1) offsets from the 512 SAMPLED inliers (fast mode)."""
            encs = [sortable_encode(g_in[l]) for l in range(lanes)]
            lo_r = jnp.full((lanes * FP, 1), (k - 1) // 2 + 1, jnp.int32)
            hi_r = jnp.full((lanes * FP, 1), k // 2 + 1, jnp.int32)
            v_lo, v_hi = bisect_stack_pair(jnp.concatenate(encs, axis=0),
                                           lo_r, hi_r)
            med = 0.5 * (sortable_decode(v_lo) + sortable_decode(v_hi))
            return [jnp.where(rmask, med[l * FP:(l + 1) * FP], 0.0)
                    for l in range(lanes)]

        def slab_median_offsets():
            """Exact offsets from the fused bisection's lower medians: the
            upper statistic is recovered with ONE bounded pass (if
            count(enc <= v_lo) >= cnt//2+1 it IS v_lo, else the smallest
            masked value > v_lo)."""
            v_lo = jnp.concatenate(
                [kth[l * g_all + 2:(l + 1) * g_all] for l in range(lanes)],
                axis=0)                                 # (lanes*n_rec, 1)
            hi_rk = stack_i32([cur_cnt[l] // 2 + 1 for l in range(lanes)],
                              rows_each=n_rec)
            v_lo_rows = spread_groups(v_lo, pool_med)   # (lanes*n_rec*8, 1)

            def acc(i, carry):
                cle, rmin = carry
                cparts, mparts = [], []
                for l in range(lanes):
                    rm = l // R
                    ok = active[l] & (i < slen[l])
                    lo = slab_lo(l, i)
                    curt = jnp.concatenate(
                        [current_s[pl.ds(l * 8, 8), pl.ds(lo, sw)] > 0]
                        * n_rec, axis=0)
                    slab = jnp.where(
                        curt & ok,
                        enc_s[pl.ds(rm * n_rec * 8, n_rec * 8),
                              pl.ds(lo, sw)], IMAX)
                    vr = v_lo_rows[l * n_rec * 8:(l + 1) * n_rec * 8]
                    cparts.append((slab <= vr).astype(jnp.float32))
                    mparts.append(jnp.where(slab > vr, slab, IMAX))
                cle = cle + jnp.sum(jnp.concatenate(cparts, axis=0),
                                    axis=1, keepdims=True)
                rmin = jnp.minimum(rmin, jnp.min(
                    jnp.concatenate(mparts, axis=0), axis=1, keepdims=True))
                return cle, rmin

            cle_rows, row_min = jax.lax.fori_loop(
                0, max_slen, acc,
                (jnp.zeros((lanes * n_rec * 8, 1), jnp.float32),
                 jnp.full((lanes * n_rec * 8, 1), 2 ** 31 - 1, jnp.int32)))
            c_le = jnp.dot(pool_med, cle_rows,
                           preferred_element_type=jnp.float32,
                           precision=hp).astype(jnp.int32)
            rowg = jax.lax.broadcasted_iota(jnp.int32,
                                            (lanes * n_rec, 1), 0)
            gmin = jnp.zeros((lanes * n_rec, 1), jnp.int32)
            for q in range(lanes * n_rec):
                gmin = gmin + jnp.where(
                    rowg == q, jnp.min(row_min[q * 8:(q + 1) * 8]), 0)
            v_hi = jnp.where(c_le >= hi_rk, v_lo, gmin)
            med = 0.5 * (sortable_decode(v_lo) + sortable_decode(v_hi))
            rowf = jax.lax.broadcasted_iota(jnp.int32, (FP, 1), 0)
            offs = []
            for l in range(lanes):
                off = jnp.zeros((FP, 1), jnp.float32)
                for fi, fr in enumerate(rec_rows):
                    off = off + jnp.where(rowf == fr,
                                          med[l * n_rec + fi, 0], 0.0)
                offs.append(off)
            return offs

        def slab_median_offsets_shared():
            """Shared-window upper-order-statistic recovery: one bounded
            pass over the union window with full-height stacked reads
            (current replicated to rec rows via the rep_rec 0/1 matmul,
            as the shared bisection) — same math as the per-lane pass."""
            v_lo = jnp.concatenate(
                [kth[l * g_all + 2:(l + 1) * g_all] for l in range(lanes)],
                axis=0)                                 # (lanes*n_rec, 1)
            hi_rk = stack_i32([cur_cnt[l] // 2 + 1 for l in range(lanes)],
                              rows_each=n_rec)
            v_lo_rows = spread_groups(v_lo, pool_med)   # (lanes*n_rec*8, 1)

            def acc(i, carry):
                cle, rmin = carry
                lo = (u_lo + i) * sw
                cur_f = jnp.where(
                    (current_s[pl.ds(0, lanes * 8), pl.ds(lo, sw)] > 0)
                    & act8, jnp.float32(1.0), jnp.float32(0.0))
                curt = jnp.dot(rep_rec, cur_f,
                               preferred_element_type=jnp.float32,
                               precision=hp) > 0.5
                slab = jnp.where(
                    curt, enc_s[pl.ds(0, lanes * n_rec * 8), pl.ds(lo, sw)],
                    IMAX)
                cle = cle + jnp.sum((slab <= v_lo_rows).astype(jnp.float32),
                                    axis=1, keepdims=True)
                rmin = jnp.minimum(rmin, jnp.min(
                    jnp.where(slab > v_lo_rows, slab, IMAX), axis=1,
                    keepdims=True))
                return cle, rmin

            cle_rows, row_min = jax.lax.fori_loop(
                0, u_len, acc,
                (jnp.zeros((lanes * n_rec * 8, 1), jnp.float32),
                 jnp.full((lanes * n_rec * 8, 1), 2 ** 31 - 1, jnp.int32)))
            c_le = jnp.dot(pool_med, cle_rows,
                           preferred_element_type=jnp.float32,
                           precision=hp).astype(jnp.int32)
            rowg = jax.lax.broadcasted_iota(jnp.int32,
                                            (lanes * n_rec, 1), 0)
            gmin = jnp.zeros((lanes * n_rec, 1), jnp.int32)
            for q in range(lanes * n_rec):
                gmin = gmin + jnp.where(
                    rowg == q, jnp.min(row_min[q * 8:(q + 1) * 8]), 0)
            v_hi = jnp.where(c_le >= hi_rk, v_lo, gmin)
            med = 0.5 * (sortable_decode(v_lo) + sortable_decode(v_hi))
            rowf = jax.lax.broadcasted_iota(jnp.int32, (FP, 1), 0)
            offs = []
            for l in range(lanes):
                off = jnp.zeros((FP, 1), jnp.float32)
                for fi, fr in enumerate(rec_rows):
                    off = off + jnp.where(rowf == fr,
                                          med[l * n_rec + fi, 0], 0.0)
                offs.append(off)
            return offs

        if exact_median:
            small_offs = gathered_median_offsets()
            slab_offs = jax.lax.cond(
                all_small,
                lambda _: [jnp.zeros((FP, 1), jnp.float32)
                           for _ in range(lanes)],
                lambda _: (slab_median_offsets_shared() if shared_window
                           else slab_median_offsets()), 0)
            offs = [jnp.where(small[l], small_offs[l], slab_offs[l])
                    for l in range(lanes)]
        else:
            offs = sampled_median_offsets()

        # --- batched forward + decisions ----------------------------------
        x_in = jnp.concatenate([g_in[l] - offs[l] for l in range(lanes)],
                               axis=1)
        x_nb = jnp.concatenate([g_nb[l] - offs[l] for l in range(lanes)],
                               axis=1)
        add_conf, rmv_conf, cp_now = forward_confidences_t(
            w, x_in, x_nb, gb=lanes)

        add_dec, rmv_dec = [], []
        for l, st in enumerate(lsts):
            # decisions in column orientation (same hash values as a row
            # draw; conf reshaped (1,k)->(k,1), cf. ops/masked_select t_col)
            u_add = uniform01(hash_keys(kcol, streams[l] + st.ctr + 4))
            u_rmv = uniform01(hash_keys(kcol, streams[l] + st.ctr + 5))
            ac = add_conf[:, l * k:(l + 1) * k].reshape(k, 1)
            rc = rmv_conf[:, l * k:(l + 1) * k].reshape(k, 1)
            add_dec.append((u_add < ac).astype(jnp.int32))
            rmv_dec.append((u_rmv < rc).astype(jnp.int32))

        # --- scatters (sel_s/ranks_s are dead after the gathers — reuse as
        # the scatter targets; bounds are SLAB-ALIGNED so the commit pass
        # never reads a stale chunk at the range edges) --------------------
        def scatter_pass(idxs, decs, out_ref, bs):
            deci = [decs[l] > 0 for l in range(lanes)]
            # decision scatter as ONE MXU dot per chunk: point g = r*p8+c
            # splits into a slot->sublane one-hot (k, 8, built once per
            # lane) and a slot->column one-hot (k, chunk, one compare per
            # chunk); their contraction counts decided slots per (r, c) —
            # >0 reproduces the old per-row hit-max exactly (duplicates OR)
            rows8t = jax.lax.broadcasted_iota(jnp.int32, (k, 8), 1)
            rowms = [jnp.where((idxs[l] // p8 == rows8t) & deci[l],
                               jnp.float32(1.0), jnp.float32(0.0))
                     for l in range(lanes)]
            idxcs = [idxs[l] % p8 for l in range(lanes)]

            def body_shared(i, _):
                # one batched (lanes, k, 8) x (lanes, k, chunk) contraction
                # and ONE full-height write per union chunk; an inactive
                # lane's rows get garbage, which commit ignores (keep_cur)
                cc = u_lo * slab_chunks + i
                lo = cc * chunk
                colm = (idxcs3 == lo + chunk_iota3).astype(jnp.float32)
                res = jax.lax.dot_general(
                    rowms3, colm, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=hp)
                out_ref[pl.ds(0, lanes * 8), pl.ds(lo, chunk)] = (
                    res.reshape(lanes * 8, chunk) > 0.5).astype(jnp.int32)
                return 0

            def body(i, _):
                for l in range(lanes):
                    rm = l // R
                    cc = ac0[l] + jnp.minimum(i, aclen[l] - 1)
                    ok = active[l] & (i < aclen[l])

                    @pl.when(ok)
                    def _(l=l, rm=rm, cc=cc):
                        lo = cc * chunk
                        inter = chunk_intersects(rm, cc, bs[l])

                        @pl.when(inter)
                        def _():
                            colm = (idxcs[l] == lo + chunk_iota).astype(
                                jnp.float32)
                            res = jax.lax.dot_general(
                                rowms[l], colm, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=hp)
                            out_ref[pl.ds(l * 8, 8), pl.ds(lo, chunk)] = (
                                res > 0.5).astype(jnp.int32)

                        @pl.when(~inter)
                        def _():
                            out_ref[pl.ds(l * 8, 8), pl.ds(lo, chunk)] = (
                                jnp.zeros((8, chunk), jnp.int32))

                return 0

            if shared_window:
                idxcs3 = jnp.stack(idxcs, axis=0)       # (lanes, k, 1)
                rowms3 = jnp.stack(rowms, axis=0)       # (lanes, k, 8)
                chunk_iota3 = chunk_iota.reshape(1, 1, chunk)
                jax.lax.fori_loop(0, u_len * slab_chunks, body_shared, 0)
            else:
                jax.lax.fori_loop(0, max_aclen, body, 0)
            # duplicate-slot OR membership (ml log-prob semantics,
            # test_random_restart.py:251-271)
            slot_sels = []
            for l in range(lanes):
                dup = (idxs[l] == idxs[l].reshape(1, k)) & deci[l]
                slot_sels.append(jnp.max(dup.astype(jnp.int32), axis=0,
                                         keepdims=True))
            return slot_sels

        add_slot = scatter_pass(idx_nb, add_dec, sel_s, b_nb)
        rmv_slot = scatter_pass(idx_in, rmv_dec, ranks_s, b_in)

        eps = jnp.float32(1e-10)
        step_lp = []
        for l in range(lanes):
            ac = add_conf[:, l * k:(l + 1) * k]
            rc = rmv_conf[:, l * k:(l + 1) * k]
            a_sel = add_slot[l] > 0
            r_sel = rmv_slot[l] > 0
            step_lp.append(
                (jnp.sum(jnp.log(jnp.where(a_sel, ac, 1.0 - ac) + eps))
                 + jnp.sum(jnp.log(jnp.where(r_sel, rc, 1.0 - rc) + eps))
                 ) / jnp.float32(k))

        # --- commit pass: mask update + reductions, range-bounded ---------
        # On noneighbor the reference breaks before the update — write cur
        # back unchanged; inert lanes likewise (branch-free).
        keep_cur = [no_neighbor[l] | ~active[l] for l in range(lanes)]

        def commit_body(i, carry):
            acc_cnt, mn, mx = carry
            cparts, mnp, mxp = [], [], []
            for l in range(lanes):
                rm = l // R
                ok = active[l] & (i < slen[l])
                lo = slab_lo(l, i)
                curs = current_s[pl.ds(l * 8, 8), pl.ds(lo, sw)] > 0
                adds = sel_s[pl.ds(l * 8, 8), pl.ds(lo, sw)] > 0
                rmvs = ranks_s[pl.ds(l * 8, 8), pl.ds(lo, sw)] > 0
                ncur = (curs | adds) & ~rmvs
                commit = (curs & keep_cur[l]) | (ncur & ~keep_cur[l])
                current_s[pl.ds(l * 8, 8), pl.ds(lo, sw)] = commit.astype(
                    jnp.int32)
                cparts.append(adds & ok)
                cparts.append(ncur & ok)
                vxyz = jnp.concatenate(
                    [vox_ref[c, pl.ds(rm * 8, 8), pl.ds(lo, sw)]
                     for c in range(3)], axis=0)
                nc3 = jnp.concatenate([ncur & ok] * 3, axis=0)
                mnp.append(jnp.where(nc3, vxyz, BIG))
                mxp.append(jnp.where(nc3, vxyz, -BIG))
            acc_cnt = acc_cnt + jnp.sum(
                jnp.concatenate(cparts, axis=0).astype(jnp.int32),
                axis=1, keepdims=True)
            mn = jnp.minimum(mn, jnp.min(jnp.concatenate(mnp, axis=0),
                                         axis=1, keepdims=True))
            mx = jnp.maximum(mx, jnp.max(jnp.concatenate(mxp, axis=0),
                                         axis=1, keepdims=True))
            return acc_cnt, mn, mx

        def commit_body_shared(i, carry):
            """Full-height commit over the union window: 3 mask reads +
            1 write + 3 voxel reads per iteration REGARDLESS of lanes;
            block row order [all-adds | all-ncur] / [all-x | all-y |
            all-z] (vs the per-lane interleave)."""
            acc_cnt, mn, mx = carry
            lo = (u_lo + i) * sw
            curs = current_s[pl.ds(0, lanes * 8), pl.ds(lo, sw)] > 0
            adds = sel_s[pl.ds(0, lanes * 8), pl.ds(lo, sw)] > 0
            rmvs = ranks_s[pl.ds(0, lanes * 8), pl.ds(lo, sw)] > 0
            ncur = (curs | adds) & ~rmvs
            commit = (curs & keep_col) | (ncur & ~keep_col)
            current_s[pl.ds(0, lanes * 8), pl.ds(lo, sw)] = commit.astype(
                jnp.int32)
            adds_ok = adds & act8
            ncur_ok = ncur & act8
            acc_cnt = acc_cnt + jnp.sum(
                jnp.concatenate([adds_ok, ncur_ok], axis=0).astype(
                    jnp.int32), axis=1, keepdims=True)
            vxyz = jnp.concatenate(
                [vox_ref[c, pl.ds(0, lanes * 8), pl.ds(lo, sw)]
                 for c in range(3)], axis=0)
            nc3 = jnp.concatenate([ncur_ok] * 3, axis=0)
            mn = jnp.minimum(mn, jnp.min(jnp.where(nc3, vxyz, BIG),
                                         axis=1, keepdims=True))
            mx = jnp.maximum(mx, jnp.max(jnp.where(nc3, vxyz, -BIG),
                                         axis=1, keepdims=True))
            return acc_cnt, mn, mx

        if shared_window:
            keep_col = stack_i32(
                [kc.astype(jnp.int32) for kc in keep_cur], rows_each=8) > 0
            ccnt, mins, maxs = jax.lax.fori_loop(
                0, u_len, commit_body_shared,
                (jnp.zeros((lanes * 16, 1), jnp.int32),
                 jnp.full((lanes * 24, 1), BIG, jnp.int32),
                 jnp.full((lanes * 24, 1), -BIG, jnp.int32)))
        else:
            ccnt, mins, maxs = jax.lax.fori_loop(
                0, max_slen, commit_body,
                (jnp.zeros((lanes * 16, 1), jnp.int32),
                 jnp.full((lanes * 24, 1), BIG, jnp.int32),
                 jnp.full((lanes * 24, 1), -BIG, jnp.int32)))

        def _commit_rows(l):
            """(add, ncur, xmin, xmax, ymin, ymax, zmin, zmax) row starts
            of lane l in the commit accumulators (mode-dependent order)."""
            if shared_window:
                return (l * 8, lanes * 8 + l * 8,
                        l * 8, l * 8,
                        lanes * 8 + l * 8, lanes * 8 + l * 8,
                        2 * lanes * 8 + l * 8, 2 * lanes * 8 + l * 8)
            return (l * 16, l * 16 + 8, l * 24, l * 24,
                    l * 24 + 8, l * 24 + 8, l * 24 + 16, l * 24 + 16)

        # --- per-lane termination bookkeeping ------------------------------
        out_lsts = []
        cands = []
        for l, st in enumerate(lsts):
            (r_add, r_new, r_xn, r_xx, r_yn, r_yx,
             r_zn, r_zx) = _commit_rows(l)
            add_cnt = jnp.sum(ccnt[r_add:r_add + 8])
            new_cnt = jnp.sum(ccnt[r_new:r_new + 8])
            vmin_x = jnp.min(mins[r_xn:r_xn + 8])
            vmax_x = jnp.max(maxs[r_xx:r_xx + 8])
            vmin_y = jnp.min(mins[r_yn:r_yn + 8])
            vmax_y = jnp.max(maxs[r_yx:r_yx + 8])
            vmin_z = jnp.min(mins[r_zn:r_zn + 8])
            vmax_z = jnp.max(maxs[r_zx:r_zx + 8])
            updated = add_cnt > 0
            if beam:
                # candidate = this lane's post-step mask; only expanding
                # rollouts enter newQ (``test_beam_search.py:271-276``)
                new_cnt_f = new_cnt.astype(jnp.float32)
                if use_cp:
                    # beam 'cp': rank queue entries by this rollout's
                    # predicted completeness (not cumulative — the head
                    # scores the current state, reference evidence
                    # experimental/train_region_grow_rnn.py:143-144)
                    score_cand = cp_now[0, l]
                else:
                    score_cand = ((pscore[l] + step_lp[l]) if scoring_ml
                                  else new_cnt_f)
                cands.append(dict(
                    valid=active[l] & ~no_neighbor[l] & updated,
                    rolled=active[l] & ~no_neighbor[l],
                    score=score_cand, cnt=new_cnt,
                    mnx=vmin_x, mny=vmin_y, mnz=vmin_z,
                    mxx=vmax_x, mxy=vmax_y, mxz=vmax_z))
                out_lsts.append(st._replace(
                    ctr=jnp.where(active[l], st.ctr + 8, st.ctr)))
                continue
            within = ((vmin_x >= st.smnx) & (vmin_y >= st.smny)
                      & (vmin_z >= st.smnz) & (vmax_x <= st.smxx)
                      & (vmax_y <= st.smxy) & (vmax_z <= st.smxz))
            stuck_stop = within & (st.stuck >= 1)
            new_stuck = jnp.where(within, st.stuck + 1, 0)
            new_steps = st.steps + 1
            hit_cap = new_steps >= max_steps
            nng = no_neighbor[l]
            done_now = ((nng | ~updated | (new_cnt == 0) | stuck_stop
                         | hit_cap) & active[l])
            reason = jnp.where(
                nng, REASON_NONEIGHBOR,
                jnp.where(~updated | (new_cnt == 0), REASON_NOEXPAND,
                          jnp.where(stuck_stop, REASON_STUCK,
                                    jnp.where(hit_cap, REASON_MAXSTEPS, 0))))

            def roll(new, old, l=l, done_now=done_now, nng=nng):
                # bbox/stuck roll forward only while growing (post-done
                # values feed nothing — the commit uses this step's locals)
                return jnp.where(active[l] & ~done_now & ~nng, new, old)

            stepped = active[l] & ~nng
            new_lp = jnp.where(stepped, st.log_prob + step_lp[l],
                               st.log_prob)
            cnt_final = jnp.where(nng, cur_cnt[l], new_cnt)
            # restart score frozen at termination: cumulative decision
            # log-prob ('ml'), final mask size ('np',
            # test_random_restart.py:171-177), or the completeness head's
            # latest prediction ('cp' — a no-neighbor final step keeps the
            # previous step's value; its forward saw a garbage neighbor set)
            new_cp = (jnp.where(stepped, cp_now[0, l], st.cpv)
                      if use_cp else st.cpv)
            if use_cp:
                score_now = new_cp
            elif scoring_ml:
                score_now = new_lp
            else:
                score_now = cnt_final.astype(jnp.float32)
            out_lsts.append(st._replace(
                done=st.done | done_now,
                steps=jnp.where(stepped, new_steps, st.steps),
                stuck=roll(new_stuck, st.stuck),
                mnx=roll(vmin_x, st.mnx), mny=roll(vmin_y, st.mny),
                mnz=roll(vmin_z, st.mnz), mxx=roll(vmax_x, st.mxx),
                mxy=roll(vmax_y, st.mxy), mxz=roll(vmax_z, st.mxz),
                smnx=roll(jnp.minimum(st.smnx, vmin_x), st.smnx),
                smny=roll(jnp.minimum(st.smny, vmin_y), st.smny),
                smnz=roll(jnp.minimum(st.smnz, vmin_z), st.smnz),
                smxx=roll(jnp.maximum(st.smxx, vmax_x), st.smxx),
                smxy=roll(jnp.maximum(st.smxy, vmax_y), st.smxy),
                smxz=roll(jnp.maximum(st.smxz, vmax_z), st.smxz),
                log_prob=new_lp,
                ctr=jnp.where(active[l], st.ctr + 8, st.ctr),
                score=jnp.where(done_now, score_now, st.score),
                cnt=jnp.where(done_now, cnt_final, st.cnt),
                reason=jnp.where(done_now, reason, st.reason),
                cpv=new_cp))
        if beam:
            return out_lsts, cands
        return out_lsts

    # ---------------------------------------------------------------------
    # Phase C: instance commit (per room, when ALL its attempts terminated)
    # ---------------------------------------------------------------------

    def commit_room(g, rst, lanes_g):
        all_done = lanes_g[0].done
        for r in range(1, R):
            all_done = all_done & lanes_g[r].done
        do_commit = all_done & ~rst.fully_done & ~rst.need_seed

        def do_parallel(op):
            """Parallel-seeds wave commit: lanes commit their OWN masks in
            seed-priority order (lane 0 = lowest curvature rank). Earlier
            commits win overlaps (mask &= ~visited); a lane whose seed was
            swallowed by an earlier commit is discarded, as the reference's
            visited check would have skipped that seed — the XLA engine's
            wave-commit rule (engine/grow.py segment_rooms K>1)."""
            s, lg = op
            vis = visited_s[pl.ds(g * 8, 8), pl.ds(0, p8)] > 0
            rank_g = rank_ref[pl.ds(g * 8, 8), :]
            valid_g = rank_g < BIG
            row_i = jax.lax.broadcasted_iota(jnp.int32,
                                             (max_instances, 8), 0)
            col_i = jax.lax.broadcasted_iota(jnp.int32,
                                             (max_instances, 8), 1)
            inst = s.inst
            cid = s.cluster_id
            labels = labels_ref[g]
            for r in range(R):
                st = lg[r]
                cur = current_s[pl.ds((g * R + r) * 8, 8), pl.ds(0, p8)] > 0
                seed_slot = valid_g & (glob_idx == st.sidx)
                swallowed = jnp.sum(jnp.where(vis & seed_slot, 1, 0)) > 0
                commit_r = st.live & ~swallowed
                mask0 = cur & ~vis
                # an attempt always commits at least its seed point
                # (reference stop_growing marks visited regardless);
                # boolean algebra, not where() — Mosaic rejects selects on
                # i1 vectors (docs/pallas_grow_kernel_design.md)
                grew = jnp.sum(jnp.where(mask0, 1, 0)) > 0
                mask = (mask0 & grew) | (seed_slot & ~vis & ~grew)
                mask = mask & commit_r
                cnt = jnp.sum(jnp.where(mask, 1, 0))
                vis = vis | mask
                kept = commit_r & (cnt > cluster_threshold)
                labels = jnp.where(mask & kept, cid, labels)
                gt_cnt = jnp.sum(jnp.where(valid_g
                                           & (obj_ref[g] == st.tgt), 1, 0))
                fields = [st.sidx.astype(jnp.float32),
                          st.tgt.astype(jnp.float32),
                          st.steps.astype(jnp.float32),
                          cnt.astype(jnp.float32),
                          gt_cnt.astype(jnp.float32),
                          st.reason.astype(jnp.float32),
                          st.log_prob,
                          kept.astype(jnp.float32)]
                rec = jnp.zeros((max_instances, 8), jnp.float32)
                for i, f in enumerate(fields):
                    rec = rec + jnp.where(col_i == i, f, 0.0)
                log_ref[g] = jnp.where((row_i == inst) & commit_r, rec,
                                       log_ref[g])
                inst = inst + commit_r.astype(jnp.int32)
                cid = jnp.where(kept, cid + 1, cid)
            labels_ref[g] = labels
            visited_s[pl.ds(g * 8, 8), pl.ds(0, p8)] = vis.astype(jnp.int32)
            trd = tried_s[pl.ds(g * 8, 8), pl.ds(0, p8)] > 0
            remaining = jnp.sum(jnp.where(valid_g & ~vis & ~trd, 1, 0))
            lg2 = tuple(l._replace(ctr=l.ctr + 8) for l in lg)
            return s._replace(
                inst=inst, cluster_id=cid, need_seed=jnp.bool_(True),
                remaining=remaining,
                fully_done=(remaining == 0) | (inst >= p)), lg2

        def do(op):
            s, lg = op
            # best attempt by score, first max (numpy.argmax tie rule,
            # test_random_restart.py:177)
            best_score = lg[0].score
            best_row = jnp.int32(g * R * 8)
            best_cnt = lg[0].cnt
            best_steps = lg[0].steps
            best_reason = lg[0].reason
            best_lp = lg[0].log_prob
            for r in range(1, R):
                better = lg[r].score > best_score
                best_score = jnp.where(better, lg[r].score, best_score)
                best_row = jnp.where(better, (g * R + r) * 8, best_row)
                best_cnt = jnp.where(better, lg[r].cnt, best_cnt)
                best_steps = jnp.where(better, lg[r].steps, best_steps)
                best_reason = jnp.where(better, lg[r].reason, best_reason)
                best_lp = jnp.where(better, lg[r].log_prob, best_lp)
            cur = read_rows_dyn(current_s, best_row,
                                [(g * R + r) * 8 for r in range(R)]) > 0
            vis = visited_s[pl.ds(g * 8, 8), pl.ds(0, p8)] > 0
            vis2 = vis | cur
            # a region always commits visited over its best mask (reference
            # marks visited regardless of cluster size)
            visited_s[pl.ds(g * 8, 8), pl.ds(0, p8)] = vis2.astype(jnp.int32)
            kept = best_cnt > cluster_threshold
            labels_ref[g] = jnp.where(cur & kept, s.cluster_id,
                                      labels_ref[g])
            rank_g = rank_ref[pl.ds(g * 8, 8), :]
            valid_g = rank_g < BIG
            gt_cnt = jnp.sum(jnp.where(valid_g & (obj_ref[g] == s.target),
                                       1, 0))
            # masked instance-record write (axon rejects scalar VMEM stores)
            row_i = jax.lax.broadcasted_iota(jnp.int32,
                                             (max_instances, 8), 0)
            col_i = jax.lax.broadcasted_iota(jnp.int32,
                                             (max_instances, 8), 1)
            fields = [s.seed_idx.astype(jnp.float32),
                      s.target.astype(jnp.float32),
                      best_steps.astype(jnp.float32),
                      best_cnt.astype(jnp.float32),
                      gt_cnt.astype(jnp.float32),
                      best_reason.astype(jnp.float32),
                      best_lp,
                      kept.astype(jnp.float32)]
            rec = jnp.zeros((max_instances, 8), jnp.float32)
            for i, f in enumerate(fields):
                rec = rec + jnp.where(col_i == i, f, 0.0)
            log_ref[g] = jnp.where(row_i == s.inst, rec, log_ref[g])
            trd = tried_s[pl.ds(g * 8, 8), pl.ds(0, p8)] > 0
            remaining = jnp.sum(jnp.where(valid_g & ~vis2 & ~trd, 1, 0))
            inst2 = s.inst + 1
            # advance every lane's draw counter past the attempt (keeps
            # R=1 streams identical to the pre-restart kernel)
            lg2 = tuple(l._replace(ctr=l.ctr + 8) for l in lg)
            # the kernel seeds until every point is visited-or-tried (the
            # reference seeds EVERY unvisited point,
            # test_region_grow.py:186-188); inst < p is a pure safety net
            return s._replace(
                inst=inst2,
                cluster_id=jnp.where(kept, s.cluster_id + 1, s.cluster_id),
                need_seed=jnp.bool_(True),
                remaining=remaining,
                fully_done=(remaining == 0) | (inst2 >= p)), lg2

        return jax.lax.cond(do_commit, do_parallel if parallel_seeds else do,
                            lambda op: op, (rst, lanes_g))

    # ---------------------------------------------------------------------
    # Beam phases (``test_beam_search.py:169-292``): Q[0] head check before
    # each round, one stochastic rollout per (parent, search) lane, prune
    # to the top beam_width expanding candidates, commit Q[0]'s mask when
    # its bbox stops growing twice or the queue empties.
    # ---------------------------------------------------------------------

    def commit_beam(g, rst, bst, do_commit, reason):
        """Commit parent slot 0's mask as the seed's instance."""
        def do(s):
            p0 = bst.parents[0]
            cur = parent_s[pl.ds(g * BW * 8, 8), pl.ds(0, p8)] > 0
            vis = visited_s[pl.ds(g * 8, 8), pl.ds(0, p8)] > 0
            vis2 = vis | cur
            visited_s[pl.ds(g * 8, 8), pl.ds(0, p8)] = vis2.astype(jnp.int32)
            kept = p0.cnt > cluster_threshold
            labels_ref[g] = jnp.where(cur & kept, s.cluster_id,
                                      labels_ref[g])
            rank_g = rank_ref[pl.ds(g * 8, 8), :]
            valid_g = rank_g < BIG
            gt_cnt = jnp.sum(jnp.where(valid_g & (obj_ref[g] == s.target),
                                       1, 0))
            row_i = jax.lax.broadcasted_iota(jnp.int32,
                                             (max_instances, 8), 0)
            col_i = jax.lax.broadcasted_iota(jnp.int32,
                                             (max_instances, 8), 1)
            fields = [s.seed_idx.astype(jnp.float32),
                      s.target.astype(jnp.float32),
                      bst.steps.astype(jnp.float32),
                      p0.cnt.astype(jnp.float32),
                      gt_cnt.astype(jnp.float32),
                      reason.astype(jnp.float32),
                      p0.score,
                      kept.astype(jnp.float32)]
            rec = jnp.zeros((max_instances, 8), jnp.float32)
            for i, f in enumerate(fields):
                rec = rec + jnp.where(col_i == i, f, 0.0)
            log_ref[g] = jnp.where(row_i == s.inst, rec, log_ref[g])
            trd = tried_s[pl.ds(g * 8, 8), pl.ds(0, p8)] > 0
            remaining = jnp.sum(jnp.where(valid_g & ~vis2 & ~trd, 1, 0))
            inst2 = s.inst + 1
            return s._replace(
                inst=inst2,
                cluster_id=jnp.where(kept, s.cluster_id + 1, s.cluster_id),
                need_seed=jnp.bool_(True),
                remaining=remaining,
                fully_done=(remaining == 0) | (inst2 >= p))

        return jax.lax.cond(do_commit, do, lambda s: s, rst)

    def q0_check(g, rst, bst):
        """Head-of-queue stuck test, run at the start of every round on
        Q[0]'s bbox vs the accumulated seen-bbox
        (``test_beam_search.py:177-189``); also the rollout-budget safety
        net (the reference has none — its queue always converges via the
        stuck rule)."""
        alive = ~rst.fully_done & ~rst.need_seed
        p0 = bst.parents[0]
        within = ((p0.mnx >= bst.smnx) & (p0.mny >= bst.smny)
                  & (p0.mnz >= bst.smnz) & (p0.mxx <= bst.smxx)
                  & (p0.mxy <= bst.smxy) & (p0.mxz <= bst.smxz))
        stop = alive & within & (bst.stuck >= 1)
        cap = alive & (bst.steps >= max_steps * max(SW, 1))
        reason = jnp.where(stop, REASON_STUCK, REASON_MAXSTEPS)
        rst2 = commit_beam(g, rst, bst, stop | cap, reason)
        upd = alive & ~stop & ~cap
        sel = lambda new, old: jnp.where(upd, new, old)
        bst2 = bst._replace(
            stuck=sel(jnp.where(within, bst.stuck + 1, 0), bst.stuck),
            smnx=sel(jnp.minimum(bst.smnx, p0.mnx), bst.smnx),
            smny=sel(jnp.minimum(bst.smny, p0.mny), bst.smny),
            smnz=sel(jnp.minimum(bst.smnz, p0.mnz), bst.smnz),
            smxx=sel(jnp.maximum(bst.smxx, p0.mxx), bst.smxx),
            smxy=sel(jnp.maximum(bst.smxy, p0.mxy), bst.smxy),
            smxz=sel(jnp.maximum(bst.smxz, p0.mxz), bst.smxz))
        return rst2, bst2

    def prune_room(g, rst, bst, lanes_g, cands_g):
        """Q = top beam_width of this round's expanding candidates
        (``sorted(newQ)[:BEAM_WIDTH]``, first-tie like the stable sort);
        winners' masks park in the parent slots and broadcast to their
        rollout lanes. An empty newQ ends the search — the reference's
        ``while len(Q) > 0`` — committing the current Q[0]."""
        alive = ~rst.fully_done & ~rst.need_seed
        rolled = cands_g[0]["rolled"].astype(jnp.int32)
        any_valid_all = cands_g[0]["valid"]
        for c in cands_g[1:]:
            rolled = rolled + c["rolled"].astype(jnp.int32)
            any_valid_all = any_valid_all | c["valid"]
        # queue emptied: commit the head (mask untouched in parent slot 0)
        rst2 = commit_beam(g, rst, bst, alive & ~any_valid_all,
                           jnp.int32(REASON_NOEXPAND))

        def do(op):
            s, b_, lg = op
            zi = jnp.int32(0)
            avail = [c["valid"] for c in cands_g]
            lane_rows = [jnp.int32((g * R + j) * 8) for j in range(R)]
            new_parents = []
            win_rows = []
            neg_inf = jnp.float32(-3.4e38)
            for b in range(BW):
                any_v = jnp.bool_(False)
                best = dict(score=neg_inf, row=jnp.int32(g * R * 8),
                            cnt=jnp.int32(0), mnx=zi, mny=zi, mnz=zi,
                            mxx=zi, mxy=zi, mxz=zi)
                for j, c in enumerate(cands_g):
                    pick = avail[j] & (~any_v | (c["score"] > best["score"]))
                    best = dict(
                        score=jnp.where(pick, c["score"], best["score"]),
                        row=jnp.where(pick, lane_rows[j], best["row"]),
                        cnt=jnp.where(pick, c["cnt"], best["cnt"]),
                        mnx=jnp.where(pick, c["mnx"], best["mnx"]),
                        mny=jnp.where(pick, c["mny"], best["mny"]),
                        mnz=jnp.where(pick, c["mnz"], best["mnz"]),
                        mxx=jnp.where(pick, c["mxx"], best["mxx"]),
                        mxy=jnp.where(pick, c["mxy"], best["mxy"]),
                        mxz=jnp.where(pick, c["mxz"], best["mxz"]))
                    any_v = any_v | avail[j]
                avail = [a & (lane_rows[j] != best["row"])
                         for j, a in enumerate(avail)]
                win_rows.append((any_v, best["row"]))
                new_parents.append(_ParentSt(
                    valid=any_v, score=jnp.where(any_v, best["score"], 0.0),
                    cnt=best["cnt"], mnx=best["mnx"], mny=best["mny"],
                    mnz=best["mnz"], mxx=best["mxx"], mxy=best["mxy"],
                    mxz=best["mxz"]))
            # read all winner masks BEFORE writing (a target lane row may
            # itself be a later winner); dynamic-row reads resolve as
            # value-selects over the room's lane rows (read_rows_dyn)
            lane_starts = [(g * R + j) * 8 for j in range(R)]
            win_masks = [read_rows_dyn(current_s, row, lane_starts)
                         for _v, row in win_rows]
            for b in range(BW):
                parent_s[pl.ds((g * BW + b) * 8, 8), pl.ds(0, p8)] = win_masks[b]
                for sx_ in range(SW):
                    current_s[pl.ds((g * R + b * SW + sx_) * 8, 8), pl.ds(0, p8)] = (
                        win_masks[b])
            np_ = new_parents
            lg2 = tuple(
                l._replace(mnx=np_[j // SW].mnx, mny=np_[j // SW].mny,
                           mnz=np_[j // SW].mnz, mxx=np_[j // SW].mxx,
                           mxy=np_[j // SW].mxy, mxz=np_[j // SW].mxz)
                for j, l in enumerate(lg))
            b2 = b_._replace(parents=tuple(new_parents),
                             steps=b_.steps + rolled)
            return s, b2, lg2

        return jax.lax.cond(alive & any_valid_all, do, lambda op: op,
                            (rst2, bst, lanes_g))

    # ---------------------------------------------------------------------
    # The merged loop
    # ---------------------------------------------------------------------

    n_valid0 = [jnp.sum(jnp.where(rank_ref[pl.ds(g * 8, 8), :] < BIG, 1, 0))
                for g in range(gb)]
    zi = jnp.int32(0)

    def init_rst(g):
        return _RoomSt(
            fully_done=n_valid0[g] == 0, need_seed=jnp.bool_(True),
            inst=zi, cluster_id=jnp.int32(1), remaining=n_valid0[g],
            target=zi, seed_idx=zi)

    def init_lst():
        return _LaneSt(
            done=jnp.bool_(False), steps=zi, stuck=zi,
            mnx=zi, mny=zi, mnz=zi, mxx=zi, mxy=zi, mxz=zi,
            smnx=zi, smny=zi, smnz=zi, smxx=zi, smxy=zi, smxz=zi,
            log_prob=jnp.float32(0.0), ctr=zi, score=jnp.float32(0.0),
            cnt=zi, reason=zi, cpv=jnp.float32(0.0),
            live=jnp.bool_(True), tgt=zi, sidx=zi)

    def loop_cond(carry):
        rsts, _ = carry
        alive = ~rsts[0].fully_done
        for g in range(1, gb):
            alive = alive | ~rsts[g].fully_done
        return alive

    def loop_body(carry):
        rsts, lsts = carry
        new_r, new_l = [], list(lsts)
        for g in range(gb):
            r2, lg2 = seed_room(g, rsts[g],
                                tuple(new_l[g * R:(g + 1) * R]))
            new_r.append(r2)
            new_l[g * R:(g + 1) * R] = list(lg2)
        new_l = grow_step(new_r, new_l)
        out_r, out_l = [], list(new_l)
        for g in range(gb):
            r3, lg3 = commit_room(g, new_r[g],
                                  tuple(out_l[g * R:(g + 1) * R]))
            out_r.append(r3)
            out_l[g * R:(g + 1) * R] = list(lg3)
        return tuple(out_r), tuple(out_l)

    def loop_cond_beam(carry):
        rsts, _, _b = carry
        alive = ~rsts[0].fully_done
        for g in range(1, gb):
            alive = alive | ~rsts[g].fully_done
        return alive

    def loop_body_beam(carry):
        rsts, lsts, bsts = carry
        new_r, new_l, new_b = [], list(lsts), []
        for g in range(gb):
            r2, lg2, b2 = seed_room(g, rsts[g],
                                    tuple(new_l[g * R:(g + 1) * R]),
                                    bsts[g])
            new_l[g * R:(g + 1) * R] = list(lg2)
            r2, b2 = q0_check(g, r2, b2)
            new_r.append(r2)
            new_b.append(b2)
        pvalid = [new_b[l // R].parents[(l % R) // SW].valid
                  for l in range(lanes)]
        pscore = [new_b[l // R].parents[(l % R) // SW].score
                  for l in range(lanes)]
        new_l, cands = grow_step(new_r, new_l, pvalid, pscore)
        out_r, out_b, out_l = [], [], list(new_l)
        for g in range(gb):
            r3, b3, lg3 = prune_room(
                g, new_r[g], new_b[g], tuple(out_l[g * R:(g + 1) * R]),
                cands[g * R:(g + 1) * R])
            out_r.append(r3)
            out_b.append(b3)
            out_l[g * R:(g + 1) * R] = list(lg3)
        return tuple(out_r), tuple(out_l), tuple(out_b)

    if beam:
        def init_bst():
            invalid = _ParentSt(
                valid=jnp.bool_(False), score=jnp.float32(0.0), cnt=zi,
                mnx=zi, mny=zi, mnz=zi, mxx=zi, mxy=zi, mxz=zi)
            return _BeamSt(smnx=zi, smny=zi, smnz=zi, smxx=zi, smxy=zi,
                           smxz=zi, stuck=zi, steps=zi,
                           parents=(invalid,) * BW)

        rsts, _, _ = jax.lax.while_loop(
            loop_cond_beam, loop_body_beam,
            (tuple(init_rst(g) for g in range(gb)),
             tuple(init_lst() for _ in range(lanes)),
             tuple(init_bst() for _ in range(gb))))
    else:
        rsts, _ = jax.lax.while_loop(
            loop_cond, loop_body,
            (tuple(init_rst(g) for g in range(gb)),
             tuple(init_lst() for _ in range(lanes))))

    row_c = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col_c = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    for g in range(gb):
        counters_ref[g] = (
            jnp.where((row_c == 0) & (col_c == 0), rsts[g].cluster_id - 1, 0)
            + jnp.where((row_c == 0) & (col_c == 1), rsts[g].inst, 0))


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------

def rooms_per_program_budget(p: int, feature_size: int,
                             lanes_per_room: int = 1,
                             budget_bytes: int = 90 * 2 ** 20,
                             pipelined: bool = False,
                             hbm_features: bool = False) -> int:
    """How many P-point rooms fit one program's VMEM (capped at 8).

    Per-room WINDOW bytes/point (pallas input/output blocks): feat 4*FP,
    vox 12, rank 4, obj 4, labels 4; per-room SCRATCH bytes/point:
    visited+tried 8, recenter encodings 4*n_rec; per LANE bytes/point:
    current+selection+ranks 12, sample keys 8. The 90 MB budget leaves the
    126 MB scoped-vmem limit room for the replicated weights (~3.3 MB) and
    the stacked slab temporaries.

    ``pipelined=True`` budgets for a MULTI-STEP grid: Mosaic
    double-buffers every window whose index map depends on program_id
    (inputs AND outputs), so window bytes count twice. A single-step grid
    (rooms <= this budget) keeps the larger single-buffered capacity —
    callers should prefer it and only fall back to the pipelined figure
    when one launch must span several programs (engine ``_launch``)."""
    n_rec = 2 + (feature_size - 6)
    window = 12 + 4 + 4 + 4
    if not hbm_features:
        window += 4 * feat_rows(feature_size)  # else features stay in HBM
    scratch = 8 + 4 * n_rec + 20 * lanes_per_room
    per_room = ((2 if pipelined else 1) * window + scratch) * p
    return int(max(1, min(8, budget_bytes // per_room)))


@functools.lru_cache(maxsize=16)
def _sharded_fused_fn(mesh, k: int, feature_size: int, max_steps: int,
                      cluster_threshold: int, max_instances: int,
                      exact_median: bool, n_weights: int,
                      interpret: bool = False, rooms_per_program: int = 1,
                      lanes_per_room: int = 1, scoring: str = "ml",
                      beam_width: int = 0, search_width: int = 0,
                      parallel_seeds: bool = False,
                      seed_separation: int = 12,
                      hbm_features: bool = False,
                      stratified: bool = False,
                      shared_window: bool = False):
    """dp-sharded fused segmentation over the room axis: each device runs
    the multi-room kernel on its local rooms (no collectives; weights
    replicated). Callers pad the room count to a multiple of
    dp * rooms_per_program."""
    from jax.sharding import PartitionSpec as PS

    from ..parallel.mesh import DP_AXIS

    def local(seeds, feat, vox, rank, obj, tbl, *weights):
        return fused_grow_rooms(
            seeds, feat, vox, rank, obj, tbl, list(weights), k=k,
            feature_size=feature_size, max_steps=max_steps,
            cluster_threshold=cluster_threshold,
            max_instances=max_instances, exact_median=exact_median,
            interpret=interpret, rooms_per_program=rooms_per_program,
            lanes_per_room=lanes_per_room, scoring=scoring,
            beam_width=beam_width, search_width=search_width,
            parallel_seeds=parallel_seeds,
            seed_separation=seed_separation, hbm_features=hbm_features,
            stratified=stratified, shared_window=shared_window)

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
                           kw.get("interpret", False),
                           kw.get("rooms_per_program", 1),
                           kw.get("lanes_per_room", 1),
                           kw.get("scoring", "ml"),
                           kw.get("beam_width", 0),
                           kw.get("search_width", 0),
                           kw.get("parallel_seeds", False),
                           kw.get("seed_separation", 12),
                           kw.get("hbm_features", False),
                           kw.get("stratified", False),
                           kw.get("shared_window", False))
    return fn(seeds, feat, vox, rank, obj, tbl, *weights)


@functools.partial(jax.jit, static_argnames=(
    "k", "feature_size", "max_steps", "cluster_threshold", "max_instances",
    "exact_median", "interpret", "rooms_per_program", "lanes_per_room",
    "scoring", "beam_width", "search_width", "parallel_seeds",
    "seed_separation", "hbm_features", "stratified", "shared_window"))
def fused_grow_rooms(seeds, feat, vox, rank, obj, tbl, weights, *, k: int,
                     feature_size: int, max_steps: int,
                     cluster_threshold: int, max_instances: int = 512,
                     exact_median: bool = True, interpret: bool = False,
                     rooms_per_program: int = 1, lanes_per_room: int = 1,
                     scoring: str = "ml", beam_width: int = 0,
                     search_width: int = 0, parallel_seeds: bool = False,
                     seed_separation: int = 12,
                     hbm_features: bool = False,
                     stratified: bool = False,
                     shared_window: bool = False):
    """Segment G rooms fully on device, ``rooms_per_program`` concurrently
    per grid step with ``lanes_per_room`` restart attempts each (reproduces
    rooms_per_program=1 up to float-ULP forward differences; see
    ``_grow_kernel``).

    seeds (G, 1) i32 (per-room PRNG seeds); feat (G, FP, P) f32
    (FP = ``feat_rows(feature_size)``);
    vox (G, 24, P8) i32; rank/obj (G, 8, P8) i32;
    tbl (G, 8, n_chunks) i32 per-chunk voxel bounds (``chunk_bounds``);
    weights = pack_lrgnet_weights list. G must divide by rooms_per_program.
    Returns (labels (G, 8, P8) i32, log (G, max_instances, 8) f32,
    counters (G, 8, 128) i32).
    """
    g_rooms, fp, p = feat.shape
    fp_full = feat_rows(feature_size)
    if fp < feature_size or fp > fp_full:
        raise ValueError(f"feat has {fp} rows; feature_size "
                         f"{feature_size} needs {feature_size}.."
                         f"{fp_full} (pack_room)")
    if fp < fp_full:
        # callers may ship only the live feature rows (a 19% smaller
        # host->device transfer at FP=16); zero-pad on device
        feat = jnp.pad(feat, ((0, 0), (0, fp_full - fp), (0, 0)))
        fp = fp_full
    p8 = p // 8
    chunk = fused_chunk(p8)
    if p8 % chunk != 0:
        # scatter_pass writes and gather_pass reads exactly n_chunks*chunk
        # columns of the scratch; a ragged tail would be read back stale
        raise ValueError(
            f"padded room width P={p} gives p8={p8} not divisible by the "
            f"chunk width {chunk}; use a power-of-two bucket size")
    gb = rooms_per_program
    if g_rooms % gb != 0:
        raise ValueError(
            f"room count {g_rooms} not divisible by rooms_per_program {gb}; "
            f"pad with inert rooms")
    n_rec = 2 + (feature_size - 6)
    if beam_width > 0:
        if lanes_per_room != beam_width * search_width:
            raise ValueError(
                f"beam mode needs lanes_per_room == beam_width * "
                f"search_width ({beam_width}*{search_width}), got "
                f"{lanes_per_room}")
    if parallel_seeds:
        if beam_width > 0:
            raise ValueError("parallel seeds and beam mode are exclusive")
        if lanes_per_room < 2:
            raise ValueError("parallel_seeds needs lanes_per_room (the "
                             "wave width W) >= 2")
    if scoring not in ("ml", "np", "cp"):
        raise ValueError(f"unknown scoring {scoring!r}")
    if scoring == "cp" and len(weights) != 26:
        raise ValueError(
            "'cp' scoring needs the completeness-head weights: pack with "
            "pack_lrgnet_weights(with_complete=True) (26 arrays, got "
            f"{len(weights)})")
    if shared_window:
        # the shared-window (lane-cohort) passes stack every lane's rows
        # at ONE union column offset; they assume lane l == room l
        # (visited/vox/rank rows align with current rows), greedy control
        # flow, and VMEM-resident features in the (FP*8, p8) layout
        if lanes_per_room != 1 or beam_width > 0 or parallel_seeds:
            raise ValueError(
                "shared_window supports the greedy path only "
                "(lanes_per_room == 1, no beam, no parallel seeds)")
        if hbm_features:
            raise ValueError(
                "shared_window requires VMEM-resident features "
                "(hbm_features=False)")
    lanes = gb * lanes_per_room
    n_chunks_h = p8 // chunk
    # coordinate-major voxel layout (3, G*8, p8): rows of one coordinate
    # for ALL rooms are contiguous, so the shared-window passes read a
    # coordinate for every lane as ONE dynamic-offset load; rank flattens
    # to (G*8, p8) for the same reason (the public (G, 24, p8)/(G, 8, p8)
    # layouts stay the API — the relayout is one device transpose/launch)
    vox = vox.reshape(g_rooms, 3, 8, p8).transpose(1, 0, 2, 3) \
             .reshape(3, g_rooms * 8, p8)
    rank = rank.reshape(g_rooms * 8, p8)
    if hbm_features:
        # slab-major relayout for on-demand DMA: chunk cc of room g becomes
        # the contiguous (FP, 8*chunk) block feat[g, cc] whose sublane r
        # occupies columns [r*chunk, (r+1)*chunk) — one DMA per gather slab
        feat = feat.reshape(g_rooms, fp, 8, n_chunks_h, chunk) \
                   .transpose(0, 3, 1, 2, 4) \
                   .reshape(g_rooms, n_chunks_h, fp, 8 * chunk)
    elif shared_window:
        # (FP*8, p8) relayout: feature f's sublane r at row f*8+r — a
        # gather chunk becomes ONE (FP*8, chunk) dynamic-offset read
        # (row-major reshape only; no data movement)
        feat = feat.reshape(g_rooms, fp * 8, p8)

    kernel = functools.partial(
        _grow_kernel, gb=gb, lanes_per_room=lanes_per_room,
        scoring=scoring, beam_width=beam_width,
        search_width=search_width, parallel_seeds=parallel_seeds,
        seed_separation=seed_separation, hbm_features=hbm_features,
        stratified=stratified, shared_window=shared_window, k=k,
        feature_size=feature_size,
        max_steps=max_steps, cluster_threshold=cluster_threshold,
        max_instances=max_instances, chunk=chunk, exact_median=exact_median)

    w_specs = [pl.BlockSpec(wm.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for wm in weights]
    out_shapes = (
        jax.ShapeDtypeStruct((g_rooms, 8, p8), jnp.int32),
        jax.ShapeDtypeStruct((g_rooms, max_instances, 8), jnp.float32),
        jax.ShapeDtypeStruct((g_rooms, 8, 128), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec((gb, 8, p8), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, max_instances, 8), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, 8, 128), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid=(g_rooms // gb,),
        in_specs=[
            # whole (G, 1) seed table in SMEM, indexed by program_id (a
            # blocked (1, 1) SMEM spec violates the tiling constraint)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # features: VMEM-resident window, or (hbm mode) the whole
            # slab-major array left in HBM and DMA'd per gather chunk
            (pl.BlockSpec(memory_space=pltpu.ANY) if hbm_features else
             pl.BlockSpec((gb, fp * 8, p8) if shared_window else
                          (gb, fp, p), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)),
            pl.BlockSpec((3, gb * 8, p8), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb * 8, p8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, 8, p8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole (G, 8, n_chunks) chunk-bounds table in SMEM (scalar
            # reads drive the chunk-skip conditionals)
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((gb * 8, p8), jnp.int32),     # visited (per room)
            pltpu.VMEM((gb * 8, p8), jnp.int32),     # tried (per room)
            pltpu.VMEM((lanes * 8, p8), jnp.int32),  # current (per lane)
            pltpu.VMEM((lanes * 8, p8), jnp.int32),  # sampling selection
            pltpu.VMEM((lanes * 8, p8), jnp.int32),  # prefix ranks
            # per-room sortable feature encodings (exact-median source,
            # shared by the room's lanes)
            pltpu.VMEM((gb * n_rec * 8, p8), jnp.int32),
            # per-step MASKED sample keys (sentinel INT32_MAX outside each
            # group's mask): per lane, 8 inlier + 8 neighbor key rows.
            # Written only for slabs in each lane's bbox range; every
            # later per-step pass reads just that range.
            pltpu.VMEM((lanes * 16, p8), jnp.int32),
        ] + ([
            # beam parent masks (Q entries' pristine masks; rollout lanes
            # copy from here each round)
            pltpu.VMEM((gb * beam_width * 8, p8), jnp.int32),
        ] if beam_width > 0 else []) + ([
            # hbm mode: per-gather DMA stage for one feature slab + its sem
            pltpu.VMEM((fp, 8 * chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ] if hbm_features else []),
        # the default 16 MB scoped-vmem budget is ~30 KB short at P=16384
        # (weights 3.2 MB + room 1.5 MB + slab temporaries); v5e has
        # 128 MB of VMEM and the batched buckets are sized to ~90 MB of it
        # (rooms_per_program_budget)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024),
        interpret=interpret,
    )(seeds, feat, vox, rank, obj, tbl, *weights)
