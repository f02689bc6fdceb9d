"""Pallas masked-selection kernels for the grow loop's latency path.

Measured on v5e (docs/pallas_grow_kernel_design.md): inside the sequential
grow ``while_loop`` each XLA sort-class selection op (top_k sampling, masked
median) costs ~5 ms of *latency* per iteration. These kernels replace them
with VPU compare/count passes that stay in VMEM:

* ``masked_sample_stratified`` — k masked indices via rank matching: ranks =
  cumsum(mask); the j-th draw targets rank floor((j+u_j) * cnt / k) + 1 with
  u_j uniform. Stratified draws are NEAR-distinct when cnt >= k (~94%
  unique; adjacent strata can floor-collide) and more evenly spread than an
  iid subset — a DOCUMENTED deviation from the reference's exact
  without-replacement sampling; cnt < k duplicates like the reference's
  with-replacement fill.
* ``masked_median_bitwise`` — exact per-column masked median by bisection on
  the monotonic sortable-integer encoding of f32 (32 count-passes; exact
  order statistics, including the even-count two-element average).

Each has a jnp reference implementation used as CPU fallback and test
oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# jnp reference implementations (fallback + oracle)
# ---------------------------------------------------------------------------

def stratified_ranks(u: jnp.ndarray, cnt: jnp.ndarray, k: int) -> jnp.ndarray:
    """Target ranks 1..cnt for k stratified draws; u (k,) uniforms."""
    j = jnp.arange(k, dtype=jnp.float32)
    r = jnp.floor((j + u) * cnt.astype(jnp.float32) / k) + 1.0
    return jnp.clip(r.astype(jnp.int32), 1, jnp.maximum(cnt, 1))


def masked_sample_stratified_ref(mask: jnp.ndarray, u: jnp.ndarray,
                                 k: int) -> jnp.ndarray:
    """(P,) mask, (k,) uniforms -> (k,) int32 indices."""
    ranks = jnp.cumsum(mask.astype(jnp.int32))
    cnt = ranks[-1]
    targets = stratified_ranks(u, cnt, k)
    pos = jnp.searchsorted(ranks, targets)
    return jnp.clip(pos, 0, mask.shape[0] - 1).astype(jnp.int32)


def masked_median_ref(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(P, C) values, (P,) mask -> (C,) median (numpy semantics)."""
    cnt = jnp.sum(mask)
    xs = jnp.sort(jnp.where(mask[:, None], x, jnp.inf), axis=0)
    lo = jnp.clip((cnt - 1) // 2, 0, x.shape[0] - 1)
    hi = jnp.clip(cnt // 2, 0, x.shape[0] - 1)
    return 0.5 * (xs[lo] + xs[hi])


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _sample_kernel(mask_ref, u_ref, out_ref, *, k: int, chunk: int):
    """One lane per grid step. mask_ref (1, 8, P8) int32: the (P,) mask
    split row-major — row r covers original indices [r*P8, (r+1)*P8).
    Ranks accumulate across rows; the j-th output is the index whose global
    masked rank equals the j-th stratified target. u_ref (1, 1, k) holds the
    per-slot uniforms (host PRNG; keeps the kernel deterministic and
    interpret-mode testable)."""
    m = mask_ref[0]                                   # (8, P8) int32 0/1
    p8 = m.shape[1]

    # ranks within each row: Hillis-Steele inclusive scan via pltpu.roll
    # (jnp.cumsum does not lower on this backend)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, p8), 1)
    row_cum = m
    d = 1
    while d < p8:
        # zero-filled right-shift by d via static concat (roll/dynamic_slice
        # do not lower on this backend)
        shifted = jnp.concatenate(
            [jnp.zeros((8, d), row_cum.dtype), row_cum[:, :p8 - d]], axis=1)
        row_cum = row_cum + shifted
        d *= 2
    row_tot = row_cum[:, p8 - 1:p8]                   # (8, 1)
    # exclusive prefix over the 8 rows (static unroll)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    row_off = jnp.zeros((8, 1), jnp.int32)
    for r in range(1, 8):
        row_off = row_off + jnp.where(row_ids >= r, row_tot[r - 1:r], 0)
    ranks = row_cum + row_off                         # (8, P8) global rank
    cnt = row_off[7, 0] + row_tot[7, 0]   # static idx (-1 lowers dynamic)

    # stratified target ranks (1, k)
    u = u_ref[0]                                      # (1, k)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1).astype(jnp.float32)
    cntf = jnp.maximum(cnt, 1).astype(jnp.float32)
    targets = jnp.floor((j + u) * cntf / k) + 1.0
    targets = jnp.clip(targets, 1.0, cntf).astype(jnp.int32)   # (1, k)

    # match: for each target rank, the first index with that rank and mask=1.
    # Encode (masked, global_index) into one int: code = rank * BIGP + idx
    # for masked positions, -1 otherwise; then target j's answer is
    # (max over chunk of code where rank == target) decoded. Loop chunks
    # with dynamic REF reads from scratch so Mosaic reuses one (k, chunk)
    # temp instead of stacking an unrolled buffer per block.
    glob_idx = (jax.lax.broadcasted_iota(jnp.int32, (8, p8), 0) * p8
                + jax.lax.broadcasted_iota(jnp.int32, (8, p8), 1))
    t_col = targets.reshape(k, 1)

    def body(ranks_s, m_s, idx_s):
        ranks_s[...] = ranks
        m_s[...] = m
        idx_s[...] = glob_idx

        def chunk_row(ci, acc):
            lo = ci * chunk

            def one_row(r, acc2):
                rr = ranks_s[pl.ds(0, 8), pl.ds(lo, chunk)]
                mm = m_s[pl.ds(0, 8), pl.ds(lo, chunk)]
                ii = idx_s[pl.ds(0, 8), pl.ds(lo, chunk)]
                del r
                # all 8 rows at once: (k, 8 * chunk) compare via reshape
                hit = (t_col == rr.reshape(1, 8 * chunk)) &                     (mm.reshape(1, 8 * chunk) > 0)
                contrib = jnp.max(
                    jnp.where(hit, ii.reshape(1, 8 * chunk), -1), axis=1)
                return jnp.maximum(acc2, contrib.reshape(1, k))

            return one_row(0, acc)

        acc0 = jnp.full((1, k), -1, jnp.int32)
        result = jax.lax.fori_loop(0, p8 // chunk, chunk_row, acc0)
        out_ref[0, 0:1, :] = jnp.maximum(result, 0)

    pl.run_scoped(
        body,
        ranks_s=pltpu.VMEM((8, p8), jnp.int32),
        m_s=pltpu.VMEM((8, p8), jnp.int32),
        idx_s=pltpu.VMEM((8, p8), jnp.int32),
    )


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnums=(2,))
def masked_sample_stratified(mask: jnp.ndarray, seeds: jnp.ndarray,
                             k: int) -> jnp.ndarray:
    """(L, P) bool mask, (L,) int32 seeds -> (L, k) int32 indices.

    Pallas on TPU; jnp reference implementation elsewhere.
    """
    l, p = mask.shape
    if jax.default_backend() != "tpu":
        base = jax.random.PRNGKey(0)
        u = jax.vmap(lambda s: jax.random.uniform(
            jax.random.fold_in(base, s), (k,)))(seeds)
        return jax.vmap(lambda mm, uu: masked_sample_stratified_ref(mm, uu, k)
                        )(mask, u)
    base = jax.random.PRNGKey(0)
    u = jax.vmap(lambda s: jax.random.uniform(
        jax.random.fold_in(base, s), (1, k)))(seeds)          # (l, 1, k)
    p8 = _round_up(p, 8 * 128) // 8
    padded = jnp.zeros((l, 8 * p8), jnp.int32).at[:, :p].set(
        mask.astype(jnp.int32))
    packed = padded.reshape(l, 8, p8)
    chunk = min(512, p8)
    kernel = functools.partial(_sample_kernel, k=k, chunk=chunk)
    out = pl.pallas_call(
        kernel,
        grid=(l,),
        in_specs=[
            pl.BlockSpec((1, 8, p8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, 8, k), jnp.int32),
        # see masked_sample_stratified_one: the scan's scoped temporaries
        # exceed the 16 MB default at ~1M-point rooms
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(packed, u)
    return out[:, 0, :]


def masked_sample_stratified_one(mask: jnp.ndarray, u: jnp.ndarray,
                                 k: int, interpret: bool = False
                                 ) -> jnp.ndarray:
    """Single-lane kernel call for use under vmap inside the grow loop.

    mask (P,) bool with P % 1024 == 0; u (1, k) uniforms -> (k,) int32.
    """
    p = mask.shape[0]
    p8 = p // 8
    packed = mask.astype(jnp.int32).reshape(1, 8, p8)
    kernel = functools.partial(_sample_kernel, k=k, chunk=min(512, p8))
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 8, p8), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, k), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8, k), jnp.int32),
        # the rank scan's stack temporaries scale with P8: the default
        # 16 MB scoped-vmem limit OOMs at P = 2^20 (25.2 MB requested —
        # hit by area-8 staging, round 5); the mask block itself is only
        # 4 MB there, so 64 MB leaves ample headroom on a 128 MB part
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(packed, u.reshape(1, 1, k))
    return out[0, 0, :]
