"""Standalone Mosaic-compiler repro for the 2026-08-19 server-toolchain
abort ("Check failed: limits[i] <= dim(i)"): ops on (lanes*8, n_slabs)
i32 arrays inside a Pallas TPU kernel, mimicking fused_grow's
build_sel_ranks bookkeeping (see docs/tpu_pitfalls.md, last section).

Measured boundary on that toolchain: case 5 (per-lane row-slice of the
narrow array under a where()-masked reduction) ABORTS the TPU worker;
cases 2/6 (plain slicing) and 7 (full-array where + 1-column slice — the
formulation now shipped in ops/fused_grow.py) compile and run. Keep this
around to re-bisect after future server updates.

Usage: python scripts/mosaic_repro_min.py CASE [LANES] [NSLABS]
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CASE = int(sys.argv[1]) if len(sys.argv) > 1 else 0
LANES = int(sys.argv[2]) if len(sys.argv) > 2 else 2
NSLABS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
SW = 1024
P8 = NSLABS * SW


def kernel(x_ref, o_ref, enc_s, case):
    lanes, n_slabs = LANES, NSLABS
    enc_s[...] = jnp.zeros((lanes * 8, P8), jnp.int32) + x_ref[0, 0]

    def ph1(i, rt):
        parts = []
        for l in range(lanes):
            lo = (jnp.minimum(i, n_slabs - 1)) * SW
            slab = enc_s[pl.ds(l * 8, 8), pl.ds(lo, SW)]
            t = jnp.sum((slab <= 5).astype(jnp.int32), axis=1,
                        keepdims=True)
            s_l = jnp.minimum(i, n_slabs - 1)
            colmask = (jax.lax.broadcasted_iota(
                jnp.int32, (8, n_slabs), 1) == s_l)
            parts.append(jnp.where(colmask, t, 0))
        return rt + jnp.concatenate(parts, axis=0)

    rt = jax.lax.fori_loop(0, n_slabs, ph1,
                           jnp.zeros((lanes * 8, n_slabs), jnp.int32))
    if case == 0:
        # full build_sel_ranks bookkeeping
        inc = rt
        d = 1
        while d < n_slabs:
            inc = inc + jnp.concatenate(
                [jnp.zeros((lanes * 8, d), jnp.int32),
                 inc[:, :n_slabs - d]], axis=1)
            d *= 2
        row_prior = inc - rt
        row_tot = inc[:, n_slabs - 1:n_slabs]
        row_id = jax.lax.broadcasted_iota(jnp.int32,
                                          (lanes * 8, lanes * 8), 0)
        col_id = jax.lax.broadcasted_iota(jnp.int32,
                                          (lanes * 8, lanes * 8), 1)
        lower_tri = (((row_id // 8) == (col_id // 8))
                     & ((col_id % 8) < (row_id % 8))).astype(jnp.float32)
        row_base = jnp.dot(lower_tri, row_tot.astype(jnp.float32),
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST
                           ).astype(jnp.int32)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (lanes * 8, n_slabs), 1)
        acc = jnp.zeros((8, 1), jnp.int32)
        for l in range(lanes):
            prior = jnp.sum(
                jnp.where(cidx[l * 8:(l + 1) * 8] == 1,
                          row_prior[l * 8:(l + 1) * 8], 0),
                axis=1, keepdims=True)
            acc = acc + prior + row_base[l * 8:(l + 1) * 8]
        o_ref[...] = jnp.zeros((8, 128), jnp.int32) + acc
    elif case == 1:
        # just the shifted-concat prefix scan
        inc = rt
        d = 1
        while d < n_slabs:
            inc = inc + jnp.concatenate(
                [jnp.zeros((lanes * 8, d), jnp.int32),
                 inc[:, :n_slabs - d]], axis=1)
            d *= 2
        o_ref[...] = jnp.zeros((8, 128), jnp.int32) + jnp.sum(inc)
    elif case == 2:
        # just the per-lane row slicing of the (lanes*8, n_slabs) array
        acc = jnp.zeros((8, 1), jnp.int32)
        for l in range(lanes):
            acc = acc + jnp.sum(rt[l * 8:(l + 1) * 8], axis=1,
                                keepdims=True)
        o_ref[...] = jnp.zeros((8, 128), jnp.int32) + acc
    elif case == 3:
        # ph1 alone
        o_ref[...] = jnp.zeros((8, 128), jnp.int32) + jnp.sum(rt)
    elif case == 4:
        # lane-col slice + MXU row_base + per-lane row slices
        row_tot = rt[:, n_slabs - 1:n_slabs]
        row_id = jax.lax.broadcasted_iota(jnp.int32,
                                          (lanes * 8, lanes * 8), 0)
        col_id = jax.lax.broadcasted_iota(jnp.int32,
                                          (lanes * 8, lanes * 8), 1)
        lower_tri = (((row_id // 8) == (col_id // 8))
                     & ((col_id % 8) < (row_id % 8))).astype(jnp.float32)
        row_base = jnp.dot(lower_tri, row_tot.astype(jnp.float32),
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST
                           ).astype(jnp.int32)
        acc = jnp.zeros((8, 1), jnp.int32)
        for l in range(lanes):
            acc = acc + row_base[l * 8:(l + 1) * 8]
        o_ref[...] = jnp.zeros((8, 128), jnp.int32) + acc
    elif case == 5:
        # cidx masked where/sum per lane
        cidx = jax.lax.broadcasted_iota(jnp.int32, (lanes * 8, n_slabs), 1)
        acc = jnp.zeros((8, 1), jnp.int32)
        for l in range(lanes):
            prior = jnp.sum(
                jnp.where(cidx[l * 8:(l + 1) * 8] == 1,
                          rt[l * 8:(l + 1) * 8], 0),
                axis=1, keepdims=True)
            acc = acc + prior
        o_ref[...] = jnp.zeros((8, 128), jnp.int32) + acc
    elif case == 7:
        # fix candidate: full-array where/sum, then slice the 1-col result
        cidx = jax.lax.broadcasted_iota(jnp.int32, (lanes * 8, n_slabs), 1)
        # per-lane target slab as a (lanes*8, 1) column
        row = jax.lax.broadcasted_iota(jnp.int32, (lanes * 8, 1), 0)
        s_col = jnp.zeros((lanes * 8, 1), jnp.int32)
        for l in range(lanes):
            s_col = s_col + jnp.where((row // 8) == l, jnp.int32(1), 0)
        prior_full = jnp.sum(jnp.where(cidx == s_col, rt, 0),
                             axis=1, keepdims=True)
        acc = jnp.zeros((8, 1), jnp.int32)
        for l in range(lanes):
            acc = acc + prior_full[l * 8:(l + 1) * 8]
        o_ref[...] = jnp.zeros((8, 128), jnp.int32) + acc
    elif case == 6:
        # lane-col slice alone
        row_tot = rt[:, n_slabs - 1:n_slabs]
        acc = jnp.zeros((8, 1), jnp.int32)
        for l in range(lanes):
            acc = acc + row_tot[l * 8:(l + 1) * 8]
        o_ref[...] = jnp.zeros((8, 128), jnp.int32) + acc


x = np.ones((1, 1), np.int32)
out = pl.pallas_call(
    functools.partial(kernel, case=CASE),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec((8, 128), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    scratch_shapes=[pltpu.VMEM((LANES * 8, P8), jnp.int32)],
)(x)
print("CASE", CASE, "OK", int(np.asarray(out)[0, 0]), flush=True)
