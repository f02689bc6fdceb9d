"""Compact-transfer device packing for the fused grow kernel.

The fused kernel consumes rooms in a padded slab layout (``pack_room``:
feat (FP, P), vox (24, P8), rank/obj (8, P8), per-chunk bounds table).
Shipping that layout over a thin host<->device link pays for the padding
twice: the bucket's empty slots travel, and every room is a separate
transfer. On this box's tunnel (~27 MB/s, ~10 ms latency) the packed
upload of the 12-room bench set is ~11 MB / 0.38 s — bigger than the
kernel's own run time (`val_run/run_phase_breakdown.py`).

This module moves the PADDING on device: the host concatenates all G
rooms' equalized points UNPADDED in pack order (voxel-lexicographic,
exactly ``pack_room``'s order) and uploads

    feats_c (EQCAP, FS) f32   rank_c (EQCAP,) i32
    vox_c   (EQCAP, 3) i32    obj_c  (EQCAP,) i32    eq_base (G+1,) i32

(EQCAP = pow2 bucket of the group's total equalized points, ~1.1x
padding instead of the per-room bucket's ~1.6x, in ONE transfer per
array), and a jitted gather program expands them into bit-identical
``pack_room`` outputs on device (`tests/test_device_pack.py`).

The return path is compacted the same way: ``compact_outputs`` gathers
the padded label block back to eq-order compact labels and bit-packs
labels + per-instance log + counters into ONE int32 buffer per group
(one device_get round trip instead of three).

Reference semantics carried: the slab layout contract of
``pack_room`` (``ops/fused_grow.py:454-492``); the first-point-per-voxel
equalization and curvature seed order themselves are produced upstream
by ``core.features.prepare_room`` (reference ``stage_data.py:58-104``,
``test_region_grow.py:119-175``) — this module only re-encodes them.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fused_grow as _fg

BIG_RANK = np.int32(2 ** 30)


class HostStage(NamedTuple):
    """Host product of ``stage_group``: compact upload arrays + the
    per-room bookkeeping needed to un-permute labels on the way back."""

    feats_c: np.ndarray      # (EQCAP, FS) f32, pack order, rooms abutted
    vox_c: np.ndarray        # (EQCAP, 3) i32
    rank_c: np.ndarray       # (EQCAP,) i32
    obj_c: np.ndarray        # (EQCAP,) i32
    eq_base: np.ndarray      # (G+1,) i32 prefix offsets into the compacts
    seeds: np.ndarray        # (G, 1) i32
    pos_of_orig: List[np.ndarray]  # per room: rf order -> pack position


def stage_group(rfs, feature_size: int, seeds, g_pad: int) -> HostStage:
    """Concatenate G rooms compactly in pack order (``pack_room``'s
    voxel-lexicographic sort); ``g_pad`` >= len(rfs) adds inert pad
    rooms (zero equalized points)."""
    g = len(rfs)
    n_tot = sum(len(rf.points) for rf in rfs)
    eqcap = max(8, 1 << (max(1, n_tot) - 1).bit_length())
    feats_c = np.zeros((eqcap, feature_size), np.float32)
    vox_c = np.full((eqcap, 3), _fg.PAD_VOX, np.int32)
    rank_c = np.full(eqcap, BIG_RANK, np.int32)
    obj_c = np.full(eqcap, -1, np.int32)
    eq_base = np.zeros(g_pad + 1, np.int32)
    pos_of_orig = []
    off = 0
    for i, rf in enumerate(rfs):
        n = len(rf.points)
        vox_in = rf.voxels.astype(np.int64)
        order = np.lexsort((vox_in[:, 2], vox_in[:, 1], vox_in[:, 0]))
        feats_c[off:off + n] = rf.points[order, :feature_size]
        vox_c[off:off + n] = rf.voxels[order]
        curv_order = np.argsort(rf.curvatures, kind="stable")
        rank_of_orig = np.empty(n, np.int64)
        rank_of_orig[curv_order] = np.arange(n)
        rank_c[off:off + n] = rank_of_orig[order]
        obj_c[off:off + n] = rf.obj_id[order]
        pos = np.empty(n, np.int64)
        pos[order] = np.arange(n)
        pos_of_orig.append(pos)
        off += n
        eq_base[i + 1] = off
    eq_base[g + 1:] = off
    return HostStage(feats_c, vox_c, rank_c, obj_c, eq_base,
                     np.asarray(seeds, np.int32).reshape(g_pad, 1),
                     pos_of_orig)


@functools.partial(jax.jit, static_argnames=("g", "p", "feature_size",
                                             "chunk"))
def device_pack(feats_c, vox_c, rank_c, obj_c, eq_base, *, g: int, p: int,
                feature_size: int, chunk: int):
    """Expand the compact group arrays into the fused kernel's padded
    slab inputs — bit-identical to per-room ``pack_room`` +
    ``chunk_bounds`` (oracle test).

    Pure gathers: flat slot gslot of room r holds sorted position
    s = (gslot % P8) * 8 + gslot // P8 (the mod-8 interleave inverse),
    which is compact element eq_base[r] + s when s < n_eq[r].
    """
    p8 = p // 8
    fp = _fg.feat_rows(feature_size)
    n_eq = eq_base[1:] - eq_base[:-1]                     # (G,)
    gsl = jnp.arange(p, dtype=jnp.int32)
    s_of_slot = (gsl % p8) * 8 + gsl // p8                # (P,)
    e = eq_base[:-1, None] + s_of_slot[None, :]           # (G, P)
    valid = s_of_slot[None, :] < n_eq[:, None]
    esafe = jnp.where(valid, e, 0)

    featp = jnp.where(valid[:, None, :],
                      jnp.transpose(feats_c[esafe], (0, 2, 1)), 0.0)
    if fp > feature_size:
        featp = jnp.pad(featp, ((0, 0), (0, fp - feature_size), (0, 0)))
    voxp = jnp.where(valid[:, None, :],
                     jnp.transpose(vox_c[esafe], (0, 2, 1)), _fg.PAD_VOX)
    vox24 = voxp.reshape(g, 3, 8, p8).reshape(g, 24, p8)
    # inert pad rooms need one valid point (vox 0, rank 0) or the seed
    # pick reduces over an empty set — bit-matching FusedSegmenter's
    # host fix-up (vox[:, 0] = 0 across all 24 rows, rank[0, 0] = 0)
    inert = (n_eq == 0)[:, None, None]
    col0 = (jnp.arange(p8) == 0)[None, None, :]
    vox24 = jnp.where(inert & col0, 0, vox24)
    rankp = jnp.where(valid, rank_c[esafe], BIG_RANK).reshape(g, 8, p8)
    row0 = (jnp.arange(8) == 0)[None, :, None]
    rank = jnp.where(inert & row0 & col0, 0, rankp)
    obj = jnp.where(valid, obj_c[esafe], -1).reshape(g, 8, p8)

    # chunk-bounds table (host chunk_bounds semantics: min/max voxel of
    # the VALID points of each column chunk; empty -> BIG/-BIG)
    n_chunks = p8 // chunk
    vvalid = rank < _fg.BIG                               # (G, 8, P8)
    mr = vvalid.reshape(g, 8, n_chunks, chunk)
    tbl = []
    for axis in range(3):
        vr = vox24[:, axis * 8:(axis + 1) * 8].reshape(g, 8, n_chunks,
                                                       chunk)
        tbl.append(jnp.min(jnp.where(mr, vr, _fg.BIG), axis=(1, 3)))
        tbl.append(jnp.max(jnp.where(mr, vr, -_fg.BIG), axis=(1, 3)))
    tbl.append(jnp.zeros((g, n_chunks), jnp.int32))
    tbl.append(jnp.zeros((g, n_chunks), jnp.int32))
    tbl = jnp.stack(tbl, axis=1)                          # (G, 8, n_chunks)
    return featp, vox24, rank, obj, tbl


@functools.partial(jax.jit, static_argnames=("eqcap",))
def compact_outputs(labels, log, counters, eq_base, *, eqcap: int):
    """Bit-pack the kernel outputs into ONE int32 buffer:
    [labels_eq (EQCAP) | log bitcast (G*MI*8) | counters (G*8*128)].

    labels_eq is in compact pack order (labels gathered at each eq
    element's flat slot), so the host unpacks per room with its
    ``pos_of_orig`` map and never sees the padded block."""
    g, _, p8 = labels.shape
    p = 8 * p8
    ee = jnp.arange(eqcap, dtype=jnp.int32)
    rid = jnp.sum((ee[None, :] >= eq_base[1:-1, None]).astype(jnp.int32),
                  axis=0)                                  # (EQCAP,)
    s = ee - eq_base[rid]
    slot = (s % 8) * p8 + s // 8
    valid = s < (eq_base[rid + 1] - eq_base[rid])
    lab_flat = labels.reshape(g, p)
    lab_eq = jnp.where(valid, lab_flat[rid, jnp.where(valid, slot, 0)], 0)
    return jnp.concatenate([
        lab_eq,
        jax.lax.bitcast_convert_type(log, jnp.int32).reshape(-1),
        counters.reshape(-1),
    ])


def split_outputs(buf: np.ndarray, eqcap: int, g: int, max_instances: int):
    """Host inverse of ``compact_outputs``: (labels_eq, log, counters)."""
    lab_eq = buf[:eqcap]
    off = eqcap
    nlog = g * max_instances * 8
    log = buf[off:off + nlog].view(np.float32).reshape(g, max_instances, 8)
    off += nlog
    counters = buf[off:off + g * 8 * 128].reshape(g, 8, 128)
    return lab_eq, log, counters
