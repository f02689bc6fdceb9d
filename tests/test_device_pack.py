"""Compact-transfer device packing (``ops/device_pack.py``) oracles.

The device expansion must be BIT-IDENTICAL to the host ``pack_room`` +
``chunk_bounds`` path — it re-encodes the same staged data, so any
difference is a bug, not a tolerance."""

import jax.numpy as jnp
import numpy as np

from learn_region_grow_tpu.core import prepare_room
from learn_region_grow_tpu.ops import device_pack as dp
from learn_region_grow_tpu.ops import fused_grow as fg


def _stage(tiny_rooms, g_pad=None, fs=13):
    rfs = [prepare_room(r[:, :6], r[:, 6], r[:, 7], resolution=0.1)
           for r in tiny_rooms]
    p = max(1024, 1 << (max(len(rf.points) for rf in rfs) - 1).bit_length())
    g_pad = g_pad or len(rfs)
    seeds = np.arange(g_pad, dtype=np.int32).reshape(g_pad, 1) + 7
    hs = dp.stage_group(rfs, fs, seeds, g_pad)
    return rfs, p, hs


def test_device_pack_matches_pack_room(tiny_rooms):
    rfs, p, hs = _stage(tiny_rooms)
    g = len(rfs)
    chunk = fg.fused_chunk(p // 8)
    feat_d, vox_d, rank_d, obj_d, tbl_d = dp.device_pack(
        jnp.asarray(hs.feats_c), jnp.asarray(hs.vox_c),
        jnp.asarray(hs.rank_c), jnp.asarray(hs.obj_c),
        jnp.asarray(hs.eq_base), g=g, p=p, feature_size=13, chunk=chunk)
    for gi, rf in enumerate(rfs):
        feat_h, vox_h, rank_h, obj_h, restore = fg.pack_room(rf, p, 13)
        np.testing.assert_array_equal(np.asarray(feat_d)[gi], feat_h)
        np.testing.assert_array_equal(np.asarray(vox_d)[gi], vox_h)
        np.testing.assert_array_equal(np.asarray(rank_d)[gi], rank_h)
        np.testing.assert_array_equal(np.asarray(obj_d)[gi], obj_h)
        np.testing.assert_array_equal(
            np.asarray(tbl_d)[gi], fg.chunk_bounds(vox_h, rank_h, chunk))
        # pos_of_orig agrees with pack_room's restore map (restore =
        # interleaved slot of the pack position)
        p8 = p // 8
        pos = hs.pos_of_orig[gi]
        np.testing.assert_array_equal((pos % 8) * p8 + pos // 8, restore)


def test_device_pack_inert_pad_rooms(tiny_rooms):
    """Pad rooms (g_pad > G) get the host fix-up bit-exactly: vox 0 in
    every row of column 0, rank 0 at (0, 0), everything else padding."""
    rfs, p, hs = _stage(tiny_rooms, g_pad=len(tiny_rooms) + 2)
    g_pad = len(rfs) + 2
    chunk = fg.fused_chunk(p // 8)
    feat_d, vox_d, rank_d, obj_d, tbl_d = dp.device_pack(
        jnp.asarray(hs.feats_c), jnp.asarray(hs.vox_c),
        jnp.asarray(hs.rank_c), jnp.asarray(hs.obj_c),
        jnp.asarray(hs.eq_base), g=g_pad, p=p, feature_size=13,
        chunk=chunk)
    for gi in range(len(rfs), g_pad):
        vox = np.full((24, p // 8), fg.PAD_VOX, np.int32)
        vox[:, 0] = 0
        rank = np.full((8, p // 8), 2 ** 30, np.int32)
        rank[0, 0] = 0
        np.testing.assert_array_equal(np.asarray(vox_d)[gi], vox)
        np.testing.assert_array_equal(np.asarray(rank_d)[gi], rank)
        np.testing.assert_array_equal(np.asarray(feat_d)[gi], 0.0)


def test_compact_outputs_roundtrip(tiny_rooms):
    """compact_outputs -> split_outputs is the identity on the kernel's
    three outputs, with labels delivered in eq pack order."""
    rng = np.random.RandomState(0)
    rfs, p, hs = _stage(tiny_rooms)
    g = len(rfs)
    p8 = p // 8
    mi = 16
    labels = rng.randint(0, 50, (g, 8, p8)).astype(np.int32)
    log = rng.randn(g, mi, 8).astype(np.float32)
    counters = rng.randint(0, 99, (g, 8, 128)).astype(np.int32)
    eqcap = len(hs.feats_c)
    buf = np.asarray(dp.compact_outputs(
        jnp.asarray(labels), jnp.asarray(log), jnp.asarray(counters),
        jnp.asarray(hs.eq_base), eqcap=eqcap))
    lab_eq, log2, cnt2 = dp.split_outputs(buf, eqcap, g, mi)
    np.testing.assert_array_equal(log2, log)
    np.testing.assert_array_equal(cnt2, counters)
    for gi, rf in enumerate(rfs):
        n = len(rf.points)
        b = int(hs.eq_base[gi])
        _, _, _, _, restore = fg.pack_room(rf, p, 13)
        # eq pack order element s sits at interleaved slot
        # (s%8)*p8 + s//8 of the padded block
        s = np.arange(n)
        slots = (s % 8) * p8 + s // 8
        np.testing.assert_array_equal(lab_eq[b:b + n],
                                      labels[gi].reshape(-1)[slots])


def test_segmenter_compact_vs_padded_bit_identical(tiny_rooms, trained):
    """The full engine path: compact-transfer on vs off gives identical
    RoomResults (the kernel consumes bit-identical inputs)."""
    from learn_region_grow_tpu.engine.grow import (GrowConfig,
                                                   segment_rooms_fused)
    params, mcfg = trained
    rfs = [prepare_room(r[:, :6], r[:, 6], r[:, 7], resolution=0.1)
           for r in tiny_rooms]
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128, max_steps=60,
                      track_accuracy=False)
    out = []
    for compact in (False, True):
        res = segment_rooms_fused(params, mcfg, rfs, gcfg,
                                  min_bucket_size=1024, max_instances=32,
                                  interpret=True,
                                  compact_transfer=compact)
        out.append(res)
    for r0, r1 in zip(*out):
        np.testing.assert_array_equal(r0.cluster_label, r1.cluster_label)
        assert r0.num_clusters == r1.num_clusters
        assert len(r0.instances) == len(r1.instances)
        for i0, i1 in zip(r0.instances, r1.instances):
            assert i0 == i1
