"""Where does the fused pipeline's wall-clock actually go?

Decomposes the bench.py protocol (12 rooms, min_bucket 4096) into
  prep      prepare_room host feature computation (SVD normals etc.)
  pack      pack_room host packing into the kernel slab layout
  transfer  host->device of the packed inputs (27 MB/s tunnel here)
  kernel    fused_grow_rooms on DEVICE-RESIDENT inputs, block_until_ready
  fetch     device->host of labels/logs/counters
so optimization effort goes where the time is (round-5; the round-4 cost
model only decomposed the kernel's step cost).

    python val_run/run_phase_breakdown.py
"""
import os
import sys
import time

import numpy as np

BASE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(BASE))


def main():
    from learn_region_grow_tpu.engine.grow import (GrowConfig,
                                                   enable_compilation_cache,
                                                   _bucket_size)
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from learn_region_grow_tpu.core import prepare_room
    from learn_region_grow_tpu.data.synthetic import generate_rooms
    from learn_region_grow_tpu.models import lrgnet
    from learn_region_grow_tpu.ops import fused_grow as _fg
    from learn_region_grow_tpu.train.checkpoint import load_checkpoint

    print("devices:", jax.devices())
    ckpt = os.path.join(os.path.dirname(BASE), "models",
                        "synthetic_pretrained.npz")
    params, _, _ = load_checkpoint(ckpt)
    cfg = GrowConfig(num_inlier=512, num_neighbor=512, max_steps=500,
                     track_accuracy=False)
    fs = 13
    weights = [jnp.asarray(a) for a in _fg.pack_lrgnet_weights(params, fs)]

    eval_rooms = generate_rooms(12, seed=42, scale=0.6)
    raw = sum(len(r) for r in eval_rooms)

    t0 = time.time()
    feats = [prepare_room(r[:, :6], r[:, 6], r[:, 7], resolution=0.1)
             for r in eval_rooms]
    t_prep = time.time() - t0
    print(f"12 rooms, {raw} raw, {sum(len(f.points) for f in feats)} eq, "
          f"prep {t_prep:.3f}s (one-time, also measured once)")

    # bucket exactly as FusedSegmenter.submit does
    buckets = {}
    for i, rf in enumerate(feats):
        buckets.setdefault(_bucket_size(len(rf.points), 4096),
                           []).append(i)

    reps = 5
    rows = []
    for psize in sorted(buckets):
        ids = buckets[psize]
        g = len(ids)
        gb = min(_fg.rooms_per_program_budget(psize, fs, 1), g)
        if g > gb:
            gb = _fg.rooms_per_program_budget(psize, fs, 1,
                                              pipelined=True)
        gp = -(-g // gb) * gb
        n_chunks = (psize // 8) // _fg.fused_chunk(psize // 8)
        best = dict(pack=9e9, transfer=9e9, kernel=9e9, fetch=9e9)
        steps = None
        nbytes = None
        for _ in range(reps + 1):  # first rep = warmup/compile
            t0 = time.time()
            feat = np.zeros((gp, fs, psize), np.float32)
            vox = np.full((gp, 24, psize // 8), _fg.PAD_VOX, np.int32)
            rank = np.full((gp, 8, psize // 8), 2 ** 30, np.int32)
            obj = np.zeros((gp, 8, psize // 8), np.int32)
            tbl = np.zeros((gp, 8, n_chunks), np.int32)
            seeds = np.zeros((gp, 1), np.int32)
            for gi, ri in enumerate(ids):
                packed, vox[gi], rank[gi], obj[gi], _ = _fg.pack_room(
                    feats[ri], psize, fs)
                feat[gi] = packed[:fs]
                seeds[gi, 0] = 1000003 + ri
            for gi in range(g, gp):
                rank[gi, 0, 0] = 0
                vox[gi, :, 0] = 0
            for gi in range(gp):
                tbl[gi] = _fg.chunk_bounds(vox[gi], rank[gi],
                                           _fg.fused_chunk(psize // 8))
            t1 = time.time()
            host = (seeds, feat, vox, rank, obj, tbl)
            nbytes = sum(a.nbytes for a in host)
            dev = [jnp.asarray(a) for a in host]
            jax.block_until_ready(dev)
            t2 = time.time()
            out = _fg.fused_grow_rooms(
                *dev, weights, k=cfg.num_inlier, feature_size=fs,
                max_steps=cfg.max_steps,
                cluster_threshold=cfg.cluster_threshold,
                max_instances=512, rooms_per_program=gb)
            jax.block_until_ready(out)
            t3 = time.time()
            host_out = [np.asarray(jax.device_get(o)) for o in out]
            t4 = time.time()
            steps = int(sum(host_out[2][gi, 0, 0] for gi in range(g)))
            best = dict(pack=min(best["pack"], t1 - t0),
                        transfer=min(best["transfer"], t2 - t1),
                        kernel=min(best["kernel"], t3 - t2),
                        fetch=min(best["fetch"], t4 - t3))
        rows.append((psize, g, gb, steps, nbytes, best))
        print(f"P={psize:6d} G={g:2d} gb={gb} wave_steps={steps:5d} "
              f"in={nbytes / 1e6:6.1f}MB  pack {best['pack']:.3f}s  "
              f"transfer {best['transfer']:.3f}s "
              f"({nbytes / 1e6 / max(best['transfer'], 1e-9):.0f}MB/s)  "
              f"kernel {best['kernel']:.3f}s "
              f"({best['kernel'] / max(steps, 1) * 1e6:.0f}us/step)  "
              f"fetch {best['fetch']:.3f}s")
    tot = {ph: sum(r[5][ph] for r in rows)
           for ph in ("pack", "transfer", "kernel", "fetch")}
    print("TOTAL (sum of per-bucket bests): "
          + "  ".join(f"{ph} {t:.3f}s" for ph, t in tot.items())
          + f"  | prep {t_prep:.3f}s"
          + f"  | grand {t_prep + sum(tot.values()):.3f}s"
          + f"  ({raw / sum(tot.values()):.0f} raw pts/s excl prep)")


if __name__ == "__main__":
    main()
