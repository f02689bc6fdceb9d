"""Real-scene-scale validation: throughput/memory at P = 16k .. 131k.

Reference rooms are 50-100k+ equalized points (``test_region_grow.py``
over full S3DIS areas; BASELINE.json config #4 is ScanNet-scale). This run
generates synthetic rooms large enough to land in the 65,536- and
131,072-point padded buckets, drives the batched XLA engine (the fused
kernel's VMEM budget caps at 32,768 — larger rooms take the lane engine)
and records the points/sec + device-memory curve to
``results/scale_curve.txt``.

Usage: python val_run/run_scale.py [quick]
"""
import os
import sys
import time

import numpy as np

BASE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(os.path.dirname(BASE), "results")
os.makedirs(RESULTS, exist_ok=True)

import jax

from learn_region_grow_tpu.engine.grow import (GrowConfig,
                                               enable_compilation_cache,
                                               segment_rooms)
enable_compilation_cache()

from learn_region_grow_tpu.core import prepare_room
from learn_region_grow_tpu.data.synthetic import generate_furnished_rooms
from learn_region_grow_tpu.eval.metrics import room_metrics
from learn_region_grow_tpu.models import lrgnet
from learn_region_grow_tpu.train.checkpoint import load_checkpoint


def device_mem_mb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / 1e6
    except Exception:
        return -1.0


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    params, _, _ = load_checkpoint(
        os.path.join(os.path.dirname(BASE), "models",
                     "synthetic_pretrained.npz"))
    mcfg = lrgnet.LrgNetConfig(feature_size=13)
    lines = ["# scale curve: padded bucket P, rooms, equalized pts, "
             "raw pts, grow secs, pts/sec, NMI, device MB"]
    # scale factors chosen so equalized counts land in each target bucket
    configs = [(1.0, 2, 16384), (1.8, 2, 32768), (2.6, 2, 65536),
               (3.8, 1, 131072)]
    if quick:
        configs = configs[:2]
    seed = 100
    for scale, n_rooms, target_p in configs:
        rooms = generate_furnished_rooms(n_rooms, seed=seed, scale=scale,
                                         min_items=20, max_items=30)
        seed += 1
        raw = sum(len(r) for r in rooms)
        t0 = time.time()
        feats = [prepare_room(r[:, :6], r[:, 6], r[:, 7], resolution=0.1)
                 for r in rooms]
        t_feat = time.time() - t0
        eq = sum(len(f.points) for f in feats)
        pmax = max(len(f.points) for f in feats)
        print(f"target P={target_p}: {n_rooms} rooms, eq {eq} "
              f"(max {pmax}), raw {raw}, feature {t_feat:.1f}s", flush=True)
        gcfg = GrowConfig(num_inlier=512, num_neighbor=512, max_steps=500,
                          pallas_sampling=True, track_accuracy=False)
        kw = dict(min_bucket_size=target_p, num_parallel_seeds=4,
                  tail_seeds=16)
        segment_rooms(params, mcfg, feats, gcfg, **kw)   # compile
        t0 = time.time()
        res = segment_rooms(params, mcfg, feats, gcfg, **kw)
        t_grow = time.time() - t0
        nmis = [room_metrics(f.obj_id, r.cluster_label)[0].nmi
                for f, r in zip(feats, res)]
        mem = device_mem_mb()
        pps = raw / (t_feat + t_grow)
        line = ("P=%6d rooms=%d eq=%7d raw=%8d grow=%7.2fs pps=%8.0f "
                "NMI=%.3f mem=%.0fMB" % (target_p, n_rooms, eq, raw,
                                         t_grow, pps, np.mean(nmis), mem))
        print(line, flush=True)
        lines.append(line)
    with open(os.path.join(RESULTS, "scale_curve.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", os.path.join(RESULTS, "scale_curve.txt"))


if __name__ == "__main__":
    main()
