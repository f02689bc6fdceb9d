"""Real-chip A/B: shared-window (lane-cohort) fused kernel vs per-lane.

Round-4 cost model (docs/pallas_grow_kernel_design.md): a fused grow step
costs ~350 us fixed + ~80 us per lane, the per-lane part being ~25-30
small dynamic-offset vector ops. The shared-window mode replaces them
with full-height stacked passes at ONE union column offset per iteration.
This script measures both on the bench.py 12-room set (min-of-5, same
protocol) and prints a table; quality must be unchanged (the two modes
are bit-identical — tests/test_fused_grow.py shared-window parity).

    python val_run/run_shared_ab.py            # on the TPU
"""
import os
import sys
import time

import numpy as np

BASE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(BASE))


def main():
    import jax

    from learn_region_grow_tpu.engine.grow import (GrowConfig,
                                                   enable_compilation_cache,
                                                   segment_rooms_fused)
    enable_compilation_cache()
    from learn_region_grow_tpu.core import prepare_room
    from learn_region_grow_tpu.data.synthetic import generate_rooms
    from learn_region_grow_tpu.eval.metrics import room_metrics
    from learn_region_grow_tpu.models import lrgnet
    from learn_region_grow_tpu.train.checkpoint import load_checkpoint

    print("devices:", jax.devices())
    ckpt = os.path.join(os.path.dirname(BASE), "models",
                        "synthetic_pretrained.npz")
    params, _, _ = load_checkpoint(ckpt)
    mcfg = lrgnet.LrgNetConfig(feature_size=13)
    eval_rooms = generate_rooms(12, seed=42, scale=0.6)
    raw = sum(len(r) for r in eval_rooms)
    feats = [prepare_room(r[:, :6], r[:, 6], r[:, 7], resolution=0.1)
             for r in eval_rooms]
    print(f"12 rooms, {raw} raw, {sum(len(f.points) for f in feats)} eq")
    gcfg = GrowConfig(num_inlier=512, num_neighbor=512, max_steps=500,
                      track_accuracy=False)

    reps = int(os.environ.get("AB_REPS", "5"))
    for label, shw in (("per-lane ", False), ("shared   ", True)):
        def run():
            return segment_rooms_fused(params, mcfg, feats, gcfg,
                                       min_bucket_size=4096,
                                       max_instances=512,
                                       shared_window=shw)
        t_c = time.time()
        res = run()  # compile+warmup
        t_c = time.time() - t_c
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            res = run()
            best = min(best, time.time() - t0)
        nmis = [room_metrics(rf.obj_id, r.cluster_label)[0].nmi
                for rf, r in zip(feats, res)]
        print("%s grow-only min-of-%d %.3fs (cold %.1fs)  NMI %.3f  "
              "%d raw pts/s" % (label, reps, best, t_c,
                                float(np.mean(nmis)), raw / best))


if __name__ == "__main__":
    main()
