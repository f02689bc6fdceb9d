"""HBM-resident-features kernel variant: real-chip parity + the 1M cap.

Round-3 verdict ask #2: the whole-room-in-VMEM layout capped the fused
kernel at 524,288 points. With ``hbm_features`` the 4*FP-byte/point feature
block leaves VMEM (gathers DMA slab-major chunks on demand), doubling the
cap to ``MAX_HBM_FUSED_POINTS`` = 1,048,576. This script stamps, on the
real chip:

1. parity: labels/instance log bit-identical HBM vs VMEM at P=131072
   (interpret-mode parity is already a unit test; this is the Mosaic-
   compiled check) + the DMA variant's overhead at a VMEM-feasible size;
2. the 1M-point record: one calibrated ~0.9M-equalized-point furnished
   room grown entirely on-chip (max_steps=1000 — the ~420k-point floor
   plane needs ~820 add steps at 512 neighbors/step).

Writes ``results/hbm_cap.txt``.  Usage: python val_run/run_hbm_cap.py
"""
import os
import sys
import time

import numpy as np

BASE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(os.path.dirname(BASE), "results")
sys.path.insert(0, os.path.dirname(BASE))

from learn_region_grow_tpu.engine.grow import (GrowConfig,
                                               enable_compilation_cache,
                                               segment_rooms_fused)
enable_compilation_cache()

from learn_region_grow_tpu.core import prepare_room
from learn_region_grow_tpu.eval.metrics import room_metrics
from learn_region_grow_tpu.models import lrgnet
from learn_region_grow_tpu.train.checkpoint import load_checkpoint
from run_scale import make_room_for_bucket

P_PARITY = 131072
P_CAP = 1048576


def timed_min3(run):
    run()                                            # compile
    t, res = float("inf"), None
    for _ in range(3):
        t0 = time.time()
        r = run()
        dt = time.time() - t0
        if dt < t:
            t, res = dt, r
    return t, res


def main():
    params, _, meta = load_checkpoint(
        os.path.join(os.path.dirname(BASE), "models",
                     "synthetic_pretrained.npz"))
    mcfg = lrgnet.LrgNetConfig(feature_size=13)
    gcfg = GrowConfig(num_inlier=512, num_neighbor=512, max_steps=500,
                      pallas_sampling=False, track_accuracy=False)
    lines = ["# HBM-resident-features fused kernel (v5e single chip, "
             "compilation-cached, min-of-3)",
             "# checkpoint: %s" % (meta or {}).get("trained_on", "?")]

    # ---- 1. compiled parity + overhead at a VMEM-feasible size ----------
    rng = np.random.RandomState(77)
    room, rf, _ = make_room_for_bucket(P_PARITY, rng)
    print(f"parity room: eq {len(rf.points)} raw {len(room)}", flush=True)
    t_v, res_v = timed_min3(lambda: segment_rooms_fused(
        params, mcfg, [rf], gcfg, min_bucket_size=P_PARITY,
        max_instances=1024))
    t_h, res_h = timed_min3(lambda: segment_rooms_fused(
        params, mcfg, [rf], gcfg, min_bucket_size=P_PARITY,
        max_instances=1024, hbm_features=True))
    same = (np.array_equal(res_v[0].cluster_label, res_h[0].cluster_label)
            and res_v[0].num_clusters == res_h[0].num_clusters)
    line = ("P=%d parity=%s vmem=%.2fs hbm=%.2fs overhead=%.2fx" % (
        P_PARITY, "BIT-IDENTICAL" if same else "MISMATCH", t_v, t_h,
        t_h / t_v))
    print(line, flush=True)
    lines.append(line)
    assert same, "HBM/VMEM label mismatch on the real chip"

    # ---- 2. the 1M-point cap record --------------------------------------
    rng = np.random.RandomState(78)
    t0 = time.time()
    room, rf, t_prep = make_room_for_bucket(P_CAP, rng)
    eq, raw = len(rf.points), len(room)
    print(f"cap room: eq {eq} raw {raw} (prep {t_prep:.1f}s, "
          f"calibration {time.time() - t0:.1f}s)", flush=True)
    assert P_CAP // 2 < eq <= P_CAP, f"calibration failed: eq={eq}"
    gcfg_cap = GrowConfig(num_inlier=512, num_neighbor=512, max_steps=1000,
                          pallas_sampling=False, track_accuracy=False)
    t_grow, res = timed_min3(lambda: segment_rooms_fused(
        params, mcfg, [rf], gcfg_cap, min_bucket_size=P_CAP,
        max_instances=1024))
    m, _ = room_metrics(rf.obj_id, res[0].cluster_label)
    n_inst = len(set(rf.obj_id.tolist()))
    line = ("P=%d hbm room eq=%d raw=%d prep=%.2fs grow=%.2fs "
            "pps=%.0f pipeline_pps=%.0f NMI=%.3f PRC=%.3f "
            "clusters=%d/%d" % (
                P_CAP, eq, raw, t_prep, t_grow, raw / t_grow,
                raw / (t_prep + t_grow), m.nmi, m.prc,
                res[0].num_clusters, n_inst))
    print(line, flush=True)
    # round-5 verdict ask #8: prep at cap scale, on the record — host SVD
    # prep vs the on-device kernel at the 1M bucket
    from learn_region_grow_tpu.core.device_features import \
        prepare_room_device
    t_dev = float("inf")
    for _ in range(2):
        t0 = time.time()
        prepare_room_device(room[:, :6], room[:, 6], room[:, 7],
                            resolution=0.1)
        t_dev = min(t_dev, time.time() - t0)
    prep_line = ("P=%d prepcmp host=%.2fs device=%.2fs -> %s" % (
        P_CAP, t_prep, t_dev, "device" if t_dev < t_prep else "host"))
    print(prep_line, flush=True)
    lines += [
        line,
        prep_line,
        "# 2x the VMEM kernel's 524,288-point cap "
        "(results/fused_cap.txt); round-5 checkpoint adds 608k-928k-eq",
        "# rooms (run_pretrain.py AREA8_TARGETS) to close the "
        "training-mix gap this record read through in rounds 3-4.",
    ]
    with open(os.path.join(RESULTS, "hbm_cap.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote results/hbm_cap.txt", flush=True)


if __name__ == "__main__":
    main()
