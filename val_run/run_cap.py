"""Regenerate the fused-kernel 524,288-point cap record
(``results/fused_cap.txt``): one calibrated ~395k-equalized-point
furnished room (RandomState(77) — same draw as the round-2 record) grown
by the fused kernel at its padded cap.

Round-3 context: the round-2 record (NMI 0.693, PRC 0.568) was captured
with a checkpoint whose training mix topped out at 317k-point rooms; the
mechanics ceiling at this scale is 1.0 (results/scale_ceiling.txt), so the
sag was a training gap. The round-3 checkpoint adds near-cap rooms
(360k/410k eq, run_pretrain.py AREA6_TARGETS) — this script stamps what
that buys at the cap.

Usage: python val_run/run_cap.py
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
from learn_region_grow_tpu.data.synthetic import generate_furnished_room
from learn_region_grow_tpu.eval.metrics import room_metrics
from learn_region_grow_tpu.models import lrgnet
from learn_region_grow_tpu.train.checkpoint import load_checkpoint

P = 524288


def main():
    params, _, meta = load_checkpoint(
        os.path.join(os.path.dirname(BASE), "models",
                     "synthetic_pretrained.npz"))
    mcfg = lrgnet.LrgNetConfig(feature_size=13)
    rng = np.random.RandomState(77)
    # same calibration model as run_scale.make_room_for_bucket
    area = P * 0.75 / 100.0
    h = 4.0
    w = (-4 * h + np.sqrt(16 * h * h + 8 * area)) / 4
    room = rf = None
    for _ in range(5):
        room = generate_furnished_room(w, w, h, rng)
        rf = prepare_room(room[:, :6], room[:, 6], room[:, 7],
                          resolution=0.1)
        eq = len(rf.points)
        if P // 2 < eq <= P:
            break
        w *= np.sqrt(P * 0.75 / eq)
    eq, raw = len(rf.points), len(room)
    # calibration must land in (P/2, P]: eq > P would silently rely on
    # downstream truncation; eq <= P/2 measures the wrong bucket
    assert P // 2 < eq <= P, f"calibration failed: eq={eq} not in ({P//2}, {P}]"
    print(f"room: eq {eq}, raw {raw}", flush=True)

    gcfg = GrowConfig(num_inlier=512, num_neighbor=512, max_steps=500,
                      pallas_sampling=False, track_accuracy=False)
    run = lambda: segment_rooms_fused(params, mcfg, [rf], gcfg,
                                      min_bucket_size=P, max_instances=1024)
    run()                                            # compile
    t_grow = float("inf")
    for _ in range(3):
        t0 = time.time()
        res = run()
        t_grow = min(t_grow, time.time() - t0)
    m, _ = room_metrics(rf.obj_id, res[0].cluster_label)
    n_inst = len(set(rf.obj_id.tolist()))
    line = ("P=%d fused room eq=%d raw=%d grow=%.2fs pps=%.0f NMI=%.3f "
            "PRC=%.3f clusters=%d/%d" % (
                P, eq, raw, t_grow, raw / t_grow, m.nmi, m.prc,
                res[0].num_clusters, n_inst))
    print(line, flush=True)
    # completeness-gated fragment merging (round-5 verdict ask #3): the
    # over-fragmentation at cap scale happens on the two ~176k-point
    # floor/ceiling planes; score adjacent-cluster unions with the
    # flagship's completeness head and merge where the union wins
    merge_line = None
    if "complete_head" in params:
        from learn_region_grow_tpu.engine.merge import merge_fragments
        t0 = time.time()
        cl, rep = merge_fragments(params, mcfg, rf,
                                  res[0].cluster_label)
        t_merge = time.time() - t0
        mm, _ = room_metrics(rf.obj_id, cl)
        merge_line = ("P=%d fused+merge room eq=%d raw=%d merge=%.2fs "
                      "NMI=%.3f PRC=%.3f clusters=%d/%d "
                      "(%d merges, %d pairs scored)" % (
                          P, eq, raw, t_merge, mm.nmi, mm.prc,
                          len(set(cl.tolist()) - {0}), n_inst,
                          rep["merges"], rep["pairs_scored"]))
        print(merge_line, flush=True)
    trained_on = (meta or {}).get("trained_on", "?")
    out = [
        "# fused kernel at the 524,288-point cap (v5e single chip, "
        "compilation-cached, min-of-3)",
        "# room: calibrated furnished synthetic, RandomState(77) draw; "
        "committed checkpoint:",
        "#   %s" % trained_on,
        line,
    ] + ([merge_line] if merge_line else []) + [
        "# Round-2 capture of the same room/protocol (checkpoint trained "
        "only to 317k): NMI 0.693 PRC 0.568.",
        "# The room is ~90% two 176k-point floor/ceiling planes — beyond "
        "any real S3DIS/ScanNet room",
        "# (they top out near 200k equalized points); "
        "results/scale_curve.txt covers the real-scene regime.",
    ]
    with open(os.path.join(RESULTS, "fused_cap.txt"), "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote results/fused_cap.txt", flush=True)


if __name__ == "__main__":
    main()
