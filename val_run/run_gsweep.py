"""Multi-room amortization sweep: grow-only wall time of ONE fused
program holding G copies of the same room, G = 1, 2, 4, 8.

Motivation: the round-3 multi-room kernel merges up to 8 rooms' state
machines per program. Bit-parity is tested; this measures what the merge
actually BUYS — if per-merged-step cost scales ~linearly with G, the
per-pass fixed overhead the merge targets (~2.4 us/pass) is NOT the
dominant term at this scale and the docs must say so.

Protocol: same calibrated furnished room duplicated G times (identical
step counts per copy -> the merged program's iteration count equals the
single room's), min-of-3 grow-only, normalized to seconds per room.

Usage: python val_run/run_gsweep.py [P]   (default P=16384)
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
from learn_region_grow_tpu.models import lrgnet
from learn_region_grow_tpu.train.checkpoint import load_checkpoint

P = int(sys.argv[1]) if len(sys.argv) > 1 else 16384


def main():
    params, _, _ = load_checkpoint(
        os.path.join(os.path.dirname(BASE), "models",
                     "synthetic_pretrained.npz"))
    mcfg = lrgnet.LrgNetConfig(feature_size=13)
    rng = np.random.RandomState(42)
    area = P * 0.75 / 100.0
    h = 3.0
    w = (-4 * h + np.sqrt(16 * h * h + 8 * area)) / 4
    rf = None
    for _ in range(5):
        room = generate_furnished_room(w, w, h, rng)
        rf = prepare_room(room[:, :6], room[:, 6], room[:, 7],
                          resolution=0.1)
        eq = len(rf.points)
        if P // 2 < eq <= P:
            break
        w *= np.sqrt(P * 0.75 / eq)
    eq = len(rf.points)
    # calibration must land in (P/2, P] (see ADVICE r3): eq > P would rely
    # on downstream truncation, eq <= P/2 measures the wrong bucket
    assert P // 2 < eq <= P, f"calibration failed: eq={eq} not in ({P//2}, {P}]"
    print(f"room: eq {eq} (bucket P={P})", flush=True)

    gcfg = GrowConfig(num_inlier=512, num_neighbor=512, max_steps=500,
                      pallas_sampling=False, track_accuracy=False)
    lines = [
        "# multi-room amortization sweep: one fused program, G copies of"
        " the same room",
        "# (min-of-3 grow-only, v5e; s/room = wall / G; amort = "
        "(G=1 s/room) / s/room)",
        f"# room eq={eq}, bucket P={P}, checkpoint="
        "models/synthetic_pretrained.npz",
    ]
    from learn_region_grow_tpu.ops.fused_grow import rooms_per_program_budget
    gb_max = rooms_per_program_budget(P, 13)
    gb_hbm = rooms_per_program_budget(P, 13, hbm_features=True)
    lines.append(f"# single-program VMEM budget caps rooms/program at "
                 f"{gb_max} for this P (hbm-features packing: {gb_hbm}); "
                 f"larger G would split into several "
                 f"programs (no further amortization to measure)")
    base = None
    # 1/2/4/8 plus each packing's own budget cap, so the hbm packing's
    # actual max rooms/program (the auto-pick's win condition) is measured
    for g in sorted({1, 2, 4, 8, gb_max, gb_hbm}):
        for tag, hbm in (("vmem", False), ("hbm ", True)):
            if g > (gb_hbm if hbm else gb_max):
                continue
            if hbm and g <= gb_max and g < 4:
                # the DMA variant only pays off where it raises
                # rooms/program; small G under the VMEM budget was
                # measured 0.90-1.10x (results/hbm_cap.txt parity row)
                continue
            feats = [rf] * g
            run = lambda: segment_rooms_fused(params, mcfg, feats, gcfg,
                                              min_bucket_size=P,
                                              max_instances=512,
                                              hbm_features=hbm)
            res = run()                              # compile
            steps = sum(i["steps"] for i in res[0].instances)
            t = float("inf")
            for _ in range(3):
                t0 = time.time()
                run()
                t = min(t, time.time() - t0)
            per_room = t / g
            if base is None:
                base = per_room
            line = ("G=%d %s wall=%6.3fs s/room=%6.3f amort=%4.2fx "
                    "steps/room=%d" % (g, tag, t, per_room,
                                       base / per_room, steps))
            print(line, flush=True)
            lines.append(line)
    # append: the record accumulates one section per bucket size P
    with open(os.path.join(RESULTS, "multiroom_sweep.txt"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to results/multiroom_sweep.txt", flush=True)


if __name__ == "__main__":
    main()
