"""Scale-quality ceiling ablation (round-2 verdict ask #4).

The scale curve's NMI sags at the top buckets (0.83 @ 262k, 0.69 @ 395k
in round 2) while mid-scale holds 0.95+. This ablation separates the
FIXTURE+MECHANICS ceiling from the model/training gap: it grows every GT
instance with a PERFECT classifier under the reference's exact growth
mechanics — curvature-ordered seeds over unvisited points, ±1-voxel bbox
neighborhood expansion, visited blocking, cluster_threshold, nearest-label
fill — i.e. the best any LrgNet could do inside those mechanics on this
fixture. What it surfaces:

* voxel-equalization collisions (points of different instances sharing a
  voxel keep only the first),
* bbox reachability (an instance disconnected in ±1-voxel steps from its
  seed fragments),
* curvature seed order + sub-threshold fragments,
* the unlabeled nearest-label fill.

Record: ``results/scale_ceiling.txt`` — per bucket, the oracle NMI next to
the engine NMI from ``results/scale_curve.txt``. If the ceiling stays
~1.0, the sag is a model/training gap (attack with the training mix); if
the ceiling itself drops, that part of the sag is the fixture.

CPU-only (no TPU needed). Usage: python val_run/run_scale_ceiling.py [quick]
"""
import os
import sys
import time

import numpy as np

BASE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(os.path.dirname(BASE), "results")
os.makedirs(RESULTS, exist_ok=True)
sys.path.insert(0, os.path.dirname(BASE))

from learn_region_grow_tpu.core import prepare_room  # noqa: E402
from learn_region_grow_tpu.data.synthetic import generate_furnished_room  # noqa: E402
from learn_region_grow_tpu.engine.grow import fill_unlabeled  # noqa: E402
from learn_region_grow_tpu.eval.metrics import room_metrics  # noqa: E402
from val_run.run_scale import make_room_for_bucket  # noqa: E402


def oracle_segment(rf, cluster_threshold: int = 10):
    """Grow every GT instance with a perfect add classifier under the
    reference mechanics (``test_region_grow.py:183-306`` with add = exact
    GT membership, no removes, no sampling cap)."""
    vox = rf.voxels
    obj = rf.obj_id
    n = len(vox)
    visited = np.zeros(n, bool)
    labels = np.zeros(n, int)
    order = np.argsort(rf.curvatures, kind="stable")
    cid = 1
    for seed in order:
        if visited[seed]:
            continue
        gt = obj == obj[seed]
        cur = np.zeros(n, bool)
        cur[seed] = True
        mn = vox[seed].copy()
        mx = vox[seed].copy()
        while True:
            nb = (~cur & ~visited & gt
                  & (vox >= mn - 1).all(axis=1)
                  & (vox <= mx + 1).all(axis=1))
            if not nb.any():
                break
            cur |= nb
            cv = vox[cur]
            mn = cv.min(axis=0)
            mx = cv.max(axis=0)
        visited |= cur
        if int(cur.sum()) > cluster_threshold:
            labels[cur] = cid
            cid += 1
    return fill_unlabeled(rf.points, labels)


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    configs = [16384, 65536] if quick else [65536, 131072, 262144, 524288]
    rng = np.random.RandomState(100)
    lines = ["# mechanics ceiling: perfect-classifier growth under the "
             "reference's exact mechanics (see run_scale_ceiling.py)"]
    for target_p in configs:
        room, rf, t_prep = make_room_for_bucket(target_p, rng)
        t0 = time.time()
        lbl = oracle_segment(rf)
        t_oracle = time.time() - t0
        m, _ = room_metrics(rf.obj_id, lbl)
        n_inst_gt = len(np.unique(rf.obj_id))
        n_clusters = len(np.unique(lbl[lbl > 0]))
        line = ("P=%6d eq=%7d gt_inst=%3d oracle_clusters=%3d "
                "ceiling NMI=%.3f AMI=%.3f PRC=%.3f RCL=%.3f IOU=%.3f "
                "(oracle %.1fs prep %.1fs)" % (
                    target_p, len(rf.points), n_inst_gt, n_clusters,
                    m.nmi, m.ami, m.prc, m.rcl, m.iou, t_oracle, t_prep))
        print(line, flush=True)
        lines.append(line)
    with open(os.path.join(RESULTS, "scale_ceiling.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", os.path.join(RESULTS, "scale_ceiling.txt"))


if __name__ == "__main__":
    main()


# imported for the bucket-calibrated room generator; silence linters
_ = generate_furnished_room, prepare_room
