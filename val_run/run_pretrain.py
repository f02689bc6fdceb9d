"""Producer of the committed flagship checkpoint
(``models/synthetic_pretrained.npz``).

Round-2 change: MIXED-SCALE training data. The previous checkpoint was
trained only on scale-0.6 rooms; at real-scene scale (100-200k equalized
points, ``results/scale_curve.txt``) its inlier coordinates are far out of
the training distribution and large planar instances fragment (262k bucket:
NMI 0.68, PRC 0.21, 85 clusters for 26 instances — max_steps was ruled out:
500 vs 2000 give identical results). The reference trains on real S3DIS
areas whose rooms span the full size range (``train_region_grow.py`` over
areas 1-6), so scale diversity is implicit upstream; this script makes it
explicit for the synthetic pipeline:

* areas 1-3: the committed scale-0.6 box-room shards
  (``val_run/data_big/multiseed``, unchanged — regenerable with
  cli/stage_data on s3dis_area{1,2,3}.h5),
* area 4: LARGE furnished rooms (equalized 40k-110k points, the
  scale-curve regime) staged by the DEVICE simulator
  (``data/device_simulator.py``) — host staging of 100k-point rooms is
  minutes/room on this 1-core box, the device path is ~12s/room.

Area-4 staged shards are ~500 MB total and regenerable, so they are NOT
committed (see .gitignore); this script recreates them on demand.

Training rooms use RandomState(300) draws — disjoint from the scale-curve
eval rooms (RandomState(100), ``run_scale.py``) and the bench eval rooms
(``generate_rooms(seed=42)``, bench.py).

Usage: python val_run/run_pretrain.py [data|train|all]
"""
import json
import os
import sys
import time

import numpy as np

BASE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(BASE, "data_big")
REPO = os.path.dirname(BASE)
sys.path.insert(0, REPO)

from learn_region_grow_tpu.engine.grow import enable_compilation_cache
enable_compilation_cache()

from learn_region_grow_tpu.core import prepare_room
from learn_region_grow_tpu.data.synthetic import generate_furnished_room
from learn_region_grow_tpu.utils.io import save_h5_rooms

STAGE = sys.argv[1] if len(sys.argv) > 1 else "all"
# equalized-point targets for the large-room area (buckets 65536..524288 —
# spans the whole scale-curve regime up to the fused kernel's cap)
AREA4_TARGETS = (40960, 57344, 81920, 110592, 143360, 188416,
                 253952, 317440)
# round 3: the scale curve's top bucket (NMI 0.83 @ 262k, 0.69 @ 395k in
# round 2) sits ABOVE the round-2 training mix; the mechanics ceiling is
# 1.0 there (results/scale_ceiling.txt), so the sag is a training gap —
# close it with near-cap rooms in their own area (area 4's staged shards
# stay valid)
AREA6_TARGETS = (360448, 409600)
# round 4: the 524k-cap record (results/fused_cap.txt) sits at 0.845 NMI
# with clusters fragmenting on the two ~176k-point floor/ceiling planes;
# add MORE near-cap rooms (diversity, not just reach — the cap room's
# 395k eq is already inside the area-6 range) right up to the VMEM cap
AREA7_TARGETS = (458752, 499712)
# round 5: the 1M-point HBM-features regime (results/hbm_cap.txt NMI
# 0.747-0.767 at P=1,048,576 vs a 1.000 mechanics ceiling) was never in
# the training mix — the round-4 checkpoint tops out at ~500k-eq rooms.
# Rooms ABOVE the 524k VMEM cap, staged with 2 seeds (they are the
# slowest programs; sample diversity comes from 3 rooms x 8192 samples)
AREA8_TARGETS = (622592, 786432, 950272)


def make_large_room(target_eq: int, rng):
    """Furnished room calibrated so the equalized count lands near
    ``target_eq`` (same ~100 pts/m^2 surface model as run_scale.py)."""
    area = target_eq / 100.0
    h = 4.0
    w = (-4 * h + np.sqrt(16 * h * h + 8 * area)) / 4
    for _ in range(5):
        room = generate_furnished_room(w, w, h, rng)
        rf = prepare_room(room[:, :6], room[:, 6], room[:, 7],
                          resolution=0.1)
        eq = len(rf.points)
        if 0.7 * target_eq < eq <= 1.3 * target_eq:
            return room
        w *= np.sqrt(target_eq / eq)
    raise RuntimeError(f"could not calibrate a room for eq={target_eq}")


def stage_large_area(area: str, targets, rng_seed: int,
                     staging_seeds=(0, 1, 2, 3)):
    from learn_region_grow_tpu.data.device_simulator import stage_rooms_device
    from learn_region_grow_tpu.utils.io import save_staged_h5

    room_path = os.path.join(DATA, f"s3dis_area{area}.h5")
    if not os.path.exists(room_path):
        rng = np.random.RandomState(rng_seed)
        rooms = [make_large_room(t, rng) for t in targets]
        save_h5_rooms(room_path, rooms)
        print(f"generated area{area} rooms:",
              [len(r) for r in rooms], flush=True)
    from learn_region_grow_tpu.utils.io import load_h5_rooms
    rooms, objs, clss = load_h5_rooms(room_path)

    for seed in staging_seeds:
        out = os.path.join(DATA, "multiseed", f"seed{seed}_area{area}.h5")
        if os.path.exists(out):
            continue
        t0 = time.time()
        # batch_rooms=1: a multi-lane 262k-bucket program runs past the
        # tunnel worker's tolerance (~10 min -> worker crash, observed
        # twice); one room per program keeps each execute under ~2 min
        samples = stage_rooms_device(rooms, objs, clss, seed=seed,
                                     samples_cap=8192, instances_cap=256,
                                     batch_rooms=1)
        save_staged_h5(out, samples)
        print(f"staged seed{seed}_area{area}: {samples.num_samples()} "
              f"samples in {time.time() - t0:.0f}s", flush=True)


def stage_area4():
    stage_large_area("4", AREA4_TARGETS, rng_seed=300)


def stage_area6():
    # RandomState(600): disjoint from area-4 (300), scale-curve eval (100)
    # and bench (42) streams
    stage_large_area("6", AREA6_TARGETS, rng_seed=600)


def stage_area7():
    stage_large_area("7", AREA7_TARGETS, rng_seed=700)


def stage_area8():
    stage_large_area("8", AREA8_TARGETS, rng_seed=800,
                     staging_seeds=(0, 1))


def train():
    from learn_region_grow_tpu.train.checkpoint import save_checkpoint
    from learn_region_grow_tpu.train.trainer import TrainConfig, fit

    # round 5: the flagship checkpoint now ALSO carries the completeness
    # head (run_completeness.py validated it held-out r=0.91; folding it
    # into the flagship lets greedy commit-gating / fragment merging use
    # it without a second model)
    cfg = TrainConfig(batch_size=100, max_epoch=24, multiseed=4,
                      completeness_head=True,
                      data_dir=DATA, models_dir=os.path.join(BASE, "models"))
    params, summary = fit(cfg, ["1", "2", "3", "4", "6", "7", "8"])
    out = os.path.join(REPO, "models", "synthetic_pretrained.npz")
    targets = (AREA4_TARGETS + AREA6_TARGETS + AREA7_TARGETS
               + AREA8_TARGETS)
    trained_on = (
        "synthetic mixed-scale: 3x8 box rooms scale=0.6 + %d large "
        "furnished rooms eq %dk-%dk (device-staged), multiseed%d" % (
            len(targets), round(min(targets) / 1024),
            round(max(targets) / 1024), cfg.multiseed))
    save_checkpoint(out, params, config={
        "feature_size": 13, "lite": None,
        "trained_on": trained_on,
        "epochs": cfg.max_epoch,
        "completeness_head": True,
    })
    print("saved", out)
    print(json.dumps(summary))


if __name__ == "__main__":
    if STAGE in ("all", "data"):
        stage_area4()
        stage_area6()
        stage_area7()
        stage_area8()
    if STAGE in ("all", "train"):
        train()
