"""Benchmark: batched region-growing inference throughput (points/sec).

Measures the flagship pipeline — room feature prep + batched device-side
region growing with the 512/512 LrgNet — on synthetic rooms (S3DIS-statistics
box rooms; the only dataset shippable in-repo). Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "points/sec", "vs_baseline": N}

``vs_baseline`` is measured against an estimated reference throughput of
2,000 raw points/sec: the reference (``test_region_grow.py``) runs one
batch-1 sess.run per region-step plus O(N) host Python per step; its own
timing instrumentation attributes most time to host phases. No throughput
number is published (BASELINE.md §Throughput), so this constant is an
explicit, documented estimate of the RTX-3070 TF2 pipeline, not a
measurement. The BASELINE.json target is >=10x.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_POINTS_PER_SEC_ESTIMATE = 2000.0


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax

    from learn_region_grow_tpu.engine.grow import enable_compilation_cache
    enable_compilation_cache()

    from learn_region_grow_tpu.core import prepare_room
    from learn_region_grow_tpu.data.synthetic import generate_rooms
    from learn_region_grow_tpu.engine.grow import GrowConfig, segment_rooms
    from learn_region_grow_tpu.eval.metrics import room_metrics
    from learn_region_grow_tpu.models import lrgnet
    from learn_region_grow_tpu.train.checkpoint import load_checkpoint

    log("devices:", jax.devices())

    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "models", "synthetic_pretrained.npz")
    if os.path.exists(ckpt):
        params, _, _ = load_checkpoint(ckpt)
        log("loaded", ckpt)
    else:
        log("no checkpoint; quick-training on synthetic")
        from learn_region_grow_tpu.data.simulator import stage_rooms
        from learn_region_grow_tpu.train.trainer import (SampleSet,
                                                         TrainConfig,
                                                         make_train_step)
        rooms = generate_rooms(3, seed=0, scale=0.5)
        staged = stage_rooms([r[:, :6] for r in rooms],
                             [r[:, 6] for r in rooms],
                             [r[:, 7] for r in rooms], seed=0)
        ss = SampleSet(*staged.split())
        init_fn, step, _ = make_train_step(TrainConfig(batch_size=32,
                                                       multiseed=0))
        params, opt = init_fn(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        for _ in range(400):
            idx = rng.choice(len(ss), 32, replace=len(ss) < 32)
            params, opt, _m = step(params, opt, ss.batch(idx, 512, 512, rng))

    mcfg = lrgnet.LrgNetConfig(feature_size=13)
    # pallas_sampling: stratified rank-matching kernel + sampled-subset
    # median (quality-validated: NMI 0.953 vs 0.957 exact on this workload)
    gcfg = GrowConfig(num_inlier=512, num_neighbor=512, max_steps=200,
                      pallas_sampling=True, track_accuracy=False)

    eval_rooms = generate_rooms(12, seed=42, scale=0.6)
    raw_points = sum(len(r) for r in eval_rooms)
    log(f"{len(eval_rooms)} eval rooms, {raw_points} raw points")

    t0 = time.time()
    feats = [prepare_room(r[:, :6], r[:, 6], r[:, 7], resolution=0.1)
             for r in eval_rooms]
    t_feature = time.time() - t0
    eq_points = sum(len(f.points) for f in feats)
    log(f"feature prep {t_feature:.2f}s ({eq_points} equalized points)")

    # warmup (compile) then measured run; single bucket => one compile.
    # 4 parallel seeds per room + adaptive fragment tail: validated at
    # equal NMI vs K=1 exact mode on the synthetic validation set.
    kw = dict(min_bucket_size=16384, num_parallel_seeds=4, tail_seeds=16)
    segment_rooms(params, mcfg, feats, gcfg, **kw)
    t0 = time.time()
    results = segment_rooms(params, mcfg, feats, gcfg, **kw)
    t_grow = time.time() - t0
    log(f"grow {t_grow:.2f}s")

    nmis = []
    for rf, res in zip(feats, results):
        m, _ = room_metrics(rf.obj_id, res.cluster_label)
        nmis.append(m.nmi)
    log("mean NMI %.3f" % np.mean(nmis))

    total_time = t_feature + t_grow
    pps = raw_points / total_time
    print(json.dumps({
        "metric": "region_growing_inference_points_per_sec",
        "value": round(pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(pps / REFERENCE_POINTS_PER_SEC_ESTIMATE, 2),
    }))


if __name__ == "__main__":
    main()
