"""Benchmark: batched region-growing inference throughput (points/sec).

Measures the flagship pipeline — room feature prep + batched device-side
region growing with the 512/512 LrgNet — on synthetic rooms (S3DIS-statistics
box rooms; the only dataset shippable in-repo). Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "points/sec", "vs_baseline": N, ...}

``vs_baseline`` is measured against the REFERENCE PROTOCOL (sequential
seeds, batch-1 forward per grow step, host voxel-set bookkeeping — a
faithful reimplementation of ``test_region_grow.py:183-316`` in
``engine/reference_loop.py``) run on the same eval set and the same chip.
Run ``python bench.py --reference-protocol`` once per machine to record that
measurement to ``results/reference_protocol.json``; until it exists the
baseline falls back to a documented 2,000 pts/s estimate of the RTX-3070 TF2
pipeline and the JSON is flagged ``"baseline_estimated": true``.

Modes:
    (default)              headline: the fused whole-room Pallas kernel —
                           EXACT reference semantics (sequential seeds,
                           exact sampling, exact median), zero host
                           round-trips; falls back to the wave engine off-TPU
    --wave                 the batched-lane XLA engine with the relaxed
                           speedups (pallas sampling, K parallel seeds +
                           adaptive tail) — round-1's headline path
    --exact                exact semantics via the fused kernel (same as
                           default on TPU; XLA K=1 exact path elsewhere)
    --reference-protocol   measure the baseline itself (slow, host-loop)
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_POINTS_PER_SEC_ESTIMATE = 2000.0
REPO_DIR = os.path.dirname(os.path.abspath(__file__))
BASELINE_RECORD = os.path.join(REPO_DIR, "results",
                               "reference_protocol.json")


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def load_baseline():
    """(points_per_sec, estimated?) — measured record if available."""
    if os.path.exists(BASELINE_RECORD):
        with open(BASELINE_RECORD) as f:
            rec = json.load(f)
        return float(rec["points_per_sec"]), False
    return REFERENCE_POINTS_PER_SEC_ESTIMATE, True


def get_params_and_rooms():
    import jax

    from learn_region_grow_tpu.core import prepare_room
    from learn_region_grow_tpu.data.synthetic import generate_rooms
    from learn_region_grow_tpu.train.checkpoint import load_checkpoint

    ckpt = os.path.join(REPO_DIR, "models", "synthetic_pretrained.npz")
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

    eval_rooms = generate_rooms(12, seed=42, scale=0.6)
    raw_points = sum(len(r) for r in eval_rooms)
    log(f"{len(eval_rooms)} eval rooms, {raw_points} raw points")

    t0 = time.time()
    feats = [prepare_room(r[:, :6], r[:, 6], r[:, 7], resolution=0.1)
             for r in eval_rooms]
    t_feature = time.time() - t0
    eq_points = sum(len(f.points) for f in feats)
    log(f"feature prep {t_feature:.2f}s ({eq_points} equalized points)")
    return params, eval_rooms, feats, raw_points, t_feature


def mean_nmi(feats, results):
    from learn_region_grow_tpu.eval.metrics import room_metrics
    nmis = []
    for rf, res in zip(feats, results):
        m, _ = room_metrics(rf.obj_id, res.cluster_label)
        nmis.append(m.nmi)
    return float(np.mean(nmis))


def log_mfu(results, t_grow, k=512, p=16384, peak_tflops=98.0):
    """Estimated model-FLOP utilisation of the grow phase. Region growth
    is sequential WITHIN a room, so the loop is latency-bound by design;
    the round-3 multi-room kernel amortizes that latency over up to 8
    rooms per program (the step count here is the per-room total — the
    same model FLOPs now land in ~1/8 the wall time). UPPER BOUND: the
    gather/scatter matmuls are bbox-chunk-windowed, so the per-iteration
    gather FLOPs assumed here are the worst (whole-room) case; t_grow is
    the grow-only min-of-5 (prep excluded)."""
    steps = sum(i["steps"] for r in results for i in r.instances)
    # per-iteration: 2 one-hot gather matmuls (2*16*P*k each) + the
    # dual-branch forward + split heads (~271 MFLOP at k=512)
    gather = 2 * 2 * 16 * p * k
    forward = 2 * k * (82752 + 49408) * 2 + 2 * 2 * 1024 * 256
    fl = steps * (gather + forward)
    tflops = fl / max(t_grow, 1e-9) / 1e12
    log("grow iterations %d, est %.2f GFLOP/iter, %.2f TFLOP/s "
        "(~%.1f%% MFU f32; latency-bound by sequential growth)" % (
            steps, (gather + forward) / 1e9, tflops,
            100.0 * tflops / peak_tflops))


def main():
    import jax

    from learn_region_grow_tpu.engine.grow import enable_compilation_cache
    enable_compilation_cache()

    from learn_region_grow_tpu.engine.grow import GrowConfig, segment_rooms
    from learn_region_grow_tpu.models import lrgnet

    mode = "fused"
    if "--reference-protocol" in sys.argv:
        mode = "reference"
    elif "--exact" in sys.argv:
        mode = "exact"
    elif "--wave" in sys.argv:
        mode = "wave"

    log("devices:", jax.devices())
    params, eval_rooms, feats, raw_points, t_feature = get_params_and_rooms()
    mcfg = lrgnet.LrgNetConfig(feature_size=13)

    if mode == "reference":
        from learn_region_grow_tpu.engine.reference_loop import (
            run_reference_protocol)
        gcfg = GrowConfig(num_inlier=512, num_neighbor=512, max_steps=500)
        t0 = time.time()
        results, timing = run_reference_protocol(params, mcfg, feats, gcfg)
        t_grow = time.time() - t0
        pps = raw_points / (t_feature + t_grow)
        log(f"grow {t_grow:.2f}s; phases: " + " ".join(
            f"{k}={v:.1f}s" for k, v in timing.items()))
        log("mean NMI %.3f" % mean_nmi(feats, results))
        rec = {
            "points_per_sec": round(pps, 1),
            "raw_points": raw_points,
            "feature_secs": round(t_feature, 2),
            "grow_secs": round(t_grow, 2),
            "phases": {k: round(v, 2) for k, v in timing.items()},
            "backend": jax.default_backend(),
        }
        os.makedirs(os.path.dirname(BASELINE_RECORD), exist_ok=True)
        with open(BASELINE_RECORD, "w") as f:
            json.dump(rec, f, indent=1)
        log(f"recorded measured baseline -> {BASELINE_RECORD}")
        print(json.dumps({
            "metric": "reference_protocol_points_per_sec",
            "value": round(pps, 1), "unit": "points/sec",
            "vs_baseline": 1.0,
        }))
        return

    baseline_pps, estimated = load_baseline()

    if mode in ("fused", "exact"):
        # EXACT reference semantics (sequential seeds, exact
        # without-replacement sampling, exact full-cloud median) via the
        # fused MULTI-ROOM Pallas kernel on TPU — the entire seed loop runs
        # on-chip with zero host round-trips, up to 8 rooms growing
        # concurrently per program (ops/fused_grow.py), and host feature
        # prep of later room groups overlaps device growth of earlier ones
        # (FusedSegmenter async submit). Off-TPU the XLA K=1 exact lane
        # engine runs instead.
        from learn_region_grow_tpu.core import prepare_room
        from learn_region_grow_tpu.engine.grow import FusedSegmenter
        gcfg = GrowConfig(num_inlier=512, num_neighbor=512, max_steps=500,
                          pallas_sampling=False, track_accuracy=False)
        use_fused = jax.default_backend() == "tpu"

        def run_pipeline():
            """Full pipeline: per-room host prep + async fused growth;
            returns (results, end-to-end seconds). Prep of group i+1 runs
            while group i's program grows on the chip."""
            t0 = time.time()
            # min_bucket 4096: the eval rooms span 0.8k-18k equalized
            # points; 16384 buckets padded 2.5x, and padded points are
            # what crosses the ~27 MB/s tunnel (round-2 bucketing kept one
            # bucket per compile; the compile cache makes the 4 finer
            # buckets free after first touch)
            seg = FusedSegmenter(params, mcfg, gcfg,
                                 min_bucket_size=4096, max_instances=512)
            group = {}
            gsize = None
            for i, r in enumerate(eval_rooms):
                rf = prepare_room(r[:, :6], r[:, 6], r[:, 7],
                                  resolution=0.1)
                group[i] = rf
                if gsize is None:
                    gsize = seg.preferred_group(len(rf.points))
                if len(group) >= gsize:
                    seg.submit(group)   # async: grows while we prep more
                    group = {}
            if group:
                seg.submit(group)
            res = seg.collect()
            results = [res[i] for i in range(len(eval_rooms))]
            return results, time.time() - t0

        def run_exact():
            if use_fused:
                return run_pipeline()
            t0 = time.time()
            results = segment_rooms(params, mcfg, feats, gcfg,
                                    min_bucket_size=16384)
            return results, time.time() - t0 + t_feature

        run_exact()  # warmup/compile
        # min-of-5: the tunneled chip's run-to-run variance reaches 2x;
        # min approximates the contention-free time (each run ~1-2 s, so
        # the extra repeats cost seconds and buy a stabler recorded
        # headline). Every timed run includes the FULL pipeline — host
        # feature prep AND growth (stricter than round 2, where prep was
        # timed once outside the min).
        # NOTE the reference-protocol baseline it is ratioed against is a
        # SINGLE run (a min-of-5 of the ~190 s host loop is impractical),
        # so vs_baseline's upper end pairs a quiet-chip minimum with a
        # possibly-contended baseline — treat the low end of observed
        # captures as the like-for-like figure (BASELINE.md framing).
        t_pipe = float("inf")
        for _ in range(5):
            results, dt = run_exact()
            t_pipe = min(t_pipe, dt)
        log(f"pipeline (prep+grow) {t_pipe:.2f}s (fused={use_fused})")
        log("mean NMI %.3f" % mean_nmi(feats, results))
        if use_fused:
            # grow-only min-of-5 on pre-prepped features: the round-2
            # protocol comparator (its headline timed growth beside a
            # one-shot prep), and the honest denominator for grow MFU
            from learn_region_grow_tpu.engine.grow import (
                segment_rooms_fused)

            def run_grow_only():
                return segment_rooms_fused(params, mcfg, feats, gcfg,
                                           min_bucket_size=4096,
                                           max_instances=512)

            run_grow_only()  # warmup: absorb dispatch/compile overhead
            t_grow, grow_results = float("inf"), None
            for _ in range(5):
                t0 = time.time()
                r = run_grow_only()
                dt = time.time() - t0
                if dt < t_grow:
                    t_grow, grow_results = dt, r
            log(f"grow-only {t_grow:.2f}s min-of-5, multi-room kernel "
                "(round-2 protocol differed: one room at a time at "
                "min_bucket 16384, 0.66s)")
            # MFU step counts come from the SAME timed grow-only runs
            # (per-room trajectories are deterministic, but pairing them
            # keeps the accounting self-contained)
            log_mfu(grow_results, t_grow)

            # relaxed grow-only: W=4 parallel seeds per wave (each wave
            # grows the 4 lowest-curvature-rank seeds >= 12 voxels apart
            # concurrently, seed-priority commit) — the documented
            # relaxation of the reference's strictly sequential seed order
            # (SURVEY.md §7 hard-part #1), quality-guarded by the NMI
            # printed beside it
            def run_grow_relaxed():
                return segment_rooms_fused(params, mcfg, feats, gcfg,
                                           min_bucket_size=4096,
                                           max_instances=512,
                                           num_parallel_seeds=4)

            run_grow_relaxed()  # warmup
            t_rel, rel_results = float("inf"), None
            for _ in range(5):
                t0 = time.time()
                r = run_grow_relaxed()
                dt = time.time() - t0
                if dt < t_rel:
                    t_rel, rel_results = dt, r
            log(f"grow-only RELAXED (W=4 parallel seeds) {t_rel:.2f}s "
                "min-of-5, mean NMI %.3f" % mean_nmi(feats, rel_results))
            log_mfu(rel_results, t_rel)
        pps = raw_points / t_pipe
        metric = ("region_growing_inference_points_per_sec"
                  if mode == "fused"
                  else "region_growing_exact_semantics_points_per_sec")
        print(json.dumps({
            "metric": metric,
            "value": round(pps, 1),
            "unit": "points/sec",
            "vs_baseline": round(pps / baseline_pps, 2),
            "baseline_points_per_sec": baseline_pps,
            "baseline_estimated": estimated,
            "exact_semantics": True,
        }))
        return

    # --wave: batched lanes + stratified Pallas sampling + 4 parallel seeds
    # + adaptive fragment tail (round-1 headline; relaxed semantics,
    # quality-validated on the synthetic record)
    gcfg = GrowConfig(num_inlier=512, num_neighbor=512, max_steps=200,
                      pallas_sampling=True, track_accuracy=False)
    kw = dict(min_bucket_size=16384, num_parallel_seeds=4, tail_seeds=16)

    segment_rooms(params, mcfg, feats, gcfg, **kw)  # warmup/compile
    t_grow = float("inf")
    for _ in range(3):
        t0 = time.time()
        results = segment_rooms(params, mcfg, feats, gcfg, **kw)
        t_grow = min(t_grow, time.time() - t0)
    log(f"grow {t_grow:.2f}s")
    log("mean NMI %.3f" % mean_nmi(feats, results))

    pps = raw_points / (t_feature + t_grow)
    print(json.dumps({
        "metric": "region_growing_wave_points_per_sec",
        "value": round(pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(pps / baseline_pps, 2),
        "baseline_points_per_sec": baseline_pps,
        "baseline_estimated": estimated,
        "exact_semantics": False,
    }))


if __name__ == "__main__":
    main()
