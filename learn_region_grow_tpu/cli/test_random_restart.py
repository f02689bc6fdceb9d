"""CLI: random-restart region-growing inference
(reference ``test_random_restart.py``; restarts run as parallel device lanes
instead of serial re-runs; ``--scoring ml|np|cp``)."""

import argparse

from . import test_region_grow as trg_cli
from ..core.features import prepare_room
from ..engine.grow import GrowConfig, segment_rooms
from ..eval.metrics import aggregate_line, room_metrics
from ..models import lrgnet
from ..train.checkpoint import load_checkpoint, lrgnet_model_path
from ..utils.io import load_h5_rooms


def main(argv=None):
    from ..engine.grow import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--area", default="5")
    ap.add_argument("--scoring", default="np",
                choices=["np", "ml", "cp"],
                help="attempt ranking: np = mask point count, ml = cumulative decision log-prob, cp = completeness-head prediction (needs --fused and a complete_head checkpoint)")
    ap.add_argument("--num-restarts", type=int, default=10)
    ap.add_argument("--resolution", type=float, default=0.1)
    ap.add_argument("--feature-size", type=int, default=13)
    ap.add_argument("--num-inlier", type=int, default=512)
    ap.add_argument("--num-neighbor", type=int, default=512)
    ap.add_argument("--cluster-threshold", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fast", action="store_true",
                    help="Pallas stratified sampling + sampled-subset median "
                         "(validated ~equal NMI, ~1.4x faster; TPU only)")
    ap.add_argument("--fused", action="store_true",
                    help="fused multi-room Pallas kernel: all restart "
                         "attempts grow as concurrent on-chip lanes "
                         "(fused-engine speed; TPU)")
    ap.add_argument("--no-warmup", dest="warmup", action="store_false",
                    help="skip the untimed warmup run (timing will include "
                         "cold compiles)")
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--models-dir", default="models")
    ap.add_argument("--model", default=None)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    agg = []
    for area in args.area.split(","):
        model_path = args.model or lrgnet_model_path(
            args.models_dir, area, args.feature_size, args.num_inlier,
            args.num_neighbor)
        params, _, _ = load_checkpoint(model_path)
        print(f"Restored from {model_path}")
        mcfg = lrgnet.LrgNetConfig(feature_size=args.feature_size)
        rooms, obj_ids, cls_ids = load_h5_rooms(
            trg_cli.area_rooms_path(args.data_dir, area))
        keep = trg_cli.load_sampled_filter(args.data_dir, area)
        feats, kept = [], []
        for rid in range(len(rooms)):
            if not keep(rid):
                continue
            feats.append(prepare_room(rooms[rid], obj_ids[rid], cls_ids[rid],
                                      resolution=args.resolution,
                                      feature_size=args.feature_size))
            kept.append(rid)
        gcfg = GrowConfig(num_inlier=args.num_inlier,
                          num_neighbor=args.num_neighbor,
                          feature_size=args.feature_size,
                          resolution=args.resolution,
                          cluster_threshold=args.cluster_threshold,
                          seed=args.seed)
        import time

        def run_grow(verbose):
            if args.fused:
                from ..engine.grow import segment_rooms_fused
                return segment_rooms_fused(
                    params, mcfg, feats, gcfg,
                    num_restarts=args.num_restarts, scoring=args.scoring,
                    verbose=verbose)
            return segment_rooms(params, mcfg, feats, gcfg,
                                 num_restarts=args.num_restarts,
                                 scoring=args.scoring, verbose=verbose)

        t_cold = 0.0
        if args.warmup:
            t_cold = time.time()
            run_grow(args.verbose)
            t_cold = time.time() - t_cold
        t_grow = time.time()
        results = run_grow(args.verbose and not args.warmup)
        t_grow = time.time() - t_grow
        if args.warmup:
            print("grow cold (compile+run) %.2fs, warm %.2fs"
                  % (t_cold, t_grow))
        for i, rid in enumerate(kept):
            m, _ = room_metrics(feats[i].obj_id, results[i].cluster_label)
            agg.append(m)
            print("Area %s room %d NMI: %.2f AMI: %.2f ARS: %.2f PRC: %.2f "
                  "RCL: %.2f IOU: %.2f" % (area, rid, m.nmi, m.ami, m.ars,
                                           m.prc, m.rcl, m.iou))
    print(aggregate_line(agg))
    return agg


if __name__ == "__main__":
    main()
