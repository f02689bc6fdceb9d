"""CLI: train MCPNet metric-learning embedder
(reference ``train_mcpnet.py``; ``--stage-data`` replicates its staging pass)."""

import argparse

from ..train.mcpnet_trainer import (MCPTrainConfig, fit, save_model,
                                    stage_mcp_area)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--area", default="1", help="validation area")
    ap.add_argument("--train-area", default=None,
                    help="comma-separated train areas "
                         "(default: all of 1-6 except --area)")
    ap.add_argument("--stage-data", action="store_true",
                    help="only stage mcp_area H5 files, then exit")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--models-dir", default="models")
    args = ap.parse_args(argv)

    cfg = MCPTrainConfig(batch_size=args.batch_size, max_epoch=args.epochs,
                         data_dir=args.data_dir, models_dir=args.models_dir)
    if args.train_area:
        train_areas = args.train_area.split(",")
    else:
        train_areas = [a for a in "123456" if a != args.area]
    if args.stage_data:
        for area in train_areas + [args.area]:
            stage_mcp_area(args.data_dir, area, cfg)
        return
    params, hist = fit(cfg, train_areas, args.area)
    save_model(cfg, params, args.area)
    return hist


if __name__ == "__main__":
    main()
