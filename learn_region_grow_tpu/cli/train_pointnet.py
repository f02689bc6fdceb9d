"""CLI: train PointNet / PointNet++ semantic segmentation baselines.

Mirrors ``python train_pointnet.py --mode pointnet2 --train-area ...``
(reference ``train_pointnet.py:293-313``).
"""

import argparse

from ..utils.class_util import (CLASSES_KITTI, CLASSES_NYU40, CLASSES_S3DIS)
from ..train.pointnet_trainer import (PointNetTrainConfig, fit, save_model)


def num_classes_for(train_area: str) -> int:
    if "kitti" in train_area:
        return len(CLASSES_KITTI)
    if "scannet" in train_area:
        return len(CLASSES_NYU40)
    return len(CLASSES_S3DIS)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", default="pointnet",
                    choices=["pointnet", "pointnet2"])
    ap.add_argument("--train-area", default="1,2,3,4,6")
    ap.add_argument("--val-area", default="5")
    ap.add_argument("--cross-domain", action="store_true")
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--num-point", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--models-dir", default="models")
    args = ap.parse_args(argv)

    train_areas = args.train_area.split(",")
    val_areas = args.val_area.split(",") if args.val_area else None
    cfg = PointNetTrainConfig(
        mode=args.mode, batch_size=args.batch_size,
        num_point=args.num_point, max_epoch=args.epochs,
        num_class=num_classes_for(train_areas[0]),
        data_dir=args.data_dir, models_dir=args.models_dir,
        cross_domain=args.cross_domain)
    print("train", train_areas, "val", val_areas, "classes", cfg.num_class)
    params, bn, hist = fit(cfg, train_areas, val_areas)
    save_model(cfg, params, bn,
               val_areas[0] if val_areas else train_areas[0],
               train_area=train_areas[0])
    return hist


if __name__ == "__main__":
    main()
