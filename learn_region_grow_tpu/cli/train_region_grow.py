"""CLI: train LrgNet on staged data.

Mirrors ``python train_region_grow.py --train-area 1,2,3,4,6 --val-area 5``
(reference ``train_region_grow.py:20-30``) with TPU-native extensions
(--tp, --dtype, --batch-size, --epochs).
"""

import argparse

from ..parallel.mesh import make_mesh
from ..train.trainer import TrainConfig, fit, save_model


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train-area", default="1,2,3,4,6")
    ap.add_argument("--val-area", default=None)
    ap.add_argument("--cross-domain", action="store_true")
    ap.add_argument("--multiseed", type=int, default=8)
    ap.add_argument("--lite", type=int, default=None)
    ap.add_argument("--feature-size", type=int, default=13)
    ap.add_argument("--num-inlier", type=int, default=512)
    ap.add_argument("--num-neighbor", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--models-dir", default="models")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    ap.add_argument("--completeness-head", action="store_true",
                    help="train the optional completeness (IoU) regression "
                         "head (evidence of the published model's head: "
                         "experimental/train_region_grow_rnn.py:143)")
    ap.add_argument("--no-mesh", action="store_true",
                    help="single-device jit without mesh sharding")
    ap.add_argument("--emb", action="store_true",
                    help="train on embedding-conditioned 19-d staged data "
                         "(cli/stage_embedding_data.py output; sets "
                         "feature size 19, checkpoint lrgnet_emb_model*)")
    args = ap.parse_args(argv)
    if args.emb:
        from ..data.embedding_staging import EMBEDDING_FEATURE_SIZE
        args.feature_size = EMBEDDING_FEATURE_SIZE

    train_areas = args.train_area.split(",")
    val_areas = args.val_area.split(",") if args.val_area else None

    cfg = TrainConfig(
        batch_size=args.batch_size,
        num_inlier=args.num_inlier,
        num_neighbor=args.num_neighbor,
        max_epoch=args.epochs,
        feature_size=args.feature_size,
        multiseed=args.multiseed,
        lite=args.lite,
        data_dir=args.data_dir,
        models_dir=args.models_dir,
        cross_domain=args.cross_domain,
        completeness_head=args.completeness_head,
        compute_dtype=args.dtype,
        tp=args.tp,
        emb=args.emb,
    )
    mesh = None if args.no_mesh else make_mesh(tp=args.tp)
    params, summary = fit(cfg, train_areas, val_areas, mesh=mesh)
    val_tag = (val_areas[0] if val_areas else train_areas[0])
    save_model(cfg, params, val_tag, train_area=train_areas[0])
    return summary


if __name__ == "__main__":
    main()
