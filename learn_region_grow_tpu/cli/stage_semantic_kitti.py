"""CLI: stage Semantic KITTI into the room-H5 format
(reference ``stage_semantic_kitti.py:11-21`` argparse flags)."""

import argparse

from ..data.kitti import KittiConfig, stage_semantic_kitti


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", "-d", required=True)
    ap.add_argument("--output", "-o", required=True)
    ap.add_argument("--sequences", "-s",
                    default="00,01,02,03,04,05,06,07,08,09,10")
    ap.add_argument("--interval", "-i", type=int, default=20)
    ap.add_argument("--min-cluster", "-m", type=int, default=50)
    ap.add_argument("--voxel-resolution", "-v", type=float, default=0.3)
    ap.add_argument("--downsample-resolution", "-r", type=float, default=0.1)
    ap.add_argument("--skip", "-k", type=int, default=10)
    args = ap.parse_args(argv)
    cfg = KittiConfig(interval=args.interval, min_cluster=args.min_cluster,
                      voxel_resolution=args.voxel_resolution,
                      downsample_resolution=args.downsample_resolution,
                      skip=args.skip)
    stage_semantic_kitti(args.dataset, args.output,
                         args.sequences.split(","), cfg)


if __name__ == "__main__":
    main()
