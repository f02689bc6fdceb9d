"""CLI: stage virtual KITTI scenes (reference ``tools/stage_vkitti.py``)."""

import argparse

from ..data.vkitti import stage_vkitti


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="data/vkitti3d_dataset_v1.0")
    ap.add_argument("--output", default="data/vkitti.h5")
    ap.add_argument("--all-scenes", action="store_true",
                    help="stage every scene (the reference stops after the "
                         "first per area)")
    args = ap.parse_args(argv)
    stage_vkitti(args.dataset, args.output,
                 one_scene_per_area=not args.all_scenes)


if __name__ == "__main__":
    main()
