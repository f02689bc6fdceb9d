"""CLI: stage training data by simulating region growing.

Mirrors ``python stage_data.py --seed S --area A --resolution R``
(reference ``stage_data.py:15-22``).
"""

import argparse

from ..data.simulator import stage_area


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--area", default="1,2,3,4,5,6",
                    help="comma-separated areas (1-6, scannet, s3dis, "
                         "synthetic_train, kitti_train, kitti_val, ...)")
    ap.add_argument("--seed", type=int, default=None,
                    help="augmentation seed; writes multiseed/seed%%d_area%%s.h5")
    ap.add_argument("--resolution", type=float, default=0.1)
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--device", action="store_true",
                    help="run the growth simulation as a jitted device "
                         "program, all rooms in parallel lanes (same "
                         "semantics; JAX PRNG draws)")
    ap.add_argument("--samples-cap", type=int, default=4096,
                    help="--device per-room sample capacity (fixed shapes)")
    args = ap.parse_args(argv)

    for area in args.area.split(","):
        stage_area(args.data_dir, area, seed=args.seed,
                   resolution=args.resolution, verbose=args.verbose,
                   device=args.device, samples_cap=args.samples_cap)


if __name__ == "__main__":
    main()
