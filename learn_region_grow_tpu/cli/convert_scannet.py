"""CLI: convert scannet.h5 into JSIS3D block format
(reference ``tools/convert_scannet.py``)."""

import argparse

from ..data.convert_scannet import convert_scannet


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", default="data/scannet.h5")
    ap.add_argument("--out-dir", default="data/jsis3d")
    ap.add_argument("--num-points", type=int, default=4096)
    args = ap.parse_args(argv)
    convert_scannet(args.input, args.out_dir, num_points=args.num_points)


if __name__ == "__main__":
    main()
