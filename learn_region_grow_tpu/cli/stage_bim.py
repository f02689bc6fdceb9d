"""CLI: stage BIM .obj meshes (reference ``tools/stage_bim.py``)."""

import argparse

from ..data.bim import stage_bim


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("obj_files", nargs="+")
    ap.add_argument("--output", default="data/bim.h5")
    ap.add_argument("--density", type=float, default=0.03)
    args = ap.parse_args(argv)
    stage_bim(args.obj_files, args.output, density=args.density)


if __name__ == "__main__":
    main()
