"""CLI: convert room H5 files to colored PLY point clouds
(reference ``h5_to_ply.py:49-112``). Modes: --rgb (true color), --seg
(instance colors), --cls (class colors)."""

import argparse
import os

import numpy as np

from ..utils.class_util import CLASS_TO_COLOR_RGB
from ..utils.io import load_h5_rooms, save_ply


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("h5file")
    ap.add_argument("--rgb", action="store_true")
    ap.add_argument("--seg", action="store_true")
    ap.add_argument("--cls", action="store_true")
    ap.add_argument("--target", type=int, default=None,
                    help="render one room with class colors + a PNG class "
                         "legend (reference h5_to_ply.py --target)")
    ap.add_argument("--out-dir", default="viz")
    ap.add_argument("--rooms", default=None,
                    help="comma-separated room ids (default all)")
    args = ap.parse_args(argv)

    rooms, obj_ids, cls_ids = load_h5_rooms(args.h5file)
    if args.target is not None:
        args.rooms = str(args.target)
        args.cls = True
    ids = ([int(x) for x in args.rooms.split(",")] if args.rooms
           else range(len(rooms)))
    if args.target is not None:
        # class legend PNG for the classes present in the target room
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from ..utils.class_util import CLASSES_S3DIS
        present = sorted(set(cls_ids[args.target].tolist()))
        fig, ax = plt.subplots(figsize=(3, 0.4 * max(len(present), 1)))
        for row, c in enumerate(present):
            color = np.array(CLASS_TO_COLOR_RGB.get(int(c),
                                                    (128, 128, 128))) / 255.0
            ax.barh(row, 1.0, color=color)
            name = (CLASSES_S3DIS[int(c)]
                    if int(c) < len(CLASSES_S3DIS) else str(c))
            ax.text(0.5, row, name, ha="center", va="center")
        ax.set_axis_off()
        os.makedirs(args.out_dir, exist_ok=True)
        fig.savefig(os.path.join(args.out_dir,
                                 f"room{args.target}_legend.png"),
                    bbox_inches="tight")
        plt.close(fig)
    os.makedirs(args.out_dir, exist_ok=True)
    for rid in ids:
        pts = np.asarray(rooms[rid]).copy()
        if args.seg:
            rng = np.random.RandomState(0)
            colors = rng.randint(0, 255, (int(obj_ids[rid].max()) + 1, 3))
            pts[:, 3:6] = colors[obj_ids[rid]]
            tag = "seg"
        elif args.cls:
            colors = np.array([CLASS_TO_COLOR_RGB.get(i, (128, 128, 128))
                               for i in range(max(CLASS_TO_COLOR_RGB) + 1)])
            pts[:, 3:6] = colors[np.clip(cls_ids[rid], 0, len(colors) - 1)]
            tag = "cls"
        else:
            # true color; synthetic rooms store rgb in [-0.5, 0.5]
            if pts[:, 3:6].max() <= 1.0:
                pts[:, 3:6] = (pts[:, 3:6] + 0.5) * 255
            tag = "rgb"
        save_ply(os.path.join(args.out_dir, f"room{rid}_{tag}.ply"), pts)


if __name__ == "__main__":
    main()
