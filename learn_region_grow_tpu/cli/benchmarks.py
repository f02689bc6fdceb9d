"""CLI: classical + learned baselines for instance segmentation.

Mirrors ``python benchmarks.py --mode <m> --area 5``
(reference ``benchmarks.py``). Modes: normal, color, curvature, feature,
smoothness, fpfh (native FPFH-33, eval/fpfh.py; ``--fpfh-pcl`` shells out
to PCL binaries like the reference), edge (SVM; train one with
``cli.train_edge``), pointnet, pointnet2.
"""

import argparse
import os
import subprocess
import time

import numpy as np

from ..core.normals import estimate_normals_curvature
from ..core.voxel import equalize_resolution
from ..eval.classical import (DEFAULT_THRESHOLDS, classical_segment,
                              edge_svm_segment)
from ..eval.metrics import aggregate_line, room_metrics
from ..utils.class_util import classes_for_area
from ..utils.io import load_h5_rooms, save_pcd, save_ply

NUM_POINT = 1024


def load_fpfh_ascii(path: str) -> np.ndarray:
    """Parse a PCL ascii FPFH pcd (``benchmarks.py:58-74``)."""
    rows = []
    with open(path) as f:
        in_data = False
        for line in f:
            if in_data:
                rows.append([float(x) for x in line.split()])
            elif line.startswith("DATA"):
                in_data = True
    return np.asarray(rows)


def compute_fpfh_pcl(points: np.ndarray, resolution: float,
                     tmp_dir: str) -> np.ndarray:
    pcd = os.path.join(tmp_dir, "tmp.pcd")
    out = os.path.join(tmp_dir, "fpfh.pcd")
    out_ascii = os.path.join(tmp_dir, "fpfh_ascii.pcd")
    pts = points[:, :6].copy()
    pts[:, 3:6] = np.clip((pts[:, 3:6] + 0.5) * 255, 0, 255) \
        if pts[:, 3:6].max() <= 1.0 else pts[:, 3:6]
    save_pcd(pcd, pts)
    try:
        subprocess.run(["pcl_fpfh_estimation", pcd, out,
                        "-radius", str(resolution * 2)], check=True)
        subprocess.run(["pcl_convert_pcd_ascii_binary", out, out_ascii, "0"],
                       check=True)
    except FileNotFoundError as e:
        raise RuntimeError(
            "fpfh mode needs the PCL command-line tools "
            "(pcl_fpfh_estimation) on PATH") from e
    fpfh = load_fpfh_ascii(out_ascii)
    norm = np.linalg.norm(fpfh, axis=1, keepdims=True)
    return fpfh / np.where(norm == 0, 1, norm)


def pointnet_class_labels(mode: str, params_tree, num_class: int,
                          points: np.ndarray, area: str) -> np.ndarray:
    """Per-point semantic classes via batched grid-block inference
    (``benchmarks.py:281-306``; the reference runs batch-1 per cell)."""
    import jax
    import jax.numpy as jnp

    from ..models import pointnet as pn

    grid_resolution = 3.0 if "kitti" in area else 1.0
    grid = np.round(points[:, :2] / grid_resolution).astype(int)
    uniq = np.unique(grid, axis=0)
    blocks = np.zeros((len(uniq), NUM_POINT, 6), np.float32)
    masks = []
    for bi, g in enumerate(uniq):
        m = np.all(grid == g, axis=1)
        gp = points[m, :6].copy()
        gp[:, :2] -= g * grid_resolution
        gp[:, 2] -= gp[:, 2].min()
        k = min(len(gp), NUM_POINT)
        blocks[bi, :k] = gp[:k]
        blocks[bi, k:] = gp[0]
        masks.append(m)

    if mode == "pointnet":
        logits, _ = pn.pointnet_forward(params_tree["params"],
                                        params_tree["bn"],
                                        jnp.asarray(blocks), False)
    else:
        logits = pn.pointnet2_forward(params_tree["params"],
                                      jnp.asarray(blocks))
    cls = np.asarray(jnp.argmax(logits, -1))
    class_labels = np.zeros(len(points))
    for bi, m in enumerate(masks):
        k = min(int(m.sum()), NUM_POINT)
        lbl = np.zeros(int(m.sum()))
        lbl[:k] = cls[bi, :k]
        class_labels[m] = lbl
    return class_labels


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", default="normal")
    ap.add_argument("--area", default="5")
    ap.add_argument("--train-area", default="1")
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--resolution", type=float, default=0.1)
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--cross-domain", action="store_true")
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--models-dir", default="models")
    ap.add_argument("--model", default=None)
    ap.add_argument("--fpfh-pcl", action="store_true",
                    help="use external PCL binaries for FPFH (the "
                         "reference's path) instead of the native "
                         "implementation (eval/fpfh.py)")
    args = ap.parse_args(argv)
    mode = args.mode
    threshold = args.threshold
    if threshold is None and mode == "smoothness":
        threshold = 0.985 if args.area.split(",")[0] == "scannet" else 0.98
    print("Using threshold",
          threshold if threshold is not None
          else DEFAULT_THRESHOLDS.get(mode), "resolution", args.resolution)

    agg = []
    save_id = 0
    for area in args.area.split(","):
        params_tree = None
        svc = None
        if mode in ("pointnet", "pointnet2"):
            from ..train.checkpoint import load_checkpoint
            model_path = args.model or os.path.join(
                args.models_dir, "%s_model%s.npz" % (
                    mode, "5" if area == "scannet" else area))
            tree, _, _ = load_checkpoint(model_path)
            params_tree = {"params": tree["params"],
                           "bn": tree.get("bn", {})}
            print("Restored from %s" % model_path)
        elif mode == "edge":
            import joblib
            model_path = args.model or os.path.join(
                args.models_dir, "edge%s.pkl" % (
                    "5" if area == "scannet" else area))
            svc = joblib.load(model_path)
            print("Restored from %s" % model_path)

        if area in ("scannet", "s3dis", "kitti_train", "kitti_val") or \
                area.startswith("synthetic"):
            rooms_path = os.path.join(args.data_dir, f"{area}.h5")
        else:
            rooms_path = os.path.join(args.data_dir, f"s3dis_area{area}.h5")
        all_rooms, all_obj, all_cls = load_h5_rooms(rooms_path)
        num_class = len(classes_for_area(area))

        for room_id in range(len(all_rooms)):
            raw = np.asarray(all_rooms[room_id], np.float64)
            eq_idx, uneq_idx = equalize_resolution(raw[:, :3],
                                                   args.resolution)
            points = raw[eq_idx]
            obj_id = np.asarray(all_obj[room_id])[eq_idx]
            t0 = time.time()

            normals = curvatures = class_labels = fpfh = None
            if mode in ("normal", "curvature", "smoothness", "fpfh",
                        "feature"):
                normals, curvatures = estimate_normals_curvature(
                    points[:, :3], raw[:, :3], args.resolution,
                    normalize_curvature=False)
            if mode in ("pointnet", "pointnet2"):
                class_labels = pointnet_class_labels(
                    mode, params_tree, num_class, points, area)
            if mode == "fpfh":
                if args.fpfh_pcl:
                    fpfh = compute_fpfh_pcl(points, args.resolution,
                                            args.data_dir)
                else:
                    from ..eval.fpfh import compute_fpfh_native
                    raw_fpfh = compute_fpfh_native(points[:, :3], normals,
                                                   args.resolution * 2)
                    nrm = np.linalg.norm(raw_fpfh, axis=1, keepdims=True)
                    fpfh = raw_fpfh / np.where(nrm == 0, 1, nrm)

            if mode == "edge":
                cluster_label = edge_svm_segment(points, args.resolution,
                                                 svc)
            else:
                cluster_label = classical_segment(
                    mode, points, args.resolution, normals, curvatures,
                    class_labels, fpfh, threshold)
            print("room %d %d points: %.2fs" % (
                room_id, len(raw), time.time() - t0))

            m, cluster_label2 = room_metrics(obj_id, cluster_label)
            agg.append(m)
            print("Area %s room %d NMI: %.2f AMI: %.2f ARS: %.2f PRC: %.2f "
                  "RCL: %.2f IOU: %.2f" % (area, room_id, m.nmi, m.ami,
                                           m.ars, m.prc, m.rcl, m.iou))
            if args.save:
                state = np.random.RandomState(0)
                colors = state.randint(0, 255, (cluster_label2.max() + 1, 3))
                colors[0] = [100, 100, 100]
                out = raw.copy()
                out[:, 3:6] = colors[cluster_label2][uneq_idx]
                d = os.path.join(args.data_dir, "results", mode)
                os.makedirs(d, exist_ok=True)
                tag = ("scannet%d" % save_id if area == "scannet"
                       else "%d" % save_id)
                save_ply(os.path.join(d, f"{tag}.ply"), out)
                save_id += 1

    print(aggregate_line(agg))
    return agg


if __name__ == "__main__":
    main()
