"""CLI: render the region-growing process step by step to PNG frames.

Capability parity with the reference's OpenGL/GLUT animation
(``animate_region_growing.py:165-256,300-428``) in a headless-friendly form:
runs the greedy grow loop on one room and renders, per step, a frame pair —
(a) the current inlier / neighbor / add / remove overlay and (b) the
committed instance coloring — via matplotlib's Agg backend. Frames land in
``--out-dir`` as ``step_%04d_{state,instances}.png``.
"""

import argparse
import os

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ..core.features import prepare_room  # noqa: E402
from ..engine.grow import GrowConfig, single_step_batch  # noqa: E402
from ..models import lrgnet  # noqa: E402
from ..train.checkpoint import load_checkpoint  # noqa: E402
from ..utils.io import load_h5_rooms  # noqa: E402
from . import test_region_grow as trg_cli  # noqa: E402


def render_frame(path, xyz, colors, title, azim=-60, elev=30):
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], c=colors, s=1.5, linewidths=0)
    ax.view_init(elev=elev, azim=azim)
    ax.set_title(title)
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def main(argv=None):
    from ..engine.grow import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--area", default="synthetic_test")
    ap.add_argument("--room", type=int, default=0)
    ap.add_argument("--out-dir", default="viz/animation")
    ap.add_argument("--resolution", type=float, default=0.1)
    ap.add_argument("--feature-size", type=int, default=13)
    ap.add_argument("--num-inlier", type=int, default=512)
    ap.add_argument("--num-neighbor", type=int, default=512)
    ap.add_argument("--max-steps", type=int, default=200)
    ap.add_argument("--max-instances", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--models-dir", default="models")
    ap.add_argument("--model", required=True)
    args = ap.parse_args(argv)

    params, _, _ = load_checkpoint(args.model)
    mcfg = lrgnet.LrgNetConfig(feature_size=args.feature_size)
    gcfg = GrowConfig(num_inlier=args.num_inlier,
                      num_neighbor=args.num_neighbor,
                      feature_size=args.feature_size,
                      resolution=args.resolution, seed=args.seed)

    rooms, obj_ids, cls_ids = load_h5_rooms(
        trg_cli.area_rooms_path(args.data_dir, args.area))
    rf = prepare_room(rooms[args.room], obj_ids[args.room],
                      cls_ids[args.room], resolution=args.resolution,
                      feature_size=args.feature_size)
    n = len(rf.points)
    xyz = rf.points[:, :3]
    os.makedirs(args.out_dir, exist_ok=True)

    pts_d = jax.device_put(rf.points[None])
    vox_d = jax.device_put(rf.voxels.astype(np.int32)[None])
    valid_d = jax.device_put(np.ones((1, n), bool))
    base_rng = jax.random.PRNGKey(args.seed)

    visited = np.zeros(n, bool)
    cluster_label = np.zeros(n, int)
    color_state = np.random.RandomState(0)
    inst_colors = color_state.rand(args.max_instances + 1, 3)
    inst_colors[0] = [0.4, 0.4, 0.4]
    order = np.argsort(rf.curvatures, kind="stable")

    frame = 0
    cluster_id = 1
    for inst in range(args.max_instances):
        cand = order[~visited[order]]
        if len(cand) == 0:
            break
        mask = np.zeros(n, bool)
        mask[int(cand[0])] = True
        seq_min = rf.voxels[int(cand[0])].copy()
        seq_max = rf.voxels[int(cand[0])].copy()
        stuck = 0
        for step in range(args.max_steps):
            vmin = rf.voxels[mask].min(axis=0)
            vmax = rf.voxels[mask].max(axis=0)
            if not (vmin < seq_min).any() and not (vmax > seq_max).any():
                if stuck >= 1:
                    break
                stuck += 1
            else:
                stuck = 0
            seq_min = np.minimum(seq_min, vmin)
            seq_max = np.maximum(seq_max, vmax)

            in_bbox = (np.all(rf.voxels >= vmin - 1, axis=1)
                       & np.all(rf.voxels <= vmax + 1, axis=1))
            neighbor = in_bbox & ~mask & ~visited

            rng = jax.vmap(lambda i: jax.random.fold_in(base_rng, i))(
                jnp.asarray([frame]))
            new_mask, _lp, updated, no_nb = jax.device_get(
                single_step_batch(mcfg, gcfg, params, pts_d, vox_d, valid_d,
                                  jax.device_put(visited[None]),
                                  jax.device_put(mask[None]),
                                  jnp.asarray([True]), rng))
            new_mask = new_mask[0]

            colors = np.full((n, 3), 0.75)
            colors[neighbor] = [0.3, 0.55, 1.0]            # candidates
            colors[mask] = [1.0, 0.85, 0.2]                # inliers
            colors[new_mask & ~mask] = [0.1, 0.8, 0.1]     # added
            colors[mask & ~new_mask] = [0.9, 0.1, 0.1]     # removed
            render_frame(os.path.join(args.out_dir,
                                      "step_%04d_state.png" % frame),
                         xyz, colors,
                         "instance %d step %d (%d pts)" % (
                             inst, step, int(mask.sum())))
            inst_c = inst_colors[np.minimum(cluster_label,
                                            args.max_instances)]
            inst_c[mask] = inst_colors[min(cluster_id, args.max_instances)]
            render_frame(os.path.join(args.out_dir,
                                      "step_%04d_instances.png" % frame),
                         xyz, inst_c, "committed instances")
            frame += 1
            if bool(no_nb[0]) or not bool(updated[0]):
                break
            mask = new_mask
        visited |= mask
        if mask.sum() > gcfg.cluster_threshold:
            cluster_label[mask] = cluster_id
            cluster_id += 1
    print("rendered %d frame pairs to %s" % (frame, args.out_dir))


if __name__ == "__main__":
    main()
