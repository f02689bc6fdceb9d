"""CLI: supervoxel pooling exploration (reference
``experimental/supervoxel_embedding.py:1-97`` — SURVEY.md C31).

The reference experiment seeds one supervoxel per 0.5 m grid cell
(first equalized point per cell in scan order — the same
first-point-per-voxel rule as resolution equalization), assigns every
point to its nearest seed by full-feature squared distance
([xyz, rgb, normals, curvature] — ``supervoxel_embedding.py:78-91``),
recolors points by supervoxel and saves a PCD per room. It was a dead
end upstream (never wired into training; SURVEY.md C31) but is part of
the reference's capability surface, so the counterpart exists here.

TPU-native differences: the O(N*S) nearest-seed loop becomes ONE
device cdist (|a|^2 + |b|^2 - 2ab — an MXU matmul over the feature
columns) instead of a per-point Python argmin, and the per-room NMI of
supervoxel labels vs instances is printed (the question the
exploration was probing). Curvature here is the pipeline's
max-normalized value (``core/features.py``) — the reference's raw
eigenvalue ratio differs by a per-room constant, which argmin distance
is insensitive to only at equal scale; structure, not bitwise parity,
is the point of this exploration.
"""
import argparse
import os

import numpy as np

from ..core import prepare_room
from ..utils.io import load_h5_rooms, save_pcd


def supervoxel_seeds(voxels_05: np.ndarray) -> np.ndarray:
    """First-point-per-0.5m-cell seed indices in scan order
    (``supervoxel_embedding.py:78-84`` semantics)."""
    # lexicographic unique keeping first occurrence in scan order
    _, first = np.unique(
        voxels_05.astype(np.int64) @ np.array([2 ** 42, 2 ** 21, 1]),
        return_index=True)
    return np.sort(first)


def assign_supervoxels(feats: np.ndarray, seed_idx: np.ndarray,
                       batch: int = 65536) -> np.ndarray:
    """Nearest-seed label per point by full-feature squared distance —
    one (N, S) cdist on device, batched over N."""
    import jax
    import jax.numpy as jnp

    seeds = jnp.asarray(feats[seed_idx])
    sn = jnp.sum(seeds * seeds, axis=1)

    @jax.jit
    def nearest(block):
        d = (jnp.sum(block * block, axis=1, keepdims=True) + sn[None]
             - 2.0 * block @ seeds.T)
        return jnp.argmin(d, axis=1)

    out = np.empty(len(feats), np.int64)
    for lo in range(0, len(feats), batch):
        # fixed block shape: one compile regardless of N
        blk = np.zeros((batch, feats.shape[1]), np.float32)
        n = min(batch, len(feats) - lo)
        blk[:n] = feats[lo:lo + n]
        out[lo:lo + n] = np.asarray(nearest(jnp.asarray(blk)))[:n]
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--area", default="3")
    ap.add_argument("--rooms", default="0,1,2",
                    help="room ids (reference runs rooms 0-2 of area 3)")
    ap.add_argument("--resolution", type=float, default=0.1)
    ap.add_argument("--supervoxel-resolution", type=float, default=0.5)
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--out-dir", default="tmp")
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    rooms, objs, clss = load_h5_rooms(
        os.path.join(args.data_dir, f"s3dis_area{args.area}.h5"))
    save_id = 0
    for rid in [int(r) for r in args.rooms.split(",")]:
        rf = prepare_room(rooms[rid][:, :6], objs[rid], clss[rid],
                          resolution=args.resolution)
        # the reference's supervoxel feature vector: xyz, rgb, normals,
        # curvature (feature cols 0:3, 6:9, 9:12, 12 of the 13-d layout)
        feats = rf.points[:, [0, 1, 2, 6, 7, 8, 9, 10, 11, 12]]
        vox05 = np.round(rf.points[:, :3]
                         / args.supervoxel_resolution).astype(np.int64)
        seed_idx = supervoxel_seeds(vox05)
        print(len(seed_idx), "supervoxels")
        label = assign_supervoxels(feats, seed_idx)
        from ..eval.metrics import room_metrics
        nmi = room_metrics(rf.obj_id, label + 1)[0].nmi
        print("Area %s room %d supervoxel NMI: %.2f" % (args.area, rid,
                                                        nmi))
        colored = rf.points[:, :6].copy()
        rng = np.random.RandomState(0)
        palette = rng.randint(0, 255, (label.max() + 1, 3))
        colored[:, 3:6] = palette[label]
        out = os.path.join(args.out_dir, "%d-cloud.pcd" % save_id)
        save_pcd(out, colored)
        print("Saved %d clusters to %s" % (len(seed_idx), out))
        save_id += 1


if __name__ == "__main__":
    main()
