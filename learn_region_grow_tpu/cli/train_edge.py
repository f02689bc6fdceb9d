"""CLI: train the edge-classifier SVM for ``benchmarks.py --mode edge``.

The reference ships only the pickled model (``models/edge5.pkl``,
``benchmarks.py:174-180``) — its training code is absent upstream (SURVEY.md
C28). This trainer reconstructs it from the mode's own definitions: edges =
voxel-adjacent point pairs, features = the pairwise feature block used at
inference (``benchmarks.py:308-330``), label = whether the pair belongs to
the same GT instance; balanced subsampling + sklearn SVC(probability=True).
"""

import argparse
import os

import numpy as np

from ..core.voxel import equalize_resolution
from ..eval.classical import (edge_svm_features, neighborhood_stats)
from ..eval.components import voxel_adjacency_edges
from ..utils.io import load_h5_rooms


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train-area", default="1,2,3,4,6")
    ap.add_argument("--out-area", default="5",
                    help="tag for the output file models/edge{tag}.pkl")
    ap.add_argument("--resolution", type=float, default=0.1)
    ap.add_argument("--max-samples", type=int, default=40000)
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--models-dir", default="models")
    args = ap.parse_args(argv)

    rng = np.random.RandomState(0)
    feats, labels = [], []
    for area in args.train_area.split(","):
        if area.startswith("synthetic") or area in ("scannet", "s3dis"):
            path = os.path.join(args.data_dir, f"{area}.h5")
        else:
            path = os.path.join(args.data_dir, f"s3dis_area{area}.h5")
        rooms, objs, _ = load_h5_rooms(path)
        for rid in range(len(rooms)):
            raw = np.asarray(rooms[rid], np.float64)
            eq, _ = equalize_resolution(raw[:, :3], args.resolution)
            pts = raw[eq]
            obj = np.asarray(objs[rid])[eq]
            src, dst = voxel_adjacency_edges(pts[:, :3], args.resolution)
            E = np.stack([src, dst], axis=1)
            nmin, nmax = neighborhood_stats(len(pts), E, pts)
            F = edge_svm_features(E, pts, nmin, nmax)
            y = (obj[src] == obj[dst]).astype(int)
            feats.append(F)
            labels.append(y)
    F = np.vstack(feats)
    y = np.concatenate(labels)
    # balanced subsample
    pos = np.nonzero(y == 1)[0]
    neg = np.nonzero(y == 0)[0]
    k = min(len(pos), len(neg), args.max_samples // 2)
    sel = np.concatenate([rng.choice(pos, k, replace=False),
                          rng.choice(neg, k, replace=False)])
    F, y = F[sel], y[sel]
    print(f"training SVC on {len(y)} balanced edge samples "
          f"({F.shape[1]} features)")

    import joblib
    from sklearn.svm import SVC
    svc = SVC(probability=True, gamma="scale")
    svc.fit(F, y)
    print("train acc: %.3f" % svc.score(F, y))
    os.makedirs(args.models_dir, exist_ok=True)
    out = os.path.join(args.models_dir, f"edge{args.out_area}.pkl")
    joblib.dump(svc, out)
    print("saved", out)


if __name__ == "__main__":
    main()
