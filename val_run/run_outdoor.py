"""Outdoor (KITTI-flow) record set at resolution 0.3.

The reference runs its full method suite on Semantic KITTI accumulated
scans at resolution 0.3 (``stage_semantic_kitti.py``, README KITTI
commands: stage -> ``train_region_grow --train-area kitti_train
--val-area kitti_val``-style flow -> ``test_region_grow --area kitti_val
--resolution 0.3`` + ``benchmarks --mode <m> --resolution 0.3``). The
real scans cannot be downloaded on this zero-egress box, so this script
runs the SAME flow on synthetic KITTI-style street scenes
(``data/synthetic.generate_outdoor_scenes``: ground plane + facades +
vehicles/poles/vegetation at outdoor scale) and records:

    results/outdoor/resolution03_lrgnet.txt      (greedy, fused kernel)
    results/outdoor/resolution03_restart_np.txt  (local search)
    results/outdoor/resolution03_smoothness.txt  (classical)
    results/outdoor/resolution03_normal.txt      (classical)

Usage: python val_run/run_outdoor.py [all|data|train|eval]
"""
import io
import os
import sys
import time

BASE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(BASE))
DATA = os.path.join(BASE, "data")
MODELS = os.path.join(BASE, "models")
RESULTS_OUT = os.path.join(os.path.dirname(BASE), "results", "outdoor")
os.makedirs(RESULTS_OUT, exist_ok=True)

from learn_region_grow_tpu.engine.grow import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
import jax  # noqa: E402

from learn_region_grow_tpu.cli import benchmarks as bm  # noqa: E402
from learn_region_grow_tpu.cli import stage_data as sd  # noqa: E402
from learn_region_grow_tpu.cli import test_random_restart as trr  # noqa: E402
from learn_region_grow_tpu.cli import test_region_grow as tst  # noqa: E402
from learn_region_grow_tpu.cli import train_region_grow as trg  # noqa: E402
from learn_region_grow_tpu.data.synthetic import generate_outdoor_scenes  # noqa: E402
from learn_region_grow_tpu.utils.io import save_h5_rooms  # noqa: E402

STAGE = sys.argv[1] if len(sys.argv) > 1 else "all"
FUSED = ["--fused"] if jax.default_backend() == "tpu" else []
RES = ["--resolution", "0.3"]


class Tee:
    def __init__(self, *s):
        self.s = s

    def write(self, x):
        [f.write(x) for f in self.s]

    def flush(self):
        [f.flush() for f in self.s]


old = sys.stdout


def capture(path, fn):
    log = io.StringIO()
    sys.stdout = Tee(old, log)
    fn()
    sys.stdout = old
    with open(path, "w") as f:
        f.write(log.getvalue())
    print("wrote", path, flush=True)


t0 = time.time()

if STAGE in ("all", "data"):
    # scene streams disjoint from every other fixture (indoor bench 42,
    # scale curve 100, pretrain 300/600/700)
    scenes = generate_outdoor_scenes(10, seed=900)
    save_h5_rooms(os.path.join(DATA, "kitti_train.h5"), scenes[:6])
    save_h5_rooms(os.path.join(DATA, "kitti_val.h5"), scenes[6:])
    # multiseed-2 augmentation shards at the KITTI resolution; device
    # staging (the host simulator is minutes/room on this 1-core box)
    dev = ["--device"] if jax.default_backend() == "tpu" else []
    for seed in ("0", "1"):
        sd.main(["--area", "kitti_train", "--seed", seed,
                 "--data-dir", DATA] + RES + dev)
    sd.main(["--area", "kitti_val", "--data-dir", DATA] + RES + dev)
    print("outdoor staging done %.0fs" % (time.time() - t0), flush=True)

if STAGE in ("all", "train"):
    trg.main(["--train-area", "kitti_train", "--val-area", "kitti_val",
              "--multiseed", "2", "--batch-size", "32", "--epochs", "15",
              "--data-dir", DATA, "--models-dir", MODELS, "--no-mesh"])
    print("outdoor training done %.0fs" % (time.time() - t0), flush=True)

if STAGE in ("all", "eval"):
    capture(os.path.join(RESULTS_OUT, "resolution03_lrgnet.txt"),
            lambda: tst.main(["--area", "kitti_val", "--data-dir", DATA,
                              "--models-dir", MODELS] + RES + FUSED))
    capture(os.path.join(RESULTS_OUT, "resolution03_restart_np.txt"),
            lambda: trr.main(["--area", "kitti_val", "--scoring", "np",
                              "--data-dir", DATA, "--models-dir", MODELS,
                              "--model", os.path.join(
                                  MODELS, "lrgnet_modelkitti_val.npz")]
                             + RES + FUSED))
    capture(os.path.join(RESULTS_OUT, "resolution03_smoothness.txt"),
            lambda: bm.main(["--mode", "smoothness", "--area", "kitti_val",
                             "--data-dir", DATA] + RES))
    capture(os.path.join(RESULTS_OUT, "resolution03_normal.txt"),
            lambda: bm.main(["--mode", "normal", "--area", "kitti_val",
                             "--data-dir", DATA] + RES))
    print("outdoor records done %.0fs" % (time.time() - t0), flush=True)
