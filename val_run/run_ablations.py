"""Round-1 ablations: input-feature and point-count variants
(mirrors the reference's ablation table, BASELINE.md: xyz-only FEATURE_SIZE=6,
xyz+rgb=9, and inlier/neighbor counts 128/256). Uses the already-staged
synthetic areas; writes results/synthetic/area5_*.txt logs."""
import os, sys, time, io

BASE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(BASE))
DATA = os.path.join(BASE, "data")
MODELS = os.path.join(BASE, "models")
RESULTS = os.path.join(os.path.dirname(BASE), "results", "synthetic")

from learn_region_grow_tpu.engine.grow import enable_compilation_cache
enable_compilation_cache()
from learn_region_grow_tpu.cli import train_region_grow as trg
from learn_region_grow_tpu.cli import test_region_grow as tst


class Tee:
    def __init__(self, *s): self.s = s
    def write(self, x): [f.write(x) for f in self.s]
    def flush(self): [f.flush() for f in self.s]


old = sys.stdout

ABLATIONS = [
    ("area5_xyz", ["--feature-size", "6"]),
    ("area5_xyzrgb", ["--feature-size", "9"]),
    ("area5_i_128_j_128", ["--num-inlier", "128", "--num-neighbor", "128"]),
    ("area5_i_256_j_256", ["--num-inlier", "256", "--num-neighbor", "256"]),
]

for name, extra in ABLATIONS:
    t = time.time()
    trg.main(["--train-area", "1,2", "--val-area", "5", "--multiseed", "4",
              "--batch-size", "32", "--epochs", "15",
              "--data-dir", DATA, "--models-dir", MODELS, "--no-mesh"]
             + extra)
    print("[trained %s in %.1fs]" % (name, time.time() - t), flush=True)
    log = io.StringIO()
    sys.stdout = Tee(old, log)
    t = time.time()
    tst.main(["--area", "5", "--data-dir", DATA, "--models-dir", MODELS]
             + extra)
    print("[%s eval took %.1fs]" % (name, time.time() - t))
    sys.stdout = old
    open(os.path.join(RESULTS, name + ".txt"), "w").write(log.getvalue())
    print("done", name, flush=True)
print("ABLATIONS DONE", flush=True)
