"""Round-1 cross-domain + outdoor-resolution records.

* cross-domain: train on the scale-0.6 synthetic areas, evaluate on a
  DIFFERENT domain (scale-1.2 rooms, different generator seed) via the
  --cross-domain checkpoint naming (reference ``results/cross_domain``).
* outdoor: the reference's KITTI configs run at resolution 0.3
  (``README.md:96-98``); stage/train/eval a coarse-resolution pipeline on
  large synthetic rooms to exercise the --resolution path end-to-end.
"""
import os, sys, time, io

BASE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(BASE))
DATA = os.path.join(BASE, "data")
MODELS = os.path.join(BASE, "models")
RESULTS_CD = os.path.join(os.path.dirname(BASE), "results", "cross_domain")
RESULTS_OUT = os.path.join(os.path.dirname(BASE), "results", "outdoor")
os.makedirs(RESULTS_CD, exist_ok=True)
os.makedirs(RESULTS_OUT, exist_ok=True)

from learn_region_grow_tpu.engine.grow import enable_compilation_cache
enable_compilation_cache()
from learn_region_grow_tpu.data.synthetic import generate_rooms
from learn_region_grow_tpu.utils.io import save_h5_rooms
from learn_region_grow_tpu.cli import stage_data as sd
from learn_region_grow_tpu.cli import train_region_grow as trg
from learn_region_grow_tpu.cli import test_region_grow as tst


class Tee:
    def __init__(self, *s): self.s = s
    def write(self, x): [f.write(x) for f in self.s]
    def flush(self): [f.flush() for f in self.s]


old = sys.stdout


def capture(path, fn):
    log = io.StringIO()
    sys.stdout = Tee(old, log)
    fn()
    sys.stdout = old
    open(path, "w").write(log.getvalue())
    print("wrote", path, flush=True)


t0 = time.time()

# ---- cross-domain: big-room target domain (area tag "9") ----
# source domain = whatever areas 1,2 currently hold (the furnished
# fixture since round 2); target = scale-1.2 box rooms
big = generate_rooms(4, seed=99, scale=1.2)
save_h5_rooms(os.path.join(DATA, "s3dis_area9.h5"), big)
# train with --cross-domain naming on areas 1,2 (staged already)
trg.main(["--train-area", "1,2", "--val-area", "5", "--multiseed", "4",
          "--batch-size", "32", "--epochs", "15", "--cross-domain",
          "--data-dir", DATA, "--models-dir", MODELS, "--no-mesh"])
capture(os.path.join(RESULTS_CD, "furnished05_to_box12_lrgnet.txt"),
        lambda: tst.main(["--area", "9", "--cross-domain",
                          "--train-area", "1",
                          "--data-dir", DATA, "--models-dir", MODELS]))
print("cross-domain done %.1fs" % (time.time() - t0), flush=True)

# ---- outdoor-style coarse resolution (0.3), big sparse scenes ----
outdoor = generate_rooms(6, seed=55, scale=1.5)
save_h5_rooms(os.path.join(DATA, "s3dis_area7.h5"), outdoor[:4])
save_h5_rooms(os.path.join(DATA, "s3dis_area8.h5"), outdoor[4:])
sd.main(["--area", "7", "--resolution", "0.3", "--data-dir", DATA])
sd.main(["--area", "8", "--resolution", "0.3", "--data-dir", DATA])
trg.main(["--train-area", "7", "--val-area", "8", "--multiseed", "0",
          "--batch-size", "32", "--epochs", "15",
          "--data-dir", DATA, "--models-dir", MODELS, "--no-mesh"])
capture(os.path.join(RESULTS_OUT, "resolution03_lrgnet.txt"),
        lambda: tst.main(["--area", "8", "--resolution", "0.3",
                          "--data-dir", DATA, "--models-dir", MODELS]))
print("outdoor done %.1fs" % (time.time() - t0), flush=True)
