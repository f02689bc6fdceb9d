"""Round-1 validation: reference workflow end-to-end on synthetic areas.

Generates 3 synthetic 'areas' (saved under the reference's s3dis_area naming),
stages them with 4 augmentation seeds, trains the flagship 512/512 LrgNet
with multiseed reloading + validation epochs, then evaluates greedy,
beam-search and random-restart engines. Stdout logs are the checked-in
regression record (results/synthetic/*.txt).
"""
import os, sys, time, contextlib, io, subprocess
import numpy as np

BASE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(BASE))
DATA = os.path.join(BASE, "data")
MODELS = os.path.join(BASE, "models")
RESULTS = os.path.join(os.path.dirname(BASE), "results", "synthetic")
os.makedirs(DATA, exist_ok=True)
os.makedirs(MODELS, exist_ok=True)
os.makedirs(RESULTS, exist_ok=True)

from learn_region_grow_tpu.engine.grow import enable_compilation_cache
enable_compilation_cache()
from learn_region_grow_tpu.data.synthetic import generate_furnished_rooms
from learn_region_grow_tpu.utils.io import save_h5_rooms

STAGE = sys.argv[1] if len(sys.argv) > 1 else "all"
t0 = time.time()

if STAGE in ("all", "data"):
    # 1. areas: 1,2 train (4 rooms each), 5 test (4 rooms).
    # Round 2: multi-class FURNISHED rooms (16-24 instances, 6 classes) so
    # the record can discriminate — the round-1 box fixture saturated the
    # flagship and degenerated the color/semantic baselines (VERDICT #5).
    rooms = generate_furnished_rooms(12, seed=7, scale=0.5,
                                     min_items=10, max_items=18)
    for area, sl in [("1", slice(0,4)), ("2", slice(4,8)), ("5", slice(8,12))]:
        save_h5_rooms(os.path.join(DATA, f"s3dis_area{area}.h5"), rooms[sl])
    print("generated areas in %.1fs" % (time.time()-t0), flush=True)
    from learn_region_grow_tpu.cli import stage_data as sd
    for seed in range(4):
        sd.main(["--area", "1,2", "--seed", str(seed), "--data-dir", DATA])
    sd.main(["--area", "5", "--data-dir", DATA])
    print("staging done %.1fs" % (time.time()-t0), flush=True)

class Tee:
    def __init__(self, *s): self.s = s
    def write(self, x): [f.write(x) for f in self.s]
    def flush(self): [f.flush() for f in self.s]
old = sys.stdout

if STAGE in ("all", "train"):
    from learn_region_grow_tpu.cli import train_region_grow as trg
    log = io.StringIO()
    sys.stdout = Tee(old, log)
    trg.main(["--train-area", "1,2", "--val-area", "5", "--multiseed", "4",
              "--batch-size", "32", "--epochs", "21",
              "--data-dir", DATA, "--models-dir", MODELS, "--no-mesh"])
    sys.stdout = old
    open(os.path.join(RESULTS, "train_area5.txt"), "w").write(log.getvalue())
    print("training done %.1fs" % (time.time()-t0), flush=True)

# evaluation: greedy / beam / restart — each selectable as its own stage
from learn_region_grow_tpu.cli import test_region_grow as tst
from learn_region_grow_tpu.cli import test_beam_search as tbs
from learn_region_grow_tpu.cli import test_random_restart as trr
for name, mod, argv in [
    ("area5_lrgnet", tst, ["--area", "5", "--data-dir", DATA,
                           "--models-dir", MODELS]),
    ("area5_lrgnet_fused", tst, ["--area", "5", "--fused",
                                 "--data-dir", DATA,
                                 "--models-dir", MODELS]),
    # local search on the FUSED engine since round 3 (rollout/restart
    # lanes on-chip; the round-2 records ran the XLA lane engine at
    # 51-241s — verdict ask #2)
    ("localsearch_beam_np", tbs, ["--area", "5", "--scoring", "np",
                                  "--fused",
                                  "--data-dir", DATA, "--models-dir", MODELS]),
    ("localsearch_beam_ml", tbs, ["--area", "5", "--scoring", "ml",
                                  "--fused",
                                  "--data-dir", DATA, "--models-dir", MODELS]),
    ("localsearch_restart_np", trr, ["--area", "5", "--scoring", "np",
                                     "--num-restarts", "5", "--fused",
                                     "--data-dir", DATA, "--models-dir", MODELS]),
    ("localsearch_restart_ml", trr, ["--area", "5", "--scoring", "ml",
                                     "--num-restarts", "5", "--fused",
                                     "--data-dir", DATA, "--models-dir", MODELS]),
]:
    if STAGE not in ("all", "eval", name):
        continue
    log = io.StringIO()
    sys.stdout = Tee(old, log)
    t = time.time()
    mod.main(argv)
    print("[%s took %.1fs]" % (name, time.time()-t))
    sys.stdout = old
    open(os.path.join(RESULTS, name + ".txt"), "w").write(log.getvalue())
    print("done", name, flush=True)
print("ALL DONE %.1fs" % (time.time()-t0), flush=True)
