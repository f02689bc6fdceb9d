"""Round-1 benchmarks validation: every baseline family on the synthetic
areas (classical modes, edge SVM, PointNet, PointNet++, MCPNet). Produces
results/synthetic/area5_<mode>.txt regression logs mirroring the
reference's results tree."""
import os, sys, time, io

BASE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(BASE))
DATA = os.path.join(BASE, "data")
MODELS = os.path.join(BASE, "models")
RESULTS = os.path.join(os.path.dirname(BASE), "results", "synthetic")
os.makedirs(RESULTS, exist_ok=True)

from learn_region_grow_tpu.engine.grow import enable_compilation_cache
enable_compilation_cache()


class Tee:
    def __init__(self, *s): self.s = s
    def write(self, x): [f.write(x) for f in self.s]
    def flush(self): [f.flush() for f in self.s]


old = sys.stdout


def capture(name, fn):
    log = io.StringIO()
    sys.stdout = Tee(old, log)
    t = time.time()
    fn()
    print("[%s took %.1fs]" % (name, time.time() - t))
    sys.stdout = old
    open(os.path.join(RESULTS, name + ".txt"), "w").write(log.getvalue())
    print("done", name, flush=True)


STAGE = sys.argv[1] if len(sys.argv) > 1 else "all"

# --- classical modes (no training) ---
if STAGE in ("all", "classical"):
    from learn_region_grow_tpu.cli import benchmarks as bm
    for mode in ("normal", "color", "curvature", "feature", "smoothness",
                 "fpfh"):
        capture("area5_%s" % mode,
                lambda m=mode: bm.main(["--mode", m, "--area", "5",
                                        "--data-dir", DATA]))

# --- edge SVM ---
if STAGE in ("all", "edge"):
    from learn_region_grow_tpu.cli import train_edge, benchmarks as bm
    train_edge.main(["--train-area", "1,2", "--out-area", "5",
                     "--data-dir", DATA, "--models-dir", MODELS,
                     "--max-samples", "20000"])
    capture("area5_edge",
            lambda: bm.main(["--mode", "edge", "--area", "5",
                             "--data-dir", DATA, "--models-dir", MODELS]))

# --- pointnet / pointnet2 semantic-seg CC ---
if STAGE in ("all", "pointnet"):
    from learn_region_grow_tpu.cli import train_pointnet, benchmarks as bm
    for mode in ("pointnet", "pointnet2"):
        capture("train_%s" % mode,
                lambda m=mode: train_pointnet.main(
                    ["--mode", m, "--train-area", "1,2", "--val-area", "5",
                     # 30 epochs left val cls acc at 0.64 (plateaued vs the
                     # reference's real-data budget); 90 reaches 0.78 and
                     # lifts CC NMI 0.56 -> 0.72 ~= the reference's 0.73
                     "--epochs", "90", "--batch-size", "16",
                     "--data-dir", DATA, "--models-dir", MODELS]))
        capture("area5_%s" % mode,
                lambda m=mode: bm.main(["--mode", m, "--area", "5",
                                        "--data-dir", DATA,
                                        "--models-dir", MODELS]))

# --- mcpnet ---
if STAGE in ("all", "mcpnet"):
    from learn_region_grow_tpu.cli import train_mcpnet, test_mcpnet
    capture("train_mcp",
            lambda: train_mcpnet.main(["--area", "5", "--train-area", "1,2",
                                       "--epochs", "12",
                                       "--data-dir", DATA,
                                       "--models-dir", MODELS]))
    capture("area5_mcp",
            lambda: test_mcpnet.main(["--area", "5", "--data-dir", DATA,
                                      "--models-dir", MODELS,
                                      "--model",
                                      os.path.join(MODELS,
                                                   "mcpnet_model5.npz")]))
print("ALL BENCHMARKS DONE", flush=True)
