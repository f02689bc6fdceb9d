"""Completeness-head ('cp') local-search scoring record (round-3 verdict
ask #7: the head predicts held-out growth quality at r=0.91 — USE it).

Trains the flagship LrgNet WITH the completeness head on the standard
validation fixture (same protocol as run_validation.py's train stage:
areas 1,2 multiseed-4, val area 5), saves it as
``val_run/models/lrgnet_model5_cp.npz``, then A/Bs the three restart
scorings (np / ml / cp) and the two beam scorings (np / cp) on the
held-out area 5 — SAME checkpoint for every scoring, so the only
variable is the attempt-ranking rule. Reference analog: the published
model's completeness head was consumed by the RNN variant
(``experimental/train_region_grow_rnn.py:143-144``); the local-search
scorings themselves mirror ``test_random_restart.py:171-177`` /
``test_beam_search.py:272-275``.

Writes ``results/synthetic/localsearch_restart_cp.txt`` and
``results/synthetic/localsearch_beam_cp.txt``.

Usage: python val_run/run_localsearch_cp.py [--retrain]
"""
import io
import os
import re
import sys
import time

BASE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(BASE))
DATA = os.path.join(BASE, "data")
MODELS = os.path.join(BASE, "models")
RESULTS = os.path.join(os.path.dirname(BASE), "results", "synthetic")
CKPT = os.path.join(MODELS, "lrgnet_model5_cp.npz")

from learn_region_grow_tpu.engine.grow import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def train_cp_checkpoint():
    import dataclasses

    from learn_region_grow_tpu.train import checkpoint as ckpt_lib
    from learn_region_grow_tpu.train.trainer import TrainConfig, fit
    cfg = TrainConfig(batch_size=32, max_epoch=21, multiseed=4,
                      data_dir=DATA, models_dir=MODELS,
                      completeness_head=True)
    params, _ = fit(cfg, ["1", "2"], ["5"], mesh=None)
    ckpt_lib.save_checkpoint(CKPT, params,
                             config=dataclasses.asdict(cfg))
    print(f"saved {CKPT}", flush=True)


class Tee:
    def __init__(self, *s):
        self.s = s

    def write(self, x):
        for f in self.s:
            f.write(x)

    def flush(self):
        for f in self.s:
            f.flush()


def capture(fn, argv):
    old = sys.stdout
    log = io.StringIO()
    sys.stdout = Tee(old, log)
    try:
        fn(argv)
    finally:
        sys.stdout = old
    return log.getvalue()


def room_nmis(text):
    return [float(m) for m in re.findall(r"room \d+ NMI: ([0-9.]+)", text)]


def main():
    t0 = time.time()
    if "--retrain" in sys.argv or not os.path.exists(CKPT):
        train_cp_checkpoint()
        print("training done %.1fs" % (time.time() - t0), flush=True)

    from learn_region_grow_tpu.cli import test_beam_search as tbs
    from learn_region_grow_tpu.cli import test_random_restart as trr
    common = ["--area", "5", "--fused", "--data-dir", DATA,
              "--model", CKPT, "--num-restarts", "5"]
    sections = {}
    for scoring in ("np", "ml", "cp"):
        sections[scoring] = capture(
            trr.main, common + ["--scoring", scoring])
        print(f"restart {scoring} done %.1fs" % (time.time() - t0),
              flush=True)
    cmp_lines = []
    np_nmi = room_nmis(sections["np"])
    for scoring in ("ml", "cp"):
        sn = room_nmis(sections[scoring])
        wins = sum(a >= b for a, b in zip(sn, np_nmi))
        cmp_lines.append(
            "# %s vs np (same checkpoint, per-room NMI): %s >= np on "
            "%d/%d rooms" % (scoring, scoring, wins, len(np_nmi)))
    out = ["# random-restart scoring A/B on the completeness-head "
           "checkpoint (fused lanes, 5 restarts/seed)",
           "# np = final mask size | ml = cumulative decision log-prob | "
           "cp = completeness-head prediction"]
    for scoring in ("np", "ml", "cp"):
        out += [f"## --scoring {scoring}", sections[scoring].rstrip()]
    out += cmp_lines
    with open(os.path.join(RESULTS, "localsearch_restart_cp.txt"),
              "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote results/synthetic/localsearch_restart_cp.txt", flush=True)

    beam_common = ["--area", "5", "--fused", "--data-dir", DATA,
                   "--model", CKPT]
    bsec = {}
    for scoring in ("np", "cp"):
        bsec[scoring] = capture(tbs.main, beam_common
                                + ["--scoring", scoring])
        print(f"beam {scoring} done %.1fs" % (time.time() - t0), flush=True)
    bnp, bcp = room_nmis(bsec["np"]), room_nmis(bsec["cp"])
    wins = sum(a >= b for a, b in zip(bcp, bnp))
    out = ["# beam-search scoring A/B on the completeness-head checkpoint "
           "(fused rollout lanes, 3x3)",
           "## --scoring np", bsec["np"].rstrip(),
           "## --scoring cp", bsec["cp"].rstrip(),
           "# cp vs np (same checkpoint, per-room NMI): cp >= np on "
           "%d/%d rooms" % (wins, len(bnp))]
    with open(os.path.join(RESULTS, "localsearch_beam_cp.txt"), "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote results/synthetic/localsearch_beam_cp.txt", flush=True)


if __name__ == "__main__":
    main()
