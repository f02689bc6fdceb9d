"""Completeness-head validation record (round-2 verdict ask #6).

Trains the flagship LrgNet WITH the optional completeness head on the
furnished synthetic fixture (areas 1,2), then reads the head back on the
HELD-OUT area 5 staging stream and reports how well its sigmoid output
tracks the simulator's staged IoU-vs-GT ``complete`` score
(reference evidence for the head: ``stage_data.py:256`` stages the score,
``experimental/train_region_grow_rnn.py:143-144`` consumed it).

Stdout is the checked-in record ``results/synthetic/completeness_head.txt``.
"""
import os
import sys
import time

import numpy as np

BASE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(BASE))
DATA = os.path.join(BASE, "data")
RESULTS = os.path.join(os.path.dirname(BASE), "results", "synthetic")
os.makedirs(RESULTS, exist_ok=True)

from learn_region_grow_tpu.engine.grow import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402

from learn_region_grow_tpu.data.simulator import stage_rooms  # noqa: E402
from learn_region_grow_tpu.data.synthetic import generate_furnished_rooms  # noqa: E402
from learn_region_grow_tpu.models import lrgnet  # noqa: E402
from learn_region_grow_tpu.train.trainer import (SampleSet, TrainConfig,  # noqa: E402
                                                 make_train_step)


def stage_area(rooms, seed):
    staged = stage_rooms([r[:, :6] for r in rooms],
                         [r[:, 6] for r in rooms],
                         [r[:, 7] for r in rooms], seed=seed)
    return SampleSet(*staged.split(), complete=staged.complete)


def main():
    t0 = time.time()
    rooms = generate_furnished_rooms(12, seed=7, scale=0.5,
                                     min_items=10, max_items=18)
    train_ss = stage_area(rooms[0:8], seed=0)
    train_ss.extend(stage_area(rooms[0:8], seed=1))
    eval_ss = stage_area(rooms[8:12], seed=0)
    print("staged %d train / %d eval samples in %.1fs"
          % (len(train_ss), len(eval_ss), time.time() - t0), flush=True)

    cfg = TrainConfig(batch_size=64, num_inlier=256, num_neighbor=256,
                      multiseed=0, completeness_head=True)
    init_fn, train_step, _ = make_train_step(cfg)
    params, opt = init_fn(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    t0 = time.time()
    steps = 1200
    for i in range(steps):
        idx = rng.choice(len(train_ss), cfg.batch_size,
                         replace=len(train_ss) < cfg.batch_size)
        batch = train_ss.batch(idx, cfg.num_inlier, cfg.num_neighbor, rng,
                               with_complete=True)
        params, opt, m = train_step(params, opt, batch)
        if i % 200 == 0:
            print("step %4d loss %.4f complete_loss %.4f"
                  % (i, float(m["loss"]), float(m["complete_loss"])),
                  flush=True)
    print("trained %d steps in %.1fs" % (steps, time.time() - t0),
          flush=True)

    # held-out read-back: predictions vs the simulator's staged IoU
    preds, tgts = [], []
    for lo in range(0, len(eval_ss), 256):
        idx = np.arange(lo, min(lo + 256, len(eval_ss)))
        batch = eval_ss.batch(idx, cfg.num_inlier, cfg.num_neighbor, rng,
                              with_complete=True)
        out = lrgnet.forward(params, batch["inlier"], batch["neighbor"],
                             cfg.model_config())
        preds.append(np.asarray(out["complete"]))
        tgts.append(np.asarray(batch["complete"]))
    pred = np.concatenate(preds)
    tgt = np.concatenate(tgts)
    r = float(np.corrcoef(pred, tgt)[0, 1])
    mse = float(np.mean((pred - tgt) ** 2))
    base_mse = float(np.var(tgt))  # predict-the-mean baseline
    # rank correlation without scipy dependence on exact ties
    pr = np.argsort(np.argsort(pred))
    tr = np.argsort(np.argsort(tgt))
    rho = float(np.corrcoef(pr, tr)[0, 1])
    print("held-out n=%d  pearson r=%.3f  spearman rho=%.3f  "
          "mse=%.4f (variance baseline %.4f)"
          % (len(pred), r, rho, mse, base_mse))
    # verdict line the record is judged on
    verdict = ("USEFUL" if r > 0.3 and mse < 0.8 * base_mse
               else "WEAK-SIGNAL" if r > 0.1 else "NO-SIGNAL")
    print("completeness head verdict: %s (the head %s a usable growth-"
          "quality signal on held-out rooms)"
          % (verdict, "provides" if verdict == "USEFUL" else
              "does not provide" if verdict == "NO-SIGNAL" else
              "provides only a weak"))


if __name__ == "__main__":
    main()
