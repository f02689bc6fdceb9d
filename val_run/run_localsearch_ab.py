"""Real-chip local-search A/B: fused kernel vs XLA lane engines
(round-5 verdict ask #7).

The fused restart/beam paths carry two documented deviations from the
reference local-search semantics (PARITY.md): parallel restart lanes
each get their own ``max_steps`` budget (the reference shares one budget
across serial attempts, ``test_random_restart.py:160-197``), and the
fused beam adds a rollout-budget safety cap absent upstream
(``test_beam_search.py:271-276`` has only the stuck rule). Rounds 3-4
backed the "quality-neutral" claim with an interpret-mode 2-room A/B;
this script replaces that with a REAL-CHIP comparison on >= 8 held-out
rooms:

    restart R=5:  xla-np vs fused-np, xla-ml vs fused-ml, fused-cp
    beam 3x3:     xla-np vs fused-np, xla-ml vs fused-ml, fused-cp

Same rooms, same checkpoint for every cell (the flagship — 'cp' rows
need its completeness head and are skipped with a note on checkpoints
without one). Prints a table and writes
``results/synthetic/localsearch_ab.txt``; PARITY.md cites it.

Usage: python val_run/run_localsearch_ab.py [n_rooms]
"""
import os
import sys
import time

import numpy as np

BASE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(os.path.dirname(BASE), "results", "synthetic")
sys.path.insert(0, os.path.dirname(BASE))

from learn_region_grow_tpu.engine.grow import (GrowConfig,
                                               enable_compilation_cache,
                                               segment_rooms,
                                               segment_rooms_fused)
enable_compilation_cache()

from learn_region_grow_tpu.core import prepare_room
from learn_region_grow_tpu.data.synthetic import generate_rooms
from learn_region_grow_tpu.engine.beam import segment_rooms_beam
from learn_region_grow_tpu.eval.metrics import room_metrics
from learn_region_grow_tpu.models import lrgnet
from learn_region_grow_tpu.train.checkpoint import load_checkpoint

N_ROOMS = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def main():
    params, _, _ = load_checkpoint(
        os.path.join(os.path.dirname(BASE), "models",
                     "synthetic_pretrained.npz"))
    mcfg = lrgnet.LrgNetConfig(feature_size=13)
    has_cp = "complete_head" in params
    # seed 1300: disjoint from the bench set (42), scale curve (100),
    # pretrain streams (300/600/700/800), outdoor (900)
    rooms = generate_rooms(N_ROOMS, seed=1300, scale=0.6)
    feats = [prepare_room(r[:, :6], r[:, 6], r[:, 7], resolution=0.1)
             for r in rooms]
    eq = sum(len(f.points) for f in feats)
    print(f"{N_ROOMS} rooms, {eq} eq points, cp head: {has_cp}",
          flush=True)
    gcfg = GrowConfig(num_inlier=512, num_neighbor=512, max_steps=500,
                      track_accuracy=False)

    def cell(run):
        run()                                       # compile/warmup
        t = float("inf")
        res = None
        for _ in range(3):
            t0 = time.time()
            r = run()
            dt = time.time() - t0
            if dt < t:
                t, res = dt, r
        per = [room_metrics(f.obj_id, r.cluster_label)[0].nmi
               for f, r in zip(feats, res)]
        return t, float(np.mean(per)), float(np.std(per)), per

    lines = [
        "# local-search A/B, fused kernel vs XLA lane engines "
        "(v5e real chip, min-of-3,",
        "# %d held-out rooms seed 1300, flagship checkpoint; round-5 "
        "verdict ask #7)" % N_ROOMS,
        "# variant        engine scoring    secs   NMI mean+-std",
    ]
    cells = {}
    for scoring in ("np", "ml"):
        cells[("restart", "xla", scoring)] = cell(
            lambda: segment_rooms(params, mcfg, feats, gcfg,
                                  num_restarts=5, scoring=scoring))
        cells[("restart", "fused", scoring)] = cell(
            lambda: segment_rooms_fused(params, mcfg, feats, gcfg,
                                        num_restarts=5, scoring=scoring))
        cells[("beam", "xla", scoring)] = cell(
            lambda: segment_rooms_beam(params, mcfg, feats, gcfg,
                                       beam_width=3, search_width=3,
                                       scoring=scoring))
        cells[("beam", "fused", scoring)] = cell(
            lambda: segment_rooms_fused(params, mcfg, feats, gcfg,
                                        beam_width=3, search_width=3,
                                        scoring=scoring))
    if has_cp:
        cells[("restart", "fused", "cp")] = cell(
            lambda: segment_rooms_fused(params, mcfg, feats, gcfg,
                                        num_restarts=5, scoring="cp"))
        cells[("beam", "fused", "cp")] = cell(
            lambda: segment_rooms_fused(params, mcfg, feats, gcfg,
                                        beam_width=3, search_width=3,
                                        scoring="cp"))
    for (variant, engine, scoring), (t, mu, sd, per) in cells.items():
        line = ("%-12s %-6s %-7s %7.2fs  %.3f+-%.3f" % (
            variant, engine, scoring, t, mu, sd))
        print(line, flush=True)
        lines.append(line)
    # per-scoring deltas (the claim under test)
    for variant in ("restart", "beam"):
        for scoring in ("np", "ml"):
            d = (cells[(variant, "fused", scoring)][1]
                 - cells[(variant, "xla", scoring)][1])
            line = ("# delta %s/%s: fused - xla = %+.3f NMI" % (
                variant, scoring, d))
            print(line, flush=True)
            lines.append(line)
    with open(os.path.join(RESULTS, "localsearch_ab.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote results/synthetic/localsearch_ab.txt", flush=True)


if __name__ == "__main__":
    main()
