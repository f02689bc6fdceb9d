"""CLI: kernel-tier micro-benchmarks.

Capability parity with the reference's standalone CUDA kernel harnesses
(``tf_ops/grouping/test/`` — CPU vs CUDA query_ball/selection_sort timing,
SURVEY.md C17): times each op on the current backend, comparing
implementation variants where they exist (Pallas vs fused-XLA FPS).
"""

import argparse
import time

import numpy as np


def timeit(fn, *args, reps=5, chain=None):
    """Pipelined THROUGHPUT per call; pass ``chain`` (maps output -> a
    perturbation of the first arg) to serialize calls and measure LATENCY
    instead (matters inside sequential loops — see
    docs/pallas_grow_kernel_design.md)."""
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.time()
    a0 = args[0]
    for _ in range(reps):
        out = fn(a0, *args[1:])
        if chain is not None:
            a0 = chain(a0, out)
    jax.block_until_ready(out)
    return (time.time() - t) / reps * 1000


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--nsample", type=int, default=32)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..engine.grow import enable_compilation_cache
    enable_compilation_cache()
    from ..ops import (farthest_point_sample, farthest_point_sample_pallas,
                       gather_point, group_point, knn_point,
                       query_ball_point, three_interpolate, three_nn)

    print("backend:", jax.devices()[0])
    rng = np.random.RandomState(0)
    b, n, m, ns = args.batch, args.n, args.m, args.nsample
    xyz = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    feats = jnp.asarray(rng.rand(b, n, 64).astype(np.float32))

    import jax.numpy as _jnp

    def chain_fps(x, out):
        # serialize: perturb input by a value derived from the output
        return x + (out[0, 0] % 2).astype(_jnp.float32) * 1e-7

    for tag, f in (("xla", farthest_point_sample),
                   ("pallas", farthest_point_sample_pallas)):
        t = timeit(lambda x: f(x, m), xyz, reps=args.reps)
        tl = timeit(lambda x: f(x, m), xyz, reps=args.reps, chain=chain_fps)
        print("fps (%s)%s b=%d n=%d m=%d: %8.2f ms tput / %8.2f ms latency"
              % (tag, " " * (7 - len(tag)), b, n, m, t, tl))

    idx_fps = farthest_point_sample(xyz, m)
    new_xyz = gather_point(xyz, idx_fps)
    t = timeit(lambda a, c: query_ball_point(0.2, ns, a, c), xyz, new_xyz,
               reps=args.reps)
    print("query_ball       b=%d n=%d m=%d ns=%d: %8.2f ms" % (b, n, m, ns, t))

    idx, _ = query_ball_point(0.2, ns, xyz, new_xyz)
    t = timeit(group_point, feats, idx, reps=args.reps)
    print("group_point      b=%d n=%d m=%d ns=%d c=64: %8.2f ms" % (
        b, n, m, ns, t))

    t = timeit(three_nn, xyz, new_xyz, reps=args.reps)
    print("three_nn         b=%d n=%d m=%d: %8.2f ms" % (b, n, m, t))

    d, i3 = three_nn(xyz, new_xyz)
    w = 1.0 / jnp.maximum(d, 1e-10)
    w = w / w.sum(-1, keepdims=True)
    small = jnp.asarray(rng.rand(b, m, 64).astype(np.float32))
    t = timeit(three_interpolate, small, i3, w, reps=args.reps)
    print("three_interp     b=%d n=%d m=%d c=64: %8.2f ms" % (b, n, m, t))

    t = timeit(lambda a, c: knn_point(16, a, c), xyz, new_xyz, reps=args.reps)
    print("knn_point(k=16)  b=%d n=%d m=%d: %8.2f ms" % (b, n, m, t))


if __name__ == "__main__":
    main()
