"""Native (C++) host-tier kernels with automatic NumPy fallback.

Build with ``learn_region_grow_tpu/native/build_native.sh``; everything
works without it (``HAVE_NATIVE`` is False and callers use the vectorized
NumPy paths). The native ``neighbor_gather`` uses its own xorshift PRNG —
deterministic per seed, but a different stream than ``np.random``.
"""

try:
    from . import _lrg_native  # type: ignore

    HAVE_NATIVE = True
    moments27 = _lrg_native.moments27
    neighbor_gather = _lrg_native.neighbor_gather
except ImportError:  # pragma: no cover - depends on local build
    HAVE_NATIVE = False
    moments27 = None
    neighbor_gather = None
