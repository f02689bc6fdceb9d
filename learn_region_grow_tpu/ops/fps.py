"""Farthest point sampling (TPU kernel tier).

Semantics match the reference CUDA op (``tf_ops/sampling/tf_sampling_g.cu:
105-170``): greedy max-of-min-squared-distance, always seeded at index 0, no
gradient. Two implementations:

* ``farthest_point_sample`` — pure-XLA ``lax.fori_loop``; the compiler keeps
  the (b, n) min-distance state on-chip and fuses the distance update with
  the argmax reduction.
* ``farthest_point_sample_pallas`` — explicit Pallas kernel. Points are
  pre-packed to a lane-friendly (8, n) layout (xyz in rows 0-2, zero
  padding elsewhere so padded rows contribute nothing to distances); the
  min-distance state lives in VMEM scratch across all npoint iterations, so
  the sequential-greedy loop runs with zero HBM traffic per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnums=1)
def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """xyz (b, n, 3) -> (b, npoint) int32 indices."""
    b, n, _ = xyz.shape

    def per_batch(pts):
        def body(i, carry):
            td, last, out = carry
            d = jnp.sum((pts - pts[last]) ** 2, axis=1)
            td = jnp.minimum(td, d)
            nxt = jnp.argmax(td).astype(jnp.int32)
            out = out.at[i].set(nxt)
            return td, nxt, out

        td0 = jnp.full((n,), jnp.inf, jnp.float32)
        out0 = jnp.zeros((npoint,), jnp.int32)
        # out[0] = 0 (reference starts at index 0); loop fills 1..npoint-1
        _, _, out = jax.lax.fori_loop(1, npoint, body,
                                      (td0, jnp.int32(0), out0))
        return out

    return jax.vmap(per_batch)(xyz.astype(jnp.float32))


def _fps_kernel(xyz_ref, out_ref, td_ref, *, npoint: int):
    """One batch row per grid step. xyz_ref (1, 8, n) in VMEM; td state in
    VMEM scratch. TPU cannot scalar-store to VMEM, so each selected index is
    committed with a masked vector read-modify-write of the output row
    (np_pad elements on the VPU — negligible next to the distance update)."""
    td_ref[:] = jnp.full_like(td_ref, 1e30)
    out_ref[...] = jnp.zeros_like(out_ref)  # slot 0 = index 0 (reference seed)
    n_pad = td_ref.shape[-1]
    np_pad = out_ref.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, np_pad), 1)
    pt_cols = jax.lax.broadcasted_iota(jnp.int32, (8, n_pad), 1)

    def body(i, last):
        # dynamic-slice of a traced column crashes the Mosaic backend here;
        # a masked reduction is the same O(n) VPU cost and compiles
        ref_col = jnp.sum(jnp.where(pt_cols == last, xyz_ref[0], 0.0),
                          axis=1, keepdims=True)      # (8, 1)
        diff = xyz_ref[0] - ref_col
        d2 = jnp.sum(diff * diff, axis=0, keepdims=True)         # (1, n)
        td = jnp.minimum(td_ref[0:1], d2)
        td_ref[0:1] = td
        nxt = jnp.argmax(td).astype(jnp.int32)
        out_ref[0, 0:1, :] = jnp.where(cols == i, nxt, out_ref[0, 0:1, :])
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.int32(0))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnums=1)
def farthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Pallas FPS; falls back to the XLA path on non-TPU backends."""
    b, n, _ = xyz.shape
    if jax.default_backend() != "tpu":
        return farthest_point_sample(xyz, npoint)
    # pack to (b, 8, n): rows 0-2 = xyz, rest zero (zero rows add 0 to d2);
    # n and npoint padded to the (8, 128) f32 tile lanes
    n_pad = _round_up(n, 128)
    np_pad = _round_up(npoint, 128)
    packed = jnp.zeros((b, 8, n_pad), jnp.float32)
    packed = packed.at[:, :3, :n].set(
        jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1)))
    if n_pad > n:
        # padding columns mirror point 0: their min-distance collapses to 0
        # after the (always-first) selection of index 0, so they never win
        packed = packed.at[:, :3, n:].set(
            jnp.transpose(xyz[:, :1, :].astype(jnp.float32), (0, 2, 1)))
    kernel = functools.partial(_fps_kernel, npoint=npoint)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 8, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, np_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, np_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, n_pad), jnp.float32)],
    )(packed)
    return out[:, 0, :npoint]


def gather_point(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(b, n, 3), (b, m) -> (b, m, 3); grad is the autodiff scatter-add
    (matches the reference's atomicAdd grad, ``tf_sampling_g.cu:172-192``)."""
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def prob_sample(inp: jnp.ndarray, inpr: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF categorical sampling (``tf_sampling_g.cu:7-104``).

    inp (b, n) unnormalized probs, inpr (b, m) uniforms -> (b, m) int32.
    """
    cdf = jnp.cumsum(inp, axis=1)
    total = cdf[:, -1:]
    r = inpr * total
    idx = jax.vmap(lambda c, q: jnp.searchsorted(c, q))(cdf, r)
    return jnp.clip(idx, 0, inp.shape[1] - 1).astype(jnp.int32)
