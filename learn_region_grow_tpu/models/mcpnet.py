"""MCPNet — Multi-view Context Pooling metric-learning embedder.

Parity with the reference (``learn_region_grow_util.py:191-232``): a
per-point 50-neighbor relative point set runs through 2 pointwise conv
layers (hidden 200) + max-pool; the context feature concats with the point's
own non-xy features (z, rgb for feature_size=6); 2 FC layers emit a 10-d
L2-normalized embedding trained with semihard triplet loss, Adam(1e-3).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .metric_losses import triplet_semihard_loss

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MCPNetConfig:
    num_neighbors: int = 50
    feature_size: int = 6        # neighbor features: xyz(+rgb)
    hidden_size: int = 200
    embedding_size: int = 10

    @property
    def point_feature_size(self) -> int:
        # the point's own feature drops xy (learn_region_grow_util.py:193)
        return self.feature_size - 2


def init_params(rng: jax.Array, cfg: MCPNetConfig) -> Params:
    init = jax.nn.initializers.glorot_uniform()
    r = jax.random.split(rng, 4)
    return {
        "k1": {"w": init(r[0], (cfg.feature_size, cfg.hidden_size)),
               "b": jnp.zeros((cfg.hidden_size,))},
        "k2": {"w": init(r[1], (cfg.hidden_size, cfg.hidden_size)),
               "b": jnp.zeros((cfg.hidden_size,))},
        "k3": {"w": init(r[2], (cfg.point_feature_size + cfg.hidden_size,
                                cfg.hidden_size)),
               "b": jnp.zeros((cfg.hidden_size,))},
        "k4": {"w": init(r[3], (cfg.hidden_size, cfg.embedding_size)),
               "b": jnp.zeros((cfg.embedding_size,))},
    }


def forward(params: Params, point_feats: jnp.ndarray,
            neighbor_feats: jnp.ndarray) -> jnp.ndarray:
    """point_feats (B, F-2), neighbor_feats (B, K, F) -> (B, E) normalized."""
    h = jax.nn.relu(jnp.einsum("bkc,cd->bkd", neighbor_feats,
                               params["k1"]["w"],
                               preferred_element_type=jnp.float32)
                    + params["k1"]["b"])
    h = jax.nn.relu(jnp.einsum("bkc,cd->bkd", h, params["k2"]["w"],
                               preferred_element_type=jnp.float32)
                    + params["k2"]["b"])
    context = jnp.max(h, axis=1)
    concat = jnp.concatenate([point_feats, context], axis=1)
    f3 = jax.nn.relu(concat @ params["k3"]["w"] + params["k3"]["b"])
    f4 = f3 @ params["k4"]["w"] + params["k4"]["b"]
    return f4 / jnp.maximum(jnp.linalg.norm(f4, axis=1, keepdims=True),
                            1e-12)


def loss_fn(params: Params, batch: Dict[str, jnp.ndarray]
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    emb = forward(params, batch["points"], batch["neighbors"])
    return triplet_semihard_loss(batch["labels"], emb), emb


@functools.partial(jax.jit,
                   static_argnames=("nsample", "radius", "chunk", "window"))
def _embed_room_program(params: Params, pts_xs: jnp.ndarray,
                        valid_xs: jnp.ndarray, lo_arr: jnp.ndarray, *,
                        nsample: int, radius: float, chunk: int,
                        window: int) -> jnp.ndarray:
    """Whole-room embedding as ONE device program (round-3 verdict ask #4:
    the host 50-NN + per-batch tunnel transfers made the C30 path 522 pts/s
    end-to-end).

    pts_xs (P, 6) f32 sorted by x (padding at the end), valid_xs (P,) bool,
    lo_arr (P // chunk,) i32 candidate-window starts -> (P, E) embeddings
    in the sorted order.

    Neighbor selection: an evenly-strided sample of the query's radius ball
    taken in x-scan order. The reference's CUDA ball query keeps the first
    ``nsample`` hits in array order (``tf_ops/grouping/tf_grouping_g.cu:
    3-36``) — an arbitrary, scan-order-biased subset; the host stager draws
    50 random 27-voxel-neighborhood candidates (kept exactly in
    ``data/mcp_staging.py::neighbor_sets``). This inference path spreads the
    ``nsample`` picks uniformly across ALL hits instead, which is both a
    better sample of the ball and TPU-shaped: queries and candidates are
    contiguous ``dynamic_slice`` windows of the x-sorted array (host
    precomputes ``lo_arr`` so every hit of a query chunk lands in its
    window), hits rank by ``cumsum``, and each pick gathers through a
    one-hot (chunk, window) @ (window, 6) MXU matmul — no ``top_k``, no
    gathers (a full-width ``lax.top_k`` here measured 341 s for 4 rooms).
    A query always hits itself, so short balls repeat real hits (max-pool
    in ``forward`` makes duplicates harmless).
    """
    r2 = jnp.float32(radius) * jnp.float32(radius)
    n_chunks = pts_xs.shape[0] // chunk

    def one_chunk(_, ci):
        q = jax.lax.dynamic_slice(pts_xs, (ci * chunk, 0), (chunk, 6))
        lo = lo_arr[ci]
        cand = jax.lax.dynamic_slice(pts_xs, (lo, 0), (window, 6))
        cval = jax.lax.dynamic_slice(valid_xs, (lo,), (window,))
        d2 = jnp.sum((q[:, None, :3] - cand[None, :, :3]) ** 2, axis=-1)
        hit = (d2 < r2) & cval[None, :]
        rank = jnp.cumsum(hit.astype(jnp.int32), axis=1)
        nhits = rank[:, -1:]                             # >= 1 (self-hit)

        # scan (not a Python unroll) over the nsample strided picks: the
        # axon remote-compile worker's program-preparation time scales
        # badly with graph size — 50 unrolled compare+matmul pairs made
        # THIS tiny program slower to prepare than the 2,000-line grow
        # kernel (90-600 s observed); the rolled form prepares in seconds
        def one_pick(_, s):
            tgt = (s * nhits) // nsample + 1             # strided ranks
            oh = (hit & (rank == tgt)).astype(jnp.float32)
            return None, oh @ cand                       # (chunk, 6)

        _, cols = jax.lax.scan(one_pick, None,
                               jnp.arange(nsample, dtype=jnp.int32))
        nbr = jnp.moveaxis(cols, 0, 1) - q[:, None, :]   # relative xyzrgb
        return None, forward(params, q[:, 2:6], nbr)

    _, embs = jax.lax.scan(one_chunk, None,
                           jnp.arange(n_chunks, dtype=jnp.int32))
    return embs.reshape(n_chunks * chunk, -1)


def embed_room(params: Params, cfg: MCPNetConfig, points: jnp.ndarray,
               radius: float = 0.45, chunk: int = 512) -> jnp.ndarray:
    # chunk=512 (not 1024): the candidate window is the chunk's x-span
    # plus 2*radius of dilation, so halving the chunk nearly halves the
    # dominant per-query compare work (p * window * nsample) in dense rooms
    """Per-point MCPNet embeddings for one room, fully on device.

    points (N, 6) [xyz, rgb] -> (N, E) f32. Sorts by x, pads N to a
    power-of-two bucket, and scans ``chunk`` queries at a time against a
    contiguous x-window of candidates (width = the widest chunk's
    radius-dilated x-range, rounded to a power of two — one compile per
    (bucket, window) pair). ``radius`` defaults to 1.5 coarse-grid cells
    (the host stager draws from the 27-cell neighborhood of a 0.3 grid).
    """
    import numpy as np

    pts = np.asarray(points, np.float32)
    n = len(pts)
    p = max(1024, 1 << int(np.ceil(np.log2(max(n, 2)))))
    chunk = min(chunk, p)
    order = np.argsort(pts[:, 0], kind="stable")
    xs = pts[order]
    padded = np.zeros((p, 6), np.float32)
    padded[:n] = xs
    valid = np.zeros(p, bool)
    valid[:n] = True

    # per-chunk candidate window [lo, lo+window): covers every point within
    # ``radius`` in x of any query in the chunk (hence every ball hit)
    n_chunks = p // chunk
    x = xs[:, 0]
    starts = np.arange(n_chunks) * chunk
    ends = np.minimum(starts + chunk, n)
    live = starts < n
    qmin = x[np.minimum(starts, n - 1)]
    qmax = x[np.maximum(ends - 1, 0)]
    lo = np.searchsorted(x, qmin - radius, "left").astype(np.int64)
    hi = np.searchsorted(x, qmax + radius, "right").astype(np.int64)
    lo[~live] = 0
    hi[~live] = 1
    width = int(max((hi - lo).max(), 512))
    window = min(1 << int(np.ceil(np.log2(width))), p)
    lo = np.minimum(lo, p - window).astype(np.int32)

    emb = _embed_room_program(params, jnp.asarray(padded),
                              jnp.asarray(valid), jnp.asarray(lo),
                              nsample=cfg.num_neighbors,
                              radius=float(radius), chunk=int(chunk),
                              window=int(window))
    out = np.empty((n, cfg.embedding_size), np.float32)
    out[order] = np.asarray(jax.device_get(emb))[:n]
    return out
