"""Device-side region-growing simulator: staging as a jitted TPU program.

TPU-native counterpart of :mod:`.simulator` (reference semantics from
``stage_data.py:44-256``). The host simulator is a per-instance Python loop
over vectorized NumPy — faithful, but serial on a 1-core staging host. This
version runs the WHOLE mistake-injected growth simulation of a room as one
``lax.while_loop`` device program and ``vmap``s it over rooms, so every room
of an area simulates in parallel on one chip (the per-room sequential
seed/visited coupling is preserved inside each lane).

Transfer-minimal by construction: the device consumes only the voxel grid,
instance ids and a seed permutation (the point features never cross the
tunnel), and emits per-sample *index* lists into the room array. The host
reconstructs the staged sample arrays by gathering from its own copy of the
room and derives the add/remove labels from ``obj_id`` + the recorded
target — so the D2H traffic is two (S, max_points) int index slabs per room
instead of the full float sample tensors.

Semantics match the host simulator exactly, step for step:

* bbox(+-1 voxel) neighborhood, first-point-per-voxel equalized rooms;
* add/remove mistakes XOR-ed onto the class decision with per-instance
  probabilities drawn from {0.2,0.3,0.4} and decayed 0.01/recorded step;
* ``stuck`` (bbox stopped expanding) is sticky and forces perfect moves;
* samples recorded only when the neighbor set is nonempty, BEFORE the mask
  update; subsampled to ``max_points`` without replacement;
* termination priority: perfect growth (commit), else continue while
  ``steps < max_steps`` and a correct move exists, else commit only above
  ``cluster_threshold``; uncommitted points stay unvisited and are retried
  by later seeds of the same permutation.

The only divergence is the RNG: draws use the JAX PRNG, so mistake/subset
outcomes are distribution-equivalent, not bit-equal, to the host's
MT19937 stream. With mistake probabilities forced to zero the trajectory is
deterministic and the staged output is bit-identical to the host simulator
given the same seed order (the oracle test in
``tests/test_device_simulator.py``).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.features import RoomFeatures, prepare_room
from ..utils.io import StagedSamples
from .simulator import _Accumulator, apply_seed_augmentation


class SimState(NamedTuple):
    rng: jnp.ndarray
    visited: jnp.ndarray      # (P,) bool
    active: jnp.ndarray       # () bool — currently growing an instance
    sptr: jnp.ndarray         # () i32 — cursor into seed_order
    target: jnp.ndarray       # () i32
    gt: jnp.ndarray           # (P,) bool
    current: jnp.ndarray      # (P,) bool
    mn: jnp.ndarray           # (3,) i32 bbox
    mx: jnp.ndarray           # (3,) i32
    stuck: jnp.ndarray        # () bool — sticky (stage_data.py:217-218)
    steps: jnp.ndarray        # () i32
    add_p: jnp.ndarray        # () f32
    rmv_p: jnp.ndarray        # () f32
    scnt: jnp.ndarray         # () i32 samples written
    dropped: jnp.ndarray      # () i32 samples lost to the S cap
    icnt: jnp.ndarray         # () i32 instances committed
    inl_idx: jnp.ndarray      # (S, M) i32
    inl_cnt: jnp.ndarray      # (S,) i32
    nb_idx: jnp.ndarray       # (S, M) i32
    nb_cnt: jnp.ndarray       # (S,) i32
    complete: jnp.ndarray     # (S,) f32
    s_target: jnp.ndarray     # (S,) i32 — target id per sample (for labels)
    inst_steps: jnp.ndarray   # (I,) i32
    inst_target: jnp.ndarray  # (I,) i32


def _first_k_indices(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the first k set bits in natural (array) order, (k,) i32.

    Slots past the popcount are 0-filled; callers slice by the count. The
    natural order matches the reference's ``points[mask]`` recording order.
    """
    p = mask.shape[0]
    ordinal = jnp.cumsum(mask) - 1
    slot = jnp.where(mask & (ordinal < k), ordinal, k)
    return (jnp.zeros(k, jnp.int32)
            .at[slot].set(jnp.arange(p, dtype=jnp.int32), mode="drop"))


def _random_k_indices(rng: jnp.ndarray, mask: jnp.ndarray, k: int,
                      stratified: bool) -> jnp.ndarray:
    """k masked subset indices for the >max_points recording case.

    ``stratified=False``: exact without-replacement via top-k of random keys
    (the reference's ``rng.choice(n, k, replace=False)``); the bitonic
    top-k costs ~ms of latency per while-loop iteration on TPU.
    ``stratified=True`` (TPU): the Pallas rank-matching sampler — VMEM
    count passes, ~94% unique draws, more evenly spread than an iid subset
    (same documented deviation as the wave engine's fast path).
    """
    if stratified:
        from ..ops.masked_select import masked_sample_stratified_one
        return masked_sample_stratified_one(
            mask, jax.random.uniform(rng, (1, k)), k)
    keys = jnp.where(mask, jax.random.uniform(rng, mask.shape), jnp.inf)
    _, idx = jax.lax.top_k(-keys, k)
    return idx.astype(jnp.int32)


@lru_cache(maxsize=None)
def make_room_simulator(p: int, samples_cap: int, instances_cap: int,
                        max_points: int = 1024, cluster_threshold: int = 10,
                        max_steps: int = 500, stratified: bool = False):
    """Build the single-room device simulator for a P-point bucket.

    Returns ``run(voxels, obj, valid, seed_order, mistake_probs, key)`` —
    pure and vmap-able; ``mistake_probs`` (2,) f32 with a negative entry
    meaning "draw per instance from the reference schedule".
    """
    S, I, M = samples_cap, instances_cap, min(max_points, p)
    big = jnp.int32(2 ** 30)

    def start_instance(voxels, obj, valid, seed_order, mistake_probs,
                       st: SimState) -> SimState:
        """Advance to the next unvisited seed (stage_data.py:107-136)."""
        rng, k_probs = jax.random.split(st.rng)
        pos = jnp.arange(p)
        cand = (~st.visited)[seed_order] & (pos >= st.sptr) & valid[seed_order]
        has = jnp.any(cand)
        npos = jnp.argmax(cand)
        seed = seed_order[npos]
        target = obj[seed]
        drawn = jax.random.randint(k_probs, (2,), 2, 5).astype(jnp.float32) * 0.1
        probs = jnp.where(mistake_probs >= 0, mistake_probs, drawn)
        return st._replace(
            rng=rng,
            active=has,
            sptr=jnp.where(has, npos + 1, p).astype(jnp.int32),
            target=target,
            gt=valid & (obj == target),
            current=jnp.zeros(p, bool).at[seed].set(has),
            mn=voxels[seed], mx=voxels[seed],
            stuck=jnp.zeros((), bool),
            steps=jnp.zeros((), jnp.int32),
            add_p=probs[0], rmv_p=probs[1],
        )

    def grow_step(voxels, obj, valid, st: SimState) -> SimState:
        """One simulated grow step (stage_data.py:138-223)."""
        rng, k_am, k_rm, k_is, k_ns = jax.random.split(st.rng, 5)
        current, gt = st.current, st.gt

        neighbor = (valid & ~current & ~st.visited
                    & jnp.all(voxels >= st.mn - 1, axis=1)
                    & jnp.all(voxels <= st.mx + 1, axis=1))
        nbc = jnp.sum(neighbor)
        curc = jnp.sum(current)
        record = nbc > 0

        # mistakes are drawn with the PRE-decay probabilities
        # (stage_data.py:158-171 runs before the decay at :198-199)
        add_mist = jax.random.uniform(k_am, (p,)) < st.add_p
        rmv_mist = jax.random.uniform(k_rm, (p,)) < st.rmv_p
        expand_sel = neighbor & jnp.where(st.stuck, gt, gt ^ add_mist)
        reject_sel = current & jnp.where(st.stuck, ~gt, (~gt) ^ rmv_mist)

        # --- record the training sample (stage_data.py:173-196) ---
        store = record & (st.scnt < S)
        row = jnp.clip(st.scnt, 0, S - 1)
        inl_sel = jnp.where(curc > M,
                            _random_k_indices(k_is, current, M, stratified),
                            _first_k_indices(current, M))
        nb_sel = jnp.where(nbc > M,
                           _random_k_indices(k_ns, neighbor, M, stratified),
                           _first_k_indices(neighbor, M))
        iou = (jnp.sum(current & gt).astype(jnp.float32)
               / jnp.maximum(1, jnp.sum(current | gt)))

        def wr(buf, val):
            return buf.at[row].set(jnp.where(store, val, buf[row]))

        steps = st.steps + record
        decay = lambda q: jnp.where(record, jnp.maximum(q - 0.01, 0.0), q)

        # --- termination + mask update (stage_data.py:167,209-223) ---
        perfect = ~jnp.any(current ^ gt)
        can_cont = ((steps < max_steps)
                    & (jnp.any(neighbor & gt) | jnp.any(current & ~gt)))
        grow_more = ~perfect & can_cont
        early_commit = (~perfect & ~can_cont
                        & (curc > cluster_threshold))
        commit = perfect | early_commit

        new_cur = current | expand_sel
        new_cur = jnp.where(jnp.sum(reject_sel) < curc,
                            new_cur & ~reject_sel, new_cur)
        vmin = jnp.min(jnp.where(new_cur[:, None], voxels, big), axis=0)
        vmax = jnp.max(jnp.where(new_cur[:, None], voxels, -big), axis=0)
        now_stuck = st.stuck | ((~jnp.any(vmin < st.mn))
                                & (~jnp.any(vmax > st.mx)))

        irow = jnp.clip(st.icnt, 0, I - 1)

        def wi(buf, val):
            return buf.at[irow].set(jnp.where(commit & (st.icnt < I),
                                              val, buf[irow]))

        return st._replace(
            rng=rng,
            visited=jnp.where(commit, st.visited | current, st.visited),
            active=grow_more,
            current=jnp.where(grow_more, new_cur, current),
            mn=jnp.where(grow_more, vmin, st.mn),
            mx=jnp.where(grow_more, vmax, st.mx),
            stuck=jnp.where(grow_more, now_stuck, st.stuck),
            steps=steps,
            add_p=decay(st.add_p), rmv_p=decay(st.rmv_p),
            scnt=st.scnt + store,
            dropped=st.dropped + (record & ~store),
            icnt=st.icnt + (commit & (st.icnt < I)),
            inl_idx=wr(st.inl_idx, inl_sel),
            inl_cnt=wr(st.inl_cnt, jnp.minimum(curc, M).astype(jnp.int32)),
            nb_idx=wr(st.nb_idx, nb_sel),
            nb_cnt=wr(st.nb_cnt, jnp.minimum(nbc, M).astype(jnp.int32)),
            complete=wr(st.complete, iou),
            s_target=wr(st.s_target, st.target),
            inst_steps=wi(st.inst_steps, steps),
            inst_target=wi(st.inst_target, st.target),
        )

    def init_state(key):
        z = jnp.zeros
        return SimState(
            rng=key,
            visited=z(p, bool),
            active=jnp.zeros((), bool),
            sptr=jnp.zeros((), jnp.int32),
            target=jnp.zeros((), jnp.int32),
            gt=z(p, bool), current=z(p, bool),
            mn=z(3, jnp.int32), mx=z(3, jnp.int32),
            stuck=jnp.zeros((), bool),
            steps=jnp.zeros((), jnp.int32),
            add_p=jnp.zeros((), jnp.float32), rmv_p=jnp.zeros((), jnp.float32),
            scnt=jnp.zeros((), jnp.int32), dropped=jnp.zeros((), jnp.int32),
            icnt=jnp.zeros((), jnp.int32),
            inl_idx=z((S, M), jnp.int32), inl_cnt=z(S, jnp.int32),
            nb_idx=z((S, M), jnp.int32), nb_cnt=z(S, jnp.int32),
            complete=z(S, jnp.float32), s_target=z(S, jnp.int32),
            inst_steps=z(I, jnp.int32), inst_target=z(I, jnp.int32),
        )

    def extract(out: SimState) -> dict:
        return {
            "inl_idx": out.inl_idx, "inl_cnt": out.inl_cnt,
            "nb_idx": out.nb_idx, "nb_cnt": out.nb_cnt,
            "complete": out.complete, "s_target": out.s_target,
            "inst_steps": out.inst_steps, "inst_target": out.inst_target,
            "n_samples": out.scnt, "n_instances": out.icnt,
            "dropped": out.dropped,
        }

    def _body(voxels, obj, valid, seed_order, mistake_probs):
        def body(s: SimState):
            return jax.lax.cond(
                s.active,
                lambda t: grow_step(voxels, obj, valid, t),
                lambda t: start_instance(voxels, obj, valid, seed_order,
                                         mistake_probs, t),
                s)
        return body

    def run(voxels, obj, valid, seed_order, mistake_probs, key):
        def cond(s: SimState):
            return s.active | (s.sptr < p)

        out = jax.lax.while_loop(
            cond, _body(voxels, obj, valid, seed_order, mistake_probs),
            init_state(key))
        return extract(out)

    def run_chunk(voxels, obj, valid, seed_order, mistake_probs, st,
                  chunk_iters):
        """Advance the simulation AT MOST ``chunk_iters`` iterations and
        return the updated state: the RE-ENTRANT runner for rooms whose
        full simulation outlives the remote worker's per-execute watchdog
        (round 5: a 630k-eq-point room's single execute was killed at
        ~282 s). Identical per-iteration semantics to ``run`` — the full
        loop is just split across executes, with state device-resident
        between them."""
        body = _body(voxels, obj, valid, seed_order, mistake_probs)

        def cond(cs):
            c, s = cs
            return (c < chunk_iters) & (s.active | (s.sptr < p))

        def cbody(cs):
            c, s = cs
            return c + 1, body(s)

        _, out = jax.lax.while_loop(cond, cbody, (jnp.int32(0), st))
        return out

    run.init_state = init_state
    run.run_chunk = run_chunk
    run.extract = extract
    return run


def _bucket(n: int, minimum: int = 1024) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@partial(jax.jit, static_argnums=(0,))
def _run_batch(sim, voxels, obj, valid, seed_order, probs, keys):
    return jax.vmap(sim)(voxels, obj, valid, seed_order, probs, keys)


@lru_cache(maxsize=8)
def _chunked_fns(sim, chunk_iters: int):
    init = jax.jit(jax.vmap(sim.init_state))
    step = jax.jit(jax.vmap(
        lambda v, o, va, so, pr, st: sim.run_chunk(v, o, va, so, pr, st,
                                                   chunk_iters)))
    extract = jax.jit(jax.vmap(sim.extract))
    return init, step, extract


def _run_chunked(sim, voxels, obj, valid, seed_order, probs, keys, p,
                 chunk_iters: int = 512):
    """Drive the re-entrant simulator: bounded-iteration executes with
    device-resident state between them (the remote worker kills single
    executes after ~282 s at the 2^20 bucket — round 5). Bit-identical to
    ``_run_batch``: the same iteration function, split across executes."""
    init, step, extract = _chunked_fns(sim, chunk_iters)
    dev = [jax.device_put(a) for a in (voxels, obj, valid, seed_order,
                                       probs)]
    st = init(keys)
    while True:
        st = step(*dev, st)
        act, sptr = jax.device_get((st.active, st.sptr))
        if not np.any(act | (sptr < p)):
            return extract(st)


def simulate_rooms_device(feats: Sequence[RoomFeatures],
                          rng: np.random.RandomState,
                          samples_cap: int = 4096,
                          instances_cap: int = 4096,
                          max_points: int = 1024,
                          cluster_threshold: int = 10,
                          max_steps: int = 500,
                          mistake_probs: Optional[Tuple[float, float]] = None,
                          batch_rooms: int = 8,
                          seed_orders: Optional[List[np.ndarray]] = None,
                          stratified: Optional[bool] = None,
                          uniform_bucket: bool = False,
                          ) -> List[dict]:
    """Run the device simulator over prepared rooms; returns per-room host
    dicts (index buffers + counts) in the input room order.

    ``rng`` drives the seed permutations and the device PRNG keys so one
    integer seed reproduces the full staging, as in the host path.
    """
    n_rooms = len(feats)
    if seed_orders is None:
        seed_orders = [rng.choice(len(rf.points), len(rf.points),
                                  replace=False).astype(np.int32)
                       for rf in feats]
    keys = [jax.random.PRNGKey(int(rng.randint(0, 2 ** 31 - 1)))
            for _ in range(n_rooms)]
    probs = np.float32(mistake_probs if mistake_probs is not None
                       else (-1.0, -1.0))

    if stratified is None:
        stratified = jax.default_backend() == "tpu"

    # ``uniform_bucket`` pads every room to the area's max bucket so mixed
    # sizes share one program instead of one per power-of-2 bucket. Measured
    # NEGATIVE on v5e (28.6s vs 15.4s for 8 rooms spanning 4k-64k): per-op
    # cost scales with the padded P and dominates the saved program
    # serialization, so per-size buckets stay the default.
    buckets = {}
    if uniform_bucket:
        top = max(_bucket(len(rf.points)) for rf in feats)
        buckets[top] = list(range(n_rooms))
    else:
        for i, rf in enumerate(feats):
            buckets.setdefault(_bucket(len(rf.points)), []).append(i)

    results: List[Optional[dict]] = [None] * n_rooms
    for psize, ids in sorted(buckets.items()):
        # the stratified Pallas sampler crashed the remote worker at the
        # 2^20 bucket (round 5: compile-time scoped-vmem OOM, then a
        # runtime kernel fault after raising the limit); above the fused
        # kernel's VMEM regime fall back to the exact top-k XLA sampler —
        # the HOST simulator's semantics, so area-8-scale staging is the
        # more reference-faithful path anyway
        sim = make_room_simulator(psize, samples_cap, instances_cap,
                                  max_points=max_points,
                                  cluster_threshold=cluster_threshold,
                                  max_steps=max_steps,
                                  stratified=stratified
                                  and psize <= 2 ** 19)
        # Bound the padded points per device program: vmapped lanes multiply
        # per-iteration work, and a single execute running ~10 min crashes
        # the remote TPU worker (observed at 3 lanes x 262144;
        # docs/tpu_pitfalls.md). 512k padded points per program keeps the
        # largest batches under ~2 minutes.
        eff_batch = max(1, min(batch_rooms, (1 << 19) // psize))
        for lo in range(0, len(ids), eff_batch):
            grp = ids[lo:lo + eff_batch]
            g = len(grp)
            voxels = np.full((g, psize, 3), 2 ** 30, np.int32)
            obj = np.full((g, psize), -1, np.int32)
            valid = np.zeros((g, psize), bool)
            order = np.full((g, psize), psize - 1, np.int32)
            for j, i in enumerate(grp):
                rf = feats[i]
                n = len(rf.points)
                voxels[j, :n] = rf.voxels
                obj[j, :n] = rf.obj_id
                valid[j, :n] = True
                # pad the permutation with an arbitrary valid=False slot
                order[j, :n] = seed_orders[i]
            run_args = (jnp.asarray(voxels), jnp.asarray(obj),
                        jnp.asarray(valid), jnp.asarray(order),
                        jnp.tile(jnp.asarray(probs), (g, 1)),
                        jnp.stack([keys[i] for i in grp]))
            if psize > 2 ** 19:
                # single-execute simulation of a 2^20-bucket room outlives
                # the remote worker's watchdog; run it re-entrantly
                out = _run_chunked(sim, *run_args, psize)
            else:
                out = _run_batch(sim, *run_args)
            # Slim the D2H transfer: the (S, M) index slabs are padded far
            # past what any room used (hundreds of MB over the tunnel).
            # Fetch the tiny counts first, slice the big buffers to the used
            # rows/columns on device, and ship indices as u16 when they fit.
            counts = jax.device_get((out["n_samples"], out["n_instances"],
                                     jnp.maximum(jnp.max(out["inl_cnt"]),
                                                 jnp.max(out["nb_cnt"]))))
            srows = max(1, int(np.max(counts[0])))
            irows = max(1, int(np.max(counts[1])))
            mcols = max(1, int(counts[2]))
            it = jnp.uint16 if psize <= 2 ** 16 else jnp.int32
            out = jax.device_get({
                "inl_idx": out["inl_idx"][:, :srows, :mcols].astype(it),
                "nb_idx": out["nb_idx"][:, :srows, :mcols].astype(it),
                "inl_cnt": out["inl_cnt"][:, :srows],
                "nb_cnt": out["nb_cnt"][:, :srows],
                "complete": out["complete"][:, :srows],
                "s_target": out["s_target"][:, :srows],
                "inst_steps": out["inst_steps"][:, :irows],
                "inst_target": out["inst_target"][:, :irows],
                "n_samples": out["n_samples"],
                "n_instances": out["n_instances"],
                "dropped": out["dropped"],
            })
            for j, i in enumerate(grp):
                results[i] = {k: np.asarray(v[j]) for k, v in out.items()}
    return results  # type: ignore[return-value]


def stage_rooms_device(rooms, obj_ids, cls_ids,
                       resolution: float = 0.1,
                       seed: Optional[int] = None,
                       max_points: int = 1024,
                       cluster_threshold: int = 10,
                       max_steps: int = 500,
                       verbose: bool = False,
                       samples_cap: int = 4096,
                       instances_cap: int = 4096,
                       mistake_probs: Optional[Tuple[float, float]] = None,
                       batch_rooms: int = 8) -> StagedSamples:
    """Device-simulated drop-in for :func:`.simulator.stage_rooms`."""
    rng = np.random.RandomState(seed if seed is not None else 0)
    feats: List[RoomFeatures] = []
    for room_id in range(len(rooms)):
        raw = np.asarray(rooms[room_id], dtype=np.float64)
        if seed is not None:
            raw = apply_seed_augmentation(raw, seed)
        feats.append(prepare_room(raw, obj_ids[room_id], cls_ids[room_id],
                                  resolution=resolution, feature_size=13))
    # permutations first, then device keys, so one integer seed fixes both
    seed_orders = [rng.choice(len(rf.points), len(rf.points),
                              replace=False).astype(np.int32)
                   for rf in feats]
    results = simulate_rooms_device(
        feats, rng, samples_cap=samples_cap, instances_cap=instances_cap,
        max_points=max_points, cluster_threshold=cluster_threshold,
        max_steps=max_steps, mistake_probs=mistake_probs,
        batch_rooms=batch_rooms, seed_orders=seed_orders)

    acc = _Accumulator()
    for room_id, (rf, res) in enumerate(zip(feats, results)):
        ns = int(res["n_samples"])
        if int(res["dropped"]) > 0:
            raise ValueError(
                f"room {room_id}: {int(res['dropped'])} samples exceeded "
                f"samples_cap={samples_cap}; raise it")
        ni = int(res["n_instances"])
        pts, obj = rf.points, rf.obj_id
        for s in range(ns):
            tgt = int(res["s_target"][s])
            ic = int(res["inl_cnt"][s])
            ii = res["inl_idx"][s, :ic]
            acc.points.append(pts[ii].copy())
            acc.count.append(ic)
            acc.remove.append((obj[ii] != tgt).astype(np.int32))
            nc = int(res["nb_cnt"][s])
            ni_idx = res["nb_idx"][s, :nc]
            acc.neighbor_points.append(pts[ni_idx].copy())
            acc.neighbor_count.append(nc)
            acc.add.append((obj[ni_idx] == tgt).astype(np.int32))
            acc.complete.append(float(res["complete"][s]))
        for k in range(ni):
            acc.steps.append(int(res["inst_steps"][k]))
            if verbose:
                print("room %d target %d: %d steps" % (
                    room_id, int(res["inst_target"][k]),
                    int(res["inst_steps"][k])))
    return acc.finalize()
