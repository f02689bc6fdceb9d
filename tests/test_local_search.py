"""Beam-search and random-restart engine variants."""

import numpy as np
import pytest

from learn_region_grow_tpu.core import prepare_room
from learn_region_grow_tpu.engine.beam import segment_rooms_beam
from learn_region_grow_tpu.engine.grow import GrowConfig, segment_rooms
from learn_region_grow_tpu.eval.metrics import room_metrics


@pytest.fixture(scope="module")
def room_and_model(tiny_rooms, trained):
    room = tiny_rooms[0]
    rf = prepare_room(room[:, :6], room[:, 6], room[:, 7], resolution=0.1)
    return rf, trained


def test_random_restart(room_and_model):
    rf, (params, mcfg) = room_and_model
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128, max_steps=100)
    for scoring in ("np", "ml"):
        results = segment_rooms(params, mcfg, [rf], gcfg, num_restarts=3,
                                scoring=scoring)
        m, _ = room_metrics(rf.obj_id, results[0].cluster_label)
        assert m.nmi > 0.4, (scoring, m)


def test_random_restart_fused(room_and_model):
    """Fused-kernel restart lanes: every attempt of a seed grows as a
    concurrent lane, the best by score commits (interpret mode off-TPU)."""
    from learn_region_grow_tpu.engine.grow import segment_rooms_fused

    rf, (params, mcfg) = room_and_model
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128, max_steps=100)
    for scoring in ("np", "ml"):
        results = segment_rooms_fused(params, mcfg, [rf], gcfg,
                                      max_instances=64, interpret=True,
                                      num_restarts=3, scoring=scoring)
        lbl = results[0].cluster_label
        assert (lbl > 0).all()
        m, _ = room_metrics(rf.obj_id, lbl)
        assert m.nmi > 0.4, (scoring, m)
        # deterministic across reruns
        again = segment_rooms_fused(params, mcfg, [rf], gcfg,
                                    max_instances=64, interpret=True,
                                    num_restarts=3, scoring=scoring)
        np.testing.assert_array_equal(lbl, again[0].cluster_label)


def test_cp_scoring_fused(room_and_model):
    """'cp' scoring (completeness-head attempt ranking, round-4 verdict
    ask #7): the kernel computes the head per lane and commits the
    highest-predicted-completeness attempt. The head here is freshly
    initialized (ranking is arbitrary but valid) — every attempt is a
    plausible segmentation, so quality must hold and runs must be
    deterministic; the trained-head A/B lives in the synthetic record
    (results/synthetic/localsearch_restart_cp.txt)."""
    import jax

    from learn_region_grow_tpu.engine.grow import segment_rooms_fused
    from learn_region_grow_tpu.models import lrgnet

    rf, (params, mcfg) = room_and_model
    cfg_cp = lrgnet.LrgNetConfig(
        feature_size=mcfg.feature_size, completeness_head=True)
    fresh = lrgnet.init_params(jax.random.PRNGKey(7), cfg_cp)
    params_cp = dict(params)
    params_cp["complete_head"] = fresh["complete_head"]
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128, max_steps=100)
    results = segment_rooms_fused(params_cp, mcfg, [rf], gcfg,
                                  max_instances=64, interpret=True,
                                  num_restarts=3, scoring="cp")
    lbl = results[0].cluster_label
    assert (lbl > 0).all()
    m, _ = room_metrics(rf.obj_id, lbl)
    assert m.nmi > 0.4, m
    again = segment_rooms_fused(params_cp, mcfg, [rf], gcfg,
                                max_instances=64, interpret=True,
                                num_restarts=3, scoring="cp")
    np.testing.assert_array_equal(lbl, again[0].cluster_label)
    # beam mode accepts cp too (rollouts ranked by predicted completeness)
    beam = segment_rooms_fused(params_cp, mcfg, [rf], gcfg,
                               max_instances=64, interpret=True,
                               beam_width=2, search_width=2, scoring="cp")
    mb, _ = room_metrics(rf.obj_id, beam[0].cluster_label)
    assert mb.nmi > 0.4, mb
    # guards: cp without a head / cp on the XLA engines is a clear error
    with pytest.raises(ValueError, match="complete_head"):
        segment_rooms_fused(params, mcfg, [rf], gcfg, interpret=True,
                            num_restarts=3, scoring="cp")
    with pytest.raises(ValueError, match="fused"):
        segment_rooms(params_cp, mcfg, [rf], gcfg, num_restarts=3,
                      scoring="cp")
    with pytest.raises(ValueError, match="fused"):
        segment_rooms_beam(params_cp, mcfg, [rf], gcfg, scoring="cp")


def test_beam_search_fused(room_and_model):
    """Fused-kernel beam: per-round rollout lanes + on-chip prune; Q[0]
    commits at stuck-twice (interpret mode off-TPU)."""
    from learn_region_grow_tpu.engine.grow import segment_rooms_fused

    rf, (params, mcfg) = room_and_model
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128, max_steps=100)
    for scoring in ("np", "ml"):
        results = segment_rooms_fused(params, mcfg, [rf], gcfg,
                                      max_instances=64, interpret=True,
                                      beam_width=2, search_width=2,
                                      scoring=scoring)
        lbl = results[0].cluster_label
        assert (lbl > 0).all()
        m, _ = room_metrics(rf.obj_id, lbl)
        assert m.nmi > 0.4, (scoring, m)


def test_beam_search(room_and_model):
    rf, (params, mcfg) = room_and_model
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128)
    results = segment_rooms_beam(params, mcfg, [rf], gcfg, beam_width=2,
                                 search_width=2, scoring="np",
                                 max_rounds=60)
    m, _ = room_metrics(rf.obj_id, results[0].cluster_label)
    assert (results[0].cluster_label > 0).all()
    assert m.nmi > 0.4, m
