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
