"""Classical baseline modes on synthetic rooms."""

import numpy as np
import pytest

from learn_region_grow_tpu.core import equalize_resolution
from learn_region_grow_tpu.core.normals import estimate_normals_curvature
from learn_region_grow_tpu.eval.classical import (classical_segment,
                                                  edge_svm_features,
                                                  neighborhood_stats)
from learn_region_grow_tpu.eval.components import voxel_adjacency_edges
from learn_region_grow_tpu.eval.metrics import room_metrics


@pytest.fixture(scope="module")
def room(tiny_rooms):
    raw = np.asarray(tiny_rooms[0], np.float64)
    eq, _ = equalize_resolution(raw[:, :3], 0.1)
    pts = raw[eq]
    obj = raw[eq, 6].astype(int)
    normals, curv = estimate_normals_curvature(pts[:, :3], raw[:, :3], 0.1,
                                               normalize_curvature=False)
    return pts, obj, normals, curv


def test_normal_mode_segments_box_room(room):
    pts, obj, normals, curv = room
    labels = classical_segment("normal", pts, 0.1, normals, curv)
    m, _ = room_metrics(obj, labels)
    # orthogonal walls of a box room are separable by normals
    assert m.nmi > 0.5, m


def test_smoothness_mode(room):
    pts, obj, normals, curv = room
    labels = classical_segment("smoothness", pts, 0.1, normals, curv,
                               threshold=0.98)
    m, _ = room_metrics(obj, labels)
    assert m.nmi > 0.5, m
    # every labeled cluster is above min size
    for c in range(1, labels.max() + 1):
        assert (labels == c).sum() > 10


def test_color_and_curvature_modes_run(room):
    pts, obj, normals, curv = room
    for mode in ("color", "curvature", "feature"):
        labels = classical_segment(mode, pts, 0.1, normals, curv)
        assert labels.shape == (len(pts),)
        assert labels.min() >= 0


def test_edge_features_shape(room):
    pts, obj, normals, curv = room
    src, dst = voxel_adjacency_edges(pts[:, :3], 0.1)
    E = np.stack([src, dst], axis=1)[:50]
    nmin, nmax = neighborhood_stats(len(pts), E, pts)
    F = edge_svm_features(E, pts, nmin, nmax)
    # 4+4+4+6+6+6 = 30 features for 6-col points
    assert F.shape == (50, 30)
    assert np.isfinite(F).all()
