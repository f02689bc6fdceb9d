"""Completeness-gated fragment merging (``engine/merge.py``).

The merge ALGORITHM is tested with an oracle completeness scorer
(IoU-vs-dominant-GT — exactly the quantity the real head is trained to
predict from the simulator, ``data/simulator.py`` staged ``complete``):
a deliberately split instance must rejoin, distinct instances must not
merge. A slow smoke runs the real trained head end to end."""

import jax
import numpy as np
import pytest

from learn_region_grow_tpu.core import prepare_room
from learn_region_grow_tpu.engine import merge as mg


def _oracle_scorer(rf):
    """Completeness of a region = |region ∩ g| / |g| for the region's
    dominant GT instance g, scaled down by impurity (points of other
    instances hurt, like the simulator's mistake-injected targets)."""
    def score(params, mcfg, rf_, regions, *a, **k):
        out = []
        for idx in regions:
            gt = rf.obj_id[idx]
            vals, cnt = np.unique(gt, return_counts=True)
            dom = vals[np.argmax(cnt)]
            cover = cnt.max() / np.sum(rf.obj_id == dom)
            purity = cnt.max() / len(idx)
            out.append(cover * purity)
        return np.array(out)
    return score


@pytest.fixture
def split_room(tiny_rooms):
    """One room + labels where the largest GT instance is split in two
    along x (simulated over-fragmentation) and every other instance maps
    to one cluster."""
    r = tiny_rooms[0]
    rf = prepare_room(r[:, :6], r[:, 6], r[:, 7], resolution=0.1)
    labels = np.zeros(len(rf.points), np.int64)
    next_id = 1
    big = max(np.unique(rf.obj_id), key=lambda o: np.sum(rf.obj_id == o))
    for o in np.unique(rf.obj_id):
        m = rf.obj_id == o
        if o == big:
            xs = rf.points[m, 0]
            cut = np.median(xs)
            labels[m & (rf.points[:, 0] <= cut)] = next_id
            labels[m & (rf.points[:, 0] > cut)] = next_id + 1
            split_ids = (next_id, next_id + 1)
            next_id += 2
        else:
            labels[m] = next_id
            next_id += 1
    return rf, labels, split_ids


def test_merge_rejoins_split_instance(split_room, monkeypatch):
    rf, labels, (a, b) = split_room
    monkeypatch.setattr(mg, "score_regions", _oracle_scorer(rf))
    merged, report = mg.merge_fragments(
        None, None, rf, labels, num_inlier=128, num_neighbor=128,
        margin=0.05)
    # the two halves now share one label...
    la = np.unique(merged[labels == a])
    lb = np.unique(merged[labels == b])
    assert len(la) == 1 and len(lb) == 1 and la[0] == lb[0]
    assert report["merges"] >= 1
    # ...and no DISTINCT GT instances were merged: every output cluster
    # is dominated >=99% by one GT instance (as in the input labels)
    for c in np.unique(merged):
        gt = rf.obj_id[merged == c]
        _, cnt = np.unique(gt, return_counts=True)
        assert cnt.max() / cnt.sum() > 0.99


def test_merge_noop_on_perfect_labels(split_room, monkeypatch):
    """GT-perfect labels: the oracle gate finds no pair whose union
    beats both parts, so labels come back untouched."""
    rf, _, _ = split_room
    labels = np.zeros(len(rf.points), np.int64)
    for i, o in enumerate(np.unique(rf.obj_id)):
        labels[rf.obj_id == o] = i + 1
    monkeypatch.setattr(mg, "score_regions", _oracle_scorer(rf))
    merged, report = mg.merge_fragments(
        None, None, rf, labels, num_inlier=128, num_neighbor=128,
        margin=0.05)
    np.testing.assert_array_equal(merged, labels)
    assert report["merges"] == 0


@pytest.mark.slow
def test_merge_real_head_smoke(split_room, tiny_rooms):
    """End-to-end with a briefly-trained real completeness head: runs,
    returns a valid labeling, and does not degrade NMI."""
    from sklearn.metrics import normalized_mutual_info_score as nmi

    from learn_region_grow_tpu.data.simulator import stage_rooms
    from learn_region_grow_tpu.train.trainer import (SampleSet, TrainConfig,
                                                     make_train_step)
    rf, labels, _ = split_room
    rooms = [r[:, :6] for r in tiny_rooms]
    staged = stage_rooms(rooms, [r[:, 6] for r in tiny_rooms],
                         [r[:, 7] for r in tiny_rooms], resolution=0.1,
                         seed=0)
    cfg = TrainConfig(batch_size=16, num_inlier=128, num_neighbor=128,
                      multiseed=0, completeness_head=True)
    ss = SampleSet(*staged.split(), complete=staged.complete)
    init_fn, train_step, _ = make_train_step(cfg)
    params, opt = init_fn(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    for _ in range(150):
        idx = rng.choice(len(ss), 16, replace=False)
        params, opt, _m = train_step(
            params, opt, ss.batch(idx, 128, 128, rng, with_complete=True))
    merged, report = mg.merge_fragments(
        params, cfg.model_config(), rf, labels, num_inlier=128,
        num_neighbor=128, margin=0.05)
    assert merged.shape == labels.shape
    assert set(np.unique(merged)) <= set(np.unique(labels))
    assert nmi(rf.obj_id, merged) >= nmi(rf.obj_id, labels) - 0.02
