"""Instance-matching metrics vs naive reference-algorithm oracle."""

import numpy as np

from learn_region_grow_tpu.eval.metrics import (aggregate_line,
                                                instance_matching,
                                                room_metrics, RoomMetrics)


def _oracle_matching(obj_id, cluster_label):
    """Direct port of the reference greedy matcher semantics
    (test_region_grow.py:319-344) as a slow oracle."""
    gt_match = 0
    dt_match = np.zeros(cluster_label.max(), dtype=bool)
    room_iou = []
    unique_id, count = np.unique(obj_id, return_counts=True)
    for k in range(len(unique_id)):
        i = unique_id[np.argsort(count)][::-1][k]
        best_iou = 0.0
        for j in range(1, cluster_label.max() + 1):
            if not dt_match[j - 1]:
                inter = np.sum((obj_id == i) & (cluster_label == j))
                union = np.sum((obj_id == i) | (cluster_label == j))
                iou = inter / union
                best_iou = max(best_iou, iou)
                if iou > 0.5:
                    dt_match[j - 1] = True
                    gt_match += 1
                    break
        room_iou.append(best_iou)
    prc = float(np.mean(dt_match)) if len(dt_match) else 0.0
    rcl = gt_match / len(set(obj_id.tolist()))
    return prc, rcl, float(np.mean(room_iou))


def test_instance_matching_matches_oracle():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 500
        obj_id = rng.randint(1, 7, n)
        # clusters: noisy copy of gt ids with some merged/split
        cluster_label = obj_id.copy()
        cluster_label[rng.rand(n) < 0.2] = rng.randint(1, 9)
        prc, rcl, iou, _ = instance_matching(obj_id, cluster_label)
        prc_o, rcl_o, iou_o = _oracle_matching(obj_id, cluster_label)
        assert abs(prc - prc_o) < 1e-9, trial
        assert abs(rcl - rcl_o) < 1e-9, trial
        assert abs(iou - iou_o) < 1e-9, trial


def test_perfect_segmentation():
    obj_id = np.repeat(np.arange(1, 5), 50)
    cluster_label = np.repeat(np.arange(1, 5), 50)
    m, relabeled = room_metrics(obj_id, cluster_label)
    assert m.nmi == 1.0 and m.prc == 1.0 and m.rcl == 1.0 and m.iou == 1.0


def test_unassigned_cluster_zero():
    obj_id = np.array([1, 1, 1, 2, 2, 2])
    cluster_label = np.array([1, 1, 1, 0, 0, 0])  # second instance unfound
    prc, rcl, iou, _ = instance_matching(obj_id, cluster_label)
    assert prc == 1.0      # the one predicted cluster matched
    assert rcl == 0.5
    assert 0.4 < iou < 0.6


def test_aggregate_line_format():
    m = RoomMetrics(0.5, 0.4, 0.3, 0.2, 0.1, 0.6)
    line = aggregate_line([m, m])
    assert line.startswith("NMI: 0.50+-0.00 AMI: 0.40+-0.00")
    assert "IOU 0.60+-0.00" in line
