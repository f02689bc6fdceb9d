"""Instance-segmentation metrics.

NMI/AMI/ARS via sklearn plus the reference's hand-rolled greedy instance
matching (``test_region_grow.py:319-355``): GT instances in descending size
order are matched to the first unused predicted cluster with IoU > 0.5;
precision = matched/predicted, recall = matched/GT, IOU = mean best-IoU per
GT instance. Vectorized via a contingency table instead of the reference's
O(GT * clusters * N) mask loops.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
from sklearn.metrics import (adjusted_mutual_info_score, adjusted_rand_score,
                             normalized_mutual_info_score)


@dataclasses.dataclass
class RoomMetrics:
    nmi: float
    ami: float
    ars: float
    prc: float
    rcl: float
    iou: float


def instance_matching(obj_id: np.ndarray, cluster_label: np.ndarray
                      ) -> Tuple[float, float, float, np.ndarray]:
    """Greedy IoU-matched precision/recall/mean-IoU + remapped labels.

    ``cluster_label`` uses 0 for unassigned, 1..C for predicted clusters.
    Returns ``(prc, rcl, mean_iou, cluster_label2)`` where ``cluster_label2``
    renumbers matched clusters by their GT match rank (the reference's PLY
    coloring scheme).
    """
    obj_id = np.asarray(obj_id)
    cluster_label = np.asarray(cluster_label)
    num_clusters = int(cluster_label.max())
    gt_ids, gt_counts = np.unique(obj_id, return_counts=True)

    # contingency: intersections between each gt id and each cluster 1..C
    gt_index = {g: i for i, g in enumerate(gt_ids)}
    gi = np.vectorize(gt_index.get)(obj_id)
    inter = np.zeros((len(gt_ids), num_clusters + 1), dtype=np.int64)
    np.add.at(inter, (gi, cluster_label), 1)
    cluster_counts = np.bincount(cluster_label, minlength=num_clusters + 1)

    dt_match = np.zeros(num_clusters, dtype=bool)
    cluster_label2 = np.zeros(len(cluster_label), dtype=int)
    gt_match = 0
    ious = []
    order = np.argsort(gt_counts)[::-1]
    for k, oi in enumerate(order):
        best_iou = 0.0
        for j in range(1, num_clusters + 1):
            if dt_match[j - 1]:
                continue
            i_and = inter[oi, j]
            i_or = gt_counts[oi] + cluster_counts[j] - i_and
            iou = i_and / i_or if i_or > 0 else 0.0
            best_iou = max(best_iou, iou)
            if iou > 0.5:
                dt_match[j - 1] = True
                gt_match += 1
                cluster_label2[cluster_label == j] = k + 1
                break
        ious.append(best_iou)
    for j in range(1, num_clusters + 1):
        if not dt_match[j - 1]:
            cluster_label2[cluster_label == j] = j + int(obj_id.max())

    prc = float(np.mean(dt_match)) if num_clusters > 0 else 0.0
    rcl = gt_match / len(set(obj_id.tolist()))
    mean_iou = float(np.mean(ious)) if ious else 0.0
    return prc, rcl, mean_iou, cluster_label2


def room_metrics(obj_id: np.ndarray, cluster_label: np.ndarray
                 ) -> Tuple[RoomMetrics, np.ndarray]:
    prc, rcl, iou, cluster_label2 = instance_matching(obj_id, cluster_label)
    m = RoomMetrics(
        nmi=float(normalized_mutual_info_score(obj_id, cluster_label)),
        ami=float(adjusted_mutual_info_score(obj_id, cluster_label)),
        ars=float(adjusted_rand_score(obj_id, cluster_label)),
        prc=prc, rcl=rcl, iou=iou,
    )
    return m, cluster_label2


def aggregate_line(metrics: list) -> str:
    """The reference's final aggregate stdout line
    (``test_region_grow.py:379-381``)."""
    nmi = [m.nmi for m in metrics]
    ami = [m.ami for m in metrics]
    ars = [m.ars for m in metrics]
    prc = [m.prc for m in metrics]
    rcl = [m.rcl for m in metrics]
    iou = [m.iou for m in metrics]
    return ("NMI: %.2f+-%.2f AMI: %.2f+-%.2f ARS: %.2f+-%.2f "
            "PRC %.2f+-%.2f RCL %.2f+-%.2f IOU %.2f+-%.2f" % (
                np.mean(nmi), np.std(nmi), np.mean(ami), np.std(ami),
                np.mean(ars), np.std(ars), np.mean(prc), np.std(prc),
                np.mean(rcl), np.std(rcl), np.mean(iou), np.std(iou)))
