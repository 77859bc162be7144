"""Video Panoptic Quality (VPQ) for VPS.

Standalone numpy rebuild of the reference's VIPSeg evaluation
(reference: univs/evaluation/eval_vpq_vps.py:77-312 — per-{1,2,4,6}-
frame tube PQ: segments are matched by IoU > 0.5 over the
concatenated-tube pixels; PQ = sum(TP IoU) / (TP + FP/2 + FN/2),
averaged over categories then over spans).

Inputs are per-frame (segment_id, category) panoptic maps.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

VOID = 0


def _tube_stats(gt_seg: np.ndarray, gt_cat: Dict[int, int],
                pr_seg: np.ndarray, pr_cat: Dict[int, int],
                num_classes: int):
    """One tube (stacked frames). Returns per-class (iou_sum, tp, fp, fn)."""
    iou_sum = np.zeros(num_classes)
    tp = np.zeros(num_classes, np.int64)
    fp = np.zeros(num_classes, np.int64)
    fn = np.zeros(num_classes, np.int64)

    gt_ids, gt_areas = np.unique(gt_seg, return_counts=True)
    pr_ids, pr_areas = np.unique(pr_seg, return_counts=True)
    gt_area = dict(zip(gt_ids.tolist(), gt_areas.tolist()))
    pr_area = dict(zip(pr_ids.tolist(), pr_areas.tolist()))

    # pair intersections via combined key
    comb = gt_seg.astype(np.int64) * (2 ** 32) + pr_seg.astype(np.int64)
    pairs, pair_areas = np.unique(comb, return_counts=True)
    inter = {}
    for key, a in zip(pairs.tolist(), pair_areas.tolist()):
        inter[(key >> 32, key & 0xFFFFFFFF)] = a

    matched_gt, matched_pr = set(), set()
    for (gi, pi), a in inter.items():
        if gi == VOID or pi == VOID:
            continue
        if gi not in gt_cat or pi not in pr_cat:
            continue
        if gt_cat[gi] != pr_cat[pi]:
            continue
        union = gt_area[gi] + pr_area[pi] - a
        iou = a / union if union > 0 else 0.0
        if iou > 0.5:
            c = gt_cat[gi]
            iou_sum[c] += iou
            tp[c] += 1
            matched_gt.add(gi)
            matched_pr.add(pi)

    for gi in gt_cat:
        if gi != VOID and gi in gt_area and gi not in matched_gt:
            fn[gt_cat[gi]] += 1
    for pi in pr_cat:
        if pi != VOID and pi in pr_area and pi not in matched_pr:
            # ignore predictions mostly covering void (simplified)
            fp[pr_cat[pi]] += 1
    return iou_sum, tp, fp, fn


def vpq_single_video(
    gt_segs: Sequence[np.ndarray],  # per-frame segment-id maps
    gt_cats: Dict[int, int],  # segment id -> category
    pr_segs: Sequence[np.ndarray],
    pr_cats: Dict[int, int],
    num_classes: int,
    spans: Sequence[int] = (1, 2, 4, 6),
) -> Dict[str, float]:
    """VPQ over tube spans; returns {'vpq': mean, 'vpq_k': per span}."""
    T = len(gt_segs)
    results = {}
    vals = []
    for k in spans:
        iou_sum = np.zeros(num_classes)
        tp = np.zeros(num_classes, np.int64)
        fp = np.zeros(num_classes, np.int64)
        fn = np.zeros(num_classes, np.int64)
        for s in range(T - k + 1):
            g = np.stack(gt_segs[s : s + k]).reshape(-1)
            p = np.stack(pr_segs[s : s + k]).reshape(-1)
            i, t_, f_, n_ = _tube_stats(g, gt_cats, p, pr_cats, num_classes)
            iou_sum += i
            tp += t_
            fp += f_
            fn += n_
        denom = tp + fp / 2 + fn / 2
        present = denom > 0
        pq_c = np.where(present, iou_sum / np.maximum(denom, 1e-9), np.nan)
        vpq_k = float(np.nanmean(np.where(present, pq_c, np.nan))) if present.any() else 0.0
        results[f"vpq_{k}"] = vpq_k
        vals.append(vpq_k)
    results["vpq"] = float(np.mean(vals))
    return results
