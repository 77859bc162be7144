"""Evaluator sanity tests: perfect predictions score perfectly,
degraded predictions score lower, formulas match hand computations."""

import numpy as np
import pytest

from univs_tpu.evaluation.davis import db_eval_boundary, db_eval_iou, evaluate_davis_sequence
from univs_tpu.evaluation.pvos import evaluate_pvos_video
from univs_tpu.evaluation.stq import STQAccumulator
from univs_tpu.evaluation.vpq import vpq_single_video
from univs_tpu.evaluation.vss import confusion_matrix, miou_from_confusion, video_consistency
from univs_tpu.evaluation.ytvis import YTVISEval, video_mask_iou
from univs_tpu.utils import rle


def _blob(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return m


def test_davis_perfect_and_shifted():
    gt = np.stack([_blob(32, 32, 8, 20, 8, 20)] * 4)[None]  # [1, 4, 32, 32]
    res = evaluate_davis_sequence(gt, gt)
    assert res["J"] == 1.0 and res["F"] == 1.0
    shifted = np.roll(gt, 4, axis=-1)
    res2 = evaluate_davis_sequence(gt, shifted)
    assert 0 < res2["J"] < 1
    assert 0 <= res2["F"] <= 1
    # J matches hand-computed IoU for the shift
    inter = 12 * 8
    union = 12 * 12 * 2 - inter
    np.testing.assert_allclose(res2["J"], inter / union, atol=1e-6)


def test_miou():
    gt = np.array([[0, 0, 1, 1], [2, 2, 255, 255]])
    pred = np.array([[0, 1, 1, 1], [2, 2, 0, 0]])
    cm = confusion_matrix(gt, pred, 3)
    miou, macc, iou = miou_from_confusion(cm)
    # class0: inter1 union2 (gt {0,0}, pred {0}+ignored) -> gt2 pred1 inter1 union2
    np.testing.assert_allclose(iou[0], 1 / 2)
    np.testing.assert_allclose(iou[1], 2 / 3)
    np.testing.assert_allclose(iou[2], 1.0)


def test_video_consistency():
    gt = [np.full((4, 4), 1)] * 8
    pred_good = [np.full((4, 4), 1)] * 8
    pred_bad = [np.full((4, 4), 1)] * 7 + [np.full((4, 4), 0)]
    assert video_consistency(gt, pred_good, window=8) == 1.0
    assert video_consistency(gt, pred_bad, window=8) == 0.0


def test_vpq_perfect():
    seg = np.zeros((8, 8), np.int32)
    seg[:4] = 1
    seg[4:] = 2
    cats = {1: 0, 2: 1}
    res = vpq_single_video([seg] * 4, cats, [seg] * 4, cats, num_classes=3, spans=(1, 2))
    assert res["vpq"] == 1.0
    # corrupt predictions: wrong class for segment 2
    res2 = vpq_single_video([seg] * 4, cats, [seg] * 4, {1: 0, 2: 0}, num_classes=3, spans=(1,))
    assert res2["vpq"] < 1.0


def test_stq_perfect():
    acc = STQAccumulator(num_classes=3, things={1})
    cls = np.array([[0, 0, 1, 1]])
    inst = np.array([[0, 0, 5, 5]])
    for _ in range(3):
        acc.update("v0", cls, inst, cls, inst)
    res = acc.result()
    assert res["SQ"] == 1.0
    assert res["AQ"] == 1.0
    assert res["STQ"] == 1.0


def test_ytvis_ap_perfect_and_miss():
    h, w = 16, 16
    seg = [rle.encode(_blob(h, w, 2, 10, 2, 10)) for _ in range(3)]
    gts = [{"video_id": 1, "category_id": 1, "id": 1, "segmentations": seg}]
    preds = [{"video_id": 1, "category_id": 1, "score": 0.9, "segmentations": seg}]
    res = YTVISEval(gts, preds).evaluate()
    np.testing.assert_allclose(res["AP"], 1.0, atol=1e-6)
    np.testing.assert_allclose(res["AP50"], 1.0, atol=1e-6)
    # completely missing prediction
    res2 = YTVISEval(gts, []).evaluate()
    assert res2["AP"] == 0.0
    # half-overlap prediction -> matches at IoU<=~0.33 only -> AP 0
    seg2 = [rle.encode(_blob(h, w, 2, 10, 6, 14)) for _ in range(3)]
    iou = video_mask_iou(seg, seg2)
    assert 0.3 < iou < 0.4
    res3 = YTVISEval(gts, [{"video_id": 1, "category_id": 1, "score": 0.9, "segmentations": seg2}]).evaluate()
    assert res3["AP"] == 0.0


def test_ytvis_crowd_matched_detection_is_ignored():
    """A detection whose only match is a crowd GT must be excluded from
    both TP and FP (COCO protocol), not counted as a false positive."""
    h, w = 16, 16
    seg_a = [rle.encode(_blob(h, w, 2, 10, 2, 10)) for _ in range(3)]
    seg_crowd = [rle.encode(_blob(h, w, 10, 16, 10, 16)) for _ in range(3)]
    gts = [
        {"video_id": 1, "category_id": 1, "id": 1, "segmentations": seg_a},
        {"video_id": 1, "category_id": 1, "id": 2, "segmentations": seg_crowd,
         "iscrowd": 1},
    ]
    preds = [
        {"video_id": 1, "category_id": 1, "score": 0.9, "segmentations": seg_a},
        # fully inside the crowd region -> crowd-matched -> ignored
        {"video_id": 1, "category_id": 1, "score": 0.8,
         "segmentations": [rle.encode(_blob(h, w, 11, 15, 11, 15))] * 3},
    ]
    res = YTVISEval(gts, preds).evaluate()
    np.testing.assert_allclose(res["AP"], 1.0, atol=1e-6)
    # sanity: an unmatched non-crowd detection DOES hurt AP
    preds_fp = [preds[0],
                {"video_id": 1, "category_id": 1, "score": 0.95,
                 "segmentations": [rle.encode(np.zeros((h, w), np.uint8))] * 3}]
    res_fp = YTVISEval(gts, preds_fp).evaluate()
    assert res_fp["AP"] < 1.0


def test_pvos_groups():
    gt = np.stack([np.stack([_blob(16, 16, 2, 8, 2, 8)] * 3),
                   np.stack([_blob(16, 16, 9, 14, 9, 14)] * 3)])
    # 60 = thing_seen, 28 = stuff_seen (VIPOSeg tables); ref frame 0 is
    # excluded, frames 1..2 score 1.0 for a perfect prediction
    res = evaluate_pvos_video(gt, gt, obj_classes=[60, 28])
    assert res["thing_seen_iou"] == 1.0 and res["stuff_seen_iou"] == 1.0
    assert res["G"] == 1.0
