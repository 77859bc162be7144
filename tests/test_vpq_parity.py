"""VPQ parity: univs_tpu.evaluation.vpq vs a direct transcription of the
reference's ``vpq_compute_single_core`` (univs/evaluation/eval_vpq_vps.py
:77-235) on randomized fixtures WITH void pixels and crowd segments.

The transcription below mirrors the reference's control flow 1:1 on
in-memory (segment-id, category) maps instead of PNG/JSON inputs; the
areas are derived from the maps exactly as the reference's sanity pass
does (eval_vpq_vps.py:113-124 recomputes pred areas from the PNG and
:163-165 recomputes gt tube areas from the map).
"""

import numpy as np
import pytest

from univs_tpu.evaluation.vpq import vpq_single_video

VOID = 0
OFFSET = 2 ** 32


def ref_vpq_single_core(gt_segs, gt_cats, gt_crowd, pr_segs, pr_cats,
                        num_classes, nframes):
    """Transcription of eval_vpq_vps.py:77-235 (one span)."""
    stats = {c: [0.0, 0, 0, 0] for c in range(num_classes)}  # iou, tp, fp, fn

    for idx in range(len(gt_segs) - nframes + 1):
        vid_pan_gt = np.stack(gt_segs[idx:idx + nframes])
        vid_pan_pred = np.stack(pr_segs[idx:idx + nframes])

        # tube segment dicts (ids present in the tube's frames, per-frame
        # areas summed — ref :140-152); crowd/category from annotations
        vid_gt_segms = {}
        vid_pred_segms = {}
        for f in range(nframes):
            for gid in np.unique(vid_pan_gt[f]):
                gid = int(gid)
                if gid == VOID or gid not in gt_cats:
                    continue
                area = int((vid_pan_gt[f] == gid).sum())
                if gid in vid_gt_segms:
                    vid_gt_segms[gid]["area"] += area
                else:
                    vid_gt_segms[gid] = {
                        "category_id": gt_cats[gid],
                        "iscrowd": int(gt_crowd.get(gid, False)),
                        "area": area,
                    }
            for pid in np.unique(vid_pan_pred[f]):
                pid = int(pid)
                if pid == VOID:
                    continue
                area = int((vid_pan_pred[f] == pid).sum())
                if pid in vid_pred_segms:
                    vid_pred_segms[pid]["area"] += area
                else:
                    vid_pred_segms[pid] = {
                        "category_id": pr_cats[pid], "area": area,
                    }

        # confusion map (ref :156-166, incl. the gt area correction)
        vid_pan_gt_pred = vid_pan_gt.astype(np.uint64) * OFFSET + vid_pan_pred.astype(np.uint64)
        gt_pred_map = {}
        labels, labels_cnt = np.unique(vid_pan_gt_pred, return_counts=True)
        for label, intersection in zip(labels, labels_cnt):
            gt_id = int(label // OFFSET)
            pred_id = int(label % OFFSET)
            if gt_id in vid_gt_segms:
                vid_gt_segms[gt_id]["area"] = int(np.sum(vid_pan_gt == gt_id))
            gt_pred_map[(gt_id, pred_id)] = int(intersection)

        gt_matched, pred_matched = set(), set()
        for (gt_label, pred_label), intersection in gt_pred_map.items():
            if gt_label not in vid_gt_segms or pred_label not in vid_pred_segms:
                continue
            if vid_gt_segms[gt_label]["iscrowd"] == 1:
                continue
            if vid_gt_segms[gt_label]["category_id"] != vid_pred_segms[pred_label]["category_id"]:
                continue
            union = (vid_pred_segms[pred_label]["area"]
                     + vid_gt_segms[gt_label]["area"] - intersection)
            union = union - gt_pred_map.get((VOID, pred_label), 0)
            iou = intersection / union
            assert iou <= 1.0
            if iou > 0.5:
                c = vid_gt_segms[gt_label]["category_id"]
                stats[c][0] += iou
                stats[c][1] += 1
                gt_matched.add(gt_label)
                pred_matched.add(pred_label)

        crowd_labels_dict = {}
        for gt_label, gt_info in vid_gt_segms.items():
            if gt_label in gt_matched:
                continue
            if gt_info["iscrowd"] == 1:
                crowd_labels_dict[gt_info["category_id"]] = gt_label
                continue
            stats[gt_info["category_id"]][3] += 1

        for pred_label, pred_info in vid_pred_segms.items():
            if pred_label in pred_matched:
                continue
            intersection = gt_pred_map.get((VOID, pred_label), 0)
            if pred_info["category_id"] in crowd_labels_dict:
                intersection += gt_pred_map.get(
                    (crowd_labels_dict[pred_info["category_id"]], pred_label), 0)
            if intersection / pred_info["area"] > 0.5:
                continue
            stats[pred_info["category_id"]][2] += 1

    # pq_average over all classes (ref :51-73, isthing=None)
    pq, n = 0.0, 0
    for c in range(num_classes):
        iou, tp, fp, fn = stats[c]
        if tp + fp + fn == 0:
            continue
        n += 1
        pq += iou / (tp + 0.5 * fp + 0.5 * fn)
    return pq / n if n else 0.0


def make_fixture(seed, T=6, H=28, W=36, num_classes=5):
    """Random video with void background, blobs, crowd (<=1 per class —
    the reference's last-crowd-wins tie-break makes >1 order-dependent),
    and predictions with matches, misses, and mostly-void spurious segs."""
    rng = np.random.RandomState(seed)
    gt = [np.zeros((H, W), np.int32) for _ in range(T)]
    pr = [np.zeros((H, W), np.int32) for _ in range(T)]
    gt_cats, gt_crowd, pr_cats = {}, {}, {}

    def blob(maps, sid, y, x, h, w, jitter):
        for t, m in enumerate(maps):
            dy = int(rng.randint(-jitter, jitter + 1))
            dx = int(rng.randint(-jitter, jitter + 1))
            y0, x0 = np.clip(y + dy, 0, H - 2), np.clip(x + dx, 0, W - 2)
            m[y0:min(y0 + h, H), x0:min(x0 + w, W)] = sid

    sid = 1
    crowded_cats = set()
    for _ in range(rng.randint(4, 8)):
        c = int(rng.randint(num_classes))
        y, x = int(rng.randint(H - 6)), int(rng.randint(W - 8))
        h, w = int(rng.randint(4, 9)), int(rng.randint(5, 11))
        iscrowd = bool(rng.rand() < 0.25) and c not in crowded_cats
        if iscrowd:
            crowded_cats.add(c)
        blob(gt, sid, y, x, h, w, jitter=1)
        gt_cats[sid], gt_crowd[sid] = c, iscrowd
        # prediction: usually a jittered copy (same category), sometimes
        # missing, sometimes wrong category
        r = rng.rand()
        if r < 0.7:
            blob(pr, 100 + sid, y, x, h, w, jitter=1)
            pr_cats[100 + sid] = c if rng.rand() < 0.85 else int(rng.randint(num_classes))
        sid += 1

    # spurious predictions over void (should be dropped when >50% void)
    for _ in range(rng.randint(1, 4)):
        y, x = int(rng.randint(H - 5)), int(rng.randint(W - 6))
        blob(pr, 100 + sid, y, x, int(rng.randint(3, 6)), int(rng.randint(3, 7)), jitter=0)
        pr_cats[100 + sid] = int(rng.randint(num_classes))
        sid += 1
    return gt, gt_cats, gt_crowd, pr, pr_cats, num_classes


@pytest.mark.parametrize("seed", range(8))
def test_vpq_matches_reference_transcription(seed):
    gt, gt_cats, gt_crowd, pr, pr_cats, K = make_fixture(seed)
    for span in (1, 2, 4):
        ours = vpq_single_video(gt, gt_cats, pr, pr_cats, K, spans=(span,),
                                gt_crowd=gt_crowd)[f"vpq_{span}"]
        ref = ref_vpq_single_core(gt, gt_cats, gt_crowd, pr, pr_cats, K, span)
        assert ours == pytest.approx(ref, abs=1e-9), (seed, span)


def test_crowd_not_fn_and_void_fp_drop():
    """Hand-built case: one crowd GT (no FN), one pred 60% on void (dropped),
    one pred 60% on crowd of its category (dropped)."""
    H, W = 10, 20
    gt = np.zeros((H, W), np.int32)
    gt[:, :8] = 7  # crowd segment, category 2
    pr = np.zeros((H, W), np.int32)
    pr[0:5, 0:5] = 101   # mostly inside crowd  (cat 2 -> dropped)
    pr[6:9, 10:18] = 102  # entirely on void (dropped)
    res = vpq_single_video(
        [gt], {7: 2}, [pr], {101: 2, 102: 1}, num_classes=3, spans=(1,),
        gt_crowd={7: True},
    )
    # no TP, no FN (crowd), both preds dropped -> no class has stats
    assert res["vpq_1"] == 0.0
    # same but pred 102 has category 2 and is NOT mostly crowd-covered:
    pr2 = pr.copy()
    res2 = vpq_single_video(
        [gt], {7: 2}, [pr2], {101: 2, 102: 2}, num_classes=3, spans=(1,),
        gt_crowd={7: True},
    )
    # 102 survives as FP for class 2 -> pq 0 but class present
    assert res2["vpq_1"] == 0.0
