"""PVOS parity: univs_tpu.evaluation.pvos vs a direct transcription of
the reference's ``eval_iou`` (univs/evaluation/eval_pvos.py:12-135 +
eval_utils_viposeg.py boundary ops, cv2-based exactly as the reference)
on randomized fixtures with seen/unseen things AND stuff, the
other-machine class 98, and per-object reference frames.
"""

import cv2
import numpy as np
import pytest

from univs_tpu.evaluation import pvos


# --- verbatim-law oracle (cv2, reference control flow) ----------------------

def ref_mask_to_boundary(mask, dilation_ratio=0.02):
    h, w = mask.shape
    img_diag = np.sqrt(h ** 2 + w ** 2)
    dilation = int(round(dilation_ratio * img_diag))
    if dilation < 1:
        dilation = 1
    new_mask = cv2.copyMakeBorder(mask, 1, 1, 1, 1, cv2.BORDER_CONSTANT, value=0)
    kernel = np.ones((3, 3), dtype=np.uint8)
    new_mask_erode = cv2.erode(new_mask, kernel, iterations=dilation)
    mask_erode = new_mask_erode[1: h + 1, 1: w + 1]
    return mask - mask_erode


def ref_boundary_iou(gt, dt, dilation_ratio=0.02):
    gt_boundary = ref_mask_to_boundary(gt, dilation_ratio)
    dt_boundary = ref_mask_to_boundary(dt, dilation_ratio)
    intersection = ((gt_boundary * dt_boundary) > 0).sum()
    union = ((gt_boundary + dt_boundary) > 0).sum()
    if union == 0:
        return 0
    return intersection / union


def ref_eval_iou(videos):
    """Transcription of eval_pvos.py:12-119 over in-memory videos.

    videos: list of dicts with gt [T,H,W], pred [T,H,W], ann_frames
    {frame: id map}, obj_class {id: class}, unseen_machine: bool.
    """
    lists = {
        "thing_seen": ([], []), "thing_unseen": ([], []),
        "stuff_seen": ([], []), "stuff_unseen": ([], []),
    }
    for vid in videos:
        obj_ids = []
        T = vid["gt"].shape[0]
        for i in range(T):
            label = vid["gt"][i]
            pred = vid["pred"][i]
            for oid in obj_ids:
                mask_gt = label == oid
                mask_pred = pred == oid
                if (np.sum(mask_pred) == 0) and (np.sum(mask_gt) != 0):
                    miou = 0.0
                    biou = 0.0
                elif (np.sum(mask_pred) != 0) and (np.sum(mask_gt) == 0):
                    miou = 0.0
                    biou = 0.0
                elif (np.sum(mask_pred) == 0) and (np.sum(mask_gt) == 0):
                    miou = 1.0
                    biou = 1.0
                else:
                    miou = np.sum(mask_gt & mask_pred) / np.sum(mask_gt | mask_pred)
                    biou = ref_boundary_iou(
                        mask_gt.astype(np.uint8), mask_pred.astype(np.uint8),
                        dilation_ratio=0.02)
                class_id = int(vid["obj_class"][oid])
                if class_id == 98:
                    key = "stuff_unseen" if vid["unseen_machine"] else "stuff_seen"
                elif class_id in pvos.THING_UNSEEN:
                    key = "thing_unseen"
                elif class_id in pvos.STUFF_UNSEEN:
                    key = "stuff_unseen"
                elif class_id in pvos.THING_SEEN:
                    key = "thing_seen"
                elif class_id in pvos.STUFF_SEEN:
                    key = "stuff_seen"
                else:
                    key = None
                if key:
                    lists[key][0].append(miou)
                    lists[key][1].append(biou)
            if i in vid["ann_frames"]:
                obj_ids.extend([int(x) for x in np.unique(vid["ann_frames"][i]) if x != 0])

    res = {}
    for key, (ml, bl) in lists.items():
        res[f"{key}_miou"] = np.mean(ml)
        res[f"{key}_biou"] = np.mean(bl)
        res[f"{key}_iou"] = (res[f"{key}_miou"] + res[f"{key}_biou"]) / 2
    res["overall_iou"] = (res["thing_seen_iou"] + res["thing_unseen_iou"]
                          + res["stuff_seen_iou"] + res["stuff_unseen_iou"]) / 4
    return res


# --- fixtures ----------------------------------------------------------------

def make_video(rng, T=5, H=40, W=48):
    classes = [60, 102, 28, 9, 98, 44]  # seen/unseen thing, seen/unseen stuff, 98
    gt = np.zeros((T, H, W), np.int32)
    pred = np.zeros((T, H, W), np.int32)
    obj_class = {}
    ann_frames = {}
    n = rng.randint(3, 6)
    for oid in range(1, n + 1):
        c = classes[rng.randint(len(classes))]
        obj_class[oid] = c
        rf = int(rng.randint(0, T - 1))
        y, x = int(rng.randint(H - 10)), int(rng.randint(W - 12))
        h, w = int(rng.randint(5, 11)), int(rng.randint(6, 13))
        for t in range(rf, T):
            dy, dx = int(rng.randint(-2, 3)), int(rng.randint(-2, 3))
            y0, x0 = np.clip(y + dy, 0, H - 2), np.clip(x + dx, 0, W - 2)
            gt[t, y0:y0 + h, x0:x0 + w] = oid
            # prediction: jittered, sometimes missing
            if rng.rand() < 0.85:
                dy2, dx2 = int(rng.randint(-3, 4)), int(rng.randint(-3, 4))
                y1, x1 = np.clip(y + dy2, 0, H - 2), np.clip(x + dx2, 0, W - 2)
                pred[t, y1:y1 + h, x1:x1 + w] = oid
        ann = np.zeros((H, W), np.int32)
        ann[gt[rf] == oid] = oid
        if rf in ann_frames:
            ann_frames[rf] = np.where(ann > 0, ann, ann_frames[rf])
        else:
            ann_frames[rf] = ann
    return {
        "gt": gt, "pred": pred, "obj_class": obj_class,
        "ann_frames": ann_frames, "unseen_machine": bool(rng.rand() < 0.5),
    }


@pytest.mark.parametrize("seed", range(5))
def test_pvos_matches_reference_transcription(seed):
    rng = np.random.RandomState(seed)
    videos = [make_video(rng) for _ in range(3)]

    buckets = {}
    for vid in videos:
        s, _ = pvos.pvos_video_samples(
            vid["gt"], vid["pred"], vid["obj_class"], vid["ann_frames"],
            video_unseen_machine=vid["unseen_machine"],
        )
        for k, v in s.items():
            buckets.setdefault(k, []).extend(v)
    ours = pvos.pvos_aggregate(buckets)
    ref = ref_eval_iou(videos)

    for k in ("thing_seen_iou", "thing_unseen_iou", "stuff_seen_iou",
              "stuff_unseen_iou", "overall_iou"):
        a, b = ours[k], ref[k]
        if np.isnan(b):
            assert np.isnan(a), k
        else:
            assert a == pytest.approx(b, abs=1e-9), (k, a, b)


def test_pvos_ref_frame_exclusion():
    """An object whose ref frame is the last frame contributes nothing."""
    T, H, W = 3, 20, 24
    gt = np.zeros((T, H, W), np.int32)
    gt[:, 4:10, 4:10] = 1
    ann = {T - 1: (gt[T - 1] == 1).astype(np.int32)}
    s, _ = pvos.pvos_video_samples(gt, gt, {1: 60}, ann)
    assert not s  # no samples at all


def test_pvos_decay_fit():
    decay = {1: [1.0, 0.9], 2: [0.8], 3: [0.75]}
    d = pvos.pvos_decay_fit(decay)
    assert np.isfinite(d) and d > 0
