"""Golden cross-checks: our metric kernels vs the VENDORED reference
evaluator packages, run directly from /root/reference on randomized
fixtures (the davis2017-evaluation pytest pattern, SURVEY §4.2).

- J / F: univs_tpu.evaluation.davis vs
  univs/evaluation/davis2017_evaluation/davis2017/metrics.py (the real
  module; its lazy skimage.morphology.disk import is shimmed with the
  canonical x^2+y^2<=r^2 structuring element).
- video AP: univs_tpu.evaluation.ytvis.YTVISEval vs
  univs/data/datasets/ytvis_api/ytvoseval.py (the real module;
  pycocotools.mask is shimmed onto univs_tpu.utils.rle — area/merge/
  decode only, which is all the api touches for compressed RLEs).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import ref_shim
from univs_tpu.evaluation.davis import db_eval_boundary, db_eval_iou
from univs_tpu.evaluation.ytvis import YTVISEval
from univs_tpu.utils import rle


def _blobs(rng, t, h, w, max_blobs=2):
    """Random multi-rectangle masks [t, h, w] (some frames empty)."""
    m = np.zeros((t, h, w), np.uint8)
    for i in range(t):
        for _ in range(rng.randint(0, max_blobs + 1)):
            y0 = rng.randint(0, h - 4)
            x0 = rng.randint(0, w - 4)
            m[i, y0: y0 + rng.randint(3, h // 2), x0: x0 + rng.randint(3, w // 2)] = 1
    return m


def test_davis_jf_matches_vendored_package():
    ref = ref_shim.load_reference_davis_metrics()
    rng = np.random.RandomState(0)
    for trial in range(6):
        t, h, w = 3, 40 + trial, 56 + 2 * trial  # odd sizes too
        ann = _blobs(rng, t, h, w)
        seg = _blobs(rng, t, h, w)
        j_ref = ref.db_eval_iou(ann, seg)
        j_got = db_eval_iou(ann, seg)
        np.testing.assert_allclose(j_got, j_ref, atol=1e-12, err_msg=f"J trial {trial}")
        f_ref = ref.db_eval_boundary(ann, seg)
        f_got = db_eval_boundary(ann, seg)
        np.testing.assert_allclose(f_got, f_ref, atol=1e-12, err_msg=f"F trial {trial}")


def _fixture_dataset(rng, n_videos=3, t=4, h=32, w=48, n_cats=3):
    videos, gts, preds = [], [], []
    ann_id = 0
    for v in range(1, n_videos + 1):
        videos.append({"id": v, "height": h, "width": w, "length": t})
        gt_masks = []
        for k in range(rng.randint(1, 4)):
            m = _blobs(rng, t, h, w)
            cat = int(rng.randint(1, n_cats + 1))
            ann_id += 1
            segs = [rle.encode(m[i]) if m[i].any() else None for i in range(t)]
            gts.append({
                "id": ann_id, "video_id": v, "category_id": cat,
                "segmentations": segs,
                "areas": [int(m[i].sum()) if m[i].any() else None for i in range(t)],
                "iscrowd": int(k == 0 and v == 2),  # one crowd GT
                "height": h, "width": w, "length": t,
            })
            gt_masks.append((m, cat))
        # predictions: perturbed copies of GT + pure noise, random scores
        for m, cat in gt_masks:
            noise = _blobs(rng, t, h, w)
            pm = (m ^ (noise & (rng.rand(t, h, w) < 0.15))).astype(np.uint8)
            preds.append({
                "video_id": v, "category_id": cat,
                "segmentations": [rle.encode(pm[i]) for i in range(t)],
                "score": float(rng.rand()),
            })
        for _ in range(2):
            nm = _blobs(rng, t, h, w)
            preds.append({
                "video_id": v,
                "category_id": int(rng.randint(1, n_cats + 1)),
                "segmentations": [rle.encode(nm[i]) for i in range(t)],
                "score": float(rng.rand()),
            })
    cats = [{"id": c, "name": f"c{c}"} for c in range(1, n_cats + 1)]
    return videos, cats, gts, preds


def test_video_ap_matches_vendored_ytvoseval(capsys):
    ytvos_mod, yteval_mod = ref_shim.load_reference_ytvos_api()
    rng = np.random.RandomState(7)
    videos, cats, gts, preds = _fixture_dataset(rng)

    gt_api = ytvos_mod.YTVOS()
    gt_api.dataset = {"videos": videos, "categories": cats,
                      "annotations": [dict(g) for g in gts]}
    gt_api.createIndex()
    dt_api = gt_api.loadRes([dict(p) for p in preds])

    ev = yteval_mod.YTVOSeval(gt_api, dt_api, "segm")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    capsys.readouterr()  # swallow the api's prints
    ap_ref, ap50_ref, ap75_ref = ev.stats[0], ev.stats[1], ev.stats[2]

    ours = YTVISEval(gts, preds).evaluate()
    assert abs(ours["AP"] - ap_ref) < 1e-9, (ours["AP"], ap_ref)
    assert abs(ours["AP50"] - ap50_ref) < 1e-9, (ours["AP50"], ap50_ref)
    assert abs(ours["AP75"] - ap75_ref) < 1e-9, (ours["AP75"], ap75_ref)
