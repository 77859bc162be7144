"""PVOS (VIPOSeg) G-score.

Standalone rebuild of the reference's VIPOSeg evaluation
(reference: univs/evaluation/eval_pvos.py + eval_utils_viposeg.py —
per-object J&F as in DAVIS, grouped into thing/stuff x seen/unseen
class buckets; G = mean over the group means).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np

from univs_tpu.evaluation.davis import db_eval_boundary, db_eval_iou


def evaluate_pvos_video(
    gt_masks: np.ndarray,  # [N, T, H, W]
    pred_masks: np.ndarray,  # [N, T, H, W]
    obj_classes: Sequence[int],
    stuff_classes: set,
    unseen_classes: set = frozenset(),
) -> Dict[str, float]:
    groups = defaultdict(list)
    n, t = gt_masks.shape[:2]
    for i in range(n):
        j = db_eval_iou(gt_masks[i], pred_masks[i]).mean()
        f = db_eval_boundary(gt_masks[i], pred_masks[i]).mean()
        jf = (j + f) / 2
        c = obj_classes[i]
        kind = "stuff" if c in stuff_classes else "thing"
        seen = "unseen" if c in unseen_classes else "seen"
        groups[f"{kind}_{seen}"].append(jf)
        groups[kind].append(jf)
    out = {k: float(np.mean(v)) for k, v in groups.items()}
    th = out.get("thing", np.nan)
    sf = out.get("stuff", np.nan)
    out["G"] = float(np.nanmean([th, sf]))
    return out
