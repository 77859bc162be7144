"""Reconstruct segmentation masks from SAVED semantic-extraction
features — the downstream consumer of SemanticExtractionDriver's
output (reference: semantic_feature_to_mask.py:30-150, the standalone
``ConvertSemanticFeatureToMask`` script).

    python tools/semantic_feature_to_mask.py features.npz \
        [--weights ckpt] [--bank datasets/concept_emb/...npz] \
        [--out output/semantic_masks] [--all] [--tiny]

``features.npz`` holds ``obj_tokens`` [T, C, Q] and ``mask_feats``
[T, h, w, C] (plus optionally ``cls_emb``) as produced by
SemanticExtractionDriver.run + np.savez.  Writes per-query mask grids
as PNGs and a summary JSON of kept query indices + top classes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("features", help=".npz with obj_tokens + mask_feats")
    p.add_argument("--weights", default=None, help="orbax/torch checkpoint")
    p.add_argument("--bank", default=None, help="category-bank .npz")
    p.add_argument("--out", default="output/semantic_masks")
    p.add_argument("--all", action="store_true",
                   help="keep every query (no confidence filter)")
    p.add_argument("--tiny", action="store_true", help="tiny test config")
    p.add_argument("--cls-thres", type=float, default=0.65)
    p.add_argument("--quality-thres", type=float, default=0.85)
    p.add_argument("--cls-start", type=int, default=1000)
    args = p.parse_args()

    import jax.numpy as jnp

    from univs_tpu.config import UniVSConfig, tiny_test_config
    from univs_tpu.inference.fast_vis import semantic_features_to_masks
    from univs_tpu.utils.checkpoint import load_params

    cfg = tiny_test_config() if args.tiny else UniVSConfig()
    data = np.load(args.features)
    obj_tokens, mask_feats = data["obj_tokens"], data["mask_feats"]

    if args.bank:
        cls_emb = jnp.asarray(np.load(args.bank)["embs"], jnp.float32)
    elif "cls_emb" in data:
        cls_emb = jnp.asarray(data["cls_emb"], jnp.float32)
    else:
        raise SystemExit("need --bank or a cls_emb entry in the npz")

    if args.weights:
        params = load_params(args.weights)
        if isinstance(params, dict) and "params" in params:
            params = params["params"]  # {"params": ...}-wrapped checkpoints
    else:
        raise SystemExit("need --weights (a converted UniVS checkpoint)")

    cls_logits, mask_logits, keep = semantic_features_to_masks(
        cfg, params, obj_tokens, mask_feats, cls_emb,
        apply_cls_thres=args.cls_thres,
        apply_mask_quality_thres=args.quality_thres,
        cls_start=args.cls_start,
        only_high_conf_masks=not args.all,
    )
    os.makedirs(args.out, exist_ok=True)
    # per-query binary mask grids (queries x frames), the reference's
    # plot_masks layout (semantic_feature_to_mask.py:121-138) without
    # the matplotlib dependency
    try:
        import cv2
    except Exception:
        cv2 = None
    n, T, h, w = mask_logits.shape
    for i in range(0, n, 10):
        chunk = (mask_logits[i:i + 10, :: max(T // 5, 1)] > 0)
        grid = chunk.transpose(0, 2, 1, 3).reshape(
            chunk.shape[0] * h, chunk.shape[1] * w).astype(np.uint8) * 255
        path = os.path.join(args.out, f"{i}.png")
        if cv2 is not None:
            cv2.imwrite(path, grid)
    summary = {
        "kept_queries": [int(k) for k in keep],
        "top_class": [int(c) for c in cls_logits.max(1).argmax(-1)]
        if len(keep) else [],
        "shape": list(mask_logits.shape),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
