#!/usr/bin/env python
"""Demo: run UniVS-TPU on a raw video / image folder and write overlays.

Equivalent of the reference's demo entry (reference: demo/demo.py +
demo/predictor.py VisualizationDemo/VideoPredictor;
tools/test_custom_videos/*).

    python tools/demo.py --input video.mp4 --output out.avi \
        --weights ckpt --bank bank.npy --dataset-ns ytvis21
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def read_frames(path: str, max_frames: int = 300):
    import cv2

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*")))[:max_frames]
        return [cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB) for f in files]
    cap = cv2.VideoCapture(path)
    frames = []
    while len(frames) < max_frames:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return frames


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", default="demo_out.avi")
    p.add_argument("--weights", default=None)
    p.add_argument("--bank", default=None)
    p.add_argument("--dataset-ns", default="ytvis21")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--score-thres", type=float, default=0.3)
    p.add_argument("--tiny", action="store_true", help="tiny model smoke mode")
    p.add_argument("--max-frames", type=int, default=300)
    args = p.parse_args()
    run(args)


def run(args):

    import jax.numpy as jnp

    from tools.run_net import build_cfg, init_params
    from univs_tpu.data.augment import resize_shortest_edge, transformed_image_size
    from univs_tpu.data.category_info import COMBINED_DATASETS_CATEGORY_INFO, TOTAL_CATEGORY_ROWS
    from univs_tpu.inference.driver import EntityDriver
    from univs_tpu.utils.checkpoint import load_category_bank, load_params
    from univs_tpu.utils.rle import decode as rle_decode
    from univs_tpu.utils.visualization import overlay_instances, write_video

    class A:  # minimal args shim for build_cfg
        backbone = args.backbone
        num_frames = 5
        bf16 = not getattr(args, "tiny", False)
        tiny = getattr(args, "tiny", False)

    cfg, _ = build_cfg(A)
    bank = load_category_bank(args.bank, TOTAL_CATEGORY_ROWS, cfg.decoder.clip_cls_emb_dim)
    if getattr(args, "tiny", False):
        # tiny decoder has a small embedding width: seeded random bank
        rngb = np.random.RandomState(0)
        bank = rngb.randn(TOTAL_CATEGORY_ROWS, cfg.decoder.clip_cls_emb_dim).astype(np.float32)
    k, start = COMBINED_DATASETS_CATEGORY_INFO[args.dataset_ns]
    cls_slice = bank[start : start + k]

    model, params = init_params(cfg, bank)
    if args.weights:
        params = load_params(args.weights)

    frames = read_frames(args.input, max_frames=getattr(args, "max_frames", 300))
    assert frames, f"no frames read from {args.input}"
    h, w = frames[0].shape[:2]
    t = resize_shortest_edge((h, w), cfg.inference.min_size_test, 1333, 32)
    images = np.stack([t.apply_image(f) for f in frames]).astype(np.float32)
    ih, iw = transformed_image_size(t, (h, w))

    driver = EntityDriver(cfg, params, num_classes=k, capacity=cfg.inference.max_num_instances)
    results = driver.run_vis(images, jnp.asarray(cls_slice), image_size=(ih, iw), out_size=(h, w))

    out_frames = []
    for fi, frame in enumerate(frames):
        masks = []
        for r in results:
            if float(np.max(r["score"])) < args.score_thres:
                continue
            masks.append(rle_decode(r["segmentations"][fi]))
        out_frames.append(overlay_instances(frame, masks))
    write_video(out_frames, args.output)
    print(f"wrote {args.output} ({len(out_frames)} frames, {len(results)} entities)")


if __name__ == "__main__":
    main()
