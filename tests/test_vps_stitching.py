"""VPS panoptic stitching fidelity: EntityDriver.run_vps with a stubbed
stream vs a direct torch transcription of ``save_results_vps``
(reference: inference_video_entity.py:963-1094)."""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax.numpy as jnp

from univs_tpu.config import InferenceConfig, tiny_test_config


def _ref_save_results_vps(
    cur_masks, cur_scores_cls, cur_classes, thing_ids, overlap_thr,
    thing_memory, stuff_memory, image_size, out_size,
):
    """Direct transcription for one window (is_last collapsed; masks
    already cropped).  cur_masks: [E, n, H, W] raw logits at out_size."""
    cur_masks = torch.from_numpy(cur_masks)
    quality = (cur_masks > 1).flatten(1).sum(-1) / (cur_masks > -1).flatten(1).sum(-1).clamp(min=1)
    cur_scores = torch.from_numpy(cur_scores_cls) * quality
    for k in range(len(cur_scores)):
        isthing = int(cur_classes[k]) in thing_ids
        if k not in thing_memory and not isthing:
            cur_scores[k] *= 0.75

    panoptic = torch.zeros(cur_masks.shape[1:], dtype=torch.int32)
    cur_prob_masks = cur_scores.view(-1, 1, 1, 1) * cur_masks
    sig = cur_masks.sigmoid()
    cur_mask_ids = cur_prob_masks.argmax(0)
    is_bg = (sig < 0.5).sum(0) == len(cur_masks)
    cur_mask_ids[is_bg] = -1

    current = max(list(thing_memory.values()) + list(stuff_memory.values()), default=0)
    for k in range(len(cur_scores)):
        pred_class = int(cur_classes[k])
        isthing = pred_class in thing_ids
        mask_area = int((cur_mask_ids == k).sum())
        original_area = int((sig[k] >= 0.5).sum())
        mask = (cur_mask_ids == k) & (sig[k] >= 0.5)
        if mask_area > 0 and original_area > 0 and int(mask.sum()) > 0:
            thr = 0.5 * overlap_thr if k in thing_memory else overlap_thr
            if isthing and mask_area / original_area < thr:
                continue
            if not isthing:
                if pred_class not in stuff_memory:
                    stuff_memory[pred_class] = current + 1
                    current += 1
                seg = stuff_memory[pred_class]
            else:
                if k not in thing_memory:
                    thing_memory[k] = current + 1
                    current += 1
                seg = thing_memory[k]
            panoptic[mask] = seg
    return panoptic.numpy()


def test_run_vps_matches_reference_stitching():
    from univs_tpu.inference.driver import EntityDriver

    cfg = tiny_test_config()
    cfg = cfg.replace(inference=dataclasses.replace(
        cfg.inference, num_frames=2, clip_stride=1, num_frames_window=6,
        overlap_threshold=0.3,
    ))
    V, H, W = 5, 64, 96
    E, K = 3, 4
    driver = EntityDriver(cfg, params={}, num_classes=K, capacity=E)

    rng = np.random.RandomState(0)
    # one emitted window covering the whole video; logits at 1/4 res
    win = (rng.randn(E, V, H // 4, W // 4) * 3).astype(np.float16)
    scores = rng.rand(E, K).astype(np.float32)
    valid = np.array([True, True, True])
    driver._stream = lambda frames, cls_emb, divide, thing_mask=None: (
        [win], [0], [scores], [valid], None, None
    )
    thing_ids = {1, 3}  # classes 1 and 3 are things (1-based)

    panoptic, seg_info = driver.run_vps(
        np.zeros((V, H, W, 3), np.float32), jnp.zeros((K, 16)),
        thing_class_ids=thing_ids, image_size=(H, W), out_size=(H, W),
    )

    # reference transcription on identical upsampled inputs
    from univs_tpu.inference.driver import _upsample_logits

    up = np.stack(
        [_upsample_logits(win[:, t], (H, W), (H, W), (H, W)) for t in range(V)], axis=1
    )  # [E, V, H, W]
    cls = scores.argmax(-1) + 1
    thing_memory, stuff_memory = {}, {}
    ref = _ref_save_results_vps(
        up, scores.max(-1), cls, thing_ids, 0.3,
        thing_memory, stuff_memory, (H, W), (H, W),
    )
    agree = (panoptic == ref).mean()
    assert agree > 0.999, f"panoptic agreement {agree:.4f}"
    # segment infos consistent with memories
    ids = {s["id"] for s in seg_info}
    assert ids == set(thing_memory.values()) | set(stuff_memory.values())
