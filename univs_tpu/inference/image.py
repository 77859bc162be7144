"""Image generic segmentation (COCO / ADE20K instance, semantic,
panoptic) — exact transcription of the reference's
``InferenceImageGenericSegmentation``
(reference: univs/inference/inference_image_generic_seg.py:176-450).

Pipeline per image (1-frame pseudo-video):

1. model forward in detection mode with the dataset's category prompt
   queries (``prompt_as_queries``) — ``pred_logits`` already sliced to
   the dataset's bank rows, ``pred_masks`` at 1/4;
2. bilinear upsample of mask logits to the padded size; per-query mask
   quality ``count(>1)/count(>-1)`` (utils/comm.py:86-89) multiplied
   into the sigmoid class scores (:242-244);
3. ``sem_seg_postprocess``: crop padding, bilinear resize to the output
   size (sem_seg_postprocess_before_inference=True for instance/
   panoptic configs);
4. task heads:
   - :func:`instance_inference` (:378-434) — learnable queries only,
     thing-class filtering for panoptic metadata, class-batched box NMS
     0.85, flattened (query, class) top-k, masks>0;
   - :func:`semantic_inference` (:287-304) — optional prompt-query-only
     slice, top-200, temperature-0.06 softmax einsum;
   - :func:`panoptic_inference` (:306-376) — drops thing-class PROMPT
     queries, NMS 0.9, keep by raw sigmoid max > object_mask_threshold,
     rank by temperature softmax, argmax merge in QUERY order with
     overlap filtering and stuff merging.

All post-processing is host-side numpy: the per-image tensors are
small and the laws are control-flow-heavy; the device does the model
forward + upsampling.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# small numpy helpers (torchvision.ops semantics)
# ---------------------------------------------------------------------------


def masks_to_boxes_np(masks: np.ndarray) -> np.ndarray:
    """[Q, H, W] binary -> xyxy boxes; [0,0,0,0] for empty masks
    (reference: univs/utils/comm.py convert_mask_to_box:41-79)."""
    Q, h, w = masks.shape
    boxes = np.zeros((Q, 4), np.float32)
    for q in range(Q):
        ys, xs = np.nonzero(masks[q])
        if len(ys) == 0:
            continue
        boxes[q] = [xs.min(), ys.min(), xs.max(), ys.max()]
    empty = ~masks.any((-2, -1))
    boxes[empty] = 0
    return boxes


def _nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Greedy NMS, torchvision.ops.nms semantics. Returns kept indices
    sorted by descending score."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    area = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(boxes[:, 3] - boxes[:, 1], 0)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        lt = np.maximum(boxes[i, :2], boxes[order, :2])
        rb = np.minimum(boxes[i, 2:], boxes[order, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / np.maximum(area[i] + area[order] - inter, 1e-9)
        suppressed[order[iou > iou_threshold]] = True
        suppressed[i] = False  # keep self
    return np.asarray(keep, np.int64)


def batched_nms_np(boxes, scores, labels, iou_threshold) -> np.ndarray:
    """torchvision.ops.batched_nms: per-class NMS via coordinate offset."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    max_coord = boxes.max() + 1
    offsets = labels.astype(np.float32) * max_coord
    shifted = boxes + offsets[:, None]
    return _nms(shifted, scores, iou_threshold)


def mask_quality_scores_np(mask_logits: np.ndarray) -> np.ndarray:
    """count(>1)/count(>-1) stability score
    (reference: univs/utils/comm.py calculate_mask_quality_scores)."""
    pos = (mask_logits > 1).reshape(mask_logits.shape[0], -1).sum(-1)
    tot = (mask_logits > -1).reshape(mask_logits.shape[0], -1).sum(-1)
    return pos / np.maximum(tot, 1)


def postprocess_nms(scores, mask_pred, box_pred=None, biou_threshold=0.85):
    """Class-batched box NMS over query rows
    (reference: inference_image_generic_seg.py:436-450)."""
    if box_pred is None:
        box_pred = masks_to_boxes_np(mask_pred > 0.0)
    s_nms = scores.max(-1)
    labels = scores.argmax(-1)
    keep = batched_nms_np(box_pred.astype(np.float32), s_nms, labels, biou_threshold)
    return scores[keep], mask_pred[keep], box_pred[keep]


# ---------------------------------------------------------------------------
# the three task heads
# ---------------------------------------------------------------------------


def instance_inference(
    mask_cls: np.ndarray,  # [Q, K] sigmoid scores x quality
    mask_pred: np.ndarray,  # [Q, H, W] logits at output size
    num_queries: int,
    thing_contiguous_ids: Optional[Sequence[int]] = None,
    topk: int = 100,
    prompt_as_queries: bool = True,
) -> List[Dict]:
    """Instance results (reference :378-434).  Returns dicts with
    0-based ``category_id`` indexing the (possibly thing-sliced) class
    axis remapped back to the dataset's contiguous ids, ``score``, and
    a binary ``mask``."""
    box_pred = masks_to_boxes_np(mask_pred > 0)
    if prompt_as_queries:
        mask_cls = mask_cls[:num_queries]
        mask_pred = mask_pred[:num_queries]
        box_pred = box_pred[:num_queries]

    K = mask_cls.shape[-1]
    thing_ids = list(thing_contiguous_ids) if thing_contiguous_ids is not None else list(range(K))
    class_map = np.asarray(thing_ids, np.int64)
    if len(thing_ids) != K:
        labels = mask_cls.argmax(-1)
        keep = np.isin(labels, thing_ids)
        mask_cls = mask_cls[:, thing_ids]
        if keep.sum() == 0:
            s = mask_cls.max(-1)
            keep = s >= min(0.1, s.max() if len(s) else 0.1)
        mask_cls = mask_cls[keep]
        mask_pred = mask_pred[keep]
        box_pred = box_pred[keep]

    mask_cls, mask_pred, box_pred = postprocess_nms(mask_cls, mask_pred, box_pred)

    Kc = mask_cls.shape[-1]
    flat = mask_cls.reshape(-1)
    k = min(topk, flat.size)
    if k == 0:
        return []
    top = np.argsort(-flat, kind="stable")[:k]
    out = []
    for t in top:
        q, c = divmod(int(t), Kc)
        out.append({
            "category_id": int(class_map[c]),
            "score": float(flat[t]),
            "mask": (mask_pred[q] > 0).astype(np.uint8),
        })
    return out


def semantic_inference(
    mask_cls: np.ndarray,  # [Q, K]
    mask_pred: np.ndarray,  # [Q, H, W] logits
    num_queries: int,
    disable_semantic_queries: bool = False,
    prompt_as_queries: bool = True,
    topk: int = 200,
) -> np.ndarray:
    """Semantic evidence map [K, H, W] (reference :287-304); argmax is
    the evaluator's job."""
    if prompt_as_queries and disable_semantic_queries:
        mask_cls = mask_cls[num_queries:]
        mask_pred = mask_pred[num_queries:]
    k = min(topk, mask_cls.shape[0])
    keep = np.argsort(-mask_cls.max(-1), kind="stable")[:k]
    mask_cls = mask_cls[keep]
    mask_pred = mask_pred[keep]
    prob = 1.0 / (1.0 + np.exp(-mask_pred))
    w = np.exp(mask_cls / 0.06)
    w = w / w.sum(-1, keepdims=True)  # (mask_cls/0.06).softmax(-1)
    return np.einsum("qc,qhw->chw", w, prob)


def panoptic_inference(
    mask_cls: np.ndarray,  # [Q, K]
    mask_pred: np.ndarray,  # [Q, H, W] logits
    num_queries: int,
    thing_contiguous_ids: Set[int],
    object_mask_threshold: float = 0.05,
    overlap_threshold: float = 0.8,
    prompt_as_queries: bool = True,
) -> Tuple[np.ndarray, List[Dict]]:
    """Panoptic map + segments (reference :306-376).  ``category_id`` in
    segments_info is the 0-based contiguous class id."""
    Q = mask_cls.shape[0]
    if prompt_as_queries:
        rows = [i for i in range(Q)
                if i < num_queries or (i - num_queries) not in thing_contiguous_ids]
        mask_cls = mask_cls[rows]
        mask_pred = mask_pred[rows]

    mask_cls, mask_pred, _ = postprocess_nms(mask_cls, mask_pred, biou_threshold=0.9)

    raw_scores = mask_cls.max(-1)
    prob = 1.0 / (1.0 + np.exp(-mask_pred))
    keep = raw_scores > object_mask_threshold
    w = np.exp(mask_cls / 0.06)
    w = w / w.sum(-1, keepdims=True)
    scores_t = w.max(-1)
    labels_t = w.argmax(-1)
    cur_scores = scores_t[keep]
    cur_classes = labels_t[keep]
    cur_masks = prob[keep]

    h, w_ = mask_pred.shape[-2:]
    panoptic = np.zeros((h, w_), np.int32)
    segments_info: List[Dict] = []
    if cur_masks.shape[0] == 0:
        return panoptic, segments_info

    cur_prob_masks = cur_scores[:, None, None] * cur_masks
    cur_mask_ids = cur_prob_masks.argmax(0)
    stuff_memory: Dict[int, int] = {}
    current_segment_id = 0
    for k in range(cur_masks.shape[0]):  # QUERY order, not score order
        pred_class = int(cur_classes[k])
        isthing = pred_class in thing_contiguous_ids
        sel = cur_mask_ids == k
        mask_area = int(sel.sum())
        original_area = int((cur_masks[k] >= 0.5).sum())
        mask = sel & (cur_masks[k] >= 0.5)
        if mask_area > 0 and original_area > 0 and mask.sum() > 0:
            if mask_area / original_area < overlap_threshold:
                continue
            if not isthing:
                if pred_class in stuff_memory:
                    panoptic[mask] = stuff_memory[pred_class]
                    continue
                stuff_memory[pred_class] = current_segment_id + 1
            current_segment_id += 1
            panoptic[mask] = current_segment_id
            segments_info.append({
                "id": current_segment_id,
                "isthing": bool(isthing),
                "category_id": pred_class,
            })
    return panoptic, segments_info


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


class ImageDriver:
    """One-image-at-a-time generic segmentation driver."""

    def __init__(self, cfg, params, num_classes: int):
        import jax
        import jax.numpy as jnp

        from univs_tpu.models.univs import (
            build_backbone, build_decoder, build_pixel_decoder, compute_dtype_of,
        )
        from univs_tpu.structures import TextPrompts

        self.cfg = cfg
        self.params = params
        self.num_queries = cfg.decoder.num_queries
        self.num_classes = num_classes
        dtype = compute_dtype_of(cfg)
        backbone = build_backbone(cfg.backbone, dtype=dtype)
        pd, dec = build_pixel_decoder(cfg), build_decoder(cfg)
        mean = np.asarray(cfg.pixel_mean, np.float32)
        std = np.asarray(cfg.pixel_std, np.float32)

        @jax.jit
        def image_fn(params, frame, cls_emb):
            # frame: [1, H, W, 3]
            x = ((frame - mean) / std).astype(dtype)
            feats = backbone.apply({"params": params["backbone"]}, x)
            mask_features, _, _, ms = pd.apply({"params": params["pixel_decoder"]}, feats)
            tp = TextPrompts(
                embs=cls_emb[None, :, None, :],
                valid=jnp.ones((1, cls_emb.shape[0]), bool),
            )
            out = dec.apply(
                {"params": params["decoder"]}, tuple(ms), mask_features,
                jnp.zeros((1, 1), jnp.int32), task="detection",
                text_prompts=tp, cls_emb=cls_emb,
            )
            logits = jax.nn.sigmoid(out["pred_logits"][0].astype(jnp.float32))  # [Q, K]
            masks = out["pred_masks"][0, :, 0].astype(jnp.float32)  # [Q, h4, w4]
            return logits, masks

        self._image_fn = image_fn

    def run(self, frame: np.ndarray, cls_emb, image_size, out_size):
        """frame [1, H, W, 3] padded RGB.  Returns (mask_cls [Q, K] =
        sigmoid x quality, mask_pred [Q, out_h, out_w] logits) following
        the reference's upsample -> quality -> crop -> resize order
        (:224-256)."""
        import jax.numpy as jnp

        from univs_tpu.inference.driver import _upsample_logits

        H, W = frame.shape[1:3]
        logits, masks = self._image_fn(self.params, jnp.asarray(frame, jnp.float32), cls_emb)
        logits = np.asarray(logits)
        masks = np.asarray(masks)
        # upsample to padded size for the quality counts (:225-243)
        import torch
        import torch.nn.functional as F

        up_pad = F.interpolate(
            torch.from_numpy(masks)[None], size=(H, W), mode="bilinear", align_corners=False
        )[0].numpy()
        quality = mask_quality_scores_np(up_pad)
        mask_cls = logits * quality[:, None]
        # sem_seg_postprocess: crop then resize to out_size
        mask_pred = _upsample_logits(masks, image_size, out_size, (H, W))
        return mask_cls, mask_pred
