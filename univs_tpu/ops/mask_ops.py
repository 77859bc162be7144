"""Mask / box tensor utilities (pure JAX, static shapes).

Rebuilds the helper layer the reference scatters across
``univs/utils/comm.py``, detectron2 box ops, and PointRend point
sampling (reference: video_criterion.py point-sampled losses,
detect_newly_entities_per_clip NMS — inference_video_entity.py:517-652).
All functions tolerate empty/invalid masks via validity masking instead
of dynamic shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# boxes
# ---------------------------------------------------------------------------

def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Binary masks [..., H, W] -> xyxy boxes [..., 4] (0-valued if empty)."""
    *lead, H, W = masks.shape
    m = masks > 0.5
    any_mask = m.any(axis=(-2, -1))

    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    big = jnp.float32(1e8)

    x_proj = m.any(axis=-2)  # [..., W]
    y_proj = m.any(axis=-1)  # [..., H]
    x0 = jnp.min(jnp.where(x_proj, xs, big), axis=-1)
    x1 = jnp.max(jnp.where(x_proj, xs + 1.0, -big), axis=-1)
    y0 = jnp.min(jnp.where(y_proj, ys, big), axis=-1)
    y1 = jnp.max(jnp.where(y_proj, ys + 1.0, -big), axis=-1)
    boxes = jnp.stack([x0, y0, x1, y1], axis=-1)
    return jnp.where(any_mask[..., None], boxes, jnp.zeros_like(boxes))


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: a [N, 4], b [M, 4] -> [N, M] (xyxy)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


def generalized_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    iou = box_iou(a, b)
    lt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    hull = jnp.maximum(wh[..., 0] * wh[..., 1], 1e-6)
    inter_lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    inter_rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    inter_wh = jnp.clip(inter_rb - inter_lt, 0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return iou - (hull - union) / hull


def mask_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise mask IoU: a [N, *S], b [M, *S] binary -> [N, M]."""
    af = (a > 0.5).reshape(a.shape[0], -1).astype(jnp.float32)
    bf = (b > 0.5).reshape(b.shape[0], -1).astype(jnp.float32)
    inter = af @ bf.T
    union = af.sum(-1)[:, None] + bf.sum(-1)[None, :] - inter
    return inter / jnp.maximum(union, 1.0)


def mask_quality_score(mask_logits: jnp.ndarray, thr: float = 0.5) -> jnp.ndarray:
    """Mean foreground/background confidence of predicted masks.

    Reference scores mask quality as mean sigmoid prob over the
    predicted-foreground region (inference_video_entity.py quality
    scoring for newly-entity admission).
    mask_logits: [..., H, W] -> [...]
    """
    prob = jax.nn.sigmoid(mask_logits)
    fg = prob > thr
    fg_score = (prob * fg).sum(axis=(-2, -1)) / jnp.maximum(fg.sum(axis=(-2, -1)), 1)
    return fg_score


# ---------------------------------------------------------------------------
# point sampling (PointRend-style)
# ---------------------------------------------------------------------------

def point_sample(feats: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample at normalized coords (align_corners=False).

    feats: [C, H, W]; coords: [P, 2] in [0, 1] (x, y) -> [P, C].
    """
    C, H, W = feats.shape
    x = coords[:, 0] * W - 0.5
    y = coords[:, 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    flat = feats.reshape(C, H * W)

    def g(xi, yi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        return flat[:, yc * W + xc] * inb.astype(feats.dtype)  # [C, P]

    out = (
        g(x0, y0) * ((1 - wx1) * (1 - wy1))
        + g(x0 + 1, y0) * (wx1 * (1 - wy1))
        + g(x0, y0 + 1) * ((1 - wx1) * wy1)
        + g(x0 + 1, y0 + 1) * (wx1 * wy1)
    )
    return out.T  # [P, C]


def get_uncertain_point_coords(
    rng: jax.Array,
    mask_logits: jnp.ndarray,
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jnp.ndarray:
    """PointRend importance sampling of loss points.

    mask_logits: [N, H, W] (per-instance logits); returns [N, num_points, 2]
    normalized (x, y).  Mirrors detectron2's
    ``get_uncertain_point_coords_with_randomness`` used by the
    reference's mask losses (video_criterion.py:570).
    """
    N = mask_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    k_uncertain = int(importance_sample_ratio * num_points)
    k_random = num_points - k_uncertain

    r1, r2 = jax.random.split(rng)
    cand = jax.random.uniform(r1, (N, n_sampled, 2))

    def per_inst(logits, coords):
        vals = point_sample(logits[None], coords)[:, 0]  # [n_sampled]
        uncertainty = -jnp.abs(vals)
        _, idx = jax.lax.top_k(uncertainty, k_uncertain)
        return coords[idx]

    picked = jax.vmap(per_inst)(mask_logits, cand)  # [N, k_uncertain, 2]
    rand = jax.random.uniform(r2, (N, k_random, 2))
    return jnp.concatenate([picked, rand], axis=1)


# ---------------------------------------------------------------------------
# NMS (jittable, fixed size)
# ---------------------------------------------------------------------------

def nms_keep_from_iou(iou: jnp.ndarray, scores: jnp.ndarray, iou_thres: float, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS given a precomputed pairwise IoU matrix [N, N]."""
    N = iou.shape[0]
    if valid is None:
        valid = jnp.ones((N,), dtype=bool)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    iou_s = iou[order][:, order]
    v = valid[order]

    def body(i, keep):
        sup = (iou_s[i] > iou_thres) & keep & (jnp.arange(N) < i)
        return keep.at[i].set(keep[i] & ~sup.any())

    keep_sorted = jax.lax.fori_loop(0, N, body, v)
    return keep_sorted[jnp.argsort(order)]


def nms_triu_keep_from_iou(iou: jnp.ndarray, scores: jnp.ndarray, iou_thres: float,
                           valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """The reference entity-dedup law (NOT greedy NMS): sort by score,
    drop any candidate whose max IoU against ANY higher-scored candidate
    exceeds the threshold — suppressed candidates still suppress others
    (``torch.triu(max_biou, diagonal=1).max(0)``,
    inference_video_entity.py:556-559 / :682-692)."""
    N = iou.shape[0]
    if valid is None:
        valid = jnp.ones((N,), dtype=bool)
    s = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-s)  # stable: ties keep original index order
    iou_s = iou[order][:, order]
    v = valid[order]
    upper = jnp.triu(jnp.ones((N, N), bool), k=1)
    max_from_higher = jnp.where(upper & v[:, None], iou_s, -jnp.inf).max(0)
    keep_sorted = v & (max_from_higher < iou_thres)
    return keep_sorted[jnp.argsort(order)]


def pairwise_mask_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Binary masks [N, H, W] x [M, H, W] -> IoU [N, M]
    (reference: batched_mask_iou semantics)."""
    af = a.reshape(a.shape[0], -1).astype(jnp.float32)
    bf = b.reshape(b.shape[0], -1).astype(jnp.float32)
    inter = af @ bf.T
    union = af.sum(-1)[:, None] + bf.sum(-1)[None, :] - inter
    return inter / jnp.maximum(union, 1.0)


def nms_keep(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thres: float, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS over a fixed-size set -> boolean keep mask [N].

    Jittable (O(N) sequential steps over sorted order).  Matches the
    reference's ``batched_nms`` use for newly-entity dedup
    (inference_video_entity.py:517-652, nms_thres 0.85).
    """
    return nms_keep_from_iou(box_iou(boxes, boxes), scores, iou_thres, valid)


# ---------------------------------------------------------------------------
# resize / paste
# ---------------------------------------------------------------------------

def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize on the last two axes (align_corners=False),
    matching ``F.interpolate(..., mode='bilinear', align_corners=False)``.
    x: [..., H, W].
    """
    *lead, H, W = x.shape
    oh, ow = out_hw
    if (H, W) == (oh, ow):
        return x
    # antialias=False: torch's F.interpolate does plain bilinear taps even
    # when downsampling; jax.image.resize defaults to antialias=True which
    # diverges substantially on downsamples (sign flips across the 0-logit
    # threshold feeding the masked-attention bias).
    return jax.image.resize(x, (*lead, oh, ow), method="bilinear", antialias=False)
