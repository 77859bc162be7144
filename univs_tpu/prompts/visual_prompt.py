"""Visual prompt encoding: point / box / mask annotations -> prompt
feature sets on the 1/8 feature grid.

TPU-native rebuild of the reference's ``VisualPromptEncoder`` /
``VisualPromptSampler`` (reference: univs/modeling/prompt_encoder/
prompt_encoder.py:58-779).  The reference mutates targets dicts with
data-dependent shapes and per-instance Python loops; here everything is
a pure function over static [Qp, ...] tensors with validity masks:

- per-instance "random in-mask pixel" selection becomes Gumbel-argmax
  over the in-mask priority map (train) or deterministic
  confidence-weighted center-biased argmax (inference; the reference
  also randomizes at inference — prompt_encoder.py:418-425 — we make it
  deterministic per SURVEY §7 "hard parts");
- dense R-point sampling becomes top-R over a priority map with
  per-point validity instead of index-repeat padding
  (prompt_encoder.py:477-481);
- instances whose mask is empty at the key frame get all-invalid kv
  entries rather than zero-vector blanks (the ProCA self-token keeps
  the softmax well-defined — see models/decoder.py).

All functions operate on ONE video; vmap over the batch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from univs_tpu.ops.mask_ops import box_cxcywh_to_xyxy, box_xyxy_to_cxcywh, masks_to_boxes
from univs_tpu.ops.position_encoding import SinePositionEncoding3D


class PromptSample(NamedTuple):
    kv: jnp.ndarray  # [Qp, R, C]
    kv_pe: jnp.ndarray  # [Qp, R, C]
    kv_valid: jnp.ndarray  # [Qp, R] bool
    valid: jnp.ndarray  # [Qp] bool


def _grid_coords(h: int, w: int) -> jnp.ndarray:
    """Pixel-center normalized (x, y) coords [H, W, 2]."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def _box_grid_mask(boxes: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Normalized xyxy boxes [Q, 4] -> binary grid masks [Q, H, W]."""
    coords = _grid_coords(h, w)  # [H, W, 2]
    x, y = coords[..., 0], coords[..., 1]
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    inside = (
        (x[None] >= x0[:, None, None])
        & (x[None] <= x1[:, None, None])
        & (y[None] >= y0[:, None, None])
        & (y[None] <= y1[:, None, None])
    )
    return inside


def _resize_nearest_mask(masks: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[Q, Hm, Wm] -> [Q, h, w] nearest (matches F.interpolate nearest)."""
    q = masks.shape[0]
    return jax.image.resize(masks, (q, h, w), method="nearest")


def _topk_points(
    priority: jnp.ndarray,  # [Q, H*W] (>0 where selectable)
    r: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select R pixel indices per instance by priority.

    Returns (idx [Q, R], valid [Q, R])."""
    vals, idx = jax.lax.top_k(priority, r)
    return idx, vals > 0


def sample_visual_prompts(
    img_feats_key: jnp.ndarray,  # [H, W, C] (1/8 src incl. level embed)
    img_pos_key: jnp.ndarray,  # [H, W, C]
    masks_key: jnp.ndarray,  # [Qp, Hm, Wm] float in [0, 1]
    boxes_key: jnp.ndarray,  # [Qp, 4] normalized xyxy
    occur_key: jnp.ndarray,  # [Qp] bool — target present in key frame
    prompt_flags: jnp.ndarray,  # [Qp] int: 0=point 1=box 2=mask
    num_points: int,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    mask_thresh: float = 0.5,
) -> PromptSample:
    """Encode one key frame's annotations into R-point prompt sets.

    Mirrors get_{point,box,mask}_prompt + get_dense_features
    (prompt_encoder.py:82-497) for all three types at once, selected
    per instance by ``prompt_flags``.
    """
    H, W, C = img_feats_key.shape
    Qp = masks_key.shape[0]
    R = num_points
    HW = H * W

    feats_flat = img_feats_key.reshape(HW, C)
    pos_flat = img_pos_key.reshape(HW, C)

    fm = _resize_nearest_mask(masks_key.astype(jnp.float32), H, W)  # [Qp, H, W]
    fm_flat = fm.reshape(Qp, HW)
    # per-instance threshold: min(thresh, max) keeps >=1 pixel for soft masks
    thr = jnp.minimum(mask_thresh, fm_flat.max(axis=1, keepdims=True))
    mask_binary = (fm_flat >= jnp.maximum(thr, 1e-6)) & (fm_flat > 0)

    box_binary = _box_grid_mask(boxes_key, H, W).reshape(Qp, HW)

    # ---- train-time jitter (box noise) — prompt_encoder.py:307-326 ----
    if train and rng is not None:
        r1, r2, rng = jax.random.split(rng, 3)
        cxcywh = box_xyxy_to_cxcywh(boxes_key)
        wh = cxcywh[:, 2:]
        noise_wh = jnp.clip(wh + 0.1 * wh * (2 * jax.random.uniform(r1, wh.shape) - 1), 0, 1)
        noise_c = jnp.clip(cxcywh[:, :2] + 0.1 * wh * (2 * jax.random.uniform(r2, wh.shape) - 1), 0, 1)
        big = (wh[:, 0] * wh[:, 1] > 0.09)[:, None]
        noised = box_cxcywh_to_xyxy(jnp.concatenate([noise_c, noise_wh], -1))
        boxes_noised = jnp.where(big, noised, boxes_key)
        box_binary = _box_grid_mask(boxes_noised, H, W).reshape(Qp, HW)

    # ---- dense point selection priorities -----------------------------
    if train and rng is not None:
        rk, rng = jax.random.split(rng)
        u = jax.random.uniform(rk, (Qp, HW), minval=0.1, maxval=1.0)
    else:
        # deterministic: prefer high mask confidence (stable across runs)
        u = 0.5 + 0.5 * fm_flat
    mask_priority = mask_binary.astype(jnp.float32) * u
    box_priority = box_binary.astype(jnp.float32) * u

    mask_idx, mask_sel_valid = _topk_points(mask_priority, R)
    box_idx, box_sel_valid = _topk_points(box_priority, R)

    # ---- point prompt: one point, feature repeated R times -----------
    # pick the in-mask point with max (center-biased) priority
    coords = _grid_coords(H, W).reshape(HW, 2)
    cxcywh = box_xyxy_to_cxcywh(boxes_key)
    ctr_dist = jnp.abs(coords[None] - cxcywh[:, None, :2])  # [Qp, HW, 2]
    in_ctr = (ctr_dist < 0.25 * jnp.maximum(cxcywh[:, None, 2:], 1e-6)).all(-1)
    point_priority = mask_priority * (1.0 + in_ctr.astype(jnp.float32))
    point_idx = jnp.argmax(point_priority, axis=1)  # [Qp]
    point_valid = jnp.take_along_axis(point_priority, point_idx[:, None], 1)[:, 0] > 0
    point_coords = coords[point_idx]  # [Qp, 2]

    point_feats = feats_flat[point_idx]  # [Qp, C] (grid-center sample)
    point_pe = pos_flat[point_idx]

    # ---- mean features (box / mask paths) ----------------------------
    w_mask = fm_flat * mask_binary
    mask_mean = (w_mask @ feats_flat) / jnp.maximum(w_mask.sum(1, keepdims=True), mask_thresh)
    box_f = box_binary.astype(jnp.float32)
    box_mean = (box_f @ feats_flat) / jnp.maximum(box_f.sum(1, keepdims=True), 1.0)

    # ---- gather dense kv ---------------------------------------------
    def gather(idx):
        return feats_flat[idx], pos_flat[idx]  # [Qp, R, C] each

    mask_kv, mask_pe = gather(mask_idx)
    box_kv, box_pe = gather(box_idx)
    pt_kv = jnp.broadcast_to(point_feats[:, None], (Qp, R, C))
    pt_pe = jnp.broadcast_to(point_pe[:, None], (Qp, R, C))
    pt_valid = jnp.broadcast_to(point_valid[:, None], (Qp, R))

    flags = prompt_flags[:, None, None]
    kv = jnp.where(flags == 0, pt_kv, jnp.where(flags == 1, box_kv, mask_kv))
    kv_pe = jnp.where(flags == 0, pt_pe, jnp.where(flags == 1, box_pe, mask_pe))
    f2 = prompt_flags[:, None]
    kv_valid = jnp.where(f2 == 0, pt_valid, jnp.where(f2 == 1, box_sel_valid, mask_sel_valid))

    valid = occur_key & (
        jnp.where(
            prompt_flags == 0,
            point_valid,
            jnp.where(prompt_flags == 1, box_sel_valid.any(1), mask_sel_valid.any(1)),
        )
    )
    kv_valid = kv_valid & valid[:, None]
    kv = kv * kv_valid[..., None]
    kv_pe = kv_pe * kv_valid[..., None]
    return PromptSample(kv=kv, kv_pe=kv_pe, kv_valid=kv_valid, valid=valid)


def sample_train_clip_prompts(
    img_feats: jnp.ndarray,  # [T, H, W, C]
    img_pos: jnp.ndarray,  # [T, H, W, C]
    masks: jnp.ndarray,  # [Qp, T, Hm, Wm]
    boxes: jnp.ndarray,  # [Qp, T, 4] normalized
    occur: jnp.ndarray,  # [Qp, T] bool
    obj_valid: jnp.ndarray,  # [Qp] bool real targets
    num_points: int,
    rng: jax.Array,
) -> Tuple[PromptSample, jnp.ndarray]:
    """Training-time sampling for one video clip.

    Random key frame + per-object random prompt type
    (25% point / 25% box / 50% mask — prompt_encoder.py:679-695),
    intra-clip propagation: features from the key frame drive all T
    frames.  Returns (PromptSample at key frame, key_fid).
    """
    T = img_feats.shape[0]
    Qp = masks.shape[0]
    r_key, r_type, r_sample = jax.random.split(rng, 3)
    key_fid = jax.random.randint(r_key, (), 0, T)

    u = jax.random.uniform(r_type, (Qp,))
    prompt_flags = jnp.where(u <= 0.25, 0, jnp.where(u <= 0.5, 1, 2))

    take = lambda a, axis: jnp.take(a, key_fid, axis=axis)
    sample = sample_visual_prompts(
        take(img_feats, 0), take(img_pos, 0),
        take(masks, 1), take(boxes, 1), take(occur, 1) & obj_valid,
        prompt_flags, num_points, rng=r_sample, train=True,
    )
    return sample, key_fid


def broadcast_prompt_sample(sample: PromptSample, t: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[Qp, R, C] key-frame sets -> per-frame [Qp, R, T, C] (+valid).

    The reference repeats key-frame features over the clip's T frames
    (prompt_encoder.py:494-495)."""
    Qp, R, C = sample.kv.shape
    kv = jnp.broadcast_to(sample.kv[:, :, None], (Qp, R, t, C))
    kv_pe = jnp.broadcast_to(sample.kv_pe[:, :, None], (Qp, R, t, C))
    kv_valid = jnp.broadcast_to(sample.kv_valid[:, :, None], (Qp, R, t))
    return kv, kv_pe, kv_valid
