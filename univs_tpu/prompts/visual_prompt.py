"""Visual prompt encoding: point / box / mask annotations -> prompt
feature sets on the 1/8 feature grid.

TPU-native rebuild of the reference's ``VisualPromptEncoder`` /
``VisualPromptSampler`` (reference: univs/modeling/prompt_encoder/
prompt_encoder.py:58-779).  The reference mutates targets dicts with
data-dependent shapes and per-instance Python loops; here everything is
a pure function over static [Qp, ...] tensors with validity masks.

Reference-exact inference semantics (activation-parity-tested in
tests/test_prompt_parity.py):

- mask prompts select the in-mask pixels of the nearest-downsampled
  mask thresholded at ``min(0.5, global_max)`` (prompt_encoder.py:221),
  in raster order, CYCLICALLY REPEATED to R points when fewer than R
  pixels exist (prompt_encoder.py:478-479) — the multiplicity weights
  both the ProCA attention and the prompt-query mean;
- instances empty at the key frame produce all-zero feature/pe sets
  (prompt_encoder.py:258-261); they still occupy kv slots and attend
  as zero tokens in ProCA (the reference applies no ProCA mask);
- when MORE than R in-mask pixels exist the reference randomizes
  (randperm, prompt_encoder.py:481) — we take the first R in raster
  order (deterministic; documented deviation, metric-neutral since the
  dense set is consumed as an attention kv set).

Train-time paths keep the randomized selection laws
(25/25/50 point/box/mask mix, box jitter) via explicit rng.

All functions operate on ONE video; vmap over the batch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from univs_tpu.ops.mask_ops import box_cxcywh_to_xyxy, box_xyxy_to_cxcywh


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
    """Normalized xyxy boxes [Q, 4] -> binary grid masks [Q, H, W].

    Matches the reference's ``convert_box_to_mask``
    (univs/utils/comm.py:6-38): integer grid coords against
    floor(x1*w), ceil(x2*w) with a strict > on the min edge.
    """
    scale = jnp.array([w, h, w, h], jnp.float32)
    b = boxes * scale
    x1, y1 = jnp.floor(b[:, 0]), jnp.floor(b[:, 1])
    x2, y2 = jnp.ceil(b[:, 2]), jnp.ceil(b[:, 3])
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    inside = (
        (gx[None] > x1[:, None, None])
        & (gx[None] <= x2[:, None, None])
        & (gy[None] > y1[:, None, None])
        & (gy[None] <= y2[:, None, None])
    )
    return inside


def _resize_nearest_mask(masks: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[Q, Hm, Wm] -> [Q, h, w] nearest-downsample.

    torch ``F.interpolate(mode='nearest')`` uses ``src = floor(dst*scale)``
    which, for integer scale factors, is plain strided subsampling —
    reproduce that exactly; fall back to jax.image.resize otherwise."""
    q, hm, wm = masks.shape
    if hm % h == 0 and wm % w == 0:
        return masks[:, :: hm // h, :: wm // w][:, :h, :w]
    return jax.image.resize(masks, (q, h, w), method="nearest")


def _cyclic_dense_select(priority: jnp.ndarray, r: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference dense-point law (prompt_encoder.py:471-481): take the
    selectable pixels (priority > 0) ordered by descending priority,
    cyclically repeated to fill R slots.

    priority: [Q, HW].  Returns (idx [Q, R], n_selectable [Q]).
    """
    hw = priority.shape[-1]
    k = min(r, hw)
    _, idx = jax.lax.top_k(priority, k)  # stable: ties keep raster order
    if k < r:  # more dense points than pixels: cyclic from the start
        idx = jnp.concatenate([idx, idx[:, : r - k]], axis=1)[:, :r]
    n = (priority > 0).sum(-1)  # [Q]
    j = jnp.arange(r)[None] % jnp.maximum(jnp.minimum(n, k), 1)[:, None]
    return jnp.take_along_axis(idx, j, axis=1), n


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
    mask_only: bool = False,
) -> PromptSample:
    """Encode one key frame's annotations into R-point prompt sets.

    Mirrors get_{point,box,mask}_prompt + get_dense_features
    (prompt_encoder.py:82-497) for all three types at once, selected
    per instance by ``prompt_flags``.

    ``mask_only``: static fast path for the per-clip pool re-encode,
    where every prompt is a mask (prompt_flags all 2, inference only) —
    skips the box-grid build, the box dense-point top-k, and the point
    argmax, which are computed-and-discarded otherwise.  Numerically
    identical to the generic path at prompt_flags==2.  Measured
    whole-program: ~neutral at E=60 on the 1/8 grid (the clip step's
    re-encode cost is the mask top-k + gathers + ring writes, not the
    dead branches — tools/probe_clip_ablation.py), kept because it also
    admits ``boxes_key=None`` (the caller's masks_to_boxes was real
    dead work) and halves the sampler's compiled size.
    """
    H, W, C = img_feats_key.shape
    Qp = masks_key.shape[0]
    R = num_points
    HW = H * W

    feats_flat = img_feats_key.reshape(HW, C)
    pos_flat = img_pos_key.reshape(HW, C)

    fm = _resize_nearest_mask(masks_key.astype(jnp.float32), H, W)  # [Qp, H, W]
    fm_flat = fm.reshape(Qp, HW)
    # GLOBAL threshold min(0.5, max over all instances+pixels)
    # (prompt_encoder.py:221 `feat_masks.max()` is dim-less); the
    # `fm > 0` guard only changes the degenerate all-blank case, where
    # the reference gathers arbitrary pixels that are zeroed downstream
    thr = jnp.minimum(mask_thresh, fm_flat.max())
    mask_binary = (fm_flat >= jnp.maximum(thr, 1e-6)) & (fm_flat > 0)

    if mask_only:
        assert not train
        u = (HW - jnp.arange(HW, dtype=jnp.float32))[None] / HW
        mask_idx, n_mask = _cyclic_dense_select(mask_binary.astype(jnp.float32) * u, R)
        kv = feats_flat[mask_idx]
        kv_pe = pos_flat[mask_idx]
        valid = occur_key & (n_mask > 0)
        kv_valid = jnp.broadcast_to(valid[:, None], (Qp, R))
        kv = kv * kv_valid[..., None]
        kv_pe = kv_pe * kv_valid[..., None]
        return PromptSample(kv=kv, kv_pe=kv_pe, kv_valid=kv_valid, valid=valid)

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
    # inference: raster order (the reference's torch.nonzero order);
    # train: random order (the reference's randperm)
    if train and rng is not None:
        rk, rng = jax.random.split(rng)
        u = jax.random.uniform(rk, (Qp, HW), minval=0.1, maxval=1.0)
    else:
        u = (HW - jnp.arange(HW, dtype=jnp.float32))[None] / HW
    mask_idx, n_mask = _cyclic_dense_select(mask_binary.astype(jnp.float32) * u, R)
    box_idx, n_box = _cyclic_dense_select(box_binary.astype(jnp.float32) * u, R)

    # ---- point prompt: one point, feature repeated R times -----------
    # pick the in-mask point with max (center-biased) priority
    coords = _grid_coords(H, W).reshape(HW, 2)
    cxcywh = box_xyxy_to_cxcywh(boxes_key)
    ctr_dist = jnp.abs(coords[None] - cxcywh[:, None, :2])  # [Qp, HW, 2]
    in_ctr = (ctr_dist < 0.25 * jnp.maximum(cxcywh[:, None, 2:], 1e-6)).all(-1)
    point_priority = mask_binary.astype(jnp.float32) * u * (1.0 + in_ctr.astype(jnp.float32))
    point_idx = jnp.argmax(point_priority, axis=1)  # [Qp]
    point_valid = jnp.take_along_axis(point_priority, point_idx[:, None], 1)[:, 0] > 0

    point_feats = feats_flat[point_idx]  # [Qp, C] (grid-center sample)
    point_pe = pos_flat[point_idx]

    # ---- gather dense kv ---------------------------------------------
    def gather(idx):
        return feats_flat[idx], pos_flat[idx]  # [Qp, R, C] each

    mask_kv, mask_pe = gather(mask_idx)
    box_kv, box_pe = gather(box_idx)
    pt_kv = jnp.broadcast_to(point_feats[:, None], (Qp, R, C))
    pt_pe = jnp.broadcast_to(point_pe[:, None], (Qp, R, C))

    flags = prompt_flags[:, None, None]
    kv = jnp.where(flags == 0, pt_kv, jnp.where(flags == 1, box_kv, mask_kv))
    kv_pe = jnp.where(flags == 0, pt_pe, jnp.where(flags == 1, box_pe, mask_pe))

    # instance validity: a selectable pixel exists and the target occurs
    valid = occur_key & jnp.where(
        prompt_flags == 0,
        point_valid,
        jnp.where(prompt_flags == 1, n_box > 0, n_mask > 0),
    )
    # all R cyclic slots carry real features for valid instances
    # (reference repeats to R — every entry is non-blank); invalid
    # instances are zeroed and attend as zero tokens (see module doc)
    kv_valid = jnp.broadcast_to(valid[:, None], (Qp, R))
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
    """[Qp, R, C] key-frame sets -> SINGLETON frame axis [Qp, R, 1, C].

    The reference repeats key-frame features over the clip's T frames
    (prompt_encoder.py:494-495); here the decoder's ProCA folds frames
    into the query axis for frame-invariant kv (decoder._proca), so the
    materialized T-fold broadcast is unnecessary.  ``t`` is unused, kept
    for signature stability."""
    del t
    return sample.kv[:, :, None], sample.kv_pe[:, :, None], sample.kv_valid[:, :, None]
