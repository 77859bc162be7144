"""Prompt-guided inference: VOS / PVOS (visual prompts) and RefVOS
(text prompts).

TPU-native rebuild of the reference's ``InferenceVideoVOS``
(reference: univs/inference/inference_video_vos.py:203-714).  The
number of target objects is known up front (GT first-frame masks or
referring expressions), so the pool uses exactly N slots; GT masks are
injected into the mask window at each object's first-appearance frame
(write_targets_into_annotations_per_clip :533-620) and the model
re-segments via prompt queries; matched prompt outputs are written back
as pseudo-GT that drives the next clip's prompts
(write_predictions_into_annotations_per_clip :286-531, prompt-only
default path ``video_unified_inference_queries='prompt'``).

Update rules transcribed: first-appear objects take prompt-query masks
with inter-object argmax resolution weighted by mIoU^2 x quality and an
mIoU floor of 0.15 x area factor (:373-394); appeared objects are gated
by embedding consistency (0.5), resolved by sim^2 x quality argmax with
mask-area ratio > 0.25 (:498-520), then ADD-accumulated
(gt_mask_logits += masks :522) with (old+new)/(nonblank+1) embds.

``query_mode`` selects the reference's
``video_unified_inference_queries`` variants (:337-371, :423-496):

- ``"prompt"`` (default) — prompt-query outputs only.
- ``"learn"`` — appeared objects are re-identified among the 200
  learnable-query outputs by Hungarian matching on temporally-weighted
  embedding cosine similarity (threshold 0.65; comm.py:25-62).
- ``"prompt+learn"`` — both, fused per object with similarity-ratio
  weights; if the two branches' masks disagree spatially
  (IoU < 0.5) the prompt branch wins outright (:478-487).

The first-appearance step is prompt-only for task ``"sot"`` exactly as
the reference (``use_prompt_only`` :336); the box-IoU-top5 /
mask-IoU-argmax first-appearance re-ID (:341-355) is provided as
:func:`match_learn_first_appear` for non-sot pipelines.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from univs_tpu.inference import memory_pool as mp
from univs_tpu.inference.entity import mask_quality_scores, _reencode_prompts, EntityClipConfig
from univs_tpu.ops import mask_ops
from univs_tpu.structures import TextPrompts, VisualPrompts


def inject_gt_first_appearance(
    pool: mp.EntityMemory,
    gt_masks_clip: jnp.ndarray,  # [N, T, H4, W4] binary (zeros if faf not in clip)
    faf: jnp.ndarray,  # [N] absolute first-appear frame (-1 never)
    obj_valid: jnp.ndarray,  # [N]
    frame_indices: jnp.ndarray,  # [T]
    clip_offset: jnp.ndarray,
) -> mp.EntityMemory:
    """Write GT masks (as +-10 logits) into the window at first
    appearance and mark the slots valid."""
    T = frame_indices.shape[0]
    in_clip = (faf >= frame_indices[0]) & (faf <= frame_indices[-1]) & obj_valid
    logits = gt_masks_clip * 20.0 - 10.0
    # only the frame(s) with GT: local mask of which frames hold data
    local = faf[:, None] == frame_indices[None, :]  # [N, T]
    add = jnp.where((in_clip[:, None] & local)[:, :, None, None], logits, 0.0)
    occ_add = (in_clip[:, None] & local).astype(pool.occurrence.dtype)

    win = jax.lax.dynamic_slice_in_dim(pool.mask_logits, clip_offset, T, axis=1)
    # replace (not add): GT overrides anything at that frame
    win = jnp.where(add != 0, add.astype(win.dtype), win)
    ml = jax.lax.dynamic_update_slice_in_dim(pool.mask_logits, win, clip_offset, axis=1)
    occ = jax.lax.dynamic_slice_in_dim(pool.occurrence, clip_offset, T, axis=1)
    occ = jnp.maximum(occ, occ_add)
    oc = jax.lax.dynamic_update_slice_in_dim(pool.occurrence, occ, clip_offset, axis=1)
    return pool.replace(
        mask_logits=ml,
        occurrence=oc,
        valid=pool.valid | in_clip,
        first_appear=jnp.where(in_clip & (pool.first_appear < 0), faf, pool.first_appear),
    )


def vos_clip_step(
    modules,
    params,
    encoded,  # (mask_features [T, h4, w4, C], ms tuple) per-frame window slices
    pool: mp.EntityMemory,
    frame_indices: jnp.ndarray,  # [T]
    clip_offset: jnp.ndarray,
    cls_emb: jnp.ndarray,
    cc: EntityClipConfig,
    text_prompts: Optional[TextPrompts] = None,  # RefVOS expressions
    task: str = "sot",
    query_mode: str = "prompt",  # 'prompt' | 'learn' | 'prompt+learn'
) -> Tuple[mp.EntityMemory, Dict]:
    """One clip of prompt-guided re-segmentation. Pure/jittable."""
    assert query_mode in ("prompt", "learn", "prompt+learn")
    if task == "grounding":
        # the reference only supports prompts-as-queries for referring
        # segmentation (inference_video_vos.py:311-312)
        query_mode = "prompt"
    pixel_decoder, decoder = modules
    T = frame_indices.shape[0]
    N = pool.capacity

    mask_features, ms = encoded
    fi = frame_indices[None]

    # ---- step 0: re-encode prompts from committed frames --------------
    # (reference sampler order: runs inside forward BEFORE the decoder;
    #  update_frames = 1 - (task == 'grounding') on the first clip, else
    #  T - clip_stride — prompt_encoder.py:881-882)
    grid_feats, grid_pos = decoder.apply(
        {"params": params["decoder"]}, ms[-1], fi, method="prompt_feature_grid"
    )
    is_first_clip = frame_indices[0] == 0
    first_update = 0 if task == "grounding" else 1
    n_update = jnp.where(is_first_clip, first_update, T - cc.clip_stride)
    pool = _reencode_prompts(
        pool, grid_feats[0], grid_pos[0], clip_offset, n_update, T, cc,
        first_frame=frame_indices[0],
    )

    if task == "grounding" and text_prompts is not None:
        vp = None
        if cc.prev_visual_prompts_for_grounding:
            # concat prev-clip visual prompt kv ahead of the text kv
            # (decoder_univs.py:736-748).  On the first clip the pool is
            # uncommitted, so the visual entries are zeros — ProCA
            # zero-bias tokens (the reference's blank-entry law); the
            # reference skips the concat entirely there ('masks' not yet
            # in targets), a static-shape deviation documented here.
            kv, kv_pe, kv_valid = mp.read_prompt_kv(pool, cc.num_prev_frames_memory)
            L = kv.shape[1]
            C = kv.shape[-1]
            queries, query_pos = mp.read_clip_queries(pool, T)
            vp = VisualPrompts(
                queries=queries[None],
                query_pos=query_pos[None],
                kv=jnp.broadcast_to(kv[None, :, :, None], (1, N, L, T, C)),
                kv_pe=None,
                kv_valid=jnp.broadcast_to(kv_valid[None, :, :, None], (1, N, L, T)),
                valid=pool.valid[None],
            )
        out = decoder.apply(
            {"params": params["decoder"]},
            ms, mask_features, fi, task="grounding", text_prompts=text_prompts,
            visual_prompts=vp,
        )
    else:
        kv, kv_pe, kv_valid = mp.read_prompt_kv(pool, cc.num_prev_frames_memory)
        L = kv.shape[1]
        C = kv.shape[-1]
        queries, query_pos = mp.read_clip_queries(pool, T)  # [N, T, C]
        vp = VisualPrompts(
            queries=queries[None],
            query_pos=query_pos[None],
            # singleton frame axis — the decoder's ProCA folds frames into
            # the query axis instead of materializing the T-fold broadcast
            # (the grounding concat path above still needs the full T axis
            # to match the per-frame text kv)
            kv=kv[None, :, :, None],
            kv_pe=kv_pe[None, :, :, None],
            kv_valid=kv_valid[None, :, :, None],
            valid=pool.valid[None],
        )
        out = decoder.apply(
            {"params": params["decoder"]},
            ms, mask_features, fi, task="sot", visual_prompts=vp, cls_emb=cls_emb,
        )

    Ql = cc.num_queries
    masks_p = out["pred_masks"][0, Ql:].astype(jnp.float32)  # [N, T, H4, W4]
    embds_p = out["pred_embds"][0, Ql:].astype(jnp.float32)  # [N, T, C]
    quality = mask_quality_scores(masks_p)

    first_frame = frame_indices[0]
    is_first_appear = (pool.first_appear >= first_frame) & (
        pool.first_appear <= frame_indices[-1]
    ) & pool.valid
    has_appeared = (pool.first_appear < first_frame) & (pool.first_appear >= 0) & pool.valid

    win = jax.lax.dynamic_slice_in_dim(pool.mask_logits, clip_offset, T, axis=1)

    # ---- first-appear objects: prompt-only re-segmentation -----------
    # inter-object overlap resolution weighted by miou^2 * quality
    # (grounding has no GT masks: quality-only weights, no miou gate,
    #  write from faf inclusive — inference_video_vos.py:396-399)
    is_grounding = task == "grounding"
    faf_local = jnp.clip(pool.first_appear - first_frame, 0, T - 1)  # [N]
    gt_at_faf = jnp.take_along_axis(win, faf_local[:, None, None, None], axis=1)[:, 0] > 0
    pred_at_faf = (
        jnp.take_along_axis(masks_p, faf_local[:, None, None, None], axis=1)[:, 0] > 0
    )
    miou = _pair_mask_iou(gt_at_faf, pred_at_faf)  # [N]
    w_first = quality if is_grounding else (miou ** 2) * quality
    resolved_first = _overlap_resolve(masks_p, w_first, is_first_appear)
    # miou floor: 0.15 * clamp(area/96^2, max=1) (reference :393-394)
    area_factor = jnp.clip(gt_at_faf.sum((-2, -1)) / (96.0 * 96.0), 0.0, 1.0)
    resolved_bin = jnp.take_along_axis(
        resolved_first > 0, faf_local[:, None, None, None], axis=1
    )[:, 0]
    miou2 = _pair_mask_iou(gt_at_faf, resolved_bin)
    first_ok = is_first_appear & (is_grounding | (miou2 > 0.15 * area_factor))

    # write masks for frames AFTER faf (replace); grounding: from faf
    if is_grounding:
        after = jnp.arange(T)[None, :] >= faf_local[:, None]
    else:
        after = jnp.arange(T)[None, :] > faf_local[:, None]  # [N, T]
    wrt = (first_ok[:, None] & after)[:, :, None, None]
    win = jnp.where(wrt, resolved_first.astype(win.dtype), win)
    occ = jax.lax.dynamic_slice_in_dim(pool.occurrence, clip_offset, T, axis=1)
    occ = jnp.where(first_ok[:, None] & after, 1.0, occ)

    # embds for first-appear objects
    old = pool.embds[:, -1]
    embds_last = jnp.where(first_ok[:, None], embds_p.mean(1), old)

    # ---- appeared objects: consistency-gated accumulation ------------
    # branch selection per query_mode (reference :423-496): the prompt
    # branch gates on embedding consistency > 0.5; the learn branch
    # Hungarian-matches pool targets to learnable-query outputs and
    # gates on matched similarity >= 0.65; fusion weighs the two by
    # similarity ratio, falling back to prompt-only when their masks
    # disagree spatially (IoU < 0.5, :483-486).
    if query_mode != "prompt":
        masks_l_all = out["pred_masks"][0, :Ql].astype(jnp.float32)  # [Q, T, H, W]
        embds_l_all = out["pred_embds"][0, :Ql].astype(jnp.float32)  # [Q, T, C]
        slot2cand, sim_l = match_learn_appeared(
            pool, embds_l_all, cc.num_prev_frames_memory
        )
        cons_l = sim_l >= 0.65
        sel = jnp.clip(slot2cand, 0)
        masks_l = jnp.where(cons_l[:, None, None, None], masks_l_all[sel], 0.0)
        embds_l = jnp.where(cons_l[:, None, None], embds_l_all[sel], 0.0)
        sim_l = jnp.where(cons_l, sim_l, 0.0)

    is_cons, sim_p = mp.consistency_gate(
        pool, embds_p, cc.num_prev_frames_memory, jnp.float32(0.5)
    )
    sim_p = jnp.where(is_cons, sim_p, 0.0)

    if query_mode == "prompt":
        masks_app, embds_app, quality_app, sim = masks_p, embds_p, quality, sim_p
        gated = has_appeared & is_cons
    elif query_mode == "learn":
        masks_app, embds_app, sim = masks_l, embds_l, sim_l
        quality_app = mask_quality_scores(masks_app)
        gated = has_appeared & cons_l
    else:  # prompt+learn fusion (reference :477-491)
        n_active = (sim_p > 0).astype(jnp.float32) + (sim_l > 0).astype(jnp.float32)
        sim = (sim_p + sim_l) / jnp.maximum(n_active, 1.0)
        den = jnp.maximum(sim_p + sim_l, 1e-5)
        w_p = sim_p / den
        w_l = sim_l / den
        masks_pg = jnp.where(is_cons[:, None, None, None], masks_p, 0.0)
        siou_up = ((masks_pg > 0) & (masks_l > 0)).sum((-3, -2, -1)).astype(jnp.float32)
        siou_dn = ((masks_pg > 0) | (masks_l > 0)).sum((-3, -2, -1)).astype(jnp.float32)
        disagree = siou_up / jnp.maximum(siou_dn, 1.0) < 0.5
        w_p = jnp.where(disagree, 1.0, w_p)
        w_l = jnp.where(disagree, 0.0, w_l)
        masks_app = w_p[:, None, None, None] * masks_pg + w_l[:, None, None, None] * masks_l
        embds_app = w_p[:, None, None] * jnp.where(
            is_cons[:, None, None], embds_p, 0.0
        ) + w_l[:, None, None] * embds_l
        quality_app = mask_quality_scores(masks_app)
        gated = has_appeared & (is_cons | cons_l)

    w_app = (sim ** 2) * quality_app
    resolved_app = _overlap_resolve(masks_app, w_app, gated)
    # area-ratio gate 0.25
    orig_area = jnp.maximum((masks_app > 0).sum((-3, -2, -1)), 1)
    res_area = (resolved_app > 0).sum((-3, -2, -1))
    ratio_ok = (res_area / orig_area) > 0.25
    gated = gated & ratio_ok
    win = win + jnp.where(gated[:, None, None, None], resolved_app.astype(win.dtype), 0)
    occ = occ + jnp.where(gated[:, None], (resolved_app > 0).any((-2, -1)).astype(occ.dtype), 0)
    nonblank_e = (old != 0).any(-1)
    upd_e = (old + embds_app.mean(1)) / (nonblank_e[:, None].astype(jnp.float32) + 1.0)
    embds_last = jnp.where(gated[:, None], upd_e, embds_last)

    pool = pool.replace(
        mask_logits=jax.lax.dynamic_update_slice_in_dim(pool.mask_logits, win, clip_offset, axis=1),
        occurrence=jax.lax.dynamic_update_slice_in_dim(pool.occurrence, occ, clip_offset, axis=1),
        embds=pool.embds.at[:, -1].set(embds_last),
        quality_sum=pool.quality_sum
        + jnp.where(first_ok, quality, 0.0)
        + jnp.where(gated, quality_app, 0.0),
    )

    return pool, {"sim": sim, "quality": quality}


def match_learn_first_appear(
    masks_l: jnp.ndarray,  # [Q, T, H, W] learnable-query mask logits
    gt_at_faf: jnp.ndarray,  # [N, H, W] bool GT masks at first appearance
    faf_local: jnp.ndarray,  # [N] local frame index of first appearance
    topk: int = 5,
) -> jnp.ndarray:
    """First-appearance re-ID against learnable queries: box-IoU top-k
    candidates, then mask-IoU argmax (reference:
    inference_video_vos.py:341-355, "used in SEEM and UNINEXT").

    Returns [N] int32 — best learnable-query index per object.  Box IoU
    is computed in pixel coords (the reference normalizes per-axis,
    which is an axis-wise linear rescale and leaves IoU unchanged).
    """
    Q = masks_l.shape[0]
    pred_faf = jnp.moveaxis(masks_l[:, faf_local], 0, 1) > 0  # [N, Q, H, W]
    gt_b = gt_at_faf > 0
    gt_boxes = mask_ops.masks_to_boxes(gt_b)  # [N, 4]
    pred_boxes = mask_ops.masks_to_boxes(pred_faf)  # [N, Q, 4]
    lt = jnp.maximum(gt_boxes[:, None, :2], pred_boxes[..., :2])
    rb = jnp.minimum(gt_boxes[:, None, 2:], pred_boxes[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_g = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    area_p = (pred_boxes[..., 2] - pred_boxes[..., 0]) * (
        pred_boxes[..., 3] - pred_boxes[..., 1]
    )
    biou = inter / jnp.maximum(area_g[:, None] + area_p - inter, 1e-6)  # [N, Q]
    k = min(topk, Q)
    _, top_idx = jax.lax.top_k(biou, k)  # [N, k]
    cand = jnp.take_along_axis(pred_faf, top_idx[:, :, None, None], axis=1)  # [N,k,H,W]
    inter_m = (cand & gt_b[:, None]).sum((-2, -1)).astype(jnp.float32)
    union_m = (cand | gt_b[:, None]).sum((-2, -1)).astype(jnp.float32)
    miou = inter_m / jnp.maximum(union_m, 1.0)
    best = jnp.argmax(miou, axis=-1)
    return jnp.take_along_axis(top_idx, best[:, None], axis=1)[:, 0].astype(jnp.int32)


def match_learn_appeared(
    pool: mp.EntityMemory,
    embds_l: jnp.ndarray,  # [Q, T, C] learnable-query embeddings this clip
    num_prev: int,
    use_norm: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hungarian re-ID of pool targets against learnable-query
    embeddings (reference: comm.py:25-62 match_from_learnable_embds
    called from inference_video_vos.py:452-460).

    ``use_norm=True``: temporally-weighted cosine similarity (the
    reference disables it — bisoftmax — only for VIPSeg).  Returns
    (slot2cand [N] int32 with -1 for empty slots, sim [N]).
    """
    from univs_tpu.losses.hungarian import hungarian

    N = pool.capacity
    Q = embds_l.shape[0]
    assert N <= Q, "pool capacity must not exceed learnable query count"
    tgt = pool.embds[:, -num_prev:]  # [N, F, C]
    F = tgt.shape[1]
    if use_norm:
        t_n = tgt / jnp.maximum(jnp.linalg.norm(tgt, axis=-1, keepdims=True), 1e-3)
        c_n = embds_l / jnp.maximum(jnp.linalg.norm(embds_l, axis=-1, keepdims=True), 1e-3)
        sim = jnp.einsum("nvc,qtc->nqv", t_n, c_n.astype(t_n.dtype)) / embds_l.shape[1]
        nonblank = (tgt != 0).any(-1).astype(jnp.float32)  # [N, F]
        w = jnp.exp(jnp.arange(1, F + 1, dtype=jnp.float32) / F * 5.0)[None] * nonblank
        w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-3)
        sim = (sim * w[:, None]).sum(-1)  # [N, Q]
    else:
        sim = jnp.einsum("nvc,qtc->nq", tgt, embds_l) / (
            F * embds_l.shape[1] * jnp.sqrt(jnp.float32(tgt.shape[-1]))
        )
        sim = 0.5 * (jax.nn.softmax(sim, axis=0) + jax.nn.softmax(sim, axis=1))
    sim = jnp.where(pool.valid[:, None], sim, -1.0)
    slot2cand = hungarian(1.0 - sim, row_valid=pool.valid)  # [N]
    sim_m = sim[jnp.arange(N), jnp.clip(slot2cand, 0)]
    sim_m = jnp.where(slot2cand >= 0, sim_m, 0.0)
    return slot2cand, sim_m


def _pair_mask_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Paired IoU: a, b [N, H, W] binary -> [N]."""
    af = a.reshape(a.shape[0], -1).astype(jnp.float32)
    bf = b.reshape(b.shape[0], -1).astype(jnp.float32)
    inter = (af * bf).sum(-1)
    union = af.sum(-1) + bf.sum(-1) - inter
    return inter / jnp.maximum(union, 1.0)


def _overlap_resolve(masks: jnp.ndarray, weights: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Pixel-wise argmax resolution between competing objects.

    masks: [N, T, H, W] logits; weights: [N]; active: [N] bool.
    A pixel belongs to the active object with max weighted sigmoid;
    background where no active object exceeds 0 logits
    (reference: inference_video_vos.py:374-386, :508-520).
    Returns masks zeroed outside each object's owned region.
    """
    w = jnp.where(active, weights, 0.0)
    prob = jax.nn.sigmoid(masks) * w[:, None, None, None]
    prob = jnp.where(active[:, None, None, None], prob, -1.0)
    owner = jnp.argmax(prob, axis=0)  # [T, H, W]
    any_fg = jnp.where(active[:, None, None, None], masks, -1.0).max(0) > 0
    own = (owner[None] == jnp.arange(masks.shape[0])[:, None, None, None]) & any_fg[None]
    return masks * own
