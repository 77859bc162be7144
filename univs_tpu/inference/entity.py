"""Unified category-guided video inference (VIS / VPS / VSS).

TPU-native rebuild of the reference's ``InferenceVideoEntity``
(reference: univs/inference/inference_video_entity.py:237-1132).  The
reference mutates targets dicts with growing tensors and syncs to the
CPU for scipy Hungarian/NMS every clip; here the whole per-clip step —
pixel decoder + UniVS decoder with memory-pool prompt queries +
consistency gating + newly-entity detection (quality scoring, top-k,
box-NMS, on-device Hungarian) + pool admission + prompt re-encoding —
is ONE jit'd function over the fixed-capacity
:class:`~univs_tpu.inference.memory_pool.EntityMemory` pytree.  The
host loop only slices backbone windows and drains emitted windows.

Threshold pipeline transcribed from the reference (SURVEY §7 "hard
parts"): consistency 0.25 (x0.5 in the first clip... reference halves
when first_frame_idx < num_frames), newly-entity match 0.1
(detect_newly_object_threshold), cls 0.25 (apply_cls_thres; 2x for
later-clip admission under VPS/'instance' uses apply_cls_thres resp.
2*apply_cls_thres), box-NMS 0.85, overlap 0.8.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from univs_tpu.config import UniVSConfig
from univs_tpu.inference import memory_pool as mp
from univs_tpu.ops import mask_ops
from univs_tpu.prompts.visual_prompt import sample_visual_prompts
from univs_tpu.structures import TextPrompts, VisualPrompts


def mask_quality_scores(mask_logits: jnp.ndarray) -> jnp.ndarray:
    """Stability score of predicted masks: IoU between thresholded
    versions at +-1 logit (the reference's calculate_mask_quality_scores
    — univs/utils/comm.py)."""
    m_hi = (mask_logits > 1.0).reshape(mask_logits.shape[0], -1).astype(jnp.float32)
    m_lo = (mask_logits > -1.0).reshape(mask_logits.shape[0], -1).astype(jnp.float32)
    inter = (m_hi * m_lo).sum(-1)
    union = jnp.maximum(m_lo.sum(-1), 1.0)
    return inter / union


@dataclass(frozen=True)
class EntityClipConfig:
    """Static knobs for the jit'd clip step."""

    num_queries: int = 200
    topk_candidates: int = 25  # test_topk_per_image
    num_prev_frames_memory: int = 5
    apply_cls_thres: float = 0.25
    newly_thres: float = 0.1  # detect_newly_object_threshold
    consistency_thres: float = 0.25  # temporal_consistency_threshold
    nms_thres: float = 0.85  # box_nms_thresh
    overlap_thres: float = 0.8  # overlap_threshold_entity
    stability_thres: float = 0.0
    num_dense_points: int = 128
    clip_stride: int = 1
    num_frames: int = 5
    # newly-entity detection variant: 'instance' (VIS) or 'pixel'
    # (VPS panoptic — reference dispatch inference_video_entity.py:367-370)
    variant: str = "instance"
    # RefVOS: concat prev-clip visual prompt kv ahead of the text kv
    # (reference MODEL.UniVS.TEST.ENABLED_PREV_VISUAL_PROMPTS_FOR_GROUNDING,
    #  decoder_univs.py:628,736-748; default off)
    prev_visual_prompts_for_grounding: bool = False
    # run newly-entity detection only every k-th clip (or when the pool
    # is empty) — reference DETECT_NEWLY_INTERVAL_FRAMES,
    # inference_video_entity.py:366
    detect_newly_interval_frames: int = 1
    # measurement-only: skip named stages of the clip step so their cost
    # can be attributed by whole-program deltas (standalone timing is
    # dispatch-floor-bound on this part — docs/PERFORMANCE.md).  Known
    # names: 'reencode', 'gate', 'newly', 'accum'.  Production configs
    # leave this empty; tools/probe_clip_ablation.py is the consumer.
    ablate: tuple = ()


def entity_clip_step(
    modules,  # (pixel_decoder, decoder) flax modules — see models.univs.build_*
    params,
    encoded,  # (mask_features [T, h4, w4, C], ms tuple) — per-frame pixel-
    # decoder outputs, precomputed per WINDOW and sliced per clip (the
    # pixel decoder is frame-independent, so unlike the reference —
    # which reruns sem_seg_head's encoder every clip,
    # inference_video_entity.py:316 — each frame is encoded once)
    pool: mp.EntityMemory,
    frame_indices: jnp.ndarray,  # [T] absolute
    clip_offset: jnp.ndarray,  # scalar: first clip frame - window_start
    is_first_clip: jnp.ndarray,  # scalar bool
    cls_emb: jnp.ndarray,  # [K, Dt] category bank slice
    cc: EntityClipConfig,
    thing_mask: Optional[jnp.ndarray] = None,  # [K] bool (pixel variant)
) -> Tuple[mp.EntityMemory, Dict[str, jnp.ndarray]]:
    """One clip of category-guided inference. Pure/jittable."""
    pixel_decoder, decoder = modules
    T = frame_indices.shape[0]
    E = pool.capacity
    K = cls_emb.shape[0]

    mask_features, ms = encoded
    fi = frame_indices[None]  # B=1

    # ---- step 0: re-encode prompts from committed frames --------------
    # The reference's sampler runs INSIDE forward, before the decoder
    # layers (process_per_video_inference: update_frames = 1 on the
    # first clip else T - clip_stride), so the kv read below sees this
    # clip's committed overlap frames fresh.
    if "reencode" not in cc.ablate:
        grid_feats, grid_pos = decoder.apply(
            {"params": params["decoder"]}, ms[-1], fi, method="prompt_feature_grid"
        )
        n_update = jnp.where(is_first_clip, 1, T - cc.clip_stride)
        pool = _reencode_prompts(
            pool, grid_feats[0], grid_pos[0], clip_offset, n_update, T, cc,
            first_frame=frame_indices[0],
        )

    # ---- memory-pool prompt queries ------------------------------------
    kv, kv_pe, kv_valid = mp.read_prompt_kv(pool, cc.num_prev_frames_memory)
    L = kv.shape[1]
    queries, query_pos = mp.read_clip_queries(pool, T)  # [E, T, C] per frame
    vp = VisualPrompts(
        queries=queries[None],
        query_pos=query_pos[None],
        # singleton frame axis: the kv is one prompt set per entity shared
        # by every clip frame (reference repeats it, prompt_encoder.py:
        # 494-495) — the decoder's ProCA folds frames into the query axis
        # instead of materializing the T-fold broadcast
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
    logits = jax.nn.sigmoid(out["pred_logits"][0].astype(jnp.float32))  # [Q, K]
    # masks stay in the decoder's compute dtype (bf16 on TPU): the
    # upfront f32 cast materialized a 200 MB tensor per clip (~1.4 ms
    # of pure writes) and doubled every downstream read.  All consumers
    # are threshold counts / sign tests / f32-promoting reductions; the
    # pool ring accumulation casts to its own f32 at the ring write.
    masks = out["pred_masks"][0]  # [Q, T, H4, W4] compute dtype
    embds = out["pred_embds"][0].astype(jnp.float32)  # [Q, T, C]

    logits_l, logits_p = logits[:Ql], logits[Ql:]
    masks_l, masks_p = masks[:Ql], masks[Ql:]
    embds_l, embds_p = embds[:Ql], embds[Ql:]

    # ---- step 1: update tracked entities from prompt queries ----------
    q_p = mask_quality_scores(masks_p)
    if "gate" not in cc.ablate:
        thr = jnp.where(is_first_clip | (frame_indices[0] < cc.num_frames),
                        cc.consistency_thres * 0.5, cc.consistency_thres)
        is_cons, sim_cons = mp.consistency_gate(
            pool, embds_p, max(cc.num_prev_frames_memory // max(cc.clip_stride, 1), 3), thr
        )

        # VIS overlap resolution (reference :477-491)
        scores_track = (pool.logits_sum / jnp.maximum(pool.logits_count, 1)[:, None]).max(-1)
        cur_scores = scores_track * sim_cons * q_p  # [E]
        prob = jax.nn.sigmoid(masks_p).reshape(E, -1)
        is_bg = (prob < 0.5).all(0)
        owner = jnp.argmax(cur_scores[:, None] * prob, axis=0)
        owner = jnp.where(is_bg, -1, owner)
        own_mask = owner[None, :] == jnp.arange(E)[:, None]
        orig_area = jnp.maximum((prob > 0.5).sum(-1), 1)
        own_area = own_mask.sum(-1)
        above_ratio = (own_area / orig_area) > cc.overlap_thres
        mask_over = (own_mask & (prob > 0.5)).any(-1)
        update = is_cons & above_ratio & mask_over
    else:
        update = pool.valid

    if "accum" not in cc.ablate:
        pool = mp.accumulate_clip_masks(
            pool, clip_offset, masks_p, embds_p.mean(1), update, q_p
        )

    # ---- step 2: detect newly entities from learnable queries ---------
    if "newly" in cc.ablate:
        pool_new = pool
    elif cc.variant == "pixel":
        pool_new = _detect_newly_pixel(
            pool, clip_offset, frame_indices, is_first_clip,
            logits_l, masks_l, embds_l, thing_mask, cc,
        )
    else:
        pool_new = _detect_newly_instance(
            pool, clip_offset, frame_indices, is_first_clip,
            logits_l, masks_l, embds_l, cc,
        )
    if cc.detect_newly_interval_frames > 1:
        # every k-th clip only, or whenever the pool is empty
        # (inference_video_entity.py:366: `i % interval == 0 or
        #  targets[0]["masks"].nelement() == 0`)
        clip_idx = frame_indices[0] // max(cc.clip_stride, 1)
        allow = (clip_idx % cc.detect_newly_interval_frames == 0) | ~pool.valid.any()
        pool = jax.tree.map(lambda a, b: jnp.where(allow, a, b), pool_new, pool)
    else:
        pool = pool_new

    emit = {
        "logits_mean": pool.logits_sum / jnp.maximum(pool.logits_count, 1)[:, None],
        "valid": pool.valid,
        "quality_sum": pool.quality_sum,
    }
    return pool, emit


def _detect_newly_instance(
    pool, clip_offset, frame_indices, is_first_clip,
    logits_l, masks_l, embds_l, cc: EntityClipConfig,
):
    """VIS (instance) newly-entity detection
    (detect_newly_entities_per_clip_instance,
    inference_video_entity.py:517-652): quality-scored top-k, triu-law
    box NMS, temporally-weighted cosine Hungarian vs memory, matched
    updates (masks only for strong matches), class+overlap admission."""
    E = pool.capacity
    T = frame_indices.shape[0]
    Ql = logits_l.shape[0]
    q_l = mask_quality_scores(masks_l)
    scored = logits_l * q_l[:, None]
    cand_ok = q_l > cc.stability_thres if cc.stability_thres > 0 else jnp.ones((Ql,), bool)
    nms_scores = jnp.where(cand_ok, scored.max(-1), -1.0)
    top_vals, top_idx = jax.lax.top_k(nms_scores, min(cc.topk_candidates, Ql))
    c_logits = scored[top_idx]
    c_masks = masks_l[top_idx]
    c_embds = embds_l[top_idx]
    c_quality = q_l[top_idx]
    c_valid = top_vals > 0

    H4, W4 = c_masks.shape[-2:]
    c_boxes_t = mask_ops.masks_to_boxes(c_masks > 0) / jnp.array([W4, H4, W4, H4], jnp.float32)
    # dedup on per-frame box IoU max over time — triu law, NOT greedy
    # (reference :551-559)
    biou = jax.vmap(mask_ops.box_iou, in_axes=(1, 1), out_axes=2)(c_boxes_t, c_boxes_t).max(-1)
    order_scores = jnp.where(c_valid, c_logits.max(-1), -1.0)
    keep = mask_ops.nms_triu_keep_from_iou(biou, order_scores, cc.nms_thres, c_valid)
    c_valid = c_valid & keep

    # match candidates to memory — quasi-track bisoftmax (the hardcoded
    # default, inference_video_entity.py:157,:593-598)
    cand2slot, matched_sim = mp.match_candidates_to_memory(
        pool, c_embds, c_valid, cc.newly_thres
    )
    matched = (matched_sim > cc.newly_thres) & (cand2slot >= 0) & c_valid
    # update matched entities' logits/embds from learnable queries (:609-612)
    slot = jnp.clip(cand2slot, 0)
    upd_logits = 0.5 * (pool.logits_last[slot] + c_logits)
    logits_last = mp._scatter_where(pool.logits_last, cand2slot, upd_logits, matched)
    old_emb = pool.embds[slot, -1]
    nonblank = (old_emb != 0).any(-1)
    new_emb = (old_emb + c_embds.mean(1)) / (nonblank[:, None].astype(jnp.float32) + 1.0)
    embds_new = pool.embds.at[:, -1].set(
        mp._scatter_where(pool.embds[:, -1], cand2slot, new_emb, matched)
    )
    pool = pool.replace(logits_last=logits_last, embds=embds_new)
    # strong matches also add their masks (:618-629)
    strong = (matched_sim > 2 * cc.newly_thres) & matched
    pool = _accumulate_candidate_masks(pool, clip_offset, c_masks, c_quality, cand2slot, strong)

    # newly = unmatched, confident, low overlap with existing masks (:641-646)
    win = jax.lax.dynamic_slice_in_dim(pool.mask_logits, clip_offset, T, axis=1)
    pool_bin = (win > 0).reshape(E, -1)
    cand_bin = (c_masks > 0).reshape(c_masks.shape[0], -1)
    # intersection as a matmul (MXU) — the [Qc, E, THW] boolean
    # broadcast is a VPU-bound reduction ~50x slower on this part.
    # bf16 0/1 operands are exact; accumulation forced f32 (counts up
    # to T*H4*W4 overflow bf16), at half the materialized bytes
    inter = jax.lax.dot(
        cand_bin.astype(jnp.bfloat16), pool_bin.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    union = jnp.maximum(cand_bin.sum(-1)[:, None] + pool_bin.sum(-1)[None] - inter, 1)
    miou_max = jnp.where(pool.valid[None], inter / union, 0.0).max(-1)
    conf = c_logits.max(-1)
    cls_gate = jnp.where(is_first_clip, jnp.maximum(cc.apply_cls_thres, 0.1), cc.apply_cls_thres)
    is_new = c_valid & ~matched & (conf > cls_gate) & jnp.where(is_first_clip, True, miou_max < 0.5)

    return mp.admit_entities(
        pool, clip_offset, frame_indices[0], c_masks, c_logits,
        c_embds.mean(1), c_quality, is_new,
    )


def _rank_within(mask: jnp.ndarray, scores: jnp.ndarray) -> jnp.ndarray:
    """Rank (0 = best) by descending score among ``mask`` members; out
    of subset -> large."""
    s = jnp.where(mask, scores, -jnp.inf)
    order = jnp.argsort(-s)
    rank = jnp.argsort(order)
    return jnp.where(mask, rank, 1 << 30)


def _detect_newly_pixel(
    pool, clip_offset, frame_indices, is_first_clip,
    logits_l, masks_l, embds_l, thing_mask, cc: EntityClipConfig,
):
    """VPS (panoptic/pixel) newly-entity detection
    (detect_newly_entities_per_clip_pixel,
    inference_video_entity.py:654-765):

    first clip — score-sorted top-100 split by thing/stuff class; top-70
    things deduped by triu-law box NMS (box_nms_thresh), top-30 stuff by
    triu-law frame-0 mask IoU at 0.6; admitted where score >
    apply_cls_thres.  Later clips — NO NMS; candidates are ALL learnable
    queries, Hungarian-matched to memory by BISOFTMAX similarity
    (use_norm=False, comm.py:39-50) with sub-threshold zeroing; every
    matched candidate adds its masks/logits/embds; newly = unmatched
    with score > 2*apply_cls_thres and mask IoU vs memory < 0.5."""
    E = pool.capacity
    T = frame_indices.shape[0]
    Ql, K = logits_l.shape
    q_l = mask_quality_scores(masks_l)
    scored = logits_l * q_l[:, None]  # [Ql, K]
    s = scored.max(-1)
    labels = scored.argmax(-1)
    if thing_mask is None:
        thing_mask = jnp.ones((K,), bool)
    isthing = thing_mask[labels]

    H4, W4 = masks_l.shape[-2:]

    # ---------- first-clip admission (:671-698) -----------------------
    rank_all = _rank_within(jnp.ones((Ql,), bool), s)
    in100 = rank_all < 100
    cand_t = (_rank_within(isthing & in100, s) < 70)
    cand_s = (_rank_within(~isthing & in100, s) < 30)
    boxes_t = mask_ops.masks_to_boxes(masks_l > 0) / jnp.array([W4, H4, W4, H4], jnp.float32)
    biou = jax.vmap(mask_ops.box_iou, in_axes=(1, 1), out_axes=2)(boxes_t, boxes_t).max(-1)
    keep_t = mask_ops.nms_triu_keep_from_iou(biou, s, cc.nms_thres, cand_t)
    miou0 = mask_ops.pairwise_mask_iou(masks_l[:, 0] > 0, masks_l[:, 0] > 0)
    keep_s = mask_ops.nms_triu_keep_from_iou(miou0, s, 0.6, cand_s)
    new_first = (keep_t | keep_s) & (s > cc.apply_cls_thres)

    # ---------- later clips: quasi-track bisoftmax match (:711-716) ---
    cand2slot, matched_sim = mp.match_candidates_to_memory(
        pool, embds_l, jnp.ones((Ql,), bool), cc.newly_thres
    )
    matched = (matched_sim > cc.newly_thres) & (cand2slot >= 0) & ~is_first_clip

    slot = jnp.clip(cand2slot, 0)
    upd_logits = 0.5 * (pool.logits_last[slot] + scored)
    logits_last = mp._scatter_where(pool.logits_last, cand2slot, upd_logits, matched)
    old_emb = pool.embds[slot, -1]
    nonblank = (old_emb != 0).any(-1)
    new_emb = (old_emb + embds_l.mean(1)) / (nonblank[:, None].astype(jnp.float32) + 1.0)
    embds_new = pool.embds.at[:, -1].set(
        mp._scatter_where(pool.embds[:, -1], cand2slot, new_emb, matched)
    )
    pool = pool.replace(logits_last=logits_last, embds=embds_new)
    # every matched candidate adds its masks (:727-740 — no 2x gate)
    pool = _accumulate_candidate_masks(pool, clip_offset, masks_l, q_l, cand2slot, matched)

    win = jax.lax.dynamic_slice_in_dim(pool.mask_logits, clip_offset, T, axis=1)
    pool_bin = (win > 0).reshape(E, -1)
    cand_bin = (masks_l > 0).reshape(Ql, -1)
    inter = jax.lax.dot(  # bf16 0/1 exact, f32 accumulate (see above)
        cand_bin.astype(jnp.bfloat16), pool_bin.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    union = jnp.maximum(
        cand_bin.sum(-1)[:, None] + pool_bin.sum(-1)[None] - inter, 1
    )
    miou_max = jnp.where(pool.valid[None], inter / union, 0.0).max(-1)
    new_later = ~matched & (s > 2 * cc.apply_cls_thres) & (miou_max < 0.5)

    is_new = jnp.where(is_first_clip, new_first, new_later)
    return mp.admit_entities(
        pool, clip_offset, frame_indices[0], masks_l, scored,
        embds_l.mean(1), q_l, is_new,
    )


def _masked_mean(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """[E, L, C], [E, L] -> [E, C]."""
    denom = jnp.maximum(valid.sum(-1, keepdims=True), 1)
    return (x * valid[..., None]).sum(1) / denom


def _accumulate_candidate_masks(pool, clip_offset, c_masks, c_quality, cand2slot, gate):
    """Scatter candidate mask logits onto their matched pool slots."""
    E = pool.capacity
    Qc, T = c_masks.shape[:2]
    win = jax.lax.dynamic_slice_in_dim(pool.mask_logits, clip_offset, T, axis=1)
    occ = jax.lax.dynamic_slice_in_dim(pool.occurrence, clip_offset, T, axis=1)
    nonblank = (c_masks > 0).any(axis=(-2, -1)).astype(occ.dtype)  # [Qc, T]
    add_m = jnp.zeros_like(win)
    add_o = jnp.zeros_like(occ)
    idx = jnp.where(gate, cand2slot, E)
    add_m = add_m.at[idx].add(c_masks.astype(win.dtype), mode="drop")
    add_o = add_o.at[idx].add(nonblank, mode="drop")
    ml = jax.lax.dynamic_update_slice_in_dim(pool.mask_logits, win + add_m, clip_offset, axis=1)
    oc = jax.lax.dynamic_update_slice_in_dim(pool.occurrence, occ + add_o, clip_offset, axis=1)
    qs = pool.quality_sum.at[idx].add(c_quality, mode="drop")
    return pool.replace(mask_logits=ml, occurrence=oc, quality_sum=qs)


def _reencode_prompts(pool, grid_feats, grid_pos, clip_offset, n_update, T,
                      cc: EntityClipConfig, first_frame=None):
    """Re-encode visual (mask) prompts for this clip's committed frames
    and write them into the prompt ring, following the reference's
    slot-overwrite cascade exactly
    (VisualPromptSampler.process_per_video_inference,
    prompt_encoder.py:883-946): iteration ``key_fid`` writes slots
    ``[key_fid:]`` for instances whose mask is non-empty at that key
    frame — so slot ``j``'s final content is the sample from the largest
    valid key frame ``<= min(j, n_update-1)``; in particular the newest
    ``stride`` slots carry a COPY of the last committed frame's sample,
    and the first clip (n_update=1) fills all T slots with frame 0's
    sample.  Must run at the START of the clip step, before the prompt
    kv read (the reference's sampler runs inside forward, before the
    decoder layers).

    ``first_frame``: absolute index of the clip's first frame — entities
    whose first appearance falls on frame ``first_frame + j`` get their
    first-appearance prompt set refreshed from slot ``j`` (the reference
    reads ``memory[:, :, faf]`` fresh each clip, decoder_univs.py:806).
    """
    E = pool.capacity
    Fp = pool.prompt_feats.shape[2]
    H4, W4 = pool.mask_logits.shape[-2:]
    R = cc.num_dense_points
    C = grid_feats.shape[-1]

    cur_f = jnp.zeros((E, R, C), pool.prompt_feats.dtype)
    cur_p = jnp.zeros((E, R, C), pool.prompt_pe.dtype)
    written = jnp.zeros((E,), bool)
    snaps_f, snaps_p, snaps_w = [], [], []
    # static loop bound: n_update is 1 on the first clip, else
    # T - clip_stride — key frames beyond max(1, T - stride) can never
    # commit (upd below requires k < n_update), so sampling them is
    # dead work (1/5 of the re-encode at the reference stride 1)
    n_keys = min(T, max(1, T - cc.clip_stride))
    for k in range(n_keys):  # static loop over committable key frames
        win = jax.lax.dynamic_slice_in_dim(pool.mask_logits, clip_offset + k, 1, axis=1)[:, 0]
        msk = (win > 0).astype(jnp.float32)
        occur = msk.any(axis=(-2, -1))
        # mask_only: every pool prompt is a mask prompt at inference —
        # the box/point paths (incl. masks_to_boxes on [E, H4, W4]) are
        # dead work the generic sampler would compute and discard
        sample = sample_visual_prompts(
            grid_feats[k], grid_pos[k], msk, None, occur,
            jnp.full((E,), 2, jnp.int32),  # mask prompts
            cc.num_dense_points, rng=None, train=False, mask_only=True,
        )
        upd = (k < n_update) & pool.valid & sample.valid
        cur_f = jnp.where(upd[:, None, None], sample.kv, cur_f)
        cur_p = jnp.where(upd[:, None, None], sample.kv_pe, cur_p)
        written = written | upd
        snaps_f.append(cur_f)
        snaps_p.append(cur_p)
        snaps_w.append(written)
    snaps_f = jnp.stack(snaps_f)  # [T, E, R, C]
    snaps_p = jnp.stack(snaps_p)
    snaps_w = jnp.stack(snaps_w)  # [T, E]

    pf, pp, pv = pool.prompt_feats, pool.prompt_pe, pool.prompt_valid
    ff, fp, fv = pool.first_feats, pool.first_pe, pool.first_valid
    last_k = jnp.maximum(n_update - 1, 0)
    for j in range(T):  # static loop over ring slots
        sel = jnp.minimum(j, last_k)  # snapshot index for slot j
        s_f = jnp.take(snaps_f, sel, axis=0)
        s_p = jnp.take(snaps_p, sel, axis=0)
        s_w = jnp.take(snaps_w, sel, axis=0)  # [E] — any write reached slot j
        slot = Fp - T + j
        pf = pf.at[:, :, slot].set(jnp.where(s_w[:, None, None], s_f, pf[:, :, slot]))
        pp = pp.at[:, :, slot].set(jnp.where(s_w[:, None, None], s_p, pp[:, :, slot]))
        pv = pv.at[:, :, slot].set(jnp.where(s_w[:, None], True, pv[:, :, slot]))
        if first_frame is not None:
            # refresh first-appearance sets while faf is inside the clip
            refresh = s_w & (pool.first_appear == first_frame + j)
            ff = jnp.where(refresh[:, None, None], s_f, ff)
            fp = jnp.where(refresh[:, None, None], s_p, fp)
            fv = jnp.where(refresh[:, None], True, fv)
    return pool.replace(
        prompt_feats=pf, prompt_pe=pp, prompt_valid=pv,
        first_feats=ff, first_pe=fp, first_valid=fv,
    )
