"""Stage-3 long-video training: sliding clips + training-time prompt
memory pool + inter-clip ReID loss.

Rebuild of the reference's ``UniVS_Prompt_LongVideo``
(reference: univs/univs_prompt_longvideo.py:95-625): a T-frame clip
slides over the Tv-frame sample with stride T-1 (:347-438); per-clip
losses accumulate; prompts for later clips come from a no-grad memory
pool built from earlier clips' features
(prepare_prompt_memory_pool :543-589); at the last clip an inter-clip
contrastive ReID loss ties embeddings of the same object across clips
(interclip_reid_loss :469-526).

TPU-first: the clip loop is a STATIC python loop over fixed clip
starts (shapes equal per clip → one traced body reused by XLA), the
pool is a fixed-size tensor stack, everything jits as one program.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from univs_tpu.config import UniVSConfig
from univs_tpu.losses.criterion import (
    TrainTargets,
    UniCriterion,
    contrastive_aux_loss,
    contrastive_loss,
)
from univs_tpu.prompts.visual_prompt import (
    broadcast_prompt_sample,
    sample_train_clip_prompts,
)
from univs_tpu.structures import VisualPrompts, make_visual_prompts


def clip_starts(num_frames_video: int, num_frames_clip: int) -> List[int]:
    """Sliding starts with stride T-1 (univs_prompt_longvideo.py:371)."""
    stride = max(num_frames_clip - 1, 1)
    starts = list(range(0, max(num_frames_video - num_frames_clip, 0) + 1, stride))
    if starts[-1] + num_frames_clip < num_frames_video:
        starts.append(num_frames_video - num_frames_clip)
    return starts


def long_video_loss(
    model,
    params,
    criterion: UniCriterion,
    images: jnp.ndarray,  # [B, Tv, H, W, 3]
    frame_indices: jnp.ndarray,  # [B, Tv]
    targets: TrainTargets,  # masks [B, N, Tv, h, w], ids [B, N, Tv]
    cfg: UniVSConfig,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total stage-3 loss for one batch of long videos (task: sot)."""
    B, Tv = images.shape[:2]
    T = cfg.num_frames
    N = targets.valid.shape[1]
    starts = clip_starts(Tv, T)
    R = cfg.prompt.num_dense_points_train

    total = jnp.float32(0.0)
    logged: Dict[str, jnp.ndarray] = {}
    stash_per_clip: List[list] = []  # per clip: per-layer (embds, ids)

    cls_emb = jnp.zeros((1, cfg.decoder.clip_cls_emb_dim))

    for ci, s in enumerate(starts):
        r = jax.random.fold_in(rng, ci)
        r_prompt, r_crit, r_shuffle, r_flip = jax.random.split(r, 4)
        sl = slice(s, s + T)
        imgs_c = images[:, sl]
        fi_c = frame_indices[:, sl]
        masks_c = targets.masks[:, :, sl]
        ids_c = targets.ids[:, :, sl]

        # visual prompts from this clip's GT (grad-free sampling targets)
        mask_features, ms = model.apply(
            {"params": params}, imgs_c, method=lambda m, y: m.encode_features(y)
        )
        grid_feats, grid_pos = model.apply(
            {"params": params}, ms[-1], fi_c,
            method=lambda m, x, f: m.decoder.prompt_feature_grid(x, f),
        )
        from univs_tpu.ops.mask_ops import masks_to_boxes

        h4, w4 = masks_c.shape[-2:]
        boxes_c = masks_to_boxes(masks_c) / jnp.array([w4, h4, w4, h4], jnp.float32)
        rngs_b = jax.random.split(r_prompt, B)
        samples, _ = jax.vmap(
            lambda f, p, m, bx, oc, ov, rr: sample_train_clip_prompts(
                f, p, m, bx, oc, ov, R, rr
            )
        )(grid_feats, grid_pos, masks_c, boxes_c, ids_c >= 0, targets.valid, rngs_b)
        kv, kv_pe, kv_valid = jax.vmap(lambda smp: broadcast_prompt_sample(smp, T))(samples)

        # NOTE (reference law): stage-3 training does NOT feed pooled
        # prompt features back into later clips.  prepare_prompt_memory_
        # pool (univs_prompt_longvideo.py:543-589) is a write-only store
        # during training: it early-returns once "prompt_feats" exists
        # (:556-558, making its own concat branch :578-589 dead), and
        # the only decoder read of targets["prompt_feats"] is gated on
        # `not self.training` (decoder_univs.py:652-656).  Its live
        # training effect is pinning prompt_obj_ids across clips
        # (:554) — automatic here, since our fixed-slot sampler prompts
        # every valid object in every clip.  Each clip's prompts come
        # from its own GT, exactly as the reference's per-clip
        # forward_prompt_encoder does.
        use_pe = jax.random.uniform(r_flip, ()) > 0.5
        vp = make_visual_prompts(kv, kv_pe, kv_valid, samples.valid, use_pe, t=T)

        out = model.apply(
            {"params": params}, imgs_c, fi_c, task="sot",
            visual_prompts=vp, cls_emb=cls_emb, train=True,
            rngs={"shuffle": r_shuffle},
        )

        targets_c = TrainTargets(
            labels=targets.labels, ids=ids_c, masks=masks_c,
            valid=targets.valid,
            prompt_obj_ids=jnp.where(
                samples.valid & targets.valid,
                jnp.broadcast_to(jnp.arange(N)[None], (B, N)), -1
            ).astype(jnp.int32),
        )
        stash_c: list = []
        loss_c, logged_c = criterion(
            r_crit, out, targets_c, jnp.ones((1,), bool), task="sot",
            reid_stash=stash_c,
        )
        total = total + loss_c
        for k, v in logged_c.items():
            logged[f"clip{ci}_{k}"] = v
        stash_per_clip.append(stash_c)

    # per-clip losses are AVERAGED over clips, not summed
    # (univs_prompt_longvideo.py:431-434: losses[k] = sum/len)
    total = total / jnp.float32(len(starts))

    # ---- inter-clip ReID loss (interclip_reid_loss :469-526) -----------
    # per decoder layer l >= 1 (:485-487): concat every clip's matched
    # learnable-query embeddings; one RANDOM occurrence of each object
    # id anchors the contrastive rows (:492-498 randperm + argmax ==
    # uniform over that id's occurrences); ctt on sim/sqrt(C) + aux on
    # clamped cosine sim; each weighted 0.5*reid_weight (:260).
    num_layers = len(stash_per_clip[0])
    r_inter = jax.random.fold_in(rng, 10_001)
    w_inter = 0.5 * cfg.train.reid_weight
    for l in range(1, num_layers):
        emb = jnp.concatenate([s[l][0] for s in stash_per_clip], axis=2)
        ids = jnp.concatenate([s[l][1] for s in stash_per_clip], axis=2)
        r_l = jax.random.fold_in(r_inter, l)
        ctt, aux = _interclip_layer_loss(emb, ids, targets.valid, r_l)
        suffix = "" if l == num_layers - 1 else f"_{l}"
        logged[f"loss_reid_interclip{suffix}"] = ctt
        logged[f"loss_reid_interclip_aux{suffix}"] = aux
        total = total + w_inter * (ctt + aux)
    return total, logged


def _interclip_layer_loss(
    emb: jnp.ndarray,   # [B, N, Tall, C] matched embeddings, all clips
    ids: jnp.ndarray,   # [B, N, Tall] per-frame gt ids (-1 = absent)
    obj_valid: jnp.ndarray,  # [B, N]
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One layer of the reference inter-clip ReID law
    (univs_prompt_longvideo.py:489-524), fixed-shape: object slots act
    as the unique-id set (each slot's id is constant over the frames
    where it appears), the anchor is a uniformly random kept occurrence
    of the slot (the randperm+argmax law), columns are every kept
    token.  The reference supports only batch size 1 (:440); batches
    average the per-video losses."""
    B, N, Tall, C = emb.shape

    def per_video(e, i, ov, r):
        flat = e.reshape(N * Tall, C)
        fid = i.reshape(N * Tall)
        keep = (fid >= 0) & jnp.repeat(ov, Tall)
        # one random kept occurrence per slot (gumbel-max over the mask)
        g = jax.random.gumbel(r, (N, Tall))
        g = jnp.where((i >= 0) & ov[:, None], g, -jnp.inf)
        anchor_t = jnp.argmax(g, axis=-1)  # [N]
        anchor = jax.vmap(lambda row, t: row[t])(e, anchor_t)  # [N, C]
        slot_id = jnp.max(i, axis=-1)  # constant id of each slot (-1 absent)
        row_valid = ov & (slot_id >= 0) & ((i >= 0).any(-1))
        pos = (slot_id[:, None] == fid[None]).astype(jnp.float32)
        sim = anchor @ flat.T / math.sqrt(C)
        r1, _ = jax.random.split(r)
        ctt = contrastive_loss(sim, pos, row_valid, keep, rng=r1)
        nrm_a = anchor / jnp.maximum(
            jnp.linalg.norm(anchor, axis=-1, keepdims=True), 1e-12)
        nrm_f = flat / jnp.maximum(
            jnp.linalg.norm(flat, axis=-1, keepdims=True), 1e-12)
        aux = contrastive_aux_loss(nrm_a @ nrm_f.T, pos, row_valid, keep)
        return ctt, aux

    rs = jax.random.split(rng, B)
    ctts, auxs = jax.vmap(per_video)(emb, ids, obj_valid, rs)
    return ctts.mean(), auxs.mean()
