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
from univs_tpu.losses.criterion import TrainTargets, UniCriterion, contrastive_loss
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
    pool_kv = None  # [B, N, P_pool, C] accumulated no-grad prompt sets
    pool_kv_pe = None
    pool_valid = None
    embds_per_clip = []  # for inter-clip reid: [B, N, T, C] matched prompt embds

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

        # merge the no-grad memory pool from earlier clips along L
        # (decoder_univs.py:750-756)
        if pool_kv is not None:
            pk = jnp.broadcast_to(pool_kv[:, :, :, None], pool_kv.shape[:3] + (T, pool_kv.shape[-1]))
            pkp = jnp.broadcast_to(pool_kv_pe[:, :, :, None], pk.shape)
            pkv = jnp.broadcast_to(pool_valid[:, :, :, None], pool_valid.shape[:3] + (T,))
            kv = jnp.concatenate([jax.lax.stop_gradient(pk), kv], axis=2)
            kv_pe = jnp.concatenate([jax.lax.stop_gradient(pkp), kv_pe], axis=2)
            kv_valid = jnp.concatenate([pkv, kv_valid], axis=2)

        use_pe = jax.random.uniform(r_flip, ()) > 0.5
        vp = make_visual_prompts(kv, kv_pe, kv_valid, samples.valid, use_pe)

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
        loss_c, logged_c = criterion(
            r_crit, out, targets_c, jnp.ones((1,), bool), task="sot"
        )
        total = total + loss_c
        for k, v in logged_c.items():
            logged[f"clip{ci}_{k}"] = v

        # collect prompt-query embds for inter-clip reid (stop-grad pool,
        # live grads for the loss — reference stashes per-layer embds)
        Ql = cfg.decoder.num_queries
        embds_per_clip.append(out["pred_embds"][:, Ql:])  # [B, N, T, C]

        # update training-time memory pool (no grad) — keep the key-frame
        # sample sets from this clip (prepare_prompt_memory_pool :543-589)
        new_kv = jax.lax.stop_gradient(samples.kv)  # [B, N, R, C]
        new_pe = jax.lax.stop_gradient(samples.kv_pe)
        new_valid = samples.kv_valid
        if pool_kv is None:
            pool_kv, pool_kv_pe, pool_valid = new_kv, new_pe, new_valid
        else:
            pool_kv = jnp.concatenate([pool_kv, new_kv], axis=2)
            pool_kv_pe = jnp.concatenate([pool_kv_pe, new_pe], axis=2)
            pool_valid = jnp.concatenate([pool_valid, new_valid], axis=2)

    # ---- inter-clip ReID loss (interclip_reid_loss :469-526) -----------
    C = embds_per_clip[0].shape[-1]
    emb = jnp.concatenate(embds_per_clip, axis=2)  # [B, N, T*n_clips, C]
    n_tok = emb.shape[2]
    flat = emb.reshape(B * N * n_tok, C)
    obj = jnp.tile(jnp.repeat(jnp.arange(N), n_tok)[None], (B, 1)).reshape(-1)
    vid = jnp.repeat(jnp.arange(B), N * n_tok)
    keep = jnp.repeat(targets.valid.reshape(-1), n_tok)
    sim = flat @ flat.T / math.sqrt(C)
    pos = ((obj[:, None] == obj[None]) & (vid[:, None] == vid[None])).astype(jnp.float32)
    inter_reid = contrastive_loss(sim, pos, keep, keep)
    total = total + cfg.train.reid_weight * inter_reid
    logged["loss_interclip_reid"] = inter_reid
    return total, logged
