"""Alternative inference drivers: MinVIS-style fast VIS, image generic
segmentation, and raw-video semantic feature extraction.

Rebuilds of:
- ``InferenceVideoVISFast`` (reference: univs/inference/
  inference_video_vis_fast.py:39-524): per-clip forward, frame-to-frame
  Hungarian matching on learnable query embeddings (bisoftmax
  similarity), overlapping-clip mask averaging;
- ``InferenceImageGenericSegmentation`` (reference: inference_image_
  generic_seg.py:36-449): COCO/ADE20K instance / semantic / panoptic
  post-processing of learnable queries;
- ``InferenceVideoSemanticExtraction`` (reference: inference_video_
  semantic_extraction.py:53-330): per-frame 200 object tokens +
  compressed mask features for downstream video-generation work.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from univs_tpu.losses.hungarian import hungarian
from univs_tpu.ops import mask_ops


def match_from_embds(tgt_embds: jnp.ndarray, cur_embds: jnp.ndarray) -> jnp.ndarray:
    """Bisoftmax frame-to-frame query matching -> permutation of cur
    aligning to tgt (reference: comm.py:25-62 / minvis).

    tgt_embds, cur_embds: [Q, C] -> perm [Q]."""
    t = tgt_embds / jnp.maximum(jnp.linalg.norm(tgt_embds, axis=-1, keepdims=True), 1e-6)
    c = cur_embds / jnp.maximum(jnp.linalg.norm(cur_embds, axis=-1, keepdims=True), 1e-6)
    sim = t @ c.T
    bisoft = (jax.nn.softmax(sim, axis=0) + jax.nn.softmax(sim, axis=1)) / 2
    return hungarian(1.0 - bisoft)  # [Q] cur index per tgt slot


class FastVISDriver:
    """MinVIS-style VIS: one forward per clip, embeddings matched
    across clips, masks averaged on overlaps."""

    def __init__(self, cfg, params, modules=None):
        from univs_tpu.models.univs import (
            build_backbone, build_decoder, build_pixel_decoder, compute_dtype_of,
        )

        self.cfg = cfg
        self.params = params
        self.T = cfg.inference.num_frames
        dtype = compute_dtype_of(cfg)
        self._backbone = build_backbone(cfg.backbone, dtype=dtype)
        pd, dec = modules or (build_pixel_decoder(cfg), build_decoder(cfg))
        mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
        std = jnp.asarray(cfg.pixel_std, jnp.float32)

        @jax.jit
        def clip_fn(params, frames, frame_indices, cls_emb):
            x = ((frames - mean) / std).astype(dtype)
            feats = self._backbone.apply({"params": params["backbone"]}, x)
            mask_features, _, _, ms = pd.apply({"params": params["pixel_decoder"]}, feats)
            out = dec.apply(
                {"params": params["decoder"]}, ms, mask_features,
                frame_indices[None], task="detection", cls_emb=cls_emb,
            )
            Ql = cfg.decoder.num_queries
            return (
                jax.nn.sigmoid(out["pred_logits"][0, :Ql].astype(jnp.float32)),
                out["pred_masks"][0, :Ql].astype(jnp.float32),
                out["pred_embds"][0, :Ql].mean(1).astype(jnp.float32),
            )

        self._clip_fn = clip_fn
        self._match = jax.jit(match_from_embds)

    def run(self, frames: np.ndarray, cls_emb, topk: int = 10) -> List[Dict]:
        """frames [V, H, W, 3] -> per-instance dicts with per-frame mask
        logits (1/4 res), aligned across clips."""
        V = frames.shape[0]
        frames_j = jnp.asarray(frames, jnp.float32)
        Ql = self.cfg.decoder.num_queries
        all_masks = []
        all_logits = []
        ref_embds = None
        perm_chain = jnp.arange(Ql)
        for i in range(0, V, self.T):
            idx = np.minimum(np.arange(i, i + self.T), V - 1)
            logits, masks, embds = self._clip_fn(
                self.params, frames_j[idx], jnp.asarray(idx), cls_emb
            )
            if ref_embds is not None:
                perm = self._match(ref_embds, embds)
                masks = masks[perm]
                logits = logits[perm]
                embds = embds[perm]
            ref_embds = embds
            n_keep = min(self.T, V - i)
            all_masks.append(np.asarray(masks[:, :n_keep]))
            all_logits.append(np.asarray(logits))
        masks = np.concatenate(all_masks, axis=1)[:, :V]
        scores = np.mean(all_logits, axis=0)  # [Q, K]
        best = scores.max(-1)
        order = np.argsort(-best)[:topk]
        return [
            {"score": scores[q], "mask_logits": masks[q], "category_id": int(scores[q].argmax())}
            for q in order
        ]


class FastVPSDriver(FastVISDriver):
    """Non-unified online VPS: per-clip learnable-query outputs matched
    across clips by a host-side tracker, then panoptic stitching
    (reference: univs/inference/inference_video_vps.py:35-406 —
    per-clip panoptic with embedding matching match_from_embds :295).
    """

    def run_vps(self, frames: np.ndarray, cls_emb, thing_class_ids,
                object_thres: float = 0.25):
        from univs_tpu.inference.trackers import FastOverTracker

        V = frames.shape[0]
        frames_j = jnp.asarray(frames, jnp.float32)
        tracker = FastOverTracker(new_score_thres=object_thres)
        for i in range(0, V, self.T):
            idx = np.minimum(np.arange(i, i + self.T), V - 1)
            logits, masks, embds = self._clip_fn(
                self.params, frames_j[idx], jnp.asarray(idx), cls_emb
            )
            n_keep = min(self.T, V - i)
            tracker.update(i, np.asarray(embds), np.asarray(logits),
                           np.asarray(masks[:, :n_keep]))
        results = tracker.results(V)

        h4, w4 = masks.shape[-2:]
        pan = np.zeros((V, h4, w4), np.int32)
        infos = []
        thing_memory, stuff_memory = {}, {}
        seg_id = 0
        for t in range(V):
            order = sorted(results, key=lambda r: -float(np.max(r["score"])))
            taken = np.zeros((h4, w4), bool)
            for r in order:
                if t not in r["masks"]:
                    continue
                m = (r["masks"][t] > 0) & ~taken
                if m.sum() == 0:
                    continue
                c = r["category_id"]
                isthing = (c + 1) in thing_class_ids
                key = r["track_id"] if isthing else c
                memory = thing_memory if isthing else stuff_memory
                if key not in memory:
                    seg_id += 1
                    memory[key] = seg_id
                    infos.append({"id": seg_id, "isthing": isthing, "category_id": c + 1})
                pan[t][m] = memory[key]
                taken |= m
        return pan, infos


def image_instance_postprocess(
    logits: np.ndarray,  # [Q, K] sigmoid scores
    masks: np.ndarray,  # [Q, H, W] logits
    topk: int = 100,
) -> List[Dict]:
    """COCO-style instance results from one image's learnable queries
    (reference: inference_image_generic_seg.py instance path)."""
    Q, K = logits.shape
    flat = logits.reshape(-1)
    k = min(topk, flat.size)
    top = np.argsort(-flat)[:k]
    out = []
    for t in top:
        q, c = divmod(int(t), K)
        m = masks[q] > 0
        mask_score = (1 / (1 + np.exp(-masks[q])))[m].mean() if m.any() else 0.0
        out.append({
            "category_id": c, "score": float(flat[t] * mask_score), "mask": m.astype(np.uint8),
        })
    return out


def image_semantic_postprocess(logits: np.ndarray, masks: np.ndarray) -> np.ndarray:
    """Semantic map via class-weighted mask vote (reference semantic
    path: einsum(qc,qhw->chw) argmax)."""
    prob = 1 / (1 + np.exp(-masks))
    sem = np.einsum("qc,qhw->chw", logits, prob)
    return sem.argmax(0)


def image_panoptic_postprocess(
    logits: np.ndarray, masks: np.ndarray, thing_ids, object_thres: float = 0.25,
    overlap_thres: float = 0.8,
) -> Tuple[np.ndarray, List[Dict]]:
    """Panoptic stitching (Mask2Former-style argmax with overlap
    filtering; reference panoptic path)."""
    scores = logits.max(-1)
    classes = logits.argmax(-1)
    keep = scores > object_thres
    prob = 1 / (1 + np.exp(-masks))
    weighted = prob * scores[:, None, None] * keep[:, None, None]
    owner = weighted.argmax(0)
    bg = (prob < 0.5).all(0) | ~keep[owner]
    pan = np.zeros(masks.shape[-2:], np.int32)
    infos = []
    seg_id = 0
    stuff_memory = {}
    for q in np.argsort(-scores):
        if not keep[q]:
            continue
        m = (owner == q) & (prob[q] > 0.5) & ~bg
        orig = (prob[q] > 0.5).sum()
        if m.sum() == 0 or orig == 0 or m.sum() / orig < overlap_thres * 0.5:
            continue
        c = int(classes[q])
        isthing = (c + 1) in thing_ids
        if not isthing and c in stuff_memory:
            pan[m] = stuff_memory[c]
            continue
        seg_id += 1
        pan[m] = seg_id
        if not isthing:
            stuff_memory[c] = seg_id
        infos.append({"id": seg_id, "isthing": isthing, "category_id": c + 1})
    return pan, infos


class SemanticExtractionDriver:
    """Raw .mp4/frames -> per-frame object tokens + compressed mask
    features (reference: inference_video_semantic_extraction.py:148-240)."""

    def __init__(self, cfg, params):
        from univs_tpu.models.univs import (
            build_backbone, build_decoder, build_pixel_decoder, compute_dtype_of,
        )

        self.cfg = cfg
        self.params = params
        self.T = cfg.inference.num_frames
        dtype = compute_dtype_of(cfg)
        self._backbone = build_backbone(cfg.backbone, dtype=dtype)
        pd, dec = build_pixel_decoder(cfg), build_decoder(cfg)
        mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
        std = jnp.asarray(cfg.pixel_std, jnp.float32)

        @jax.jit
        def clip_fn(params, frames, frame_indices, cls_emb):
            x = ((frames - mean) / std).astype(dtype)
            feats = self._backbone.apply({"params": params["backbone"]}, x)
            mask_features, _, _, ms = pd.apply({"params": params["pixel_decoder"]}, feats)
            out = dec.apply(
                {"params": params["decoder"]}, ms, mask_features,
                frame_indices[None], task="detection", cls_emb=cls_emb,
            )
            Ql = cfg.decoder.num_queries
            embds = out["pred_embds"][0, :Ql]  # [Q, T, C]
            # 1/32-compressed mask features (reference returns mask_features
            # pooled 8x from the 1/4 map)
            mf = mask_features
            t_, h, w, c = mf.shape
            mf = mf.reshape(t_, h // 8, 8, w // 8, 8, c).mean(axis=(2, 4))
            return embds.transpose(1, 2, 0), mf  # [T, C, Q], [T, h/32, w/32, C]

        self._clip_fn = clip_fn

    def run(self, frames: np.ndarray, cls_emb):
        V = frames.shape[0]
        frames_j = jnp.asarray(frames, jnp.float32)
        toks, mfs = [], []
        for i in range(0, V, self.T):
            idx = np.minimum(np.arange(i, i + self.T), V - 1)
            e, m = self._clip_fn(self.params, frames_j[idx], jnp.asarray(idx), cls_emb)
            n = min(self.T, V - i)
            toks.append(np.asarray(e[:n]))
            mfs.append(np.asarray(m[:n]))
        return np.concatenate(toks), np.concatenate(mfs)
