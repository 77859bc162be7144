"""Alternative inference drivers: MinVIS-style fast VIS, image generic
segmentation, and raw-video semantic feature extraction.

Rebuilds of:
- ``InferenceVideoVISFast`` (reference: univs/inference/
  inference_video_vis_fast.py:39-524): per-clip forward, frame-to-frame
  Hungarian matching on learnable query embeddings (bisoftmax
  similarity), overlapping-clip mask averaging;
  (image generic segmentation lives in univs_tpu/inference/image.py —
  exact transcription of inference_image_generic_seg.py);
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
            x = ((frames.astype(jnp.float32) - mean) / std).astype(dtype)
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
        frames_j = jnp.asarray(frames)  # keep uint8 uint8: 4x cheaper H2D
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


class MDQEVISDriver(FastVISDriver):
    """Clip-level VIS with the MDQE over-tracker (reference:
    univs/inference/inference_video_vis.py:39 with tracker_type='mdqe'
    driving MDQE_OverTrackerEfficient) — per-clip learnable-query
    outputs, score-thresholded into tracker clips, window-resident
    matching + rollover, per-window emission."""

    def run(self, frames: np.ndarray, cls_emb, score_thres: float = 0.05,
            window_track: Optional[int] = None, topk: int = 25) -> List[Dict]:
        from univs_tpu.inference.trackers import MDQETracker

        V = frames.shape[0]
        T = self.T
        stride = self.cfg.inference.clip_stride
        W = window_track or max(T * 2, 10)
        frames_j = jnp.asarray(frames)  # keep uint8 uint8: 4x cheaper H2D
        tracker = MDQETracker(
            num_classes=int(cls_emb.shape[0]), num_frames=T,
            num_frames_window_track=W, clip_stride=stride,
            embed_dim=self.cfg.decoder.hidden_dim,
            apply_cls_thres=self.cfg.inference.apply_cls_thres,
            data_name="ytvis",
        )
        results: Dict[int, Dict] = {}  # obj_id -> {frames: {f: mask}, cls: []}
        window_start = 0
        first = True
        i = 0
        while i < V:
            idx = np.minimum(np.arange(i, i + T), V - 1)
            logits, masks, embds = self._clip_fn(
                self.params, frames_j[idx], jnp.asarray(idx), cls_emb
            )
            logits = np.asarray(logits)
            masks = np.asarray(masks)
            embds = np.asarray(embds)
            keep = logits.max(-1) > score_thres
            if keep.sum() == 0:
                keep[np.argmax(logits.max(-1))] = True
            clip = {
                "scores": logits.max(-1)[keep],
                "mask_logits": masks[keep],
                "cls_probs": logits[keep],
                "query_embeds": embds[keep],
                "frame_idx": list(range(i - window_start, i - window_start + T)),
            }
            tracker.update(clip, is_first_clip=first)
            first = False
            nxt = i + stride
            is_last = nxt + T > V + T - 1 or nxt >= V
            if (nxt - window_start) + T > tracker.mem_length or is_last:
                out = tracker.get_result(is_last_clip=is_last)
                for k, oid in enumerate(np.asarray(out["obj_ids"])):
                    r = results.setdefault(int(oid), {"frames": {}, "cls": []})
                    r["cls"].append(np.asarray(out["pred_cls_scores"][k]))
                    for t in range(out["pred_masks"].shape[1]):
                        f = window_start + t
                        if f < V:
                            r["frames"][f] = np.asarray(out["pred_masks"][k, t])
                window_start += tracker.window_frames
            if is_last:
                break
            i = nxt
        final = []
        for oid, r in results.items():
            score = np.mean(r["cls"], axis=0)
            final.append({
                "track_id": oid, "score": score,
                "category_id": int(score.argmax()),
                "masks": r["frames"],
            })
        final.sort(key=lambda r: -float(np.max(r["score"])))
        return final[:topk]


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
        frames_j = jnp.asarray(frames)  # keep uint8 uint8: 4x cheaper H2D
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
            x = ((frames.astype(jnp.float32) - mean) / std).astype(dtype)
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
        frames_j = jnp.asarray(frames)  # keep uint8 uint8: 4x cheaper H2D
        toks, mfs = [], []
        for i in range(0, V, self.T):
            idx = np.minimum(np.arange(i, i + self.T), V - 1)
            e, m = self._clip_fn(self.params, frames_j[idx], jnp.asarray(idx), cls_emb)
            n = min(self.T, V - i)
            toks.append(np.asarray(e[:n]))
            mfs.append(np.asarray(m[:n]))
        return np.concatenate(toks), np.concatenate(mfs)


def semantic_features_to_masks(
    cfg,
    params,
    obj_tokens: np.ndarray,  # [T, C, Q] saved by SemanticExtractionDriver
    mask_feats: np.ndarray,  # [T, h, w, C] compressed mask features
    cls_emb: jnp.ndarray,  # [K, Dt] category bank
    apply_cls_thres: float = 0.65,
    apply_mask_quality_thres: float = 0.85,
    temporal_stride: int = 10,
    cls_start: int = 1000,
    only_high_conf_masks: bool = True,
):
    """Reconstruct class logits + mask logits from SAVED semantic
    features — the downstream consumer of the I7 extraction format
    (reference: semantic_feature_to_mask.py:30-150
    ``ConvertSemanticFeatureToMask.convert``).

    The reference saves PRE-norm object tokens and applies
    ``decoder_norm`` at load; our extraction driver saves the decoder's
    ``pred_embds``, which are already decoder-normed — so this consumer
    skips the norm and the end-to-end composition (pixels -> masks) is
    identical.  Laws transcribed exactly: ``mask_embed`` MLP x mask-
    feature einsum; ``vis2text_projection`` -> cosine similarity against
    the L2-normalized category bank x ``exp(cls_temp)``; high-confidence
    filter = sigmoid class score over categories [cls_start:] >
    ``apply_cls_thres`` (the reference's ``[..., 1000:]`` video-dataset
    slice of the combined bank) AND mask stability quality at
    ``temporal_stride`` sub-sampling > ``apply_mask_quality_thres``.

    Returns (cls_logits [n, T, K], mask_logits [n, T, h, w],
    indices [n] of the kept queries).
    """
    from univs_tpu.inference.entity import mask_quality_scores
    from univs_tpu.models.univs import build_decoder

    dec = build_decoder(cfg)
    tokens = jnp.asarray(obj_tokens).transpose(0, 2, 1)  # [T, Q, C]
    mf = jnp.asarray(mask_feats, jnp.float32)

    @jax.jit
    def heads(dec_params, tokens, mf, cls_emb):
        def run(m, tokens):
            membed = m.mask_embed(tokens)  # [T, Q, mask_dim]
            cls_feats = m.vis2text(tokens)  # [T, Q, Dt]
            return membed, cls_feats

        membed, cls_feats = dec.apply({"params": dec_params}, tokens, method=run)
        masks = jnp.einsum("tqc,thwc->qthw", membed.astype(jnp.float32), mf)
        c = cls_feats / jnp.maximum(
            jnp.linalg.norm(cls_feats, axis=-1, keepdims=True), 1e-12)
        k = cls_emb / jnp.maximum(
            jnp.linalg.norm(cls_emb, axis=-1, keepdims=True), 1e-12)
        logits = jnp.einsum("tqd,kd->qtk", c.astype(jnp.float32), k)
        logits = logits * jnp.exp(dec_params["cls_temp"])
        return logits, masks

    cls_logits, mask_logits = heads(params["decoder"], tokens, mf, cls_emb)
    cls_logits, mask_logits = np.asarray(cls_logits), np.asarray(mask_logits)
    Q = mask_logits.shape[0]
    if not only_high_conf_masks:
        return cls_logits, mask_logits, np.arange(Q)

    start = min(cls_start, cls_logits.shape[-1] - 1)
    scores = 1.0 / (1.0 + np.exp(-cls_logits[..., start:]))
    is_conf = scores.reshape(Q, -1).max(-1) > apply_cls_thres
    qual = np.asarray(
        mask_quality_scores(jnp.asarray(mask_logits[:, ::temporal_stride])))
    keep = np.flatnonzero(is_conf & (qual > apply_mask_quality_thres))
    return cls_logits[keep], mask_logits[keep], keep
