"""Batched multi-video serving for the streaming VIS runtime.

The single-video clip decode dispatches ~240 queries x T=5 frames of
work per step — plenty for correctness, but the decoder's many small
ops leave the chip underutilized between the big matmuls.  Decoding B
videos in LOCKSTEP amortizes per-op overheads: the window encode folds
the video axis into the frame axis (backbone + pixel decoder are
frame-parallel), and the clip step / pool shift / emission are
``jax.vmap``-ped over a leading video axis (the memory pools are a
stacked pytree).  Measured scaling lives in docs/PERFORMANCE.md.

This is a serving-throughput feature with no reference counterpart
(the torch reference processes one video at a time,
inference_video_entity.py:243 ``len(targets) == 1``); per-video
results are IDENTICAL to :class:`EntityDriver` because vmap only
batches the same pure clip program.

Contract: all videos share one padded resolution; shorter videos are
padded by repeating their last frame (index clamping), and results are
truncated to each video's true length on assembly.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from univs_tpu.config import UniVSConfig
from univs_tpu.inference import memory_pool as mp
from univs_tpu.inference.driver import (
    _DRIVER_JIT_MEMO,
    assemble_vis_results,
    compute_dtype_of,
)
from univs_tpu.inference.entity import EntityClipConfig, entity_clip_step
from univs_tpu.models.univs import build_backbone, build_decoder, build_pixel_decoder


def _build_batched_fns(cfg, backbone, modules, cc, stride, dtype):
    mean = np.asarray(cfg.pixel_mean, np.float32)
    std = np.asarray(cfg.pixel_std, np.float32)

    @jax.jit
    def encode_fn(params, frames):
        # frames [B*Wn, H, W, 3]: the video axis rides the frame axis
        x = ((frames.astype(jnp.float32) - mean) / std).astype(dtype)
        feats = backbone.apply({"params": params["backbone"]}, x)
        mask_features, _, _, ms = modules[0].apply(
            {"params": params["pixel_decoder"]}, feats
        )
        return mask_features, tuple(ms)

    def _clip(params, feats, pool, frame_indices, clip_offset, is_first, cls_emb):
        return entity_clip_step(
            modules, params, feats, pool, frame_indices,
            clip_offset, is_first, cls_emb, cc,
        )

    # video axis: feats / pool / frame_indices batched; params, offset,
    # first-flag and the class bank shared
    clip_fn = jax.jit(jax.vmap(_clip, in_axes=(None, 0, 0, 0, None, None, None)))
    shift_fn = jax.jit(jax.vmap(lambda pool: mp.shift_clip(pool, stride)))

    import functools

    @functools.partial(jax.jit, static_argnames=("out_frames",))
    def emit_fn(pool, out_frames: int):
        def one(p):
            raw = p.mask_logits[:, :out_frames]
            occ = jnp.maximum(p.occurrence[:, :out_frames], 1.0)
            divided = raw / occ[:, :, None, None]
            scores = p.logits_sum / jnp.maximum(p.logits_count, 1)[:, None]
            valid_snapshot = jnp.logical_or(p.valid, False)
            return (divided.astype(jnp.float16), scores, valid_snapshot,
                    mp.evict_window(p, out_frames))

        return jax.vmap(one)(pool)

    # (no batched emit_packed_fn: packing happens at the drain on only
    # the finally-valid rows — _pack_rows — exactly as in EntityDriver)
    return encode_fn, clip_fn, shift_fn, emit_fn


class BatchedVISServer:
    """Lockstep VIS over a batch of videos (throughput serving mode).

    Args:
        cfg: UniVSConfig
        params: UniVS param tree
        num_classes: K of the category slice
        capacity: entity slots per video
        batch_size: videos decoded per dispatch
    """

    def __init__(self, cfg: UniVSConfig, params, num_classes: int,
                 capacity: int = 40, batch_size: int = 2):
        self.cfg = cfg
        self.params = params
        self.num_classes = num_classes
        self.capacity = capacity
        self.batch_size = batch_size
        inf = cfg.inference
        self.T = inf.num_frames
        self.stride = inf.clip_stride
        self.window = inf.num_frames_window
        self.out_window = max(self.window - self.T, self.T)
        self.cc = EntityClipConfig(
            num_queries=cfg.decoder.num_queries,
            topk_candidates=inf.topk_per_video,
            num_prev_frames_memory=cfg.prompt.num_prev_frames_memory,
            apply_cls_thres=inf.apply_cls_thres,
            newly_thres=inf.newly_entity_thres,
            consistency_thres=inf.consistency_thres[0],
            nms_thres=inf.nms_thres,
            num_dense_points=cfg.prompt.num_dense_points_test,
            clip_stride=self.stride,
            num_frames=self.T,
            detect_newly_interval_frames=inf.detect_newly_interval_frames,
        )
        dtype = compute_dtype_of(cfg)
        self._backbone = build_backbone(cfg.backbone, dtype=dtype)
        self._modules = (build_pixel_decoder(cfg), build_decoder(cfg))

        memo_key = ("entity_batched", cfg, batch_size)
        fns = _DRIVER_JIT_MEMO.get(memo_key)
        if fns is None:
            fns = _build_batched_fns(
                cfg, self._backbone, self._modules, self.cc, self.stride, dtype
            )
            _DRIVER_JIT_MEMO[memo_key] = fns
        (self._encode_fn, self._clip_fn, self._shift_fn, self._emit_fn) = fns

    # ------------------------------------------------------------------

    def _stream_batch(self, frames_b: np.ndarray, lengths: Sequence[int],
                      cls_emb: jnp.ndarray, packed_sizes=None):
        """frames_b [B, V, H, W, 3] (tail frames repeated per video);
        lengths: true per-video frame counts.  Returns per-video
        (emitted windows, starts, score snapshots, final pool leaves).
        ``packed_sizes`` as in ``EntityDriver._stream``: emit bit-packed
        output-resolution masks on device instead of fp16 logits."""
        B, V, H, W = frames_b.shape[:4]
        assert B == self.batch_size
        mask_hw = (H // 4, W // 4)

        pool1 = mp.create_entity_memory(
            self.capacity, self.num_classes, self.cfg.decoder.hidden_dim,
            mask_hw, window=self.out_window + self.T,
            num_prompt_points=self.cc.num_dense_points,
            embd_history=8,
            prompt_history=self.T + self.stride,
        )
        pool = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), pool1
        )

        frames_j = jnp.asarray(frames_b)  # keep uint8 uint8: 4x cheaper H2D
        feats_window = None
        window_range = (0, 0)
        emitted = [[] for _ in range(B)]
        emit_starts: List[int] = []
        emit_scores = [[] for _ in range(B)]
        emitted_total = 0

        is_last = False
        i = 0
        first = True
        while i < V and not is_last:
            is_last = i + self.T >= V
            clip_idx = np.minimum(np.arange(i, i + self.T), V - 1)

            if i + self.T > window_range[1]:
                idx = np.minimum(np.arange(i, i + self.window), V - 1)
                Wn = len(idx)
                flat = frames_j[:, idx].reshape(B * Wn, H, W, 3)
                mf, ms = self._encode_fn(self.params, flat)
                feats_window = (
                    mf.reshape(B, Wn, *mf.shape[1:]),
                    tuple(m.reshape(B, Wn, *m.shape[1:]) for m in ms),
                )
                window_range = (i, i + self.window)

            rel = clip_idx - window_range[0]
            mf_w, ms_w = feats_window
            feats = (mf_w[:, rel], tuple(m[:, rel] for m in ms_w))

            # per-video frame indices clamp at each video's true length
            fi_b = np.minimum(clip_idx[None, :], np.asarray(lengths)[:, None] - 1)
            clip_offset = jnp.int32(i - emitted_total)
            pool, _ = self._clip_fn(
                self.params, feats, pool, jnp.asarray(fi_b),
                clip_offset, jnp.bool_(first), cls_emb,
            )
            first = False

            while (i + self.T - emitted_total) >= (self.out_window + self.T) or (
                is_last and emitted_total < V
            ):
                n_out = self.out_window if not is_last else min(
                    V - emitted_total, self.out_window + self.T)
                # packed mode also emits fp16 quarter-res windows: the
                # upsample+pack runs at the drain on only the
                # finally-valid rows (see EntityDriver._stream)
                masks_div, win_scores, win_valid, pool = \
                    self._emit_fn(pool, n_out)
                for b in range(B):
                    emitted[b].append(masks_div[b])
                    emit_scores[b].append(win_scores[b])
                emit_starts.append(emitted_total)
                emitted_total += n_out
                if is_last and emitted_total >= V:
                    break

            if not is_last:
                pool = self._shift_fn(pool)
            i += self.stride

        # end-of-batch drain; with packed emission, only finally-valid
        # entity rows cross the D2H link (bucketed gather, see the
        # single-video driver)
        entity_rows = [None] * B
        if packed_sizes is not None:
            from univs_tpu.inference.driver import _pack_rows

            valid_b = np.asarray(pool.valid)
            for b in range(B):
                rows = np.flatnonzero(valid_b[b])
                entity_rows[b] = rows
                if rows.size:
                    # power-of-two bucket (not %8): dead D2H rows are
                    # ~150 ms/row/video on this link — see the driver
                    bucket = 1 << (int(rows.size) - 1).bit_length()
                    pad = min(bucket - rows.size, valid_b.shape[1] - rows.size)
                    idx = jnp.asarray(np.concatenate(
                        [rows, np.repeat(rows[-1:], pad)]).astype(np.int32))
                    emitted[b] = [_pack_rows(m[idx], packed_sizes)
                                  for m in emitted[b]]
                else:
                    ph, pw = packed_sizes[1]
                    emitted[b] = [np.zeros((0, m.shape[1], ph, (pw + 7) // 8),
                                           np.uint8) for m in emitted[b]]
        for e in emitted:
            for m in e:
                try:
                    m.copy_to_host_async()
                except Exception:
                    break
        emitted = [[np.asarray(m) for m in e] for e in emitted]
        emit_scores = [[np.asarray(s) for s in e] for e in emit_scores]
        return emitted, emit_starts, emit_scores, pool, entity_rows

    def run_vis(self, videos: Sequence[np.ndarray], cls_emb: jnp.ndarray,
                image_sizes: Optional[Sequence] = None,
                out_sizes: Optional[Sequence] = None) -> List[List[Dict]]:
        """videos: B arrays [V_b, H, W, 3] at ONE padded resolution.
        Returns per-video per-entity result dicts (same contract as
        EntityDriver.run_vis)."""
        B = len(videos)
        assert B == self.batch_size, (B, self.batch_size)
        H, W = videos[0].shape[1:3]
        lengths = [v.shape[0] for v in videos]
        V = max(lengths)
        frames_b = np.stack([
            v[np.minimum(np.arange(V), v.shape[0] - 1)] for v in videos
        ])
        # the jit'd batched emit needs ONE static size triple: use the
        # packed device-side emission when every video shares the padded
        # resolution as image/out size (the lockstep-batch contract);
        # fall back to host upsampling for per-video crop/resize targets
        packed_sizes = None
        if not image_sizes and not out_sizes:
            packed_sizes = ((H, W), (H, W), (H, W))
        emitted, emit_starts, emit_scores, pool, entity_rows = \
            self._stream_batch(frames_b, lengths, cls_emb,
                               packed_sizes=packed_sizes)
        out = []
        for b in range(B):
            image_size = (image_sizes[b] if image_sizes else (H, W))
            out_size = (out_sizes[b] if out_sizes else image_size)
            out.append(assemble_vis_results(
                emitted[b], emit_starts, emit_scores[b],
                np.asarray(pool.valid[b]), np.asarray(pool.quality_sum[b]),
                lengths[b], image_size, out_size, (H, W),
                packed_width=(W if packed_sizes is not None else None),
                entity_rows=entity_rows[b],
            ))
        return out
