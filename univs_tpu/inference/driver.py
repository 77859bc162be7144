"""Host-side video inference drivers: windowed backbone + clip loop +
window emission.

Orchestrates the jit'd per-clip step (inference/entity.py) over a full
video, mirroring the reference's ``InferenceVideoEntity.inference_video``
control flow (reference: inference_video_entity.py:283-431): backbone
features computed once per ``num_frames_window`` frames and sliced per
clip; results emitted per ``num_frames_window_output`` frames with
window eviction.  Only three things happen on the host: window
slicing, fetching emitted mask windows, and RLE/JSON writing.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from univs_tpu.config import UniVSConfig
from univs_tpu.inference import memory_pool as mp
from univs_tpu.inference.entity import EntityClipConfig, entity_clip_step
from univs_tpu.models.univs import (
    build_backbone,
    build_decoder,
    build_pixel_decoder,
    compute_dtype_of,
)
from univs_tpu.utils import rle

# jitted step functions shared across driver instances, keyed by config
# (see EntityDriver.__init__ for why)
_DRIVER_JIT_MEMO: Dict = {}


def _build_entity_fns(cfg, backbone, modules, cc, stride, dtype):
    # numpy (not device) constants: closing device arrays into a jit
    # triggers the jax-0.9 constant-interning corruption (see the
    # _DRIVER_JIT_MEMO note and tests/test_entity_inference.py)
    mean = np.asarray(cfg.pixel_mean, np.float32)
    std = np.asarray(cfg.pixel_std, np.float32)

    @jax.jit
    def encode_window_fn(params, frames):
        # backbone + per-frame pixel decoder, amortized per window
        # (the reference reruns the encoder per clip — see
        # inference/entity.py docstring).  Frames may arrive uint8 (the
        # cheap-transfer path) — cast on device before normalizing.
        x = ((frames.astype(jnp.float32) - mean) / std).astype(dtype)
        feats = backbone.apply({"params": params["backbone"]}, x)
        mask_features, _, _, ms = modules[0].apply(
            {"params": params["pixel_decoder"]}, feats
        )
        return mask_features, tuple(ms)

    @jax.jit
    def clip_fn(params, feats, pool, frame_indices, clip_offset, is_first, cls_emb):
        return entity_clip_step(
            modules, params, feats, pool, frame_indices,
            clip_offset, is_first, cls_emb, cc,
        )

    # the pool pytree (~320 MB at 640x960/E=60, dominated by f32
    # mask_logits) is threaded through every per-clip jit: DONATE it so
    # XLA updates the ring buffers in place instead of copying the whole
    # pool across each call boundary.  The streaming loops always
    # reassign `pool` from the call's result, never reusing the old
    # reference.  (clip_fn above stays undonated — probes/bench re-feed
    # a fixed pool.)
    @functools.partial(jax.jit, donate_argnums=(4,))
    def clip_window_fn(params, feats_window, sched, ci, pool, cls_emb):
        # Per-clip indices come from a DEVICE-resident schedule uploaded
        # once per video, indexed by a device step counter that the call
        # returns incremented — the loop makes zero per-clip host->device
        # transfers (each small transfer pays wire latency on this
        # link).  Clip slicing also lives here: the 4 eager window
        # gathers cost a measured ~34 ms/clip as standalone dispatches.
        rel_all, idx_all, off_all = sched
        rel = rel_all[ci]
        frame_indices = idx_all[ci]
        clip_offset = off_all[ci]
        is_first = ci == 0
        mf_w, ms_w = feats_window
        feats = (mf_w[rel], tuple(m[rel] for m in ms_w))
        pool, emit = entity_clip_step(
            modules, params, feats, pool, frame_indices,
            clip_offset, is_first, cls_emb, cc,
        )
        return pool, ci + 1

    import dataclasses

    cc_pixel = dataclasses.replace(cc, variant="pixel")

    @functools.partial(jax.jit, donate_argnums=(2,))
    def clip_pixel_fn(params, feats, pool, frame_indices, clip_offset, is_first,
                      cls_emb, thing_mask):
        # VPS panoptic newly-entity variant (detect_newly_entities_per_
        # clip_pixel — reference dispatch inference_video_entity.py:367-370)
        return entity_clip_step(
            modules, params, feats, pool, frame_indices,
            clip_offset, is_first, cls_emb, cc_pixel, thing_mask,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def shift_fn(pool):
        return mp.shift_clip(pool, stride)

    @functools.partial(jax.jit, static_argnames=("out_frames",),
                       donate_argnums=(0,))
    def emit_fn(pool, out_frames: int):
        # one executable for both consumers (a static `divide` flag
        # would create a second executable of the same shape, which
        # trips the preloaded PJRT plugin's buffer-accounting bug —
        # see the _DRIVER_JIT_MEMO note)
        raw = pool.mask_logits[:, :out_frames]
        # VIS emission normalizes by occurrence (save_results_vis:931);
        # VPS uses the raw accumulated logits (save_results_vps:984 —
        # the division there is commented out in the reference)
        occ = jnp.maximum(pool.occurrence[:, :out_frames], 1.0)
        divided = raw / occ[:, :, None, None]
        # per-window class-score snapshot: the logits-history mean at
        # emission time (reference: save_results_vis
        # inference_video_entity.py:926 targets["logits"].mean(1))
        scores = pool.logits_sum / jnp.maximum(pool.logits_count, 1)[:, None]
        # NOTE: materialize a copy of `valid` — returning an input leaf
        # unchanged makes an input-aliased output, which corrupts the
        # preloaded PJRT plugin's buffer accounting for later dispatches
        valid_snapshot = jnp.logical_or(pool.valid, False)
        return (divided.astype(jnp.float16), raw.astype(jnp.float16),
                scores, valid_snapshot, mp.evict_window(pool, out_frames))

    # (the former emit_packed_fn — packing every capacity slot per window
    # on device — is gone from the production tuple: windows emit fp16
    # quarter-res and the upsample+pack runs at the drain on only the
    # finally-valid rows, see _pack_rows)
    return (encode_window_fn, clip_fn, clip_window_fn, clip_pixel_fn,
            shift_fn, emit_fn)


# upsample+threshold+bitpack executables keyed by (rows, frames, sizes)
# — applied at the end-of-video drain to the gathered valid-entity rows
_PACK_JIT_MEMO: Dict = {}


def _pack_rows(win: jnp.ndarray, sizes) -> jnp.ndarray:
    """[P, n, H4, W4] fp16 divided logits -> packed output-res masks
    (the reference's save_results_vis upsample law on device, applied
    only to the P finally-valid rows)."""
    key = (win.shape, win.dtype.name, sizes)
    fn = _PACK_JIT_MEMO.get(key)
    if fn is None:
        image_size, out_size, padded_size = sizes
        fn = jax.jit(lambda m: _upsample_threshold_pack(
            m, image_size, out_size, padded_size))
        _PACK_JIT_MEMO[key] = fn
    return fn(win)


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., W] bool -> [..., ceil(W/8)] uint8, big-endian bit order
    (np.unpackbits-compatible)."""
    W = bits.shape[-1]
    pad = (-W) % 8
    if pad:
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    b = bits.reshape(bits.shape[:-1] + ((W + pad) // 8, 8))
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (b.astype(jnp.uint8) * weights).sum(-1).astype(jnp.uint8)


def _upsample_threshold_pack(logits: jnp.ndarray, image_size, out_size,
                             padded_size) -> jnp.ndarray:
    """Traced twin of ``_upsample_and_threshold`` + bitpack:
    [E, n, H4, W4] logits -> [E, n, out_h, ceil(out_w/8)] packed uint8.

    ``jax.image.resize(method="linear")`` matches torch
    ``F.interpolate(mode="bilinear", align_corners=False)`` to float
    rounding (<=5e-7 — pinned by
    tests/test_entity_inference.py::test_packed_emission_matches_host).
    Entities are processed in chunks so the full-resolution f32
    intermediate stays bounded (~256 MB) regardless of capacity."""
    E, n = logits.shape[:2]
    x = logits.astype(jnp.float32)

    def up(chunk):
        c = chunk.shape[0]
        y = jax.image.resize(chunk, (c, n) + tuple(padded_size),
                             method="linear", antialias=False)
        y = y[:, :, : image_size[0], : image_size[1]]
        if tuple(image_size) != tuple(out_size):
            y = jax.image.resize(y, (c, n) + tuple(out_size),
                                 method="linear", antialias=False)
        return _pack_bits(y > 0)

    budget = 64 * 2 ** 20  # f32 elements per chunk (~256 MB)
    per_e = max(1, n * padded_size[0] * padded_size[1])
    c_max = max(1, budget // per_e)
    c = max((d for d in range(1, E + 1) if E % d == 0 and d <= c_max),
            default=1)
    if c == E:
        return up(x)
    packed = jax.lax.map(up, x.reshape(E // c, c, *x.shape[1:]))
    return packed.reshape(E, *packed.shape[2:])


def _build_vos_fns(cfg, backbone, modules, cc, stride, dtype, query_mode):
    from univs_tpu.inference.vos import inject_gt_first_appearance, vos_clip_step
    from univs_tpu.structures import TextPrompts

    mean = np.asarray(cfg.pixel_mean, np.float32)
    std = np.asarray(cfg.pixel_std, np.float32)

    @jax.jit
    def encode_window_fn(params, frames):
        x = ((frames.astype(jnp.float32) - mean) / std).astype(dtype)
        feats = backbone.apply({"params": params["backbone"]}, x)
        mask_features, _, _, ms = modules[0].apply(
            {"params": params["pixel_decoder"]}, feats
        )
        return mask_features, tuple(ms)

    # pool donated throughout — see the note in _build_entity_fns
    @functools.partial(jax.jit, donate_argnums=(2,))
    def clip_fn(params, feats, pool, gt_clip, faf, obj_valid, frame_indices, clip_offset, cls_emb):
        pool = inject_gt_first_appearance(pool, gt_clip, faf, obj_valid, frame_indices, clip_offset)
        return vos_clip_step(modules, params, feats, pool, frame_indices,
                             clip_offset, cls_emb, cc, query_mode=query_mode)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def grounding_clip_fn(params, feats, pool, frame_indices, clip_offset, cls_emb, text_embs, text_valid):
        tp = TextPrompts(embs=text_embs, valid=text_valid)
        return vos_clip_step(modules, params, feats, pool, frame_indices,
                             clip_offset, cls_emb, cc,
                             text_prompts=tp, task="grounding")

    shift_fn = jax.jit(lambda pool: mp.shift_clip(pool, stride),
                       donate_argnums=(0,))

    @functools.partial(jax.jit, static_argnames=("out_frames",),
                       donate_argnums=(0,))
    def emit_fn(pool, out_frames: int):
        masks = pool.mask_logits[:, :out_frames]
        return masks.astype(jnp.float16), mp.evict_window(pool, out_frames)

    return encode_window_fn, clip_fn, grounding_clip_fn, shift_fn, emit_fn


class EntityDriver:
    """Category-guided VIS/VPS/VSS over one video.

    Args:
        cfg: UniVSConfig
        params: model params (the UniVSModel param tree)
        num_classes: K of the dataset's category slice
        capacity: entity slots E
    """

    def __init__(self, cfg: UniVSConfig, params, num_classes: int,
                 capacity: int = 40, thing_class_ids: Optional[Sequence[int]] = None,
                 pipeline_devices=None):
        """``pipeline_devices``: optional (encode_device, decode_device)
        pair.  When set, the window encode (backbone + pixel decoder)
        runs on the first device and the clip decode + memory pool live
        on the second, with the NEXT window's encode dispatched eagerly
        so the two chips overlap — true encode/decode pipelining for
        serving (single-chip streaming is 1/(t_enc+t_dec); two chips
        approach 1/max(t_enc, t_dec)).  Single-chip behavior is
        unchanged when None."""
        self.cfg = cfg
        self.params = params
        self._enc_dev = self._dec_dev = None
        self._params_enc = params
        if pipeline_devices is not None:
            self._enc_dev, self._dec_dev = pipeline_devices
            self._params_enc = jax.device_put(params, self._enc_dev)
            self.params = jax.device_put(params, self._dec_dev)
        self.num_classes = num_classes
        self.capacity = capacity
        self.thing_class_ids = set(thing_class_ids or [])
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

        # One set of jitted step functions per distinct config, shared
        # by every driver instance.  Besides avoiding pointless
        # recompiles when several evaluations run in one process, this
        # sidesteps a bug in this stack's preloaded PJRT plugin where a
        # SECOND independently-traced executable of the entity clip
        # step fails at dispatch with "Execution supplied N buffers but
        # compiled program expected M".
        memo_key = ("entity", cfg)
        fns = _DRIVER_JIT_MEMO.get(memo_key)
        if fns is None:
            fns = _build_entity_fns(
                cfg, self._backbone, self._modules, self.cc, self.stride, dtype
            )
            _DRIVER_JIT_MEMO[memo_key] = fns
        (self._encode_window_fn, self._clip_fn, self._clip_window_fn,
         self._clip_pixel_fn, self._shift_fn, self._emit_fn) = fns

    # ------------------------------------------------------------------

    def _iter_clips(self, V: int):
        """The ONE clip/window/emission schedule for a V-frame video.

        Both the device-resident schedule precompute and the dispatch
        loop consume this generator, so they cannot drift apart.  Yields
        per-clip dicts: ``i`` clip start, ``clip_idx`` absolute frame
        indices (tail-clamped), ``rel`` window-relative indices,
        ``offset`` = i - frames emitted so far, ``new_window`` = window
        start when this clip needs a fresh encode else None, ``emits`` =
        [(start, n_out), ...] output windows due after this clip,
        ``is_last``."""
        window_range = (0, 0)
        emitted_total = 0
        i, is_last = 0, False
        while i < V and not is_last:
            is_last = i + self.T >= V
            clip_idx = np.minimum(np.arange(i, i + self.T), V - 1)
            # frames beyond V-1 are clamped repeats already present in
            # the current window — compare the CLAMPED clip end, or the
            # tail triggers a whole redundant window encode (~1.6 s)
            new_window = None
            if min(i + self.T, V) > window_range[1]:
                new_window = i
                window_range = (i, i + self.window)
            offset = i - emitted_total
            emits = []
            while (i + self.T - emitted_total) >= (self.out_window + self.T) or (
                is_last and emitted_total < V
            ):
                n_out = (self.out_window if not is_last
                         else min(V - emitted_total, self.out_window + self.T))
                emits.append((emitted_total, n_out))
                emitted_total += n_out
                if is_last and emitted_total >= V:
                    break
            yield {
                "i": i, "clip_idx": clip_idx,
                "rel": clip_idx - window_range[0], "offset": offset,
                "new_window": new_window, "emits": emits, "is_last": is_last,
            }
            i += self.stride

    def _dispatch(self, frames: np.ndarray, cls_emb: jnp.ndarray, divide: bool,
                  thing_mask: Optional[np.ndarray] = None,
                  next_frames: Optional[np.ndarray] = None) -> Dict:
        """Dispatch one video's full clip loop WITHOUT any device->host
        sync; returns a handle dict whose leaves are device arrays.
        ``thing_mask`` selects the VPS pixel newly-entity variant.

        ``next_frames``: optional NEXT video to pre-upload.  The
        host->device transfer is enqueued AFTER this video's compute, so
        it rides the FIFO queue alongside the ~seconds of backlog
        instead of blocking it (a transfer enqueued BEFORE the compute
        serializes the whole video behind it — the round-4 bench lost
        ~1.9 s/video exactly this way).  The uploaded device array is
        returned under ``next_frames_device``."""
        V, H, W = frames.shape[:3]
        mask_hw = (H // 4, W // 4)

        pool = mp.create_entity_memory(
            self.capacity, self.num_classes, self.cfg.decoder.hidden_dim,
            mask_hw, window=self.out_window + self.T,
            num_prompt_points=self.cc.num_dense_points,
            embd_history=8,
            prompt_history=self.T + self.stride,
        )

        # preserve the caller's dtype: uint8 frames ship 4x fewer bytes
        # over the (slow, ~21-34 MB/s here) host->device link and are
        # cast/normalized on device inside the window encode
        frames_j = jnp.asarray(frames)
        if self._enc_dev is not None:
            frames_j = jax.device_put(frames_j, self._enc_dev)
            pool = jax.device_put(pool, self._dec_dev)
            cls_emb = jax.device_put(cls_emb, self._dec_dev)
            if thing_mask is not None:
                thing_mask = np.asarray(thing_mask)

        def encode_at(start):
            idx = np.minimum(np.arange(start, start + self.window), V - 1)
            f = self._encode_window_fn(self._params_enc, frames_j[idx])
            if self._dec_dev is not None:
                f = jax.device_put(f, self._dec_dev)  # async inter-chip copy
            return f

        def next_window_start(end):
            # smallest clip start on the stride lattice needing a new window
            lo = end - self.T + 1
            return int(-(-lo // self.stride) * self.stride)

        if thing_mask is None:
            # device-resident clip schedule (rel/frame-idx/offset per clip
            # step), uploaded in ONE transfer; the loop's clip dispatches
            # then carry no per-clip host->device arrays at all (each
            # small transfer pays full wire latency on this link).
            # Derived from the same generator as the dispatch loop.
            plan = list(self._iter_clips(V))
            sched = (
                jnp.asarray(np.stack([c["rel"] for c in plan]).astype(np.int32)),
                jnp.asarray(np.stack([c["clip_idx"] for c in plan]).astype(np.int32)),
                jnp.asarray(np.asarray([c["offset"] for c in plan], np.int32)),
            )
            ci = jnp.int32(0)
            if self._dec_dev is not None:
                sched = jax.device_put(sched, self._dec_dev)
                ci = jax.device_put(ci, self._dec_dev)

        feats_window = None
        next_feats = None
        next_start = -1
        emitted: List[jnp.ndarray] = []
        emit_starts: List[int] = []
        emit_scores: List[jnp.ndarray] = []  # [E, K] snapshot per window
        emit_valids: List[jnp.ndarray] = []

        first = True
        for c in self._iter_clips(V):
            if c["new_window"] is not None:
                i0 = c["new_window"]
                feats_window = next_feats if next_start == i0 else encode_at(i0)
                next_feats, next_start = None, -1
                if self._enc_dev is not None:
                    # eagerly dispatch the NEXT window's encode: it runs
                    # on the encode chip while this window's clip
                    # decodes run on the decode chip
                    ns = next_window_start(i0 + self.window)
                    if ns < V:
                        next_feats, next_start = encode_at(ns), ns

            if thing_mask is None:
                pool, ci = self._clip_window_fn(
                    self.params, feats_window, sched, ci, pool, cls_emb,
                )
            else:
                mf_w, ms_w = feats_window
                rel = c["rel"]
                feats = (mf_w[rel], tuple(m[rel] for m in ms_w))
                pool, _ = self._clip_pixel_fn(
                    self.params, feats, pool, jnp.asarray(c["clip_idx"]),
                    jnp.int32(c["offset"]), jnp.bool_(first), cls_emb,
                    jnp.asarray(thing_mask),
                )
            first = False

            for start, n_out in c["emits"]:
                # emit + evict exactly n_out frames: the trailing T
                # overlap frames stay in the pool and keep accumulating
                # (reference drops only num_frames_window_output frames:
                # inference_video_entity.py mask_logits[:, n_out:]).
                # Windows emit fp16 quarter-res and STAY ON DEVICE until
                # the drain: fetching here would idle the chip while the
                # host writes RLEs; packing all E capacity slots here
                # cost a measured ~6 s/video of f32 resize traffic
                # (validity is only known at video end).
                masks_div, masks_raw, win_scores, win_valid, pool = \
                    self._emit_fn(pool, n_out)
                emitted.append(masks_div if divide else masks_raw)
                emit_scores.append(win_scores)
                emit_valids.append(win_valid)
                emit_starts.append(start)

            if not c["is_last"]:
                pool = self._shift_fn(pool)

        next_dev = None
        if next_frames is not None:
            # enqueued BEHIND everything above: the transfer overlaps
            # this video's queued compute on the copy engine
            put = (functools.partial(jax.device_put, device=self._enc_dev)
                   if self._enc_dev is not None else jax.device_put)
            next_dev = put(next_frames)

        return {
            "V": V, "padded_size": (H, W), "pool": pool,
            "emitted": emitted, "emit_starts": emit_starts,
            "emit_scores": emit_scores, "emit_valids": emit_valids,
            "next_frames_device": next_dev, "drained": False,
        }

    def _queue_drain(self, h: Dict, packed_sizes=None) -> None:
        """Sync on the final pool validity, then dispatch the packed
        upsample (valid rows only) and start async D2H copies.  After
        this returns, ``h['emitted']`` holds arrays whose fetch is
        device-complete (or in flight)."""
        if h["drained"]:
            return
        h["drained"] = True
        entity_rows = None
        emitted = h["emitted"]
        if packed_sizes is not None and emitted:
            # only finally-valid entity rows are upsampled+bitpacked and
            # cross the (slow) D2H link; pad the gather index to the
            # next power of two so the gather/pack programs are shared
            # across videos with similar counts WITHOUT inflating the
            # transfer (padding 1 entity to 8 rows cost a measured
            # ~1.15 s/video of dead D2H bytes on the ~16 MB/s tunnel —
            # tools/probe_pipeline_phases.py)
            valid_final = np.asarray(h["pool"].valid)
            entity_rows = np.flatnonzero(valid_final)
            if entity_rows.size:
                bucket = 1 << (int(entity_rows.size) - 1).bit_length()
                pad = min(bucket - entity_rows.size,
                          valid_final.shape[0] - entity_rows.size)
                idx = np.concatenate(
                    [entity_rows, np.repeat(entity_rows[-1:], pad)]
                ).astype(np.int32)
                idx_j = jnp.asarray(idx)
                emitted = [_pack_rows(m[idx_j], packed_sizes)
                           for m in emitted]
            else:
                ph, pw = packed_sizes[1]
                emitted = [np.zeros((0, m.shape[1], ph, (pw + 7) // 8),
                                    np.uint8) for m in emitted]
        h["emitted"] = emitted
        h["entity_rows"] = entity_rows
        for m in emitted:
            try:  # overlap the window transfers where the runtime allows
                m.copy_to_host_async()
            except Exception:
                break

    def _fetch(self, h: Dict):
        emitted = [np.asarray(m) for m in h["emitted"]]
        emit_scores = [np.asarray(s) for s in h["emit_scores"]]
        emit_valids = [np.asarray(v) for v in h["emit_valids"]]
        return (emitted, h["emit_starts"], emit_scores, emit_valids,
                h["pool"], h.get("entity_rows"))

    def _stream(self, frames: np.ndarray, cls_emb: jnp.ndarray, divide: bool,
                thing_mask: Optional[np.ndarray] = None,
                packed_sizes=None):
        """Dispatch + drain + fetch one video; returns (emitted mask
        windows, window starts, score snapshots, valid snapshots, final
        pool, entity_rows).  With ``packed_sizes`` set, windows come
        back as bit-packed output-resolution masks of only the
        finally-valid entity rows (``entity_rows`` maps rows to slots);
        otherwise fp16 quarter-res logits of every slot."""
        h = self._dispatch(frames, cls_emb, divide, thing_mask=thing_mask)
        self._queue_drain(h, packed_sizes)
        return self._fetch(h)

    # -- VIS serving API -------------------------------------------------

    def start_vis(self, frames: np.ndarray, cls_emb: jnp.ndarray,
                  image_size=None, out_size=None,
                  next_frames: Optional[np.ndarray] = None) -> Dict:
        """Dispatch one video's full VIS compute without blocking.
        Returns a handle for :meth:`finish_vis`.  ``next_frames`` (the
        NEXT video) is uploaded behind this video's compute — read the
        device array back from ``handle['next_frames_device']``.

        The serving loop that keeps the chip busy end-to-end:

            h = driver.start_vis(video0, cls_emb, next_frames=video1)
            for v_next in videos[2:] + [None]:
                h2 = driver.start_vis(h["next_frames_device"], cls_emb,
                                      next_frames=v_next)
                results = driver.finish_vis(h)   # host RLE work overlaps
                h = h2                           # ... h2's device compute
        """
        V, H, W = frames.shape[:3]
        image_size = tuple(image_size or (H, W))
        out_size = tuple(out_size or image_size)
        h = self._dispatch(frames, cls_emb, divide=True,
                           next_frames=next_frames)
        h["sizes"] = (image_size, out_size, (H, W))
        return h

    def finish_vis(self, h: Dict) -> List[Dict]:
        """Drain + assemble a :meth:`start_vis` handle into per-entity
        result dicts."""
        image_size, out_size, padded_size = h["sizes"]
        self._queue_drain(h, packed_sizes=h["sizes"])
        emitted, emit_starts, emit_scores, _, pool, entity_rows = self._fetch(h)
        return assemble_vis_results(
            emitted, emit_starts, emit_scores, np.asarray(pool.valid),
            np.asarray(pool.quality_sum), h["V"], image_size, out_size,
            padded_size, packed_width=out_size[1], entity_rows=entity_rows,
        )

    def run_vis(self, frames: np.ndarray, cls_emb: jnp.ndarray,
                image_size=None, out_size=None) -> List[Dict]:
        """frames: [V, H, W, 3] raw RGB (padded to divisibility).
        Returns per-entity dicts with per-frame RLEs + class scores
        matching the reference's results_list contract
        (inference_video_entity.py:914-961)."""
        return self.finish_vis(self.start_vis(frames, cls_emb,
                                              image_size, out_size))


    # ------------------------------------------------------------------

    def run_vss(self, frames: np.ndarray, cls_emb: jnp.ndarray,
                image_size=None, out_size=None) -> np.ndarray:
        """VSS: per-clip semantic argmax from learnable queries only —
        the reference keeps NO cross-clip state for vss (save_results_vss
        is called with the per-clip ``out_learn`` and clip stride =
        num_frames; reference: inference_video_entity.py:299,357-360,
        1096-1132).

        Exact transcription of the reference pipeline: raw mask logits
        bilinearly upsampled to the padded size and cropped, per-query
        quality = count(logits>1)/count(logits>-1) over the upsampled
        clip (utils/comm.py:86-89), sigmoid class logits scaled by
        quality, per-pixel evidence ``einsum('qc,qthw->cthw')`` over
        sigmoid masks, argmax.  The reference's final nearest resize to
        out_size commutes with sigmoid/einsum/argmax, so it runs
        host-side after the argmax (quality counts are taken before
        that nearest resize — a count-*ratio*, which nearest resizing
        rescales numerator and denominator alike).  The tail clip runs
        at its true shorter length, as the reference does
        (frame_indices = arange(i, min(i+T, V))).
        Returns per-frame class maps [V, out_h, out_w] int32."""
        V, H, W = frames.shape[:3]
        image_size = image_size or (H, W)
        out_size = out_size or image_size
        frames_j = jnp.asarray(frames)  # keep uint8 uint8: 4x cheaper H2D
        pd, dec = self._modules
        ih, iw = image_size

        @jax.jit
        def vss_clip(params, encoded, frame_indices, cls_emb):
            # frame_indices length Tc specializes the tail clip
            mask_features, ms = encoded
            out = dec.apply(
                {"params": params["decoder"]}, ms, mask_features, frame_indices[None],
                task="detection", cls_emb=cls_emb,
            )
            return vss_semantic_labels(
                out["pred_logits"][0], out["pred_masks"][0], (H, W), (ih, iw)
            )

        labels = np.zeros((V, *out_size), np.int32)
        i = 0
        while i < V:
            Tc = min(self.T, V - i)
            clip_idx = np.minimum(np.arange(i, i + self.T), V - 1)
            encoded = self._encode_window_fn(self.params, frames_j[clip_idx])
            if Tc < self.T:  # true short tail clip (reference semantics)
                mf_w, ms_w = encoded
                encoded = (mf_w[:Tc], tuple(m[:Tc] for m in ms_w))
            sem = np.asarray(
                vss_clip(self.params, encoded, jnp.asarray(clip_idx[:Tc]), cls_emb)
            )
            up = _resize_labels_nearest(sem, out_size)
            for k in range(Tc):
                labels[i + k] = up[k]
            i += self.T
        return labels

    def run_vps(self, frames: np.ndarray, cls_emb: jnp.ndarray,
                thing_class_ids, image_size=None, out_size=None):
        """VPS: entity tracking + per-window panoptic stitching — exact
        transcription of ``save_results_vps``
        (reference: inference_video_entity.py:963-1094):

        raw accumulated mask logits (no occurrence division), per-window
        score = history-mean class logits max x mask quality, 0.75
        discount for stuff entities not yet registered as things,
        per-pixel argmax over score-weighted LOGITS, bg where every
        sigmoid < 0.5, per-entity area-ratio filter
        (mask_area/original_area >= overlap_threshold for things, halved
        once the thing is already tracked), stuff merged by class with
        persistent segment-id memories.
        Returns (panoptic [V, out_h, out_w] int32 segment ids,
                 segments_info list)."""
        V, H, W = frames.shape[:3]
        image_size = image_size or (H, W)
        out_size = out_size or image_size
        thing_ids = set(int(t) for t in thing_class_ids)  # 1-based
        overlap_thr = self.cfg.inference.overlap_threshold
        K = int(cls_emb.shape[0])
        thing_mask = np.zeros((K,), bool)
        for t in thing_ids:
            if 1 <= t <= K:
                thing_mask[t - 1] = True

        emitted, emit_starts, emit_scores, emit_valids, pool, _ = self._stream(
            frames, cls_emb, divide=False, thing_mask=thing_mask
        )

        panoptic = np.zeros((V, *out_size), np.int32)
        thing_memory: Dict[int, int] = {}
        stuff_memory: Dict[int, int] = {}
        final_scores = None

        for win_masks, start, win_scores, win_valid in zip(
            emitted, emit_starts, emit_scores, emit_valids
        ):
            final_scores = win_scores
            n = min(win_masks.shape[1], V - start)
            valid_idx = np.nonzero(win_valid)[0]
            if len(valid_idx) == 0 or n <= 0:
                continue
            E = len(valid_idx)
            cls_scores = win_scores[valid_idx]  # [E, K] history mean
            cur_scores_cls = cls_scores.max(-1)
            cur_classes = cls_scores.argmax(-1) + 1  # 1-based

            def up(t):  # [E, out_h, out_w] raw accumulated logits
                return _upsample_logits(
                    win_masks[valid_idx, t], image_size, out_size, (H, W)
                )

            # pass 1: per-entity quality over the WHOLE window (:998)
            q_pos = np.zeros(E)
            q_tot = np.zeros(E)
            ups = {}
            for t in range(n):
                lg = up(t)
                ups[t] = lg if n <= 8 else None  # cache small windows
                q_pos += (lg > 1).reshape(E, -1).sum(-1)
                q_tot += (lg > -1).reshape(E, -1).sum(-1)
            qual = q_pos / np.maximum(q_tot, 1)
            scores = cur_scores_cls * qual
            for j, e in enumerate(valid_idx):
                if int(cur_classes[j]) not in thing_ids and int(e) not in thing_memory:
                    scores[j] *= 0.75  # thing priority (:1000-1001)

            # pass 2: per-pixel argmax (winning entity where its own
            # sigmoid >= 0.5) + WINDOW-level area accumulation
            mask_ids_w = np.full((n, *out_size), -1, np.int16)
            winner_on = np.zeros((n, *out_size), bool)  # winner's sig >= 0.5
            mask_area = np.zeros(E, np.int64)
            original_area = np.zeros(E, np.int64)
            painted_count = np.zeros(E, np.int64)
            for t in range(n):
                lg = ups[t] if ups.get(t) is not None else up(t)
                sig = 1.0 / (1.0 + np.exp(-lg))
                prob = scores[:, None, None] * lg
                ids_t = prob.argmax(0).astype(np.int16)
                is_bg = (sig < 0.5).sum(0) == E
                ids_t[is_bg] = -1
                mask_ids_w[t] = ids_t
                win_sig = np.take_along_axis(sig, np.maximum(ids_t, 0)[None], 0)[0]
                winner_on[t] = (ids_t >= 0) & (win_sig >= 0.5)
                for j in range(E):
                    sel = ids_t == j
                    mask_area[j] += int(sel.sum())
                    original_area[j] += int((sig[j] >= 0.5).sum())
                    painted_count[j] += int((sel & winner_on[t]).sum())

            # pass 3: register segment ids in entity order (reference
            # iterates k ascending; pixels are disjoint so paint order
            # does not matter, only id allocation order does)
            seg_table = np.zeros(E + 1, np.int32)  # index -1 -> last -> 0
            for j, e in enumerate(valid_idx):
                pred_class = int(cur_classes[j])
                isthing = pred_class in thing_ids
                if mask_area[j] == 0 or original_area[j] == 0 or painted_count[j] == 0:
                    continue
                thr = 0.5 * overlap_thr if int(e) in thing_memory else overlap_thr
                if isthing and mask_area[j] / original_area[j] < thr:
                    continue
                if not isthing:
                    if pred_class not in stuff_memory:
                        stuff_memory[pred_class] = (
                            max(list(thing_memory.values()) + list(stuff_memory.values()), default=0) + 1
                        )
                    seg_table[j] = stuff_memory[pred_class]
                else:
                    if int(e) not in thing_memory:
                        thing_memory[int(e)] = (
                            max(list(thing_memory.values()) + list(stuff_memory.values()), default=0) + 1
                        )
                    seg_table[j] = thing_memory[int(e)]

            for t in range(n):
                lab = seg_table[mask_ids_w[t]]
                panoptic[start + t] = np.where(winner_on[t], lab, 0)

        # segments_infos from the memory dicts + final class snapshot
        # (reference: vps_output_results)
        segments_info = []
        cls_final = (
            final_scores.argmax(-1) + 1 if final_scores is not None else None
        )
        for obj_id, seg_id in thing_memory.items():
            c = int(cls_final[obj_id]) if cls_final is not None else 0
            segments_info.append({"id": seg_id, "isthing": c in thing_ids, "category_id": c})
        for stuff_class, seg_id in stuff_memory.items():
            segments_info.append({"id": seg_id, "isthing": False, "category_id": int(stuff_class)})
        return panoptic, segments_info


def vss_semantic_labels(pred_logits, pred_masks, padded_hw, image_hw) -> jnp.ndarray:
    """Per-clip semantic label maps — exact transcription of
    ``save_results_vss`` (reference: inference_video_entity.py:1096-1132
    + calculate_mask_quality_scores, utils/comm.py:86-89).

    pred_logits [Q, K] raw; pred_masks [Q, Tc, h4, w4] raw logits.
    Upsample logits bilinearly to ``padded_hw``, crop to ``image_hw``;
    quality = count(>1)/count(>-1) per query over the clip; evidence =
    einsum(sigmoid(logits)*quality, sigmoid(masks)); argmax.  The
    reference's final nearest resize to out_size happens host-side (it
    commutes with everything here).  Returns [Tc, ih, iw] int32.
    """
    H, W = padded_hw
    ih, iw = image_hw
    logits = jax.nn.sigmoid(pred_logits.astype(jnp.float32))  # [Q, K]
    masks_t = pred_masks.astype(jnp.float32).transpose(1, 0, 2, 3)  # [Tc, Q, h4, w4]
    Q = logits.shape[0]

    def up_frame(mt):  # [Q, h4, w4] -> [Q, ih, iw] logits
        u = jax.image.resize(mt, (Q, H, W), method="bilinear", antialias=False)
        return u[:, :ih, :iw]

    def count_frame(carry, mt):
        u = up_frame(mt)
        pos, tot = carry
        return (pos + (u > 1).sum(axis=(1, 2)), tot + (u > -1).sum(axis=(1, 2))), None

    zeros = jnp.zeros((Q,), jnp.int32)
    (pos, tot), _ = jax.lax.scan(count_frame, (zeros, zeros), masks_t)
    quality = pos.astype(jnp.float32) / jnp.maximum(tot, 1).astype(jnp.float32)
    wlogits = logits * quality[:, None]  # [Q, K]

    def frame_label(mt):
        u = jax.nn.sigmoid(up_frame(mt))
        sem = jnp.einsum("qc,qhw->chw", wlogits, u)
        return jnp.argmax(sem, axis=0).astype(jnp.int32)

    return jax.lax.map(frame_label, masks_t)  # [Tc, ih, iw]


def _resize_labels_nearest(labels: np.ndarray, out_size) -> np.ndarray:
    """[T, h, w] int labels -> [T, out] nearest resize (reference:
    save_results_vss's final F.interpolate(..., mode='nearest'))."""
    import torch
    import torch.nn.functional as F

    m = torch.from_numpy(labels.astype(np.float32))[None]
    m = F.interpolate(m, size=out_size, mode="nearest")
    return m[0].numpy().astype(np.int32)


class VOSDriver:
    """Prompt-guided VOS/PVOS over one video (GT first-frame masks).

    Host orchestration of inference/vos.py's clip step, mirroring
    ``InferenceVideoVOS.inference_video_vos``
    (reference: inference_video_vos.py:243-284)."""

    def __init__(self, cfg: UniVSConfig, params, capacity: int, num_classes: int = 1,
                 query_mode: str = "prompt"):
        self.cfg = cfg
        self.params = params
        self.capacity = capacity
        self.query_mode = query_mode
        inf = cfg.inference
        self.T = inf.num_frames
        self.stride = inf.clip_stride
        self.window = inf.num_frames_window
        from univs_tpu.inference.entity import EntityClipConfig

        self.cc = EntityClipConfig(
            num_queries=cfg.decoder.num_queries,
            num_prev_frames_memory=cfg.prompt.num_prev_frames_memory,
            num_dense_points=cfg.prompt.num_dense_points_test,
            clip_stride=self.stride, num_frames=self.T,
            prev_visual_prompts_for_grounding=(
                inf.enabled_prev_visual_prompts_for_grounding
            ),
        )
        dtype = compute_dtype_of(cfg)
        self._backbone = build_backbone(cfg.backbone, dtype=dtype)
        self._modules = (build_pixel_decoder(cfg), build_decoder(cfg))
        self.num_classes = num_classes

        # shared jitted step functions per config (see _DRIVER_JIT_MEMO)
        memo_key = ("vos", cfg, query_mode)
        fns = _DRIVER_JIT_MEMO.get(memo_key)
        if fns is None:
            fns = _build_vos_fns(
                cfg, self._backbone, self._modules, self.cc, self.stride,
                dtype, query_mode,
            )
            _DRIVER_JIT_MEMO[memo_key] = fns
        (self._encode_window_fn, self._clip_fn, self._grounding_clip_fn,
         self._shift_fn, self._emit_fn) = fns

    def run(self, frames: np.ndarray, gt_masks_14, faf: np.ndarray,
            obj_valid: np.ndarray, cls_emb: jnp.ndarray,
            image_size=None, out_size=None) -> np.ndarray:
        """frames [V, H, W, 3]; gt_masks_14 [N, V, H/4, W/4] binary (only
        first-appearance frames need data); faf [N] first-appear frames.
        Returns per-frame label maps [V, out_h, out_w] uint8 (0=bg,
        i+1=object i)."""
        V, H, W = frames.shape[:3]
        image_size = image_size or (H, W)
        out_size = out_size or image_size
        mask_hw = (H // 4, W // 4)
        out_window = max(self.window - self.T, self.T)

        pool = mp.create_entity_memory(
            self.capacity, self.num_classes, self.cfg.decoder.hidden_dim, mask_hw,
            window=out_window + self.T,
            num_prompt_points=self.cc.num_dense_points,
            embd_history=8, prompt_history=self.T + self.stride,
        )
        frames_j = jnp.asarray(frames)  # keep uint8 uint8: 4x cheaper H2D
        faf_j = jnp.asarray(faf, jnp.int32)
        ov_j = jnp.asarray(obj_valid)

        feats_window, window_range = None, (0, 0)
        emitted, emit_starts, emitted_total = [], [], 0
        i, is_last = 0, False
        while i < V and not is_last:
            is_last = i + self.T >= V
            clip_idx = np.minimum(np.arange(i, i + self.T), V - 1)
            if i + self.T > window_range[1]:
                idx = np.minimum(np.arange(i, i + self.window), V - 1)
                feats_window = self._encode_window_fn(self.params, frames_j[idx])
                window_range = (i, i + self.window)
            rel = clip_idx - window_range[0]
            mf_w, ms_w = feats_window
            feats = (mf_w[rel], tuple(m[rel] for m in ms_w))
            gt_clip = jnp.asarray(gt_masks_14[:, clip_idx], jnp.float32)
            clip_offset = jnp.int32(i - emitted_total)
            pool, _ = self._clip_fn(
                self.params, feats, pool, gt_clip, faf_j, ov_j,
                jnp.asarray(clip_idx), clip_offset, cls_emb,
            )
            while (i + self.T - emitted_total) >= (out_window + self.T) or (
                is_last and emitted_total < V
            ):
                n_out = out_window if not is_last else min(V - emitted_total, out_window + self.T)
                # emit + evict exactly n_out: keep the T overlap frames
                # (windows stay on device until the end-of-video drain —
                # see EntityDriver._stream)
                masks, pool = self._emit_fn(pool, n_out)
                emitted.append(masks)
                emit_starts.append(emitted_total)
                emitted_total += n_out
                if is_last and emitted_total >= V:
                    break
            if not is_last:
                pool = self._shift_fn(pool)
            i += self.stride
        emitted = [np.asarray(m) for m in emitted]

        # assemble per-frame label maps (argmax over objects, 0 = bg)
        labels = np.zeros((V, *out_size), np.uint8)
        for win_masks, start in zip(emitted, emit_starts):
            n = win_masks.shape[1]
            for k in range(n):
                if start + k >= V:
                    break
                logit = _upsample_logits(win_masks[:, k], image_size, out_size, (H, W))
                lab = np.argmax(logit, axis=0) + 1
                lab[logit.max(0) <= 0] = 0
                labels[start + k] = lab.astype(np.uint8)
        return labels

    def run_grounding(self, frames: np.ndarray, text_embs, text_valid,
                      cls_emb: jnp.ndarray, n_expressions: Optional[int] = None,
                      image_size=None, out_size=None) -> np.ndarray:
        """RefVOS: expressions as prompts, no GT injection
        (reference: inference_video_vos grounding path + save_rvos_results).
        text_embs: [1, Qp, 1+77, Dt] padded to the driver capacity;
        returns per-expression binary masks [n_expressions, V, out_h, out_w]."""
        V, H, W = frames.shape[:3]
        image_size = image_size or (H, W)
        out_size = out_size or image_size
        mask_hw = (H // 4, W // 4)
        out_window = max(self.window - self.T, self.T)
        assert int(text_embs.shape[1]) == self.capacity, (
            "pad text prompts to the driver capacity", text_embs.shape, self.capacity)
        N = n_expressions or self.capacity

        pool = mp.create_entity_memory(
            self.capacity, self.num_classes, self.cfg.decoder.hidden_dim, mask_hw,
            window=out_window + self.T,
            num_prompt_points=self.cc.num_dense_points,
            embd_history=8, prompt_history=self.T + self.stride,
        )
        # all expressions "appear" at frame 0
        pool = pool.replace(
            valid=jnp.arange(self.capacity) < N,
            first_appear=jnp.where(jnp.arange(self.capacity) < N, 0, -1),
        )
        frames_j = jnp.asarray(frames)  # keep uint8 uint8: 4x cheaper H2D
        feats_window, window_range = None, (0, 0)
        emitted, emit_starts, emitted_total = [], [], 0
        i, is_last = 0, False
        while i < V and not is_last:
            is_last = i + self.T >= V
            clip_idx = np.minimum(np.arange(i, i + self.T), V - 1)
            if i + self.T > window_range[1]:
                idx = np.minimum(np.arange(i, i + self.window), V - 1)
                feats_window = self._encode_window_fn(self.params, frames_j[idx])
                window_range = (i, i + self.window)
            rel = clip_idx - window_range[0]
            mf_w, ms_w = feats_window
            feats = (mf_w[rel], tuple(m[rel] for m in ms_w))
            pool, _ = self._grounding_clip_fn(
                self.params, feats, pool, jnp.asarray(clip_idx),
                jnp.int32(i - emitted_total), cls_emb, text_embs, text_valid,
            )
            while (i + self.T - emitted_total) >= (out_window + self.T) or (
                is_last and emitted_total < V
            ):
                n_out = out_window if not is_last else min(V - emitted_total, out_window + self.T)
                # emit + evict exactly n_out: keep the T overlap frames
                masks, pool = self._emit_fn(pool, n_out)
                emitted.append(masks)
                emit_starts.append(emitted_total)
                emitted_total += n_out
                if is_last and emitted_total >= V:
                    break
            if not is_last:
                pool = self._shift_fn(pool)
            i += self.stride
        emitted = [np.asarray(m) for m in emitted]

        out = np.zeros((N, V, *out_size), np.uint8)
        for win_masks, start in zip(emitted, emit_starts):
            for k in range(win_masks.shape[1]):
                if start + k >= V:
                    break
                logit = _upsample_logits(win_masks[:N, k], image_size, out_size, (H, W))
                out[:, start + k] = (logit > 0).astype(np.uint8)
        return out


def _upsample_logits(mask_logits: np.ndarray, image_size, out_size, padded_size) -> np.ndarray:
    import torch
    import torch.nn.functional as F

    m = torch.from_numpy(mask_logits.astype(np.float32))[None]
    m = F.interpolate(m, size=padded_size, mode="bilinear", align_corners=False)
    m = m[:, :, : image_size[0], : image_size[1]]
    m = F.interpolate(m, size=out_size, mode="bilinear", align_corners=False)
    return m[0].numpy()


def _upsample_and_threshold(mask_logits: np.ndarray, image_size, out_size, padded_size) -> np.ndarray:
    """[n, H4, W4] logits -> [n, out_h, out_w] uint8 via bilinear,
    cropping padded regions first (reference: save_results_vis:932-939)."""
    import torch
    import torch.nn.functional as F

    m = torch.from_numpy(mask_logits.astype(np.float32))[None]
    m = F.interpolate(m, size=padded_size, mode="bilinear", align_corners=False)
    m = m[:, :, : image_size[0], : image_size[1]]
    m = F.interpolate(m, size=out_size, mode="bilinear", align_corners=False)
    return (m[0] > 0).numpy().astype(np.uint8)


def assemble_vis_results(emitted, emit_starts, emit_scores, valid, quality_sum,
                         V, image_size, out_size, padded_size,
                         packed_width: Optional[int] = None,
                         entity_rows=None) -> List[Dict]:
    """Per-entity result dicts from emitted mask windows (the host half
    of ``save_results_vis``, inference_video_entity.py:914-961).  Shared
    by the single-video driver and the batched server.

    Two window layouts: fp16 quarter-res logit windows [E, n, H4, W4]
    (upsampled + thresholded here, on host), or — when ``packed_width``
    is set — bit-packed binary masks [R, n, out_h, ceil(out_w/8)]
    already at output resolution (the upsample law ran on device);
    ``entity_rows`` then maps window rows R to entity slots."""
    capacity = valid.shape[0]
    row_of = {int(e): r for r, e in enumerate(entity_rows)} \
        if entity_rows is not None else None
    # reference: res['mask_quality_score'] = q_i / (int(q.max()) + 1)
    # at the last window (inference_video_entity.py:958)
    quality = quality_sum / (int(quality_sum.max()) + 1)
    results = []
    for e in range(capacity):
        if not valid[e]:
            continue
        segs = [None] * V
        for win_masks, start in zip(emitted, emit_starts):
            if packed_width is not None:
                m = win_masks[e if row_of is None else row_of[e]]
                up = np.unpackbits(m, axis=-1)[..., :packed_width]
            else:
                m = win_masks[e]  # [n, H4, W4] fp16 logits
                up = _upsample_and_threshold(m, image_size, out_size,
                                             padded_size)
            for k in range(up.shape[0]):
                if start + k < V:
                    segs[start + k] = rle.encode(up[k])
        blank = rle.encode(np.zeros(out_size, np.uint8))
        segs = [s if s is not None else blank for s in segs]
        score_windows = np.stack([s[e] for s in emit_scores])  # [W, K]
        results.append({
            "obj_id": e,
            "score_windows": score_windows,
            "score": combine_window_scores(score_windows.copy()),
            "mask_quality_score": float(quality[e]),
            "segmentations": segs,
        })
    return results


def temporal_consistency_weighting(scores: np.ndarray) -> np.ndarray:
    """In-place per-window score weighting — exact transcription of
    ``calculate_mask_temporal_consistency_scores``
    (reference: inference/comm.py:197-207).

    scores: [W, K]; window t is weighted by the fraction of nonblank
    windows in [max(0, t-1), min(W, t+1)) times its own nonblank bit.
    """
    nonblank = scores.sum(-1) > 0
    W = len(nonblank)
    for t in range(W):
        s_t = max(0, t - 1)
        e_t = min(W, t + 1)
        w = float(nonblank[t]) * float(nonblank[s_t:e_t].sum()) / max(e_t - s_t, 1)
        scores[t] = scores[t] * w
    return scores


def combine_window_scores(score_windows: np.ndarray) -> np.ndarray:
    """Per-window [W, K] scores -> final per-class [K] scores
    (reference: inference/comm.py:166-167): temporal-consistency
    weighting, then mean over windows still nonblank after weighting.
    Mutates score_windows (pass a copy if it must survive)."""
    scores = temporal_consistency_weighting(score_windows)
    denom = max(int((scores.sum(-1) > 0).sum()), 1)
    return scores.sum(0) / denom


def vis_results_to_ytvis_json(
    video_id, video_len: int, height: int, width: int,
    results: List[Dict], apply_cls_thresh: float = 0.05, topk_per_video: int = 25,
) -> List[Dict]:
    """Per-entity windows -> YTVIS-format per-(entity, class) records —
    exact transcription of ``vis_clip_instances_to_coco_json_video``
    (reference: inference/comm.py:97-195): per-window score stacking,
    temporal-consistency weighting (comm.py:197-207), accumulated mask
    quality (or nonblank-length fallback), 0.1*thresh class filter, and
    the 1.5x-above-thresh topk cut."""
    out = []
    scores_all = []
    num_above = 0
    for res in results:
        if "score_windows" in res:
            scores = combine_window_scores(
                np.asarray(res["score_windows"], np.float32).copy()
            )
        else:
            scores = np.asarray(res["score"], np.float32)  # [K]
        if "mask_quality_score" in res:
            quality = float(res["mask_quality_score"])
        else:
            # reference fallback counts nonblank WINDOWS over video_len
            # frames (comm.py:162-164 — a windows/frames quirk, kept)
            if "score_windows" in res:
                raw = np.asarray(res["score_windows"], np.float32)
            else:
                raw = np.asarray(res["score"], np.float32)[None]
            nonblank = int((raw.sum(-1) > 0).sum())
            quality = max(float(nonblank) / max(video_len, 1), 0.1)
        for c in range(scores.shape[0]):
            if scores[c] < 0.1 * apply_cls_thresh:
                continue
            s = float(scores[c]) * quality
            out.append({
                "video_id": video_id,
                "score": s,
                "category_id": int(c),
                "segmentations": res["segmentations"],
                "height": height,
                "width": width,
            })
            scores_all.append(s)
            if scores[c] > apply_cls_thresh:
                num_above += 1
    if scores_all:
        scores_all.sort(reverse=True)
        k = max(int(num_above * 1.5), topk_per_video)
        thr = scores_all[min(k, len(scores_all) - 1)]
        out = [r for r in out if r["score"] >= thr]
    return out
