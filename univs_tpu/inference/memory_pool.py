"""Fixed-capacity entity memory pool for clip-streaming inference.

The reference carries cross-clip state in mutable ``targets`` dicts
whose tensors GROW every clip (masks/boxes/embds/logits appended per
clip, evicted per output window — inference_video_entity.py:878-912,
:394-397; prompt tensors grow by clip_stride —
prompt_encoder.py:1059-1071).  That is unusable under jit, so here the
same state is one fixed-capacity pytree:

- E entity slots with a ``valid`` mask (admission fills free slots);
- per-frame histories are RING buffers shifted left by ``stride`` each
  clip instead of concat-and-slice;
- the per-clip class logits "history mean" (reference pads a copy of
  the last logits each clip then averages over all —
  pad_zero_annotations_for_next_clip:898, save_results_vis:924) is kept
  exactly as a running (sum, count) pair plus the last value;
- mask-logit accumulation happens at the model's 1/4 output resolution
  instead of the padded input resolution (reference interpolates to
  interim_size before accumulating — :450-452); accumulation and
  upsampling are linear so emission upsamples once, cutting the pool's
  HBM footprint ~16x.

All ops are pure jittable functions (pool, inputs) -> pool.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from univs_tpu.ops import mask_ops


@struct.dataclass
class EntityMemory:
    """State for up to E entities over a video.

    Shapes: E slots, F_e embedding-history frames, W mask-window frames
    (= num_frames_window_output + clip length), R prompt points,
    F_p prompt-history frames, K classes, C hidden, (H4, W4) mask res.
    """

    valid: jnp.ndarray  # [E] bool — slot holds an entity
    first_appear: jnp.ndarray  # [E] int32 absolute frame idx (-1 unset)
    # class scores: running mean over clips + last per-clip value
    logits_sum: jnp.ndarray  # [E, K]
    logits_count: jnp.ndarray  # [E]
    logits_last: jnp.ndarray  # [E, K]
    # query-embedding history (for consistency/matching), ring over clips
    embds: jnp.ndarray  # [E, F_e, C] (zero = blank)
    # mask window (1/4 res): accumulated logits + occurrence counts
    mask_logits: jnp.ndarray  # [E, W, H4, W4]
    occurrence: jnp.ndarray  # [E, W]
    # NOTE: the reference also keeps per-frame boxes in its annotations
    # (write_newly_entities_into_annotations_per_clip) — they exist only
    # to serve box-TYPE prompts, which the entity path never issues (the
    # pool re-encode is mask-prompt, prompt_encoder.py:846 default).
    # The rebuild dropped the field: maintaining it cost a per-clip
    # masks_to_boxes over the accumulated [E, T, H4, W4] window with no
    # reader anywhere (measured ~1.5 ms/clip of dead reductions).
    quality_sum: jnp.ndarray  # [E]
    # prompt memory pool (ProCA kv source)
    prompt_feats: jnp.ndarray  # [E, R, F_p, C]
    prompt_pe: jnp.ndarray  # [E, R, F_p, C]
    prompt_valid: jnp.ndarray  # [E, R, F_p] bool
    first_feats: jnp.ndarray  # [E, R, C] first-appearance prompt set
    first_pe: jnp.ndarray  # [E, R, C]
    first_valid: jnp.ndarray  # [E, R] bool
    # window bookkeeping
    window_start: jnp.ndarray  # scalar int32 — absolute frame of mask_logits[:, 0]

    @property
    def capacity(self) -> int:
        return self.valid.shape[0]


def create_entity_memory(
    capacity: int,
    num_classes: int,
    hidden_dim: int,
    mask_hw: Tuple[int, int],
    window: int,
    num_prompt_points: int,
    embd_history: int = 8,
    prompt_history: int = 6,
    dtype=jnp.float32,
) -> EntityMemory:
    E, K, C = capacity, num_classes, hidden_dim
    H4, W4 = mask_hw
    R, Fp, Fe, W = num_prompt_points, prompt_history, embd_history, window
    z = lambda *s: jnp.zeros(s, dtype)
    return EntityMemory(
        valid=jnp.zeros((E,), bool),
        first_appear=jnp.full((E,), -1, jnp.int32),
        logits_sum=z(E, K),
        logits_count=z(E),
        logits_last=z(E, K),
        embds=z(E, Fe, C),
        mask_logits=z(E, W, H4, W4),
        occurrence=z(E, W),
        quality_sum=z(E),
        prompt_feats=z(E, R, Fp, C),
        prompt_pe=z(E, R, Fp, C),
        prompt_valid=jnp.zeros((E, R, Fp), bool),
        first_feats=z(E, R, C),
        first_pe=z(E, R, C),
        first_valid=jnp.zeros((E, R), bool),
        window_start=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# ring-buffer shifts
# ---------------------------------------------------------------------------


def shift_clip(pool: EntityMemory, stride: int) -> EntityMemory:
    """Advance per-clip histories by one clip (stride frames).

    Equivalent to the reference's zero/copy padding for the next clip
    (pad_zero_annotations_for_next_clip:878-912, zero_pad_prompt:1059).
    embds: new slot initialised with mean of last 3 entries (reference
    :895); prompt frames: zero/invalid; logits: running pair gets the
    last value re-added (reference duplicates the last logits row).
    """
    # embds ring: shift left by 1 clip slot
    emb_pad = pool.embds[:, -3:].mean(axis=1, keepdims=True)
    embds = jnp.concatenate([pool.embds[:, 1:], emb_pad], axis=1)
    # logits history mean: duplicated last row (only for existing entities)
    cnt = pool.logits_count + pool.valid
    lsum = pool.logits_sum + pool.logits_last * pool.valid[:, None]
    # prompt ring: shift by stride frames
    def pshift(x):
        pad = jnp.zeros_like(x[:, :, :stride])
        return jnp.concatenate([x[:, :, stride:], pad], axis=2)

    return pool.replace(
        embds=jnp.where(pool.valid[:, None, None], embds, pool.embds),
        logits_sum=lsum,
        logits_count=cnt,
        prompt_feats=pshift(pool.prompt_feats),
        prompt_pe=pshift(pool.prompt_pe),
        prompt_valid=pshift(pool.prompt_valid.astype(jnp.float32)) > 0,
    )


def evict_window(pool: EntityMemory, out_frames: int) -> EntityMemory:
    """Drop the first ``out_frames`` frames of the mask window after
    emission (reference: inference_video_entity.py:394-397)."""
    z_m = jnp.zeros_like(pool.mask_logits[:, :out_frames])
    z_o = jnp.zeros_like(pool.occurrence[:, :out_frames])
    return pool.replace(
        mask_logits=jnp.concatenate([pool.mask_logits[:, out_frames:], z_m], axis=1),
        occurrence=jnp.concatenate([pool.occurrence[:, out_frames:], z_o], axis=1),
        window_start=pool.window_start + out_frames,
    )


# ---------------------------------------------------------------------------
# prompt kv read (decoder_univs.py:795-822)
# ---------------------------------------------------------------------------


def read_prompt_kv(pool: EntityMemory, num_prev: int):
    """Memory-pool read: first-appearance prompt set + last ``num_prev``
    frames' prompt sets -> ProCA kv [E, (1+num_prev)*R, C] (+pe, +valid).
    """
    E, R, Fp, C = pool.prompt_feats.shape
    num_prev = min(num_prev, Fp)
    prev_f = pool.prompt_feats[:, :, -num_prev:]  # [E, R, P, C]
    prev_p = pool.prompt_pe[:, :, -num_prev:]
    prev_v = pool.prompt_valid[:, :, -num_prev:]
    # frame-major flatten (reference transposes (R, T)->(T, R) then flattens)
    prev_f = prev_f.transpose(0, 2, 1, 3).reshape(E, num_prev * R, C)
    prev_p = prev_p.transpose(0, 2, 1, 3).reshape(E, num_prev * R, C)
    prev_v = prev_v.transpose(0, 2, 1).reshape(E, num_prev * R)
    kv = jnp.concatenate([pool.first_feats, prev_f], axis=1)
    kv_pe = jnp.concatenate([pool.first_pe, prev_p], axis=1)
    kv_valid = jnp.concatenate([pool.first_valid, prev_v], axis=1)
    kv_valid = kv_valid & pool.valid[:, None]
    return kv, kv_pe, kv_valid


def read_clip_queries(pool: EntityMemory, t: int):
    """Per-frame prompt-query initialisations from the ring's last ``t``
    slots (this clip's frames).

    The reference derives query embeds from the PRE-extraction dense
    sets — the prompt memory sliced to the current clip's frames
    (process_per_video_inference returns ``prompt_*[-num_frames:]``,
    prompt_encoder.py:952-954) — as non-blank means over the R entries
    (decoder_univs.py:641-645).  Frames whose slot was never written
    (the newest stride frames before any commit) yield zero queries.

    Returns (queries [E, t, C], query_pos [E, t, C]).
    """
    f = pool.prompt_feats[:, :, -t:]  # [E, R, t, C]
    p = pool.prompt_pe[:, :, -t:]
    v = pool.prompt_valid[:, :, -t:]  # [E, R, t]
    denom = jnp.maximum(v.sum(1), 1)[..., None].astype(f.dtype)  # [E, t, 1]
    m = v[:, :, :, None].astype(f.dtype)
    return (f * m).sum(1) / denom, (p * m).sum(1) / denom


def write_prompt_frame(
    pool: EntityMemory,
    frame_slot: jnp.ndarray,  # int — index into the F_p prompt ring
    feats: jnp.ndarray,  # [E, R, C]
    pe: jnp.ndarray,  # [E, R, C]
    valid: jnp.ndarray,  # [E, R] bool
    entity_mask: jnp.ndarray,  # [E] bool — which entities to update
) -> EntityMemory:
    """Write one frame's re-encoded prompts into the ring
    (reference: process_per_video_inference:936-946)."""
    upd = entity_mask[:, None] & valid
    pf = pool.prompt_feats.at[:, :, frame_slot].set(
        jnp.where(upd[..., None], feats, pool.prompt_feats[:, :, frame_slot])
    )
    pp = pool.prompt_pe.at[:, :, frame_slot].set(
        jnp.where(upd[..., None], pe, pool.prompt_pe[:, :, frame_slot])
    )
    pv = pool.prompt_valid.at[:, :, frame_slot].set(
        jnp.where(entity_mask[:, None], valid, pool.prompt_valid[:, :, frame_slot])
    )
    # first-appearance set: fill once per entity
    need_first = entity_mask & ~pool.first_valid.any(-1)
    ff = jnp.where(need_first[:, None, None], feats, pool.first_feats)
    fp = jnp.where(need_first[:, None, None], pe, pool.first_pe)
    fv = jnp.where(need_first[:, None], valid, pool.first_valid)
    return pool.replace(
        prompt_feats=pf, prompt_pe=pp, prompt_valid=pv,
        first_feats=ff, first_pe=fp, first_valid=fv,
    )


# ---------------------------------------------------------------------------
# tracked-entity update (write_prompt_predictions_into_annotations_per_clip)
# ---------------------------------------------------------------------------


def accumulate_clip_masks(
    pool: EntityMemory,
    clip_offset: jnp.ndarray,  # int — first clip frame relative to window_start
    masks: jnp.ndarray,  # [E, T, H4, W4] predicted mask logits
    embds_mean: jnp.ndarray,  # [E, C] clip-mean embeddings
    update: jnp.ndarray,  # [E] bool — gated entities
    quality: jnp.ndarray,  # [E]
) -> EntityMemory:
    """Additive mask-logit accumulation + occurrence counting + embd
    averaging for gated entities (reference:
    inference_video_entity.py:493-515: ``gt_mask_logits += masks``,
    ``occurrence += nonblank``, ``embds[-1] = (old + new)/(nonblank+1)``).
    """
    E, T, H4, W4 = masks.shape
    W = pool.mask_logits.shape[1]
    nonblank = (masks > 0).any(axis=(-2, -1)).astype(pool.occurrence.dtype)  # [E, T]

    # dynamic-slice window update
    win = jax.lax.dynamic_slice_in_dim(pool.mask_logits, clip_offset, T, axis=1)
    win = win + jnp.where(update[:, None, None, None], masks.astype(win.dtype), 0)
    ml = jax.lax.dynamic_update_slice_in_dim(pool.mask_logits, win, clip_offset, axis=1)

    occ = jax.lax.dynamic_slice_in_dim(pool.occurrence, clip_offset, T, axis=1)
    occ = occ + jnp.where(update[:, None], nonblank, 0)
    oc = jax.lax.dynamic_update_slice_in_dim(pool.occurrence, occ, clip_offset, axis=1)

    # embds: (old + new) / (nonblank_old + 1) at the last ring slot
    old = pool.embds[:, -1]
    nonblank_e = (old != 0).any(-1)
    new_e = (old + embds_mean) / (nonblank_e[:, None].astype(old.dtype) + 1.0)
    embds = pool.embds.at[:, -1].set(jnp.where(update[:, None], new_e, old))

    return pool.replace(
        mask_logits=ml, occurrence=oc, embds=embds,
        quality_sum=pool.quality_sum + jnp.where(update, quality, 0.0),
    )


def consistency_gate(
    pool: EntityMemory,
    pred_embds: jnp.ndarray,  # [E, T, C] prompt-query embeddings this clip
    num_prev: int,
    threshold: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine-similarity consistency vs the embd history
    (reference: comm.py:64-95 with temporal weighting comm.py:10-23).
    Returns (is_consistent [E], similarity [E])."""
    prev = pool.embds[:, -num_prev:]
    F = prev.shape[1]
    prev_n = prev / jnp.maximum(jnp.linalg.norm(prev, axis=-1, keepdims=True), 1e-3)
    cur_n = pred_embds / jnp.maximum(
        jnp.linalg.norm(pred_embds, axis=-1, keepdims=True), 1e-3
    )
    sim = jnp.einsum("nvc,ntc->nv", prev_n, cur_n.astype(prev_n.dtype)) / pred_embds.shape[1]
    nonblank = (prev != 0).any(-1).astype(jnp.float32)  # [E, F]
    w = jnp.exp(jnp.arange(1, F + 1, dtype=jnp.float32) / F * 5.0) * nonblank
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-3)
    sim = (sim * w).sum(-1)
    return (sim > threshold) & pool.valid, sim


# ---------------------------------------------------------------------------
# new-entity matching + admission
# ---------------------------------------------------------------------------


def match_candidates_to_memory(
    pool: EntityMemory,
    cand_embds: jnp.ndarray,  # [Qc, T, C]
    cand_valid: jnp.ndarray,  # [Qc]
    threshold: float,
    use_norm: bool = False,
    embd_frames: int = 3,
):
    """Hungarian match of candidate (learnable-query) entities to pool
    entities by embedding similarity.

    Default (``use_norm=False``) is the reference's QUASI-TRACK law —
    ``use_quasi_track = True`` is hardcoded
    (inference_video_entity.py:157, :593-598/:711-716): raw dot products
    per (prev-frame, cur-frame) pair, bisoftmax over entities and
    candidates averaged over pairs, sub-threshold similarities zeroed,
    then Hungarian on (1 - sim).  ``use_norm=True`` is the
    temporally-weighted cosine alternative (comm.py:35-46, the dead
    ``else`` branch).

    Returns (cand2slot [Qc] int — matched pool slot or -1,
             matched_sim [Qc]).
    """
    from univs_tpu.losses.hungarian import hungarian

    E = pool.capacity
    tgt = pool.embds[:, -embd_frames:]  # [E, F, C]
    if use_norm:
        t_n = tgt / jnp.maximum(jnp.linalg.norm(tgt, axis=-1, keepdims=True), 1e-3)
        c_n = cand_embds / jnp.maximum(
            jnp.linalg.norm(cand_embds, axis=-1, keepdims=True), 1e-3
        )
        sim = jnp.einsum("nvc,mtc->nmv", t_n, c_n.astype(t_n.dtype)) / cand_embds.shape[1]
        nonblank = (tgt != 0).any(-1).astype(jnp.float32)
        F = tgt.shape[1]
        w = jnp.exp(jnp.arange(1, F + 1, dtype=jnp.float32) / F * 5.0)[None] * nonblank
        w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-3)
        sim = (sim * w[:, None]).sum(-1)  # [E, Qc]
        sim = jnp.where(pool.valid[:, None] & cand_valid[None, :], sim, -1.0)
    else:
        pair = jnp.einsum("nvc,mtc->nmvt", tgt, cand_embds)
        pair = pair.reshape(E, cand_embds.shape[0], -1)  # [E, Qc, F*T]
        s_rows = jnp.where(pool.valid[:, None, None], pair, -1e9)
        s_cols = jnp.where(cand_valid[None, :, None], pair, -1e9)
        sim = 0.5 * (
            jax.nn.softmax(s_cols, axis=1) + jax.nn.softmax(s_rows, axis=0)
        ).mean(-1)
        sim = jnp.where(sim < threshold, 0.0, sim)
        sim = jnp.where(pool.valid[:, None] & cand_valid[None, :], sim, -1.0)
    Qc = cand_embds.shape[0]
    if E <= Qc:
        slot2cand = hungarian(1.0 - sim, row_valid=pool.valid)  # [E]
        cand2slot = jnp.full((Qc,), -1, jnp.int32)
        gate = slot2cand >= 0
        cand2slot = cand2slot.at[jnp.where(gate, slot2cand, Qc)].set(
            jnp.arange(E, dtype=jnp.int32), mode="drop"
        )
    else:
        cand2slot = hungarian(1.0 - sim.T, row_valid=cand_valid)  # [Qc]
        # hungarian assigns every valid candidate a slot; mask empty slots
        slot_ok = pool.valid[jnp.clip(cand2slot, 0)] & (cand2slot >= 0)
        cand2slot = jnp.where(slot_ok, cand2slot, -1)
    matched_sim = jnp.where(
        cand2slot >= 0, sim[jnp.clip(cand2slot, 0), jnp.arange(Qc)], -1.0
    )
    return cand2slot, matched_sim


def admit_entities(
    pool: EntityMemory,
    clip_offset: jnp.ndarray,  # int frame offset in window
    frame_idx: jnp.ndarray,  # absolute first frame of clip
    masks: jnp.ndarray,  # [Qc, T, H4, W4] candidate mask logits
    logits: jnp.ndarray,  # [Qc, K]
    embds_mean: jnp.ndarray,  # [Qc, C]
    quality: jnp.ndarray,  # [Qc]
    is_new: jnp.ndarray,  # [Qc] bool — admit these
) -> EntityMemory:
    """Scatter new entities into free pool slots
    (reference: write_newly_entities_into_annotations_per_clip:767-876).
    Drops candidates if no free slots remain (silent cap at E)."""
    E = pool.capacity
    Qc, T = masks.shape[:2]
    free_slots = ~pool.valid  # [E]
    # rank of each free slot / each new candidate
    slot_rank = jnp.cumsum(free_slots) - 1  # rank among free slots
    cand_rank = jnp.cumsum(is_new) - 1  # rank among admitted candidates
    # slot_for_cand[q] = index of (cand_rank[q])-th free slot
    # build: free slot indices sorted
    slot_idx = jnp.where(free_slots, jnp.arange(E), E)
    slot_order = jnp.sort(slot_idx)  # free slots first
    n_free = free_slots.sum()
    take = jnp.where((cand_rank < n_free) & is_new, cand_rank, E - 1)
    slot_for_cand = slot_order[jnp.clip(take, 0, E - 1)]
    admit = is_new & (cand_rank < n_free) & (slot_for_cand < E)

    def scatter(dst, src, extra_dims):
        idx = jnp.where(admit, slot_for_cand, E)  # E = out of range -> dropped
        return dst.at[idx.clip(0, E - 1)].set(
            jnp.where(admit.reshape((-1,) + (1,) * extra_dims), src, dst[idx.clip(0, E - 1)])
        )

    # Window-sliced ring scatter.  Admitted slots were free, and free
    # slots' ring rows are all-zero by invariant (rows start zero, every
    # ring write is gated to valid/admitted slots, ``valid`` is never
    # cleared, and evict_window zero-fills) — so scattering only the
    # clip's T-frame window slice equals the reference's full-row write
    # (zeros elsewhere) at 1/W the traffic.  The full-row variant
    # materialized a [Qc, W, H4, W4] zero tensor (~160 MB at production
    # geometry) and scattered full [W, H4, W4] rows (~3 ms/clip).
    win_m = jax.lax.dynamic_slice_in_dim(pool.mask_logits, clip_offset, T, axis=1)
    win_o = jax.lax.dynamic_slice_in_dim(pool.occurrence, clip_offset, T, axis=1)
    win_m = _scatter_where(win_m, slot_for_cand, masks.astype(win_m.dtype), admit)
    win_o = _scatter_where(win_o, slot_for_cand, jnp.ones((Qc, T), pool.occurrence.dtype), admit)
    mask_logits = jax.lax.dynamic_update_slice_in_dim(pool.mask_logits, win_m, clip_offset, axis=1)
    occurrence = jax.lax.dynamic_update_slice_in_dim(pool.occurrence, win_o, clip_offset, axis=1)

    # embds ring: only the last history slot gets the candidate mean;
    # earlier slots of a free slot are already zero (same invariant)
    embds = pool.embds.at[:, -1].set(
        _scatter_where(pool.embds[:, -1], slot_for_cand, embds_mean, admit)
    )

    return pool.replace(
        valid=_scatter_bool(pool.valid, slot_for_cand, admit),
        first_appear=_scatter_where(pool.first_appear, slot_for_cand, jnp.full((Qc,), frame_idx, jnp.int32), admit),
        logits_sum=_scatter_where(pool.logits_sum, slot_for_cand, logits, admit),
        logits_count=_scatter_where(pool.logits_count, slot_for_cand, jnp.ones((Qc,), pool.logits_count.dtype), admit),
        logits_last=_scatter_where(pool.logits_last, slot_for_cand, logits, admit),
        embds=embds,
        mask_logits=mask_logits,
        occurrence=occurrence,
        quality_sum=_scatter_where(pool.quality_sum, slot_for_cand, quality, admit),
    )


def _scatter_where(dst: jnp.ndarray, idx: jnp.ndarray, src: jnp.ndarray, gate: jnp.ndarray) -> jnp.ndarray:
    """dst[idx[q]] = src[q] where gate[q]; out-of-gate writes dropped."""
    E = dst.shape[0]
    safe_idx = jnp.where(gate, idx, E)  # E drops via mode="drop"
    return dst.at[safe_idx].set(src, mode="drop")


def _scatter_bool(dst: jnp.ndarray, idx: jnp.ndarray, gate: jnp.ndarray) -> jnp.ndarray:
    E = dst.shape[0]
    safe_idx = jnp.where(gate, idx, E)
    return dst.at[safe_idx].set(True, mode="drop")
