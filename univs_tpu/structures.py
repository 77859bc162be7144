"""Structured (pytree) containers used across the framework.

The reference passes mutable ``targets`` dicts through every layer and
mutates them in place (prepare_targets.py, prompt_encoder.py:844-1071).
Here the same information flows through frozen, static-shaped pytrees
so the whole per-clip step jits.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class VisualPrompts:
    """Per-target visual prompt feature sets consumed by ProCA.

    Shapes (static): B videos, Qp padded prompt slots, L prompt tokens
    per target, T frames, C hidden.

    Equivalent of the reference's ``prompt_feats_dense`` /
    ``prompt_pe_dense`` (Q_p x L x NT x C) plus the derived query
    initialisations (decoder_univs.py:631-656), with explicit validity
    masks instead of zero-vector blanks.
    """

    queries: jnp.ndarray  # [B, Qp, T, C] content init (mean of valid kv)
    query_pos: jnp.ndarray  # [B, Qp, T, C]
    # kv may carry a SINGLETON frame axis (shape [B, Qp, L, 1, C]) when
    # the prompt set is shared by every clip frame (the entity/VOS
    # memory-pool read) — the decoder's ProCA then folds frames into the
    # query axis instead of materializing the T-fold broadcast.
    kv: jnp.ndarray  # [B, Qp, L, T|1, C]
    kv_pe: Optional[jnp.ndarray]  # [B, Qp, L, T|1, C] or None
    kv_valid: jnp.ndarray  # [B, Qp, L, T|1] bool
    valid: jnp.ndarray  # [B, Qp] bool — real (non-padding) targets

    @property
    def num_prompts(self) -> int:
        return self.queries.shape[1]


def make_visual_prompts(
    kv: jnp.ndarray,
    kv_pe: Optional[jnp.ndarray],
    kv_valid: jnp.ndarray,
    valid: jnp.ndarray,
    use_pe_as_query_pos: bool | jnp.ndarray = True,
    t: Optional[int] = None,
) -> VisualPrompts:
    """Derive query initialisations from kv sets.

    Mirrors the reference's non-blank means (decoder_univs.py:640-650):
    queries = mean of valid kv feats; query_pos = mean of valid kv PE
    (inference always; training coin-flips PE vs feats —
    pass the flip result via ``use_pe_as_query_pos``).

    When the kv carries a singleton frame axis (shared prompt set) the
    derived queries are broadcast to ``t`` — the decoder needs one query
    per frame even though the kv stays unbroadcast.
    """
    denom = jnp.maximum(kv_valid.sum(axis=2)[..., None], 1)  # [B, Qp, T, 1]
    m = kv_valid[..., None].astype(kv.dtype)
    feats_mean = (kv * m).sum(axis=2) / denom  # [B, Qp, T, C]
    if kv_pe is not None:
        pe_mean = (kv_pe * m).sum(axis=2) / denom
    else:
        pe_mean = feats_mean
    if isinstance(use_pe_as_query_pos, bool):
        qpos = pe_mean if use_pe_as_query_pos else feats_mean
    else:
        qpos = jnp.where(use_pe_as_query_pos, pe_mean, feats_mean)
    if t is not None and feats_mean.shape[2] == 1 and t > 1:
        B, Qp, _, C = feats_mean.shape
        feats_mean = jnp.broadcast_to(feats_mean, (B, Qp, t, C))
        qpos = jnp.broadcast_to(qpos, (B, Qp, t, C))
    return VisualPrompts(
        queries=feats_mean, query_pos=qpos, kv=kv, kv_pe=kv_pe,
        kv_valid=kv_valid, valid=valid,
    )


@struct.dataclass
class TextPrompts:
    """CLIP-text prompt inputs.

    detection: ``embs`` are per-category text embeddings (Kp padded
    categories, L=1).  grounding: ``embs`` are per-expression
    [sentence; 77 word tokens] stacks (L=78).
    Equivalent of targets' category/exp features
    (decoder_univs.py:659-744, prepare_targets.py:269-385).
    """

    embs: jnp.ndarray  # [B, Qp, L, D_text]  (L=1 detection, 1+77 grounding)
    valid: jnp.ndarray  # [B, Qp] bool
    word_valid: Optional[jnp.ndarray] = None  # [B, Qp, L] bool (grounding)


@struct.dataclass
class DecoderOutputs:
    """One prediction set (final or auxiliary)."""

    logits: jnp.ndarray  # [B, Q, K] class / expression scores
    masks: jnp.ndarray  # [B, Q, T, H, W] mask logits (1/4 res)
    embds: jnp.ndarray  # [B, Q, T, C] decoder-normed query embeddings
    embds_raw: jnp.ndarray  # [B, Q, T, C] pre-norm (for reid logits)
