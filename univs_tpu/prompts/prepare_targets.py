"""Target preparation: dataset records -> decoder prompt inputs.

Rebuild of the reference's ``PrepareTargets``
(reference: univs/prepare_targets.py:46-385): category-embedding
slices + negative padding for detection, CLIP expression encoding for
grounding, minimal inference dicts.  Train-time conversion lives in
data/mapper.py + data/loader.py (fixed-capacity arrays).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from univs_tpu.data.category_info import COMBINED_DATASETS_CATEGORY_INFO, dataset_namespace
from univs_tpu.structures import TextPrompts


class PrepareTargets:
    def __init__(self, category_bank: np.ndarray, text_encoder=None):
        """category_bank: [3938, 640] frozen CLIP category embeddings;
        text_encoder: models.clip_text.TextPromptEncoder (RefVOS)."""
        self.bank = np.asarray(category_bank, np.float32)
        self.text_encoder = text_encoder

    def category_slice(self, dataset_name: str) -> np.ndarray:
        """The dataset's class-embedding bank slice
        (reference: prepare_targets.py:38, decoder_univs.py:659-668)."""
        ns = dataset_namespace(dataset_name)
        k, start = COMBINED_DATASETS_CATEGORY_INFO[ns]
        return self.bank[start : start + k]

    def detection_inputs(self, dataset_name: str) -> Tuple[TextPrompts, jnp.ndarray]:
        """Inference: all categories become prompt queries
        (decoder_univs.py:674-675)."""
        sl = jnp.asarray(self.category_slice(dataset_name))
        tp = TextPrompts(embs=sl[None, :, None, :], valid=jnp.ones((1, sl.shape[0]), bool))
        return tp, sl

    def grounding_inputs(self, expressions: Sequence[str], pad_to: Optional[int] = None) -> TextPrompts:
        """RefVOS: expressions -> [sentence; 77 words] prompt stacks
        (reference: prompt_encoder.py:28-55, prepare_targets.py:269-322)."""
        assert self.text_encoder is not None, "grounding needs the CLIP text tower"
        word, sent = self.text_encoder.encode_expressions(list(expressions))
        n = word.shape[0]
        embs = jnp.concatenate([sent[:, None], word], axis=1)  # [n, 1+77, D]
        valid = jnp.ones((n,), bool)
        if pad_to and pad_to > n:
            pad = pad_to - n
            embs = jnp.pad(embs, ((0, pad), (0, 0), (0, 0)))
            valid = jnp.pad(valid, (0, pad))
        return TextPrompts(embs=embs[None], valid=valid[None])
