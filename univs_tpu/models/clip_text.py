"""CLIP text encoder (RN50x4 geometry), flax.

Rebuild of the reference's frozen language tower
(reference: univs/modeling/language/TextEncoder.py:57-184 —
12-layer transformer, width 640, 10 heads, context 77, vocab 49408,
embed dim 640 for the RN50x4 checkpoint) plus the TextPromptEncoder
wrapper (reference: prompt_encoder.py:16-55: per expression returns
77-token word features from the bare '{}.' template and sentence (EOT)
features averaged over the 81 templates).

The tower is frozen at train/inference time in the reference; here it
is an ordinary flax module whose params are simply never put in the
optimizer (see parallel/train_state label rules) — or, preferably, the
categories/expressions are pre-embedded offline (reference does the
same for categories: datasets/concept_emb/*.pth) and this tower is only
needed for free-form RefVOS text at inference.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from univs_tpu.models.tokenizer import (
    CONTEXT_LENGTH,
    VOCAB_SIZE,
    ClipTokenizer,
    pre_tokenize,
)


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class ClipResidualBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_bias):
        # LN in fp32 (reference TextEncoder.py:8-14)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        from univs_tpu.models.transformer_layers import MultiHeadAttention

        y = MultiHeadAttention(self.width, self.heads, self.dtype, name="attn")(
            y, y, y, bias=causal_bias
        )
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        y = nn.Dense(self.width * 4, dtype=self.dtype, name="c_fc")(y)
        y = QuickGELU()(y)
        y = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(y)
        return x + y


class ClipTextEncoder(nn.Module):
    embed_dim: int = 640
    context_length: int = CONTEXT_LENGTH
    vocab_size: int = VOCAB_SIZE
    width: int = 640
    heads: int = 10
    num_layers: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """tokens [N, L] int -> (word_feats [N, L, D], eot_feats [N, D])."""
        L = tokens.shape[-1]
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02), (self.vocab_size, self.width), jnp.float32
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (self.context_length, self.width), jnp.float32
        )
        x = tok_emb[tokens].astype(self.dtype) + pos_emb[None, :L].astype(self.dtype)
        causal = jnp.where(
            jnp.triu(jnp.ones((L, L), bool), 1), jnp.float32(-1e9), 0.0
        )[None, None]
        for i in range(self.num_layers):
            x = ClipResidualBlock(self.width, self.heads, self.dtype, name=f"block_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )
        word = x @ proj.astype(x.dtype)
        eot_idx = jnp.argmax(tokens, axis=-1)
        eot = jnp.take_along_axis(word, eot_idx[:, None, None], axis=1)[:, 0]
        return word, eot


class TextPromptEncoder:
    """Host-side helper: expressions/class names -> CLIP features.

    Reference: prompt_encoder.py:16-55 (expressions) and the offline
    category embedding extraction (extract_class_embed.py).
    """

    def __init__(self, params, encoder: ClipTextEncoder | None = None, tokenizer: ClipTokenizer | None = None):
        self.encoder = encoder or ClipTextEncoder()
        self.params = params
        self.tokenizer = tokenizer or ClipTokenizer()
        self._encode = jax.jit(lambda p, t: self.encoder.apply(p, t))

    def encode_expressions(self, expressions) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (word_feats [N, 77, D] from template '{}.',
               sentence_feats [N, D] mean-EOT over 81 templates)."""
        tokens = pre_tokenize(expressions, self.tokenizer, text_type="expression")  # [N, 81, 77]
        n, m, L = tokens.shape
        word, eot = self._encode(self.params, jnp.asarray(tokens.reshape(n * m, L)))
        word = word.reshape(n, m, L, -1)
        eot = eot.reshape(n, m, -1)
        return word[:, 0], eot.mean(axis=1)

    def encode_category_names(self, names, clean: bool = True) -> jnp.ndarray:
        """-> [K, D] mean-EOT category bank (matches the offline
        concept_emb extraction protocol: clean_strings on the full
        synonym row, 81 templates, EOT mean —
        reference: tools/clip_concept_extraction/extract_concept_emb.py:53-78)."""
        from univs_tpu.models.tokenizer import clean_category_string

        names = list(names)
        if clean:
            names = [clean_category_string(n) for n in names]
        tokens = pre_tokenize(names, self.tokenizer, text_type="class_name")
        n, m, L = tokens.shape
        _, eot = self._encode(self.params, jnp.asarray(tokens.reshape(n * m, L)))
        return eot.reshape(n, m, -1).mean(axis=1)
