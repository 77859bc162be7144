"""CLIP tokenizer + text tower tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univs_tpu.models.tokenizer import (
    CONTEXT_LENGTH,
    PROMPT_TEMPLATES,
    ClipTokenizer,
    pre_tokenize,
)
from univs_tpu.models.clip_text import ClipTextEncoder

VOCAB_AVAILABLE = any(
    os.path.exists(p)
    for p in ("/root/reference/univs/modeling/language/bpe_simple_vocab_16e6.txt.gz",)
)


@pytest.mark.skipif(not VOCAB_AVAILABLE, reason="BPE vocab not available")
def test_tokenizer_known_encodings():
    tok = ClipTokenizer()
    # canonical CLIP encodings (public test vectors)
    assert tok.sot == 49406 and tok.eot == 49407
    ids = tok.encode("a photo of a cat")
    # "a photo of a cat" tokenizes to these ids in every public CLIP impl
    assert ids == [320, 1125, 539, 320, 2368], ids
    arr = tok(["a photo of a cat"])
    assert arr.shape == (1, CONTEXT_LENGTH)
    assert arr[0, 0] == 49406 and arr[0, 6] == 49407
    assert arr[0, 7:].sum() == 0


@pytest.mark.skipif(not VOCAB_AVAILABLE, reason="BPE vocab not available")
def test_pre_tokenize_templates():
    out = pre_tokenize(["dog"])
    assert out.shape == (1, 81, CONTEXT_LENGTH)
    assert len(PROMPT_TEMPLATES) == 81
    # template 0 is the bare '{}.'
    tok = ClipTokenizer()
    np.testing.assert_array_equal(out[0, 0], tok(["dog."])[0])


def test_text_encoder_shapes_and_eot():
    enc = ClipTextEncoder(embed_dim=32, width=32, heads=4, num_layers=2, vocab_size=100)
    tokens = jnp.array([[99, 5, 3, 98, 0, 0], [99, 7, 98, 0, 0, 0]])  # eot=98 highest after sot? use argmax
    params = enc.init(jax.random.PRNGKey(0), tokens)
    word, eot = enc.apply(params, tokens)
    assert word.shape == (2, 6, 32)
    assert eot.shape == (2, 32)
    # eot feature = word feature at argmax(token id)
    idx0 = int(jnp.argmax(tokens[0]))
    np.testing.assert_allclose(np.asarray(eot[0]), np.asarray(word[0, idx0]), atol=1e-6)


def test_text_encoder_causality():
    enc = ClipTextEncoder(embed_dim=16, width=16, heads=2, num_layers=1, vocab_size=50)
    t1 = jnp.array([[49, 5, 3, 2, 48, 0]])
    t2 = t1.at[0, 5].set(7)  # change a token AFTER position 2
    params = enc.init(jax.random.PRNGKey(0), t1)
    w1, _ = enc.apply(params, t1)
    w2, _ = enc.apply(params, t2)
    np.testing.assert_allclose(np.asarray(w1[0, :5]), np.asarray(w2[0, :5]), atol=1e-5)
    assert not np.allclose(np.asarray(w1[0, 5]), np.asarray(w2[0, 5]))
