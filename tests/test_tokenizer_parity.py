"""Tokenizer + CLIP text tower parity vs the reference.

- Golden token-id comparison of our BPE tokenizer / template expansion
  against the reference's runtime tokenizer
  (univs/modeling/language/clip_prompt_utils.py pre_tokenize /
  pre_tokenize_expression) over real category names (ytvis19 list) and
  RefVOS-style expressions, using the reference's actual
  bpe_simple_vocab_16e6.txt.gz.
- Activation parity of ClipTextEncoder vs the reference CLIPLangEncoder
  (TextEncoder.py:87-141) with converted random-init weights.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import ref_shim
from univs_tpu.models.tokenizer import ClipTokenizer, pre_tokenize
from univs_tpu.utils.convert import convert_clip_text

CLASS_NAMES = [
    "person", "giant_panda", "lizard", "sedan", "flying_disc",
    "ape", "truck", "whale", "duck", "tennis_racket".replace("_", " "),
    "mouse/rat", "red panda,lesser panda", "surf+board",
]
EXPRESSIONS = [
    "a man riding a surfboard on a wave",
    "the black dog on the left",
    "second person from the right wearing a red hat",
    "a gold colored fish swimming near the rocks",
]


@pytest.fixture(scope="module")
def ref_tok():
    return ref_shim.load_reference_tokenizer_module()


def test_tokenizer_class_names_golden(ref_tok):
    ref_ids = ref_tok.pre_tokenize(CLASS_NAMES).numpy()  # [N, 81, 77]
    ours = pre_tokenize(CLASS_NAMES, text_type="class_name")
    assert ours.shape == ref_ids.shape, (ours.shape, ref_ids.shape)
    mism = np.argwhere(ours != ref_ids)
    assert mism.size == 0, f"{len(mism)} token mismatches, first {mism[:5]}"


def test_tokenizer_expressions_golden(ref_tok):
    ref_ids = ref_tok.pre_tokenize_expression(EXPRESSIONS).numpy()
    ours = pre_tokenize(EXPRESSIONS, text_type="expression")
    assert ours.shape == ref_ids.shape
    assert (ours == ref_ids).all()


def test_tokenizer_has_real_vocab():
    tok = ClipTokenizer()
    assert tok.has_vocab, "BPE vocab must load (hash fallback not allowed here)"
    assert tok.sot == 49406 and tok.eot == 49407


def test_category_bank_tokenization_golden(ref_tok):
    """Bank-extraction tokenization on REAL combined_datasets.txt rows:
    clean_strings on the whole synonym row, then 81 templates — must
    match the reference pipeline token-for-token
    (reference: extract_concept_emb.py:60-65)."""
    from univs_tpu.models.tokenizer import clean_category_string

    with open("/root/reference/datasets/concept_emb/combined_datasets.txt") as f:
        rows = [l.strip() for l in f if l.strip()]
    assert len(rows) == 3938  # matches the category_info offsets
    sample = rows[:5] + rows[1000:1005] + rows[2641:2646] + rows[-5:]

    for row in sample:
        ref_cleaned = ref_tok.clean_strings(row)
        ours_cleaned = clean_category_string(row)
        assert ours_cleaned == ref_cleaned, (row, ours_cleaned, ref_cleaned)
        ref_ids = ref_tok.pre_tokenize([[ref_cleaned]]).numpy()[0]  # [81, 77]
        ours = pre_tokenize([ours_cleaned], text_type="class_name")[0]
        assert (ours == ref_ids).all(), row


def test_category_info_consistent_with_bank_rows():
    from univs_tpu.data.category_info import (
        COMBINED_DATASETS_CATEGORY_INFO,
        TOTAL_CATEGORY_ROWS,
    )

    end = max(off + cnt for cnt, off in COMBINED_DATASETS_CATEGORY_INFO.values())
    assert end == TOTAL_CATEGORY_ROWS == 3938


def test_clip_text_tower_activation_parity():
    mod = ref_shim.load_reference_text_encoder_module()
    torch.manual_seed(0)
    width, heads, layers, embed_dim, vocab, ctx = 32, 4, 2, 24, 128, 77
    ref = mod.CLIPLangEncoder(
        embed_dim=embed_dim,
        context_length=ctx,
        vocab_size=vocab,
        transformer_width=width,
        transformer_heads=heads,
        transformer_layers=layers,
        out_features=["res5"],
        freeze_at=0,
    )
    ref.eval()

    rng = np.random.RandomState(0)
    tokens = rng.randint(1, vocab - 1, size=(3, ctx))
    tokens[:, 0] = vocab - 2  # sot-like
    eot_pos = np.array([5, 20, 76])
    for i, p in enumerate(eot_pos):
        tokens[i, p] = vocab - 1  # highest id -> argmax = eot position
        tokens[i, p + 1 :] = 0 if p + 1 < ctx else tokens[i, p + 1 :]

    with torch.no_grad():
        word_ref, eot_ref = ref.encode_text(torch.as_tensor(tokens), only_eot=False)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_clip_text(sd, num_layers=layers, width=width)

    from univs_tpu.models.clip_text import ClipTextEncoder

    ours = ClipTextEncoder(
        embed_dim=embed_dim, context_length=ctx, vocab_size=vocab,
        width=width, heads=heads, num_layers=layers,
    )
    word, eot = ours.apply({"params": params}, jnp.asarray(tokens))
    d_word = float(np.abs(np.asarray(word) - word_ref.numpy()).max())
    d_eot = float(np.abs(np.asarray(eot) - eot_ref.numpy()).max())
    assert d_word < 1e-4, d_word
    assert d_eot < 1e-4, d_eot
