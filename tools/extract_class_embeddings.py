#!/usr/bin/env python
"""Extract the frozen CLIP category-embedding bank.

Equivalent of the reference's offline concept-embedding extraction
(reference: tools/clip_concept_extraction/ +
univs/modeling/language/extract_class_embed.py): for each category
name in the combined namespace list, embed 81 prompt templates through
the CLIP text tower and average the EOT features -> [N, 640] bank.

    python tools/extract_class_embeddings.py \
        --names datasets/concept_emb/combined_datasets.txt \
        --clip-weights clip_rn50x4_text.pth --out bank.npy
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_names(path: str):
    """One bank row per line; synonym rows ("tench, Tinca tinca,") stay
    whole — clean_strings concatenates the synonyms (reference:
    extract_concept_emb.py:60-69)."""
    names = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            names.append(line)
    return names


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--names", required=True)
    p.add_argument("--clip-weights", default=None, help=".pth CLIP text tower (OpenAI naming)")
    p.add_argument("--out", default="bank.npy")
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from univs_tpu.models.clip_text import ClipTextEncoder, TextPromptEncoder
    from univs_tpu.models.tokenizer import ClipTokenizer

    names = load_names(args.names)
    print(f"{len(names)} category names")

    enc = ClipTextEncoder()
    if args.clip_weights:
        import torch

        from univs_tpu.utils.convert import convert_clip_text, flatten_torch

        sd = flatten_torch(torch.load(args.clip_weights, map_location="cpu", weights_only=False))
        params = {"params": convert_clip_text(sd)}
    else:
        print("WARNING: no CLIP weights — random tower (smoke only)")
        tokens = jnp.zeros((1, 77), jnp.int32)
        params = jax.jit(lambda r: enc.init(r, tokens))(jax.random.PRNGKey(0))

    tpe = TextPromptEncoder(params, enc, ClipTokenizer())
    bank = []
    for i in range(0, len(names), args.batch):
        chunk = names[i : i + args.batch]
        # pad the tail so the jitted encode keeps one static shape
        npad = args.batch - len(chunk)
        emb = np.asarray(tpe.encode_category_names(chunk + ["object"] * npad))
        bank.append(emb[: len(chunk)])
        if i % 512 == 0:
            print(f"{i}/{len(names)}", flush=True)
    bank = np.concatenate(bank)
    np.save(args.out, bank)
    print(f"wrote {args.out} {bank.shape}")


if __name__ == "__main__":
    main()
