#!/usr/bin/env python
"""Model analysis: parameter counts + FLOPs per stage.

Equivalent of the reference's tools/analyze_model.py (fvcore FLOPs) —
uses XLA's own cost analysis of the jitted forward.

    python tools/analyze_model.py --backbone resnet50
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--height", type=int, default=640)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--frames", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from univs_tpu.config import BackboneConfig, UniVSConfig
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts

    cfg = UniVSConfig(backbone=BackboneConfig(name=args.backbone))
    model = UniVSModel(cfg)
    b, t, h, w = 1, args.frames, args.height, args.width
    K = 40
    rng = np.random.RandomState(0)
    images = jnp.zeros((b, t, h, w, 3))
    fi = jnp.arange(t)[None]
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((b, K), bool))

    @jax.jit
    def init_fn(r):
        return model.init({"params": r}, images, fi, task="detection",
                          text_prompts=tp, cls_emb=cls_emb)

    params = jax.eval_shape(init_fn, jax.random.PRNGKey(0))["params"]

    def count(tree):
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

    total = count(params)
    print(f"total params: {total/1e6:.2f}M")
    for name, sub in params.items():
        print(f"  {name}: {count(sub)/1e6:.2f}M")

    def fwd(p, x):
        return model.apply(p, x, fi, task="detection", text_prompts=tp, cls_emb=cls_emb)["pred_logits"]

    lowered = jax.jit(fwd).lower({"params": jax.eval_shape(init_fn, jax.random.PRNGKey(0))["params"]}, images)
    try:
        cost = lowered.compile().cost_analysis()
        flops = cost.get("flops", float("nan"))
        print(f"forward FLOPs ({h}x{w}, T={t}): {flops/1e9:.1f} GFLOPs")
        print(f"bytes accessed: {cost.get('bytes accessed', float('nan'))/1e9:.2f} GB")
    except Exception as e:
        print(f"(cost analysis unavailable: {e})")


if __name__ == "__main__":
    main()
