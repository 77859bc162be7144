"""Decode-path breakdown at the bench config (640x960, T=5, 40 cats).

Times the UniVS decoder (a) full, (b) without prompt machinery
(learnable queries only -> no ProCA / lang2vision), (c) 3 layers, to
locate where the ~14 ms/clip goes.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit_sync(fn, args_list, iters=15):
    import jax
    import jax.numpy as jnp

    for a in args_list:
        np.asarray(jnp.sum(jax.tree.leaves(fn(*a))[0]))
    t0 = time.perf_counter()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(iters)]
    float(jnp.sum(jax.tree.leaves(outs[-1])[0]))
    return (time.perf_counter() - t0) / iters


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from univs_tpu.config import UniVSConfig
    from univs_tpu.models.univs import build_decoder
    from univs_tpu.structures import TextPrompts

    cfg = UniVSConfig(dtype="bfloat16")
    T, K = cfg.inference.num_frames, 40
    h, w = 640, 960
    sizes = [(h // 32, w // 32), (h // 16, w // 16), (h // 8, w // 8)]
    rng = np.random.RandomState(0)

    def make(seed):
        r = np.random.RandomState(seed)
        ms = tuple(
            jnp.asarray(r.randn(T, hh, ww, cfg.decoder.hidden_dim), jnp.bfloat16)
            for hh, ww in sizes
        )
        mf = jnp.asarray(r.randn(T, h // 4, w // 4, cfg.decoder.mask_dim), jnp.bfloat16)
        return ms, mf

    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    fi = jnp.arange(T)[None]
    sets = [make(s) for s in range(2)]

    for label, cfg_v, use_prompts in (
        ("full (9 layers, 40 prompts)", cfg, True),
        ("learnable-only (no ProCA/l2v)", cfg, False),
        ("full, 3 layers", dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, num_layers=3)), True),
    ):
        dec = build_decoder(cfg_v)
        kw = dict(task="detection", cls_emb=cls_emb)
        if use_prompts:
            kw["text_prompts"] = tp
        params = dec.init(
            {"params": jax.random.PRNGKey(0)}, list(sets[0][0]), sets[0][1], fi, **kw
        )["params"]

        @jax.jit
        def f(ms, mf, params=params, dec=dec, kw=kw):
            out = dec.apply({"params": params}, list(ms), mf, fi, **kw)
            return out["pred_masks"]

        t = timeit_sync(f, sets)
        print(f"{label}: {t*1000:.2f} ms/clip", flush=True)


if __name__ == "__main__":
    main()
