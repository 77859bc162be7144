"""Attribute the entity clip step's cost by whole-program ablation.

Standalone timing of sub-programs is dispatch-floor-bound on this part
(~1.2 ms per dispatch, docs/PERFORMANCE.md "Round 4"), so the only
meaningful attribution is whole-program deltas: compile the SAME clip
step with named stages skipped (EntityClipConfig.ablate) and subtract.

Stages (inference/entity.py): 'reencode' = per-clip visual-prompt
re-encode over the memory pool (T key-frame dense-point samples + ring
writes); 'gate' = consistency gating + VIS overlap resolution; 'newly'
= newly-entity detection (quality top-k, NMS, Hungarian vs memory,
admission).  The residual with all three off is the sot decoder forward
(prompt+learnable queries) + pool mask accumulation.

Run on the real TPU: `python tools/probe_clip_ablation.py`.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _drain(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf[(0,) * leaf.ndim]))


def timeit(fn, iters=30):
    for _ in range(2):
        _drain(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    _drain(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    from univs_tpu.config import UniVSConfig
    from univs_tpu.inference import memory_pool as mpool
    from univs_tpu.inference.driver import EntityDriver
    from univs_tpu.inference.entity import entity_clip_step
    from univs_tpu.models.univs import (
        UniVSModel,
        build_decoder,
        build_pixel_decoder,
    )
    from univs_tpu.structures import TextPrompts

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    cfg = UniVSConfig(dtype="bfloat16" if on_tpu else "float32")
    T = cfg.inference.num_frames
    h, w = (640, 960) if on_tpu else (128, 192)
    K = 40
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(T, h, w, 3) * 255, jnp.float32)
    fi = jnp.arange(T)[None]
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    model = UniVSModel(cfg)

    @jax.jit
    def init_fn(rng_, images, fi):
        return model.init({"params": rng_}, images, fi, task="detection",
                          text_prompts=tp, cls_emb=cls_emb)

    params = init_fn(jax.random.PRNGKey(0), frames[None], fi)["params"]
    pd, dec = build_pixel_decoder(cfg), build_decoder(cfg)
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.pixel_std, jnp.float32)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    @jax.jit
    def encode(params, frames):
        x = ((frames - mean) / std).astype(dtype)
        feats = model.apply({"params": params}, x, method=lambda m, y: m.backbone(y))
        mf, _, _, ms = pd.apply({"params": params["pixel_decoder"]}, feats)
        return mf, tuple(ms)

    mf, ms = encode(params, frames)
    feats_clip = (mf, tuple(ms))
    driver = EntityDriver(cfg, params, num_classes=K,
                          capacity=cfg.inference.max_num_instances)
    stride = cfg.inference.clip_stride
    pool0 = mpool.create_entity_memory(
        cfg.inference.max_num_instances, K, cfg.decoder.hidden_dim,
        (h // 4, w // 4), window=driver.out_window + T,
        num_prompt_points=driver.cc.num_dense_points, embd_history=8,
        prompt_history=T + stride,
    )
    # seed a realistically occupied pool: one first clip admits entities
    pool1, _ = driver._clip_fn(
        params, feats_clip, pool0, fi[0], jnp.int32(0), jnp.bool_(True), cls_emb
    )
    _drain(pool1.mask_logits)
    n_valid = int(np.asarray(pool1.valid).sum())
    print(f"pool occupancy after first clip: {n_valid}", file=sys.stderr)

    modules = (pd, dec)
    results = {}
    variants = [
        ("full", ()),
        ("-reencode", ("reencode",)),
        ("-gate", ("gate",)),
        ("-newly", ("newly",)),
        ("-accum", ("accum",)),
        ("-all3 (decoder+accum only)", ("reencode", "gate", "newly")),
        ("-all4 (sot decoder fwd only)", ("reencode", "gate", "newly", "accum")),
    ]
    for name, ablate in variants:
        cc = dataclasses.replace(driver.cc, ablate=ablate)

        @jax.jit
        def step(params, feats, pool, fi, off, first, cls_emb, cc=cc):
            pool, _ = entity_clip_step(modules, params, feats, pool, fi,
                                       off, first, cls_emb, cc)
            return pool.mask_logits

        t = timeit(lambda: step(params, feats_clip, pool1, fi[0],
                                jnp.int32(1), jnp.bool_(False), cls_emb))
        results[name] = t
        print(f"{name:<28s} {t * 1000:7.2f} ms", flush=True)

    base = results["full"]
    print("\nattribution (whole-program deltas):")
    for name in ["-reencode", "-gate", "-newly"]:
        print(f"  {name[1:]:<10s} {(base - results[name]) * 1000:6.2f} ms")
    print(f"  residual   {results['-all3 (decoder+accum only)'] * 1000:6.2f} ms"
          " (sot decoder fwd + mask accumulation)")


if __name__ == "__main__":
    main()
