"""Probe: how much of the clip step's re-encode is the dense-point
top_k sort?  Whole-program delta: compile the SAME entity_clip_step
with _cyclic_dense_select monkeypatched to a sort-free iota selection
(wrong results, same shapes/traffic), subtract.

    python tools/probe_reencode_sort.py   # real TPU
"""

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
    from univs_tpu.models.univs import UniVSModel, build_decoder, build_pixel_decoder
    from univs_tpu.structures import TextPrompts
    from univs_tpu.prompts import visual_prompt as vp

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
    pool1, _ = driver._clip_fn(
        params, feats_clip, pool0, fi[0], jnp.int32(0), jnp.bool_(True), cls_emb
    )
    _drain(pool1.mask_logits)

    modules = (pd, dec)

    def build_step(cc):
        @jax.jit
        def step(params, feats, pool, fi, off, first, cls_emb):
            pool, _ = entity_clip_step(modules, params, feats, pool, fi,
                                       off, first, cls_emb, cc)
            return pool.mask_logits
        return step

    real_select = vp._cyclic_dense_select

    def iota_select(priority, r):
        hw = priority.shape[-1]
        q = priority.shape[0]
        idx = jnp.broadcast_to(jnp.arange(r)[None] % hw, (q, r))
        n = (priority > 0).sum(-1)
        return idx, n

    step = build_step(driver.cc)
    t_real = timeit(lambda: step(params, feats_clip, pool1, fi[0],
                                 jnp.int32(1), jnp.bool_(False), cls_emb))
    print(f"clip step (real top_k select) : {t_real*1e3:7.2f} ms", flush=True)

    vp._cyclic_dense_select = iota_select
    try:
        import dataclasses
        cc2 = dataclasses.replace(driver.cc)  # new object -> new jit cache key
        step2 = build_step(cc2)
        t_iota = timeit(lambda: step2(params, feats_clip, pool1, fi[0],
                                      jnp.int32(1), jnp.bool_(False), cls_emb))
    finally:
        vp._cyclic_dense_select = real_select
    print(f"clip step (iota select)       : {t_iota*1e3:7.2f} ms", flush=True)
    print(f"top_k sort cost               : {(t_real - t_iota)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
