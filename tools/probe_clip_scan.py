"""Probe: fold a window's clip steps + ring shifts into ONE lax.scan
dispatch vs the per-clip dispatch loop.

The driver dispatches clip_window_fn + shift_fn per clip (~1.2 ms
fixed cost per dispatch on this stack, docs/PERFORMANCE.md).  A V=30
stride-1 video is 26 clip dispatches + 25 shifts = ~60 ms/video of
pure dispatch overhead, plus host-loop time.  A lax.scan over the
device-resident schedule runs the whole emit-less segment in one
dispatch.

Checks bit-equality of the final pool vs the sequential path, then
times both on the real chip.

    python tools/probe_clip_scan.py            # real TPU timing
    JAX_PLATFORMS=cpu python tools/probe_clip_scan.py --small  # equality only
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, flush=True)


def _drain(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf[(0,) * leaf.ndim]))


def main():
    small = "--small" in sys.argv
    from univs_tpu.config import UniVSConfig
    from univs_tpu.inference import memory_pool as mp
    from univs_tpu.inference.driver import EntityDriver
    from univs_tpu.inference.entity import entity_clip_step
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    if small:
        import dataclasses
        base = UniVSConfig(dtype="float32")
        cfg = dataclasses.replace(
            base,
            decoder=dataclasses.replace(base.decoder, num_layers=3),
        )
        h, w, V = 128, 192, 12
    else:
        cfg = UniVSConfig(dtype="bfloat16" if on_tpu else "float32")
        h, w, V = (640, 960, 30) if on_tpu else (128, 192, 12)
    T = cfg.inference.num_frames
    K = 40
    rng = np.random.RandomState(0)
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    frames0 = jnp.asarray(rng.rand(1, T, h, w, 3) * 255, jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    model = UniVSModel(cfg)
    params = jax.jit(lambda r, x, fi: model.init(
        {"params": r}, x, fi, task="detection", text_prompts=tp, cls_emb=cls_emb,
    ))(jax.random.PRNGKey(0), frames0, jnp.arange(T)[None])["params"]

    driver = EntityDriver(cfg, params, num_classes=K,
                          capacity=cfg.inference.max_num_instances if not small else 12)
    stride = driver.stride
    cc = driver.cc
    modules = driver._modules

    # one window's worth of features
    Wn = min(driver.window, V)
    frames = jnp.asarray(rng.rand(Wn, h, w, 3) * 255, jnp.float32)
    feats_window = driver._encode_window_fn(params, frames)
    _drain(feats_window[0])

    plan = list(driver._iter_clips(V))
    n_scan = sum(1 for c in plan if not c["emits"] and not c["is_last"])
    log(f"V={V}: {len(plan)} clips, {n_scan} scannable (emit-less, non-last)")
    sched = (
        jnp.asarray(np.stack([c["rel"] for c in plan]).astype(np.int32)),
        jnp.asarray(np.stack([c["clip_idx"] for c in plan]).astype(np.int32)),
        jnp.asarray(np.asarray([c["offset"] for c in plan], np.int32)),
    )

    def fresh_pool():
        return mp.create_entity_memory(
            driver.capacity, K, cfg.decoder.hidden_dim, (h // 4, w // 4),
            window=driver.out_window + T,
            num_prompt_points=cc.num_dense_points, embd_history=8,
            prompt_history=T + stride,
        )

    # ---- sequential path (the production per-clip dispatches) ---------
    def run_sequential(pool):
        ci = jnp.int32(0)
        for c in plan:
            pool, ci = driver._clip_window_fn(
                params, feats_window, sched, ci, pool, cls_emb)
            if not c["is_last"]:
                pool = driver._shift_fn(pool)
        return pool

    # ---- scan path -----------------------------------------------------
    rel_all, idx_all, off_all = sched
    mf_w, ms_w = feats_window

    import functools

    @functools.partial(jax.jit, donate_argnums=(1,),
                       static_argnames=("n_steps",))
    def scan_fn(params, pool, ci, cls_emb, n_steps):
        def body(carry, _):
            pool, ci = carry
            rel = rel_all[ci]
            feats = (mf_w[rel], tuple(m[rel] for m in ms_w))
            pool, _ = entity_clip_step(
                modules, params, feats, pool, idx_all[ci], off_all[ci],
                ci == 0, cls_emb, cc)
            pool = mp.shift_clip(pool, stride)
            return (pool, ci + 1), None
        (pool, ci), _ = jax.lax.scan(body, (pool, ci), None, length=n_steps)
        return pool, ci

    def run_scan(pool):
        ci = jnp.int32(0)
        pool, ci = scan_fn(params, pool, ci, cls_emb, n_scan)
        for c in plan[n_scan:]:
            pool, ci = driver._clip_window_fn(
                params, feats_window, sched, ci, pool, cls_emb)
            if not c["is_last"]:
                pool = driver._shift_fn(pool)
        return pool

    log("sequential warm-up...")
    p_seq = run_sequential(fresh_pool())
    _drain(p_seq.mask_logits)
    log("scan warm-up (compile)...")
    p_scan = run_scan(fresh_pool())
    _drain(p_scan.mask_logits)

    # equality
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32)))),
        p_seq, p_scan)
    worst = max(jax.tree.leaves(diffs))
    log(f"max |seq - scan| over pool leaves: {worst:.3e}")
    assert worst == 0.0, diffs

    if on_tpu:
        iters = 5
        for name, fn in (("sequential", run_sequential), ("scan", run_scan)):
            _drain(fn(fresh_pool()).mask_logits)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(fresh_pool())
            _drain(out.mask_logits)
            dt = (time.perf_counter() - t0) / iters
            log(f"{name}: {dt*1000:.1f} ms/video-decode "
                f"({dt/len(plan)*1000:.2f} ms/clip incl. shift)")


if __name__ == "__main__":
    main()
