"""Probe: where do the ~10 s/video go?  Times the REAL driver pieces:
  encode W=30       — the production window encode (bench only times W=10)
  encode W=10       — bench geometry for comparison
  clip_window x10   — the production donated clip fn, chained
  shift x10         — donated shift, chained
  stream (no pack)  — driver._stream fp16 path end-to-end
  stream (packed)   — driver._stream packed path end-to-end

    python tools/probe_driver5.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, flush=True)


def main():
    from univs_tpu.config import UniVSConfig
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts
    from univs_tpu.inference.driver import EntityDriver
    import univs_tpu.inference.memory_pool as mp

    on_tpu = jax.default_backend() != "cpu"
    cfg = UniVSConfig(dtype="bfloat16" if on_tpu else "float32")
    model = UniVSModel(cfg)
    T = cfg.inference.num_frames
    h, w = (640, 960) if on_tpu else (128, 192)
    K = 40
    rng = np.random.RandomState(0)
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    frames0 = jnp.asarray(rng.rand(1, T, h, w, 3) * 255, jnp.float32)

    params = jax.jit(lambda r, x, fi: model.init(
        {"params": r}, x, fi, task="detection", text_prompts=tp, cls_emb=cls_emb,
    ))(jax.random.PRNGKey(0), frames0, jnp.arange(T)[None])["params"]

    driver = EntityDriver(cfg, params, num_classes=K,
                          capacity=cfg.inference.max_num_instances)

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(jnp.sum(leaf[(0,) * leaf.ndim].astype(jnp.float32)))

    W30 = driver.window
    frames30 = jnp.asarray(rng.rand(W30, h, w, 3) * 255, jnp.float32)

    t_named = {}

    def timeit(name, f, reps=3):
        sync(f())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f())
            ts.append(time.perf_counter() - t0)
        t_named[name] = sorted(ts)[len(ts) // 2]
        log(f"{name:18s}: median {t_named[name]*1e3:7.0f} ms  (all: "
            + ", ".join(f"{x*1e3:.0f}" for x in ts) + ")")

    timeit("encode W=30", lambda: driver._encode_window_fn(driver.params, frames30))
    timeit("encode W=10", lambda: driver._encode_window_fn(driver.params, frames30[:10]))

    feats30 = driver._encode_window_fn(driver.params, frames30)
    sync(feats30)

    mask_hw = (h // 4, w // 4)
    def fresh_pool():
        return mp.create_entity_memory(
            driver.capacity, K, cfg.decoder.hidden_dim, mask_hw,
            window=driver.out_window + T,
            num_prompt_points=driver.cc.num_dense_points, embd_history=8,
            prompt_history=T + driver.stride)

    rel = jnp.arange(T)
    fi0 = jnp.arange(T)

    def chain_clips():
        p = fresh_pool()
        for i in range(10):
            p, _ = driver._clip_window_fn(
                driver.params, feats30, rel, p, fi0, jnp.int32(1),
                jnp.bool_(False), cls_emb)
        return p.logits_count

    timeit("clip_window x10", chain_clips)

    def chain_shifts():
        p = fresh_pool()
        for i in range(10):
            p = driver._shift_fn(p)
        return p.logits_count

    timeit("shift x10", chain_shifts)

    video = np.asarray(rng.rand(30, h, w, 3) * 255, np.float32)

    def stream_fp16():
        out = driver._stream(video, cls_emb, divide=True, packed_sizes=None)
        return out[4].logits_count

    def stream_packed():
        out = driver._stream(video, cls_emb, divide=True,
                             packed_sizes=((h, w), (h, w), (h, w)))
        return out[4].logits_count

    timeit("stream fp16", stream_fp16, reps=2)
    timeit("stream packed", stream_packed, reps=2)

    n_clips = 26
    model_t = (t_named["encode W=30"] + n_clips * (
        t_named["clip_window x10"] + t_named["shift x10"]) / 10)
    log(f"model: encode + 26*(clip+shift) = {model_t*1e3:.0f} ms "
        f"vs stream fp16 {t_named['stream fp16']*1e3:.0f} ms")


if __name__ == "__main__":
    main()
