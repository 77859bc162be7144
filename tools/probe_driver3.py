"""Probe: per-phase device cost of the streaming driver, interleaved
repetitions + medians (the tunnel/chip showed high run-to-run variance:
loop-without-emission measured 20.3s in one process and <12s total in
another).

Phases, each synced by a scalar fetch:
  encode W=30      — one window encode at the production window size
  encode W=10      — the bench's encode geometry (checks superlinearity)
  slice x30        — the per-clip eager feature slicing (mf_w[rel], ms)
  clip x30         — chained entity clip steps on fixed feats
  shift x30        — pool ring shifts
  emit packed x2   — the two packed emissions of a 30-frame video
  emit fp16 x2     — the old fp16 emissions

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_driver3.py
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
    W30 = driver.window
    frames30 = jnp.asarray(rng.rand(W30, h, w, 3) * 255, jnp.float32)
    frames10 = frames30[:10]

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(jnp.sum(leaf[(0,) * leaf.ndim].astype(jnp.float32)))

    mask_hw = (h // 4, w // 4)
    pool0 = mp.create_entity_memory(
        driver.capacity, K, cfg.decoder.hidden_dim, mask_hw,
        window=driver.out_window + T,
        num_prompt_points=driver.cc.num_dense_points, embd_history=8,
        prompt_history=T + driver.stride)
    sizes = ((h, w), (h, w), (h, w))
    fi0 = jnp.arange(T)

    # ---- define phases -------------------------------------------------
    feats30 = driver._encode_window_fn(driver.params, frames30)
    sync(feats30)

    def ph_encode30():
        return driver._encode_window_fn(driver.params, frames30)

    def ph_encode10():
        return driver._encode_window_fn(driver.params, frames10)

    def ph_slice():
        outs = None
        mf_w, ms_w = feats30
        for i in range(30):
            rel = np.minimum(np.arange(i, i + T), W30 - 1) - 0
            outs = (mf_w[rel], tuple(m[rel] for m in ms_w))
        return outs

    mf_w, ms_w = feats30
    feats_clip = (mf_w[:T], tuple(m[:T] for m in ms_w))
    pool1, _ = driver._clip_fn(driver.params, feats_clip, pool0, fi0,
                               jnp.int32(0), jnp.bool_(True), cls_emb)
    sync(pool1.logits_count)

    def ph_clips():
        p = pool1
        for i in range(30):
            p, _ = driver._clip_fn(driver.params, feats_clip, p, fi0,
                                   jnp.int32(1), jnp.bool_(False), cls_emb)
        return p.logits_count

    def ph_shift():
        p = pool1
        for i in range(30):
            p = driver._shift_fn(p)
        return p.logits_count

    def ph_emit_packed():
        a, s, v, p = driver._emit_packed_fn(pool1, driver.out_window, sizes)
        b, s2, v2, p2 = driver._emit_packed_fn(p, T, sizes)
        return b

    def ph_emit_fp16():
        a, ar, s, v, p = driver._emit_fn(pool1, driver.out_window)
        b, br, s2, v2, p2 = driver._emit_fn(p, T)
        return br

    phases = [("encode W=30", ph_encode30), ("encode W=10", ph_encode10),
              ("slice x30", ph_slice), ("clip x30", ph_clips),
              ("shift x30", ph_shift), ("emit packed x2", ph_emit_packed),
              ("emit fp16 x2", ph_emit_fp16)]

    # warm-up all
    for name, f in phases:
        sync(f())
    # interleave 3 reps
    times = {name: [] for name, _ in phases}
    for rep in range(3):
        for name, f in phases:
            t0 = time.perf_counter()
            sync(f())
            times[name].append(time.perf_counter() - t0)
    for name, _ in phases:
        ts = sorted(times[name])
        log(f"{name:16s}: median {ts[1]*1e3:7.0f} ms  (all: "
            + ", ".join(f"{t*1e3:.0f}" for t in times[name]) + ")")


if __name__ == "__main__":
    main()
