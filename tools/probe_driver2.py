"""Probe: decompose the packed-emission driver (round-4 path).

Measures, at the bench geometry (640x960, V=30):
  loop-noemit — clip loop + window encodes, emission skipped, synced by
                a scalar fetch (pure device compute + dispatch overhead)
  loop-emit   — same plus the packed emit dispatches, synced likewise
                (adds the on-device upsample+threshold+pack cost)
  full        — run_vis end to end (adds slice, D2H drain, unpackbits,
                RLE, assemble)

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_driver2.py
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

    on_tpu = jax.default_backend() != "cpu"
    cfg = UniVSConfig(dtype="bfloat16" if on_tpu else "float32")
    model = UniVSModel(cfg)
    T = cfg.inference.num_frames
    h, w = (640, 960) if on_tpu else (128, 192)
    K = 40
    V = 30
    rng = np.random.RandomState(0)
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    frames0 = jnp.asarray(rng.rand(1, T, h, w, 3) * 255, jnp.float32)

    params = jax.jit(lambda r, x, fi: model.init(
        {"params": r}, x, fi, task="detection", text_prompts=tp, cls_emb=cls_emb,
    ))(jax.random.PRNGKey(0), frames0, jnp.arange(T)[None])["params"]

    driver = EntityDriver(cfg, params, num_classes=K,
                          capacity=cfg.inference.max_num_instances)
    video = np.asarray(rng.rand(V, h, w, 3) * 255, np.float32)

    t0 = time.perf_counter()
    res = driver.run_vis(video, cls_emb)
    log(f"warm-up (compile): {time.perf_counter()-t0:.1f}s, "
        f"{len(res)} entities")

    def sync(pool):
        return float(jnp.sum(pool.logits_count))

    import functools
    import univs_tpu.inference.memory_pool as _mp
    evict_fn = jax.jit(functools.partial(_mp.evict_window),
                       static_argnums=(1,))

    # variant loops built on driver internals
    def loop(emit_mode):
        import univs_tpu.inference.memory_pool as mp
        mask_hw = (h // 4, w // 4)
        pool = mp.create_entity_memory(
            driver.capacity, K, cfg.decoder.hidden_dim, mask_hw,
            window=driver.out_window + driver.T,
            num_prompt_points=driver.cc.num_dense_points, embd_history=8,
            prompt_history=driver.T + driver.stride)
        frames_j = jnp.asarray(video, jnp.float32)
        emitted = []
        i, first, is_last, emitted_total = 0, True, False, 0
        window_range = (0, 0)
        feats_window = None
        sizes = ((h, w), (h, w), (h, w))
        while i < V and not is_last:
            is_last = i + driver.T >= V
            clip_idx = np.minimum(np.arange(i, i + driver.T), V - 1)
            if i + driver.T > window_range[1]:
                idx = np.minimum(np.arange(i, i + driver.window), V - 1)
                feats_window = driver._encode_window_fn(driver.params, frames_j[idx])
                window_range = (i, i + driver.window)
            rel = clip_idx - window_range[0]
            mf_w, ms_w = feats_window
            feats = (mf_w[rel], tuple(m[rel] for m in ms_w))
            pool, _ = driver._clip_fn(
                driver.params, feats, pool, jnp.asarray(clip_idx),
                jnp.int32(i - emitted_total), jnp.bool_(first), cls_emb)
            first = False
            while (i + driver.T - emitted_total) >= (driver.out_window + driver.T) or (
                    is_last and emitted_total < V):
                n_out = driver.out_window if not is_last else min(
                    V - emitted_total, driver.out_window + driver.T)
                if emit_mode == "packed":
                    win, s_, v_, pool = driver._emit_packed_fn(pool, n_out, sizes)
                    emitted.append(win)
                elif emit_mode == "fp16":
                    a, b, s_, v_, pool = driver._emit_fn(pool, n_out)
                    emitted.append(a)
                else:
                    pool = evict_fn(pool, n_out)
                emitted_total += n_out
                if is_last and emitted_total >= V:
                    break
            if not is_last:
                pool = driver._shift_fn(pool)
            i += driver.stride
        return pool, emitted

    for mode in ("none", "packed", "fp16"):
        pool, emitted = loop(mode)  # warm-up for this mode's programs
        sync(pool)
        t0 = time.perf_counter()
        pool, emitted = loop(mode)
        dt_disp = time.perf_counter() - t0  # dispatch-only wall time
        s = sync(pool)
        dt = time.perf_counter() - t0
        log(f"loop[{mode:6s}]: {dt*1e3:6.0f} ms (dispatch {dt_disp*1e3:.0f} ms)")
        if mode == "packed":
            t0 = time.perf_counter()
            host = [np.asarray(m) for m in emitted]
            log(f"  full-capacity drain ({sum(m.size for m in host)/1e6:.0f} MB):"
                f" {(time.perf_counter()-t0)*1e3:.0f} ms")

    t0 = time.perf_counter()
    driver.run_vis(video, cls_emb)
    log(f"run_vis total: {(time.perf_counter()-t0)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
