"""Probe: where the EntityDriver's end-to-end time goes.

bench r4 measured the honest frames->RLEs driver FPS at 1.25 vs the
15.77 analytic device bound — this decomposes the gap:

  stream-device — the clip loop with the final host drain excluded
                  (device compute + per-clip python dispatch)
  drain         — np.asarray of the emitted windows (device->host copy
                  of ~[V, E, H/4, W/4] fp16 over the axon tunnel)
  upsample      — torch bilinear 4x upsample of every (entity, frame)
  rle           — RLE encode of every upsampled frame mask
  rest          — assemble bookkeeping

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_driver.py
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
    from univs_tpu.inference.driver import (
        EntityDriver, assemble_vis_results, _upsample_and_threshold)
    from univs_tpu.utils import rle

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

    # warm-up (compile everything)
    t0 = time.perf_counter()
    driver.run_vis(video, cls_emb)
    log(f"warm-up (compile): {time.perf_counter()-t0:.1f}s")

    # --- stage 1: the stream loop, drain separated -----------------------
    import univs_tpu.inference.driver as drv

    orig_asarray = np.asarray
    for it in range(2):
        t0 = time.perf_counter()
        emitted, emit_starts, emit_scores, emit_valids, pool, _ = driver._stream(
            video, cls_emb, divide=True)
        t_stream_total = time.perf_counter() - t0
        log(f"stream total (incl drain): {t_stream_total*1e3:.0f} ms")

    # re-run, timing the drain alone: _stream drains internally, so time
    # a device-side-only variant by syncing before the final asarray
    t0 = time.perf_counter()
    masks_dev = driver._emit_fn  # noqa - just to reference
    # device-side: run the loop again but fetch only a scalar at the end
    emitted_d, starts_d, scores_d, valids_d, pool_d, _ = driver._stream(
        video, cls_emb, divide=True)
    # emitted_d are already numpy (drained); measure transfer by pushing
    # one window back and fetching
    win = jnp.asarray(emitted_d[0])
    float(jnp.sum(win[0, 0, 0, 0]))
    t0 = time.perf_counter()
    _ = orig_asarray(win)
    t_drain1 = time.perf_counter() - t0
    nbytes = win.size * 2
    log(f"drain 1 window [{emitted_d[0].shape}] fp16: {t_drain1*1e3:.0f} ms "
        f"({nbytes/1e6:.0f} MB -> {nbytes/t_drain1/1e9:.2f} GB/s)")

    # --- stage 2: assemble ------------------------------------------------
    valid = np.asarray(pool_d.valid)
    qsum = np.asarray(pool_d.quality_sum)
    n_valid = int(valid.sum())
    t0 = time.perf_counter()
    res = assemble_vis_results(emitted_d, starts_d, scores_d, valid, qsum,
                               V, (h, w), (h, w), (h, w))
    t_asm = time.perf_counter() - t0
    log(f"assemble_vis_results: {t_asm*1e3:.0f} ms for {n_valid} entities")

    # split: upsample vs rle for one entity-window
    m = emitted_d[0][0]  # [n, H4, W4]
    t0 = time.perf_counter()
    for _ in range(5):
        up = _upsample_and_threshold(m, (h, w), (h, w), (h, w))
    t_up = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(5):
        for k_ in range(up.shape[0]):
            rle.encode(up[k_])
    t_rle = (time.perf_counter() - t0) / 5
    log(f"per entity-window [{m.shape}]: upsample {t_up*1e3:.0f} ms, "
        f"rle {t_rle*1e3:.0f} ms  (x {n_valid} entities)")

    # --- stage 3: per-clip python dispatch overhead ----------------------
    # time N clip steps back-to-back without any host fetch
    mask_hw = (h // 4, w // 4)
    import univs_tpu.inference.memory_pool as mp
    pool0 = mp.create_entity_memory(
        driver.capacity, K, cfg.decoder.hidden_dim, mask_hw,
        window=driver.out_window + T,
        num_prompt_points=driver.cc.num_dense_points, embd_history=8,
        prompt_history=T + driver.stride)
    fw = driver._encode_window_fn(driver.params, jnp.asarray(video[:driver.window], jnp.float32))
    feats = (fw[0][:T], tuple(mm[:T] for mm in fw[1]))
    p1, _ = driver._clip_fn(driver.params, feats, pool0, jnp.arange(T),
                            jnp.int32(0), jnp.bool_(True), cls_emb)
    float(jnp.sum(p1.valid[0]))
    iters = 20
    t0 = time.perf_counter()
    p = p1
    for i in range(iters):
        p, _ = driver._clip_fn(driver.params, feats, p, jnp.arange(T),
                               jnp.int32(1), jnp.bool_(False), cls_emb)
    float(jnp.sum(p.valid[0]))
    t_clip = (time.perf_counter() - t0) / iters
    log(f"entity clip step (chained, sync-amortized): {t_clip*1e3:.1f} ms")


if __name__ == "__main__":
    main()
