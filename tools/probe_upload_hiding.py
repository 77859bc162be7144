"""Probe: is the next-video upload actually hidden behind compute?

Runs the pipelined driver loop twice: (a) with NO per-iteration upload
(the same device-resident video is re-decoded), giving the pure
device+drain wall; (b) with the standard next-video uint8 upload
enqueued behind each video's compute (the bench loop).  The delta is
the UNHIDDEN portion of the ~55 MB transfer.

    python tools/probe_upload_hiding.py
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


def main():
    from univs_tpu.config import UniVSConfig
    from univs_tpu.inference.driver import EntityDriver
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts

    cfg = UniVSConfig(dtype="bfloat16")
    model = UniVSModel(cfg)
    T = cfg.inference.num_frames
    h, w, V, K = 640, 960, 30, 40
    rng = np.random.RandomState(0)
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    frames0 = jnp.asarray(rng.rand(1, T, h, w, 3) * 255, jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    params = jax.jit(lambda r, x, fi: model.init(
        {"params": r}, x, fi, task="detection", text_prompts=tp, cls_emb=cls_emb,
    ))(jax.random.PRNGKey(0), frames0, jnp.arange(T)[None])["params"]

    video = np.asarray(rng.rand(V, h, w, 3) * 255, np.uint8)
    driver = EntityDriver(cfg, params, num_classes=K,
                          capacity=cfg.inference.max_num_instances)
    log("warm-up...")
    driver.run_vis(video, cls_emb)
    dev_video = jax.device_put(video)

    iters = 4

    # (a) no uploads: same device video each iteration
    t0 = time.perf_counter()
    hd = driver.start_vis(dev_video, cls_emb)
    for _ in range(iters - 1):
        hd_next = driver.start_vis(dev_video, cls_emb)
        driver.finish_vis(hd)
        hd = hd_next
    driver.finish_vis(hd)
    ta = (time.perf_counter() - t0) / iters
    log(f"(a) device-only loop: {ta:.3f} s/video = {V/ta:.2f} FPS")

    # (b) bench loop: one 55 MB uint8 upload enqueued behind each video
    t0 = time.perf_counter()
    hd = driver.start_vis(dev_video, cls_emb, next_frames=video)
    for _ in range(iters - 1):
        hd_next = driver.start_vis(hd["next_frames_device"], cls_emb,
                                   next_frames=video)
        driver.finish_vis(hd)
        hd = hd_next
    driver.finish_vis(hd)
    tb = (time.perf_counter() - t0) / iters
    log(f"(b) with uploads:     {tb:.3f} s/video = {V/tb:.2f} FPS")
    log(f"unhidden upload: {tb - ta:.3f} s of a ~{video.nbytes/2**20:.0f} MB "
        f"transfer ({video.nbytes/2**20/max(tb-ta,1e-9):.1f} MB/s effective)")


if __name__ == "__main__":
    main()
