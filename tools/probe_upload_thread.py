"""Probe: can a background-thread device_put stream a video upload
WHILE the main thread blocks on the device queue?

probe_upload_hiding showed the upload enqueued behind compute on the
SAME host thread adds its full wire time to the wall (one FIFO stream:
enqueue order = execution order).  If the tunnel multiplexes transfers
issued from a second host thread, the 53 MB can flow during the ~2.3 s
compute wait instead.

    python tools/probe_upload_thread.py
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

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
    pool = ThreadPoolExecutor(max_workers=1)

    def upload():
        d = jax.device_put(video)
        d.block_until_ready()  # force the wire traffic inside the thread
        return d

    iters = 4
    t0 = time.perf_counter()
    hd = driver.start_vis(dev_video, cls_emb)
    fut = pool.submit(upload)
    for _ in range(iters - 1):
        results = driver.finish_vis(hd)  # blocks on this video's queue
        nxt = fut.result()
        hd = driver.start_vis(nxt, cls_emb)
        fut = pool.submit(upload)
    driver.finish_vis(hd)
    fut.result()
    dt = (time.perf_counter() - t0) / iters
    log(f"threaded upload loop: {dt:.3f} s/video = {V/dt:.2f} FPS "
        f"(vs 2.33 device-only, 3.80 same-thread)")


if __name__ == "__main__":
    main()
