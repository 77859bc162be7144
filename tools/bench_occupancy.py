"""Benchmark: streaming VIS driver FPS at realistic entity occupancy.

The standard bench video (random noise, random-init weights) admits
E≈1 of 60 capacity slots, so the drain D2H bytes and the host-side RLE
work run far below production scale (YouTube-VIS videos carry ~10-60
tracked entities).  Device clip programs are capacity-static — their
timing does not depend on occupancy — but the end-of-video drain
fetches only the finally-VALID rows (power-of-two bucketed) and the
host RLE-encodes every valid entity x frame, so the pipelined
overlap of video k's drain with video k+1's compute is only proven at
high occupancy.

This probe floors the admission thresholds (newly/cls/consistency -> 0,
NMS -> 0.999) so the detection path admits its top-k candidates every
detect interval and the pool fills toward capacity; the device programs
are structurally identical (thresholds are baked scalars), so the FPS
delta vs the standard bench isolates drain + RLE at occupancy.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_occupancy.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, flush=True)


from univs_tpu.utils.synth import synth_blob_video  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from univs_tpu.config import UniVSConfig
    from univs_tpu.inference.driver import EntityDriver
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    base = UniVSConfig(dtype="bfloat16" if on_tpu else "float32")
    # Fill the pool: admission requires a candidate to (a) NOT match an
    # existing memory entity (newly_thres is the MATCH threshold — set
    # it impossibly high so nothing matches and everything is "new"),
    # (b) clear the class gate (floored), (c) survive NMS (near-disabled).
    cfg = dataclasses.replace(
        base,
        inference=dataclasses.replace(
            base.inference,
            apply_cls_thres=0.0,
            newly_entity_thres=2.0,
            consistency_thres=(0.0, 0.0),
            # random-init weights give near-identical masks across
            # queries; any real NMS threshold collapses them to one
            # entity (box IoU ~1).  >1 disables NMS so the first clip
            # admits all top-k candidates and the pool runs at ~25/60
            # occupancy (the miou<0.5 law still blocks later-clip
            # duplicates — that part is the production semantics).
            nms_thres=1.5,
        ),
    )
    T = cfg.inference.num_frames
    h, w = (640, 960) if on_tpu else (128, 192)
    V = 30
    K = 40
    rng = np.random.RandomState(0)
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)

    model = UniVSModel(cfg)
    frames0 = jnp.asarray(rng.rand(1, T, h, w, 3) * 255, jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    params = jax.jit(lambda r, x, fi: model.init(
        {"params": r}, x, fi, task="detection", text_prompts=tp, cls_emb=cls_emb,
    ))(jax.random.PRNGKey(0), frames0, jnp.arange(T)[None])["params"]

    video = synth_blob_video(V, h, w, n_blobs=24, seed=0)
    driver = EntityDriver(cfg, params, num_classes=K,
                          capacity=cfg.inference.max_num_instances)

    log("warm-up (compile)...")
    results = driver.run_vis(video, cls_emb)
    n_entities = len(results)
    log(f"occupancy: {n_entities} / {cfg.inference.max_num_instances} slots")

    iters = 3 if on_tpu else 1
    dev_video = jax.device_put(video)
    t0 = time.perf_counter()
    hd = driver.start_vis(dev_video, cls_emb, next_frames=video)
    for _ in range(iters - 1):
        hd_next = driver.start_vis(hd["next_frames_device"], cls_emb,
                                   next_frames=video)
        results = driver.finish_vis(hd)
        hd = hd_next
    results = driver.finish_vis(hd)
    dt = (time.perf_counter() - t0) / iters
    log(f"pipelined driver: {dt:.3f} s/video = {V / dt:.2f} FPS at "
        f"E={len(results)} occupancy ({platform})")


if __name__ == "__main__":
    main()
