"""Probe: per-phase host wall time of the pipelined bench loop.

probe_h2d_overlap established compute->upload order overlaps fully, yet
the pipelined bench still measures ~4.7 s/video vs the ~2.7 s device
model.  This splits one steady-state iteration into:

  start_vis      - dispatch loop host time (incl. next-video device_put
                   host-blocking portion)
  drain.sync     - np.asarray(pool.valid) (waits for THIS video's queue)
  drain.pack     - _pack_rows dispatches + copy_to_host_async
  fetch          - np.asarray of packed windows + scores
  assemble       - host RLE encoding

    python tools/probe_pipeline_phases.py               # bench video, E~1
    python tools/probe_pipeline_phases.py --occupancy   # blobs, E~30
"""

import dataclasses
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
    from univs_tpu.inference.driver import EntityDriver, assemble_vis_results
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts
    from univs_tpu.utils.synth import synth_blob_video

    occupancy = "--occupancy" in sys.argv
    cfg = UniVSConfig(dtype="bfloat16")
    if occupancy:
        # same admission flooring as tools/bench_occupancy.py: fill the
        # pool toward capacity so drain/fetch/assemble run at E~30
        cfg = dataclasses.replace(
            cfg,
            inference=dataclasses.replace(
                cfg.inference,
                apply_cls_thres=0.0,
                newly_entity_thres=2.0,
                consistency_thres=(0.0, 0.0),
                nms_thres=1.5,
            ),
        )
    model = UniVSModel(cfg)
    T = cfg.inference.num_frames
    h, w = 640, 960
    K = 40
    V = 30
    # EXACT bench.py rng stream (frames draw -> cls_emb -> video) so the
    # same 1 entity is admitted and the drain path carries real bytes
    rng = np.random.RandomState(0)
    frames_draw = rng.rand(10, h, w, 3) * 255
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    images = jnp.asarray(frames_draw[None, :T], jnp.float32)

    @jax.jit
    def init_fn(r, images, fi):
        return model.init({"params": r}, images, fi, task="detection",
                          text_prompts=tp, cls_emb=cls_emb)

    params = init_fn(jax.random.PRNGKey(0), images, jnp.arange(T)[None])["params"]
    video = (synth_blob_video(V, h, w, n_blobs=24, seed=0) if occupancy
             else np.asarray(rng.rand(V, h, w, 3) * 255, np.uint8))
    driver = EntityDriver(cfg, params, num_classes=K,
                          capacity=cfg.inference.max_num_instances)
    log("warm-up...")
    driver.run_vis(video, cls_emb)
    log("warm-up done")

    hd = driver.start_vis(jax.device_put(video), cls_emb, next_frames=video)
    for it in range(3):
        t0 = time.perf_counter()
        hd_next = driver.start_vis(hd["next_frames_device"], cls_emb,
                                   next_frames=video)
        t1 = time.perf_counter()
        # --- finish_vis split open ---
        sizes = hd["sizes"]
        ts = time.perf_counter()
        valid = np.asarray(hd["pool"].valid)
        t2 = time.perf_counter()
        driver._queue_drain(hd, packed_sizes=sizes)
        t3 = time.perf_counter()
        fetched = driver._fetch(hd)
        t4 = time.perf_counter()
        emitted, emit_starts, emit_scores, _, pool, entity_rows = fetched
        results = assemble_vis_results(
            emitted, emit_starts, emit_scores, np.asarray(pool.valid),
            np.asarray(pool.quality_sum), hd["V"], sizes[0], sizes[1],
            sizes[2], packed_width=sizes[1][1], entity_rows=entity_rows)
        t5 = time.perf_counter()
        hd = hd_next
        log(f"iter {it}: start_vis {1e3*(t1-t0):6.0f} ms | valid-sync "
            f"{1e3*(t2-ts):6.0f} | pack {1e3*(t3-t2):6.0f} | fetch "
            f"{1e3*(t4-t3):6.0f} | assemble {1e3*(t5-t4):6.0f} | total "
            f"{1e3*(t5-t0):6.0f} ms ({len(results)} entities)")
    driver.finish_vis(hd)


if __name__ == "__main__":
    main()
