"""Benchmark: lockstep-batched VIS serving throughput vs batch size.

Measures the FULL ``BatchedVISServer`` pipeline (frames in -> per-video
entity dicts out) at B in {1, 2, 4, 8} on the real chip, reporting
per-chip throughput (B * V / wall).  This is the measurement promised
by ``inference/serving.py``'s docstring: lockstep batching amortizes
the ~1.2 ms per-dispatch floor and the decoder's small-op overhead
(tools/probe_decode.py) across B videos.

Frames are pre-uploaded to the device before timing: steady-state
serving overlaps ingest with compute (see EntityDriver.start_vis), and
on THIS stack the axon host->device tunnel (~21-34 MB/s measured)
would otherwise dominate — 1.84 MB/frame uint8 caps ingest at ~13-18
FPS no matter the compute.  Production TPU hosts feed chips over PCIe
(tens of GB/s), so the device-side number is the one that scales; the
tunnel ceiling is documented in docs/PERFORMANCE.md.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_serving.py [B ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from univs_tpu.config import UniVSConfig
    from univs_tpu.inference.serving import BatchedVISServer
    from univs_tpu.inference.driver import assemble_vis_results
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts

    batch_sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    cfg = UniVSConfig(dtype="bfloat16" if on_tpu else "float32")
    T = cfg.inference.num_frames
    h, w = (640, 960) if on_tpu else (128, 192)
    V = 30
    K, E = 40, 40
    rng = np.random.RandomState(0)
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)

    model = UniVSModel(cfg)
    frames0 = jnp.asarray(rng.rand(1, T, h, w, 3) * 255, jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    params = jax.jit(lambda r, x, fi: model.init(
        {"params": r}, x, fi, task="detection", text_prompts=tp, cls_emb=cls_emb,
    ))(jax.random.PRNGKey(0), frames0, jnp.arange(T)[None])["params"]

    video = np.asarray(rng.rand(V, h, w, 3) * 255, np.uint8)

    rows = []
    for B in batch_sizes:
        try:
            srv = BatchedVISServer(cfg, params, num_classes=K, capacity=E,
                                   batch_size=B)
            frames_b = jax.device_put(
                jnp.asarray(np.broadcast_to(video, (B,) + video.shape)))
            lengths = [V] * B
            packed_sizes = ((h, w), (h, w), (h, w))

            def run_once():
                emitted, emit_starts, emit_scores, pool, entity_rows = \
                    srv._stream_batch(frames_b, lengths, cls_emb,
                                      packed_sizes=packed_sizes)
                out = []
                for b in range(B):
                    out.append(assemble_vis_results(
                        emitted[b], emit_starts, emit_scores[b],
                        np.asarray(pool.valid[b]),
                        np.asarray(pool.quality_sum[b]),
                        V, (h, w), (h, w), (h, w), packed_width=w,
                        entity_rows=entity_rows[b],
                    ))
                return out

            log(f"B={B}: warm-up (compile)...")
            out = run_once()
            n_ent = sum(len(o) for o in out)
            iters = 3 if on_tpu else 1
            t0 = time.perf_counter()
            for _ in range(iters):
                out = run_once()
            dt = (time.perf_counter() - t0) / iters
            fps = B * V / dt
            rows.append((B, dt, fps, n_ent))
            log(f"B={B}: {dt:.3f} s/batch = {fps:.2f} frames/s per chip "
                f"({n_ent} entities)")
        except Exception as e:  # OOM at large B is a finding, not a crash
            rows.append((B, None, None, None))
            log(f"B={B}: FAILED ({type(e).__name__}: {str(e)[:200]})")

    log("")
    log("| B | s/batch | per-chip FPS |")
    log("|---|---|---|")
    for B, dt, fps, _ in rows:
        if dt is None:
            log(f"| {B} | OOM/fail | — |")
        else:
            log(f"| {B} | {dt:.2f} | {fps:.2f} |")


if __name__ == "__main__":
    main()
