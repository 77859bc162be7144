"""Benchmark: flagship UniVS-R50 category-guided video segmentation FPS.

Measures frames/sec of the jitted per-clip forward (backbone + pixel
decoder + UniVS decoder with 40 category prompts) on 5-frame clips at
640x960 — the reference's VIS inference configuration
(reference: tools/test/test_r50.sh: MIN_SIZE_TEST 640, T=5 clips).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is FPS relative to an A100 estimate of the reference
pipeline (~10 FPS for R50 VIS at 640p — no official number exists;
BASELINE.md notes the repo publishes none).
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_REFERENCE_FPS_ESTIMATE = 10.0


def main():
    import jax
    import jax.numpy as jnp

    from univs_tpu.config import UniVSConfig
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)

    cfg = UniVSConfig(dtype="bfloat16" if on_tpu else "float32")
    model = UniVSModel(cfg)

    b, t = 1, cfg.inference.num_frames
    h, w = (640, 960) if on_tpu else (128, 192)
    K = 40
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, t, h, w, 3) * 255, jnp.float32)
    frame_indices = jnp.arange(t)[None]
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((b, K), bool))

    # jit the init: under the axon remote-compile tunnel every eager op
    # is a compile round trip, so unjitted init takes tens of minutes
    @jax.jit
    def init_fn(rng, images, frame_indices):
        return model.init(
            {"params": rng}, images, frame_indices,
            task="detection", text_prompts=tp, cls_emb=cls_emb,
        )

    params = init_fn(jax.random.PRNGKey(0), images, frame_indices)

    @jax.jit
    def fwd(params, images):
        out = model.apply(
            params, images, frame_indices, task="detection",
            text_prompts=tp, cls_emb=cls_emb,
        )
        return out["pred_logits"], out["pred_masks"]

    # warmup / compile
    logits, masks = fwd(params, images)
    jax.block_until_ready((logits, masks))

    iters = 10 if on_tpu else 2
    start = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - start

    fps = (b * t * iters) / dt
    print(
        json.dumps(
            {
                "metric": f"UniVS-R50 VIS forward FPS ({h}x{w}, T={t}, {platform})",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / A100_REFERENCE_FPS_ESTIMATE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
