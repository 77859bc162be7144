"""HBM budget of the 1024^2 Swin train step, with/without remat.

Compiles (AOT, no execution) the full detection train step at the
stage-2 Swin input size (1024x1024, T=2) and prints XLA's
memory_analysis — the documented HBM budget for
cfg.backbone.swin_use_checkpoint + cfg.decoder.remat_heads
(VERDICT r1 item 9).  Uses a width-reduced Swin so the compile stays
fast; the ACTIVATION memory (what remat targets) scales the same way.

Run: PYTHONPATH=/root/repo python tools/probe_remat_memory.py
"""

from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def build(remat: bool):
    from univs_tpu.config import (
        BackboneConfig,
        DecoderConfig,
        PixelDecoderConfig,
        PromptConfig,
        TrainConfig,
        UniVSConfig,
    )

    return UniVSConfig(
        backbone=BackboneConfig(
            name="swin_tiny", swin_embed_dim=32, swin_depths=(2, 2, 2, 2),
            swin_num_heads=(2, 4, 8, 16), swin_use_checkpoint=remat,
        ),
        pixel_decoder=PixelDecoderConfig(
            hidden_dim=64, num_layers=2, num_heads=4, num_points=4, ffn_dim=128, mask_dim=64
        ),
        decoder=DecoderConfig(
            hidden_dim=64, num_queries=50, num_layers=9, num_heads=4, ffn_dim=128,
            mask_dim=64, clip_cls_emb_dim=64, num_classes=40, lang_dim=64,
            remat_heads=remat,
        ),
        prompt=PromptConfig(num_dense_points_train=4, num_dense_points_test=8,
                            num_max_instances=4, num_max_instances_test=6),
        num_frames=2,
        dtype="bfloat16",
        train=TrainConfig(num_points=1024),
    )


def main():
    import jax
    import jax.numpy as jnp

    from univs_tpu.losses.criterion import TrainTargets
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.parallel.mesh import make_mesh
    from univs_tpu.parallel.train_state import TrainBatch, create_train_state, make_train_step

    S = 1024
    B, T, N, K = 1, 2, 4, 40
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, T, S, S, 3) * 255, jnp.float32)
    fi = jnp.broadcast_to(jnp.arange(T)[None], (B, T))

    for remat in (False, True):
        cfg = build(remat)
        model = UniVSModel(cfg)
        cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
        from univs_tpu.structures import TextPrompts

        tp = TextPrompts(
            embs=jnp.broadcast_to(cls_emb[None, :, None, :], (B, K, 1, cls_emb.shape[-1])),
            valid=jnp.ones((B, K), bool),
        )
        params = model.init(
            {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
            images, fi, task="detection", text_prompts=tp, cls_emb=cls_emb, train=True,
        )["params"]
        Qp = N + 1
        labels = jnp.asarray(rng.randint(1, K + 1, (B, N)), jnp.int32)
        targets = TrainTargets(
            labels=labels,
            ids=jnp.broadcast_to(jnp.arange(N)[None, :, None], (B, N, T)).astype(jnp.int32),
            masks=jnp.asarray(rng.rand(B, N, T, S // 4, S // 4) > 0.7, jnp.float32),
            valid=jnp.ones((B, N), bool),
            prompt_obj_ids=jnp.concatenate(
                [jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N)),
                 jnp.full((B, 1), -1, jnp.int32)], axis=1),
        )
        batch = TrainBatch(
            images=images, frame_indices=fi, targets=targets,
            prompt_category_embs=jnp.concatenate(
                [cls_emb[labels - 1],
                 jnp.broadcast_to(cls_emb[:1][None], (B, 1, cls_emb.shape[-1]))], axis=1),
            prompt_category_valid=jnp.ones((B, Qp), bool),
            category_bank=cls_emb,
            category_bank_valid=jnp.ones((K,), bool),
        )
        mesh = make_mesh(jax.devices()[:1])
        state = create_train_state(cfg, params)
        step = make_train_step(cfg, model, mesh, task="detection")
        with mesh:
            lowered = jax.jit(step).lower(state, batch, jax.random.PRNGKey(42))
            compiled = lowered.compile()
        try:
            ma = compiled.memory_analysis()
            print(
                f"remat={remat}: temp={ma.temp_size_in_bytes/2**20:.0f}MiB "
                f"args={ma.argument_size_in_bytes/2**20:.0f}MiB "
                f"out={ma.output_size_in_bytes/2**20:.0f}MiB "
                f"total(temp+args)={(ma.temp_size_in_bytes+ma.argument_size_in_bytes)/2**20:.0f}MiB",
                flush=True,
            )
        except Exception as e:
            print(f"remat={remat}: memory_analysis unavailable: {e}", flush=True)


if __name__ == "__main__":
    main()
