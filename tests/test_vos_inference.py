"""VOS clip-step test: GT injection + re-segmentation + pool updates."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univs_tpu.config import tiny_test_config
from univs_tpu.inference import memory_pool as mp
from univs_tpu.inference.entity import EntityClipConfig
from univs_tpu.inference.vos import inject_gt_first_appearance, vos_clip_step
from univs_tpu.models.univs import UniVSModel, build_decoder, build_pixel_decoder
from univs_tpu.structures import TextPrompts


def test_vos_two_clips():
    cfg = tiny_test_config()
    model = UniVSModel(cfg)
    T, H, W = 2, 64, 96
    N, R = 3, 8
    K = 5
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, T, H, W, 3) * 255, jnp.float32)
    fi0 = jnp.arange(T)[None]
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, images, fi0,
        task="detection", text_prompts=tp, cls_emb=cls_emb,
    )["params"]

    cc = EntityClipConfig(
        num_queries=cfg.decoder.num_queries, num_prev_frames_memory=3,
        num_dense_points=R, clip_stride=1, num_frames=T,
    )
    pool = mp.create_entity_memory(
        N, K, cfg.decoder.hidden_dim, (16, 24), window=6,
        num_prompt_points=R, embd_history=4, prompt_history=4,
    )

    # GT: two objects appear at frame 0, one at frame 1
    gt = np.zeros((N, T, 16, 24), np.float32)
    gt[0, 0, 2:8, 2:10] = 1
    gt[1, 0, 9:14, 12:20] = 1
    gt[2, 1, 1:5, 15:22] = 1
    faf = jnp.array([0, 0, 1])
    obj_valid = jnp.ones((N,), bool)

    pool = inject_gt_first_appearance(
        pool, jnp.asarray(gt), faf, obj_valid, jnp.arange(T), jnp.int32(0)
    )
    assert int(pool.valid.sum()) == 3
    assert float(pool.mask_logits[0, 0].max()) > 0
    assert float(pool.mask_logits[2, 1].max()) > 0

    modules = (build_pixel_decoder(cfg), build_decoder(cfg))
    bb = model.apply(
        {"params": params}, images.reshape(T, H, W, 3),
        method=lambda m, y: m.backbone(m.normalize(y)),
    )
    mf, _, _, ms = modules[0].apply({"params": params["pixel_decoder"]}, bb)
    feats = (mf, tuple(ms))

    step = jax.jit(
        lambda params, feats, pool, fi, off, cls_emb: vos_clip_step(
            modules, params, feats, pool, fi, off, cls_emb, cc,
        )
    )
    sub = {"pixel_decoder": params["pixel_decoder"], "decoder": params["decoder"]}
    pool1, aux = step(sub, feats, pool, jnp.arange(T), jnp.int32(0), cls_emb)
    assert bool(jnp.isfinite(pool1.mask_logits).all())
    assert bool(pool1.prompt_valid.any()), "prompts must be encoded from GT frame"

    pool1 = mp.shift_clip(pool1, 1)
    pool2, aux2 = step(sub, feats, pool1, jnp.arange(1, T + 1), jnp.int32(1), cls_emb)
    assert bool(jnp.isfinite(pool2.mask_logits).all())
    assert bool(jnp.isfinite(aux2["sim"]).all())
