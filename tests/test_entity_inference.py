"""End-to-end entity clip-step test: two clips through the tiny model,
memory pool admission + tracking + prompt re-encoding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univs_tpu.config import tiny_test_config
from univs_tpu.inference import memory_pool as mp
from univs_tpu.inference.entity import EntityClipConfig, entity_clip_step
from univs_tpu.models.univs import UniVSModel
from univs_tpu.structures import TextPrompts


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    model = UniVSModel(cfg)
    T, H, W = 2, 64, 96
    K = 5
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, T, H, W, 3) * 255, jnp.float32)
    fi = jnp.arange(T)[None]
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, images, fi,
        task="detection", text_prompts=tp, cls_emb=cls_emb,
    )
    return cfg, model, variables["params"], images, cls_emb


def test_two_clip_steps(setup):
    cfg, model, params, images, cls_emb = setup
    T, H, W = 2, 64, 96
    E, R = 6, 8
    cc = EntityClipConfig(
        num_queries=cfg.decoder.num_queries, topk_candidates=4,
        num_prev_frames_memory=3, apply_cls_thres=0.0, newly_thres=0.1,
        consistency_thres=-1.0,  # accept everything (random weights)
        num_dense_points=R, clip_stride=1, num_frames=T,
    )
    pool = mp.create_entity_memory(
        E, cls_emb.shape[0], cfg.decoder.hidden_dim, (16, 24),
        window=6, num_prompt_points=R, embd_history=4, prompt_history=4,
    )

    from univs_tpu.models.univs import build_decoder, build_pixel_decoder

    modules = (build_pixel_decoder(cfg), build_decoder(cfg))

    # per-frame encoded features (backbone + pixel decoder)
    bb = model.apply(
        {"params": params}, images.reshape(T, 64, 96, 3),
        method=lambda m, y: m.backbone(m.normalize(y)),
    )
    mf, _, _, ms = modules[0].apply({"params": params["pixel_decoder"]}, bb)
    feats = (mf, tuple(ms))
    # This test doubles as a regression probe for the tracer-leak class
    # of "Execution supplied N buffers but compiled program expected M"
    # failures: a module-level `jnp.float32(...)` constant created while
    # the module was first imported INSIDE another trace (hungarian.py's
    # old _INF) leaked that trace's tracer into every later jaxpr's
    # constants, and the SECOND dispatch of any overlapping jit died.
    # Two separate dispatches of this step after the engine tests ran
    # reproduce that history.
    step = jax.jit(
        lambda params, feats, pool, fi, off, first, cls_emb: entity_clip_step(
            modules, params, feats, pool, fi, off, first, cls_emb, cc
        )
    )

    pool1, emit1 = step(params, feats, pool, jnp.arange(T), jnp.int32(0), jnp.bool_(True), cls_emb)
    n1 = int(pool1.valid.sum())
    assert n1 > 0, "first clip must admit entities (cls threshold 0)"
    assert bool(jnp.isfinite(pool1.mask_logits).all())
    # reference sampler order: prompts are encoded at the START of each
    # clip step, so entities admitted in clip 1 get their prompt sets at
    # clip 2 (the reference zero-pads newly entities' prompt tensors and
    # fills them at the next clip's update loop)
    assert not bool(pool1.prompt_valid.any())

    pool1 = mp.shift_clip(pool1, stride=1)
    pool2, emit2 = step(params, feats, pool1, jnp.arange(1, T + 1), jnp.int32(1), jnp.bool_(False), cls_emb)
    assert int(pool2.valid.sum()) >= n1
    assert bool(jnp.isfinite(pool2.mask_logits).all())
    assert bool(pool2.prompt_valid.any()), "clip 2 re-encodes committed frames"
    # first-appearance kv stays EMPTY for detection-discovered entities:
    # the reference zero-pads newly entities' prompt tensors
    # (write_newly_entities:864-876) and later update loops never cover
    # the admission frame again — only VOS/sot GT-injected objects get a
    # first-appearance set
    assert not bool(pool2.first_valid.any())
    # logits running mean has counted clips
    assert float(pool2.logits_count.max()) >= 1
    # occurrences accumulated within the window
    assert float(pool2.occurrence.sum()) > 0


def test_detect_newly_interval_frames(setup):
    """DETECT_NEWLY_INTERVAL_FRAMES (inference_video_entity.py:366):
    newly-entity admission runs only every k-th clip — except the pool
    is empty, which always admits."""
    cfg, model, params, images, cls_emb = setup
    T = 2
    E, R = 6, 8
    cc = EntityClipConfig(
        num_queries=cfg.decoder.num_queries, topk_candidates=4,
        num_prev_frames_memory=3, apply_cls_thres=0.0, newly_thres=0.1,
        consistency_thres=-1.0, num_dense_points=R, clip_stride=1,
        num_frames=T, detect_newly_interval_frames=2,
    )
    pool = mp.create_entity_memory(
        E, cls_emb.shape[0], cfg.decoder.hidden_dim, (16, 24),
        window=6, num_prompt_points=R, embd_history=4, prompt_history=4,
    )
    from univs_tpu.models.univs import build_decoder, build_pixel_decoder

    modules = (build_pixel_decoder(cfg), build_decoder(cfg))
    bb = model.apply(
        {"params": params}, images.reshape(T, 64, 96, 3),
        method=lambda m, y: m.backbone(m.normalize(y)),
    )
    mf, _, _, ms = modules[0].apply({"params": params["pixel_decoder"]}, bb)
    feats = (mf, tuple(ms))
    step = jax.jit(
        lambda params, feats, pool, fi, off, first, cls_emb: entity_clip_step(
            modules, params, feats, pool, fi, off, first, cls_emb, cc
        )
    )
    # clip 0 (index 0 % 2 == 0, and pool empty): admits
    pool1, _ = step(params, feats, pool, jnp.arange(T), jnp.int32(0),
                    jnp.bool_(True), cls_emb)
    n1 = int(pool1.valid.sum())
    assert n1 > 0
    # clip 1 (index 1 % 2 != 0, pool non-empty): NO new admissions; the
    # prompt-query tracking update still runs (occurrence accumulates)
    pool1s = mp.shift_clip(pool1, stride=1)
    pool2, _ = step(params, feats, pool1s, jnp.arange(1, T + 1), jnp.int32(1),
                    jnp.bool_(False), cls_emb)
    assert int(pool2.valid.sum()) == n1
    # clip 2 (index 2 % 2 == 0): admission active again — pool state
    # after the gate equals a full detect step (>= previous count)
    pool2s = mp.shift_clip(pool2, stride=1)
    pool3, _ = step(params, feats, pool2s, jnp.arange(2, T + 2), jnp.int32(2),
                    jnp.bool_(False), cls_emb)
    assert int(pool3.valid.sum()) >= n1
