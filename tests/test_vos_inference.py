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

    # learn / prompt+learn back-end re-ID variants share the same step
    for mode in ("learn", "prompt+learn"):
        step_m = jax.jit(
            lambda params, feats, pool, fi, off, cls_emb: vos_clip_step(
                modules, params, feats, pool, fi, off, cls_emb, cc, query_mode=mode,
            )
        )
        pool_m, aux_m = step_m(sub, feats, pool1, jnp.arange(1, T + 1), jnp.int32(1), cls_emb)
        assert bool(jnp.isfinite(pool_m.mask_logits).all()), mode
        assert bool(jnp.isfinite(aux_m["sim"]).all()), mode


def test_grounding_prev_visual_prompts_flag():
    """ENABLED_PREV_VISUAL_PROMPTS_FOR_GROUNDING (decoder_univs.py:736-748):
    with the flag on, a committed memory pool's visual prompt kv is
    concatenated ahead of the text kv and changes the RefVOS outputs."""
    cfg = tiny_test_config()
    T, H, W = 2, 64, 96
    N, R = 2, 8
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(1, T, H, W, 3) * 255, jnp.float32)
    fi0 = jnp.arange(T)[None]
    Dt = cfg.decoder.clip_cls_emb_dim
    L = 4  # sentence + 3 word tokens
    text_embs = jnp.asarray(rng.randn(1, N, L, Dt), jnp.float32)
    tp = TextPrompts(embs=text_embs, valid=jnp.ones((1, N), bool))
    cls_emb = jnp.asarray(rng.randn(3, Dt), jnp.float32)

    model = UniVSModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, images, fi0,
        task="grounding", text_prompts=tp, cls_emb=cls_emb,
    )["params"]
    modules = (build_pixel_decoder(cfg), build_decoder(cfg))
    bb = model.apply(
        {"params": params}, images.reshape(T, H, W, 3),
        method=lambda m, y: m.backbone(m.normalize(y)),
    )
    mf, _, _, ms = modules[0].apply({"params": params["pixel_decoder"]}, bb)
    feats = (mf, tuple(ms))
    sub = {"pixel_decoder": params["pixel_decoder"], "decoder": params["decoder"]}

    def make_pool():
        pool = mp.create_entity_memory(
            N, 3, cfg.decoder.hidden_dim, (16, 24), window=6,
            num_prompt_points=R, embd_history=4, prompt_history=4,
        )
        # commit pseudo-GT masks (as the first grounding clip would)
        logits = np.full((N, 6, 16, 24), -10.0, np.float32)
        logits[0, 0, 2:8, 2:10] = 10.0
        logits[1, 0, 9:14, 12:20] = 10.0
        return pool.replace(
            mask_logits=jnp.asarray(logits),
            valid=jnp.ones((N,), bool),
            first_appear=jnp.zeros((N,), jnp.int32),
            occurrence=jnp.asarray((logits > 0).any((-2, -1)), jnp.float32),
        )

    outs = {}
    for flag in (False, True):
        cc = EntityClipConfig(
            num_queries=cfg.decoder.num_queries, num_prev_frames_memory=3,
            num_dense_points=R, clip_stride=1, num_frames=T,
            prev_visual_prompts_for_grounding=flag,
        )
        step = jax.jit(
            lambda params, feats, pool, fi, off, cls_emb, cc=cc: vos_clip_step(
                modules, params, feats, pool, fi, off, cls_emb, cc,
                text_prompts=tp, task="grounding",
            )
        )
        pool_o, aux = step(sub, feats, make_pool(), jnp.arange(T), jnp.int32(0), cls_emb)
        assert bool(jnp.isfinite(pool_o.mask_logits).all()), flag
        outs[flag] = np.asarray(pool_o.mask_logits, np.float32)
    # the concatenated visual kv must actually influence the decode
    assert not np.allclose(outs[False], outs[True])


def test_match_learn_first_appear_picks_best_query():
    from univs_tpu.inference.vos import match_learn_first_appear

    Q, T, H, W = 6, 2, 16, 24
    masks_l = np.full((Q, T, H, W), -10.0, np.float32)
    gt = np.zeros((2, H, W), np.float32)
    gt[0, 2:8, 2:10] = 1
    gt[1, 9:14, 12:20] = 1
    # query 4 matches object 0 exactly at frame 0; query 1 overlaps worse
    masks_l[4, 0, 2:8, 2:10] = 10.0
    masks_l[1, 0, 2:9, 2:12] = 10.0
    # query 2 matches object 1 at frame 1
    masks_l[2, 1, 9:14, 12:20] = 10.0
    idx = match_learn_first_appear(
        jnp.asarray(masks_l), jnp.asarray(gt), jnp.array([0, 1]), topk=3
    )
    assert int(idx[0]) == 4
    assert int(idx[1]) == 2


def test_match_learn_appeared_hungarian():
    from univs_tpu.inference.vos import match_learn_appeared

    N, Q, T, C = 3, 8, 2, 16
    rng = np.random.RandomState(0)
    pool = mp.create_entity_memory(
        N, 5, C, (4, 6), window=4, num_prompt_points=4, embd_history=4, prompt_history=4,
    )
    tgt = rng.randn(N, C).astype(np.float32)
    embds = np.zeros((N, 4, C), np.float32)
    embds[:, -1] = tgt  # only most recent frame populated
    pool = pool.replace(embds=jnp.asarray(embds), valid=jnp.array([True, True, False]))
    # learnable queries: slots 0/1 live at query indices 5/2
    cur = rng.randn(Q, T, C).astype(np.float32)
    cur[5] = tgt[0]
    cur[2] = tgt[1]
    slot2cand, sim = match_learn_appeared(pool, jnp.asarray(cur), num_prev=3)
    assert int(slot2cand[0]) == 5
    assert int(slot2cand[1]) == 2
    assert float(sim[0]) > 0.9 and float(sim[1]) > 0.9
    assert int(slot2cand[2]) == -1 and float(sim[2]) == 0.0
