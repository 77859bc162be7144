"""Fast-VIS driver, image postprocessing, semantic extraction tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univs_tpu.config import InferenceConfig, tiny_test_config
from univs_tpu.inference.fast_vis import (
    FastVISDriver,
    SemanticExtractionDriver,
    match_from_embds,
)
from univs_tpu.inference.image import (
    instance_inference,
    panoptic_inference,
    semantic_inference,
)
from univs_tpu.models.univs import UniVSModel
from univs_tpu.structures import TextPrompts


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config().replace(
        inference=InferenceConfig(num_frames=2, clip_stride=1, num_frames_window=4)
    )
    model = UniVSModel(cfg)
    rng = np.random.RandomState(0)
    K = 5
    images = jnp.asarray(rng.rand(1, 2, 64, 96, 3) * 255, jnp.float32)
    cls_bank = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_bank[None, :, None, :], valid=jnp.ones((1, K), bool))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, images, jnp.arange(2)[None],
        task="detection", text_prompts=tp, cls_emb=cls_bank,
    )["params"]
    return cfg, params, cls_bank


def test_match_from_embds_permutation():
    e = jnp.eye(4, 8)
    perm = np.asarray(match_from_embds(e, e[::-1]))
    assert perm.tolist() == [3, 2, 1, 0]


def test_fast_vis_driver(setup):
    cfg, params, cls_bank = setup
    frames = np.random.RandomState(1).rand(5, 64, 96, 3).astype(np.float32) * 255
    driver = FastVISDriver(cfg, params)
    results = driver.run(frames, cls_bank, topk=4)
    assert len(results) == 4
    assert results[0]["mask_logits"].shape == (5, 16, 24)
    assert np.isfinite(results[0]["mask_logits"]).all()


def test_image_postprocess():
    """Exact-law image heads (univs_tpu/inference/image.py): rows =
    num_queries learnable + K prompt queries, K=3 classes."""
    rng = np.random.RandomState(0)
    Ql, K = 4, 3
    logits = rng.rand(Ql + K, K).astype(np.float32)
    masks = rng.randn(Ql + K, 16, 16).astype(np.float32) * 4

    inst = instance_inference(logits, masks, Ql, thing_contiguous_ids=[0, 2], topk=5)
    assert 0 < len(inst) <= 5 and {"category_id", "score", "mask"} <= set(inst[0])
    assert all(r["category_id"] in (0, 2) for r in inst)

    sem = semantic_inference(logits, masks, Ql)
    assert sem.shape == (K, 16, 16)
    assert np.isfinite(sem).all()

    pan, infos = panoptic_inference(
        logits, masks, Ql, thing_contiguous_ids={0, 2}, object_mask_threshold=0.1
    )
    assert pan.shape == (16, 16)
    assert all({"id", "isthing", "category_id"} <= set(i) for i in infos)
    # ids painted in the map appear in segments_info and vice versa
    painted = set(np.unique(pan)) - {0}
    assert painted == {i["id"] for i in infos} or len(infos) >= len(painted)


def test_semantic_extraction(setup):
    cfg, params, cls_bank = setup
    frames = np.random.RandomState(2).rand(3, 64, 96, 3).astype(np.float32) * 255
    driver = SemanticExtractionDriver(cfg, params)
    toks, mfs = driver.run(frames, cls_bank)
    assert toks.shape == (3, cfg.decoder.hidden_dim, cfg.decoder.num_queries)
    assert mfs.shape == (3, 2, 3, cfg.pixel_decoder.mask_dim)
    assert np.isfinite(toks).all()


def test_fast_vps_driver(setup):
    from univs_tpu.inference.fast_vis import FastVPSDriver

    cfg, params, cls_bank = setup
    frames = np.random.RandomState(3).rand(4, 64, 96, 3).astype(np.float32) * 255
    driver = FastVPSDriver(cfg, params)
    pan, infos = driver.run_vps(frames, cls_bank, thing_class_ids={1, 2}, object_thres=0.0)
    assert pan.shape == (4, 16, 24)
    assert all({"id", "isthing", "category_id"} <= set(i) for i in infos)
    assert pan.max() <= len(infos)


def test_semantic_feature_to_mask_roundtrip(setup):
    """The saved-feature consumer (semantic_feature_to_mask.py:30-150)
    reconstructs EXACTLY the decoder's own masks at the compressed
    resolution: the mask einsum is linear in the mask features, so
    einsum(membed, avgpool8(mf)) == avgpool8(einsum(membed, mf))."""
    from univs_tpu.inference.fast_vis import semantic_features_to_masks
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts

    cfg, params, cls_bank = setup
    rng = np.random.RandomState(7)
    frames = rng.rand(2, 64, 96, 3).astype(np.float32) * 255
    driver = SemanticExtractionDriver(cfg, params)
    toks, mfs = driver.run(frames, cls_bank)

    cls_logits, mask_logits, keep = semantic_features_to_masks(
        cfg, params, toks, mfs, cls_bank, only_high_conf_masks=False,
    )
    Q = cfg.decoder.num_queries
    assert mask_logits.shape[:2] == (Q, 2) and len(keep) == Q

    # direct decoder forward on the same clip -> avg-pool8 its masks
    model = UniVSModel(cfg)
    tp = TextPrompts(
        embs=cls_bank[None, :, None, :], valid=jnp.ones((1, 5), bool)
    )
    out = model.apply(
        {"params": params}, jnp.asarray(frames[None]), jnp.arange(2)[None],
        task="detection", text_prompts=tp, cls_emb=cls_bank,
    )
    direct = np.asarray(out["pred_masks"][0, :Q], np.float32)  # [Q, T, H4, W4]
    t_, h4, w4 = direct.shape[1:]
    pooled = direct.reshape(Q, t_, h4 // 8, 8, w4 // 8, 8).mean(axis=(3, 5))
    np.testing.assert_allclose(mask_logits, pooled, atol=2e-4, rtol=1e-3)

    # high-conf filtering returns a subset with the same rows
    cls_f, masks_f, keep_f = semantic_features_to_masks(
        cfg, params, toks, mfs, cls_bank, apply_cls_thres=-1.0,
        apply_mask_quality_thres=-1.0, cls_start=0, temporal_stride=1,
    )
    assert len(keep_f) == Q  # thresholds at -1 keep everything
    np.testing.assert_allclose(masks_f, mask_logits, atol=1e-6)
