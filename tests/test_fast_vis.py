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
