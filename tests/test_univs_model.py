"""End-to-end tiny-model tests for the UniVS meta-architecture."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univs_tpu.config import tiny_test_config
from univs_tpu.models.univs import UniVSModel
from univs_tpu.structures import TextPrompts


@pytest.fixture(scope="module")
def tiny_model_and_params():
    cfg = tiny_test_config()
    model = UniVSModel(cfg)
    b, t, h, w = 1, 2, 64, 96
    images = jnp.array(np.random.RandomState(0).rand(b, t, h, w, 3) * 255, jnp.float32)
    frame_indices = jnp.arange(t)[None]
    K = 5
    cls_emb = jnp.array(np.random.RandomState(1).randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((b, K), bool))
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        images, frame_indices, task="detection", text_prompts=tp, cls_emb=cls_emb,
    )
    return cfg, model, params, images, frame_indices, tp, cls_emb


def test_detection_forward(tiny_model_and_params):
    cfg, model, params, images, frame_indices, tp, cls_emb = tiny_model_and_params
    out = model.apply(
        params, images, frame_indices, task="detection", text_prompts=tp, cls_emb=cls_emb
    )
    Q = cfg.decoder.num_queries + 5
    assert out["pred_logits"].shape == (1, Q, 5)
    assert out["pred_masks"].shape == (1, Q, 2, 16, 24)
    assert out["aux_outputs"] == []  # aux only materialized at train
    assert bool(jnp.isfinite(out["pred_masks"]).all())


def test_sot_training_forward_with_gt_prompts(tiny_model_and_params):
    cfg, model, params, images, frame_indices, tp, cls_emb = tiny_model_and_params
    b, t = 1, 2
    Qp = cfg.prompt.num_max_instances
    rng = np.random.RandomState(3)
    gt_masks = jnp.array(rng.rand(b, Qp, t, 16, 24) > 0.7, jnp.float32)
    from univs_tpu.ops.mask_ops import masks_to_boxes

    boxes_px = masks_to_boxes(gt_masks)  # [b, Qp, t, 4] in pixels of 16x24
    norm = jnp.array([24.0, 16.0, 24.0, 16.0])
    gt_boxes = boxes_px / norm
    gt_occur = jnp.ones((b, Qp, t), bool)
    gt_obj_valid = jnp.array([[True, True, True, False]])
    out = model.apply(
        params, images, frame_indices, task="sot", cls_emb=cls_emb,
        gt_masks=gt_masks, gt_boxes=gt_boxes, gt_occur=gt_occur,
        gt_obj_valid=gt_obj_valid, train=True,
        rngs={"prompt": jax.random.PRNGKey(1), "shuffle": jax.random.PRNGKey(2)},
    )
    Q = cfg.decoder.num_queries + Qp
    assert out["pred_masks"].shape == (1, Q, t, 16, 24)
    assert bool(jnp.isfinite(out["pred_masks"]).all())
    assert out["prompt_valid"].shape == (1, Qp)


def test_forward_is_jittable(tiny_model_and_params):
    cfg, model, params, images, frame_indices, tp, cls_emb = tiny_model_and_params

    @jax.jit
    def fwd(params, images):
        return model.apply(
            params, images, frame_indices, task="detection", text_prompts=tp, cls_emb=cls_emb
        )["pred_masks"]

    m1 = fwd(params, images)
    m2 = fwd(params, images + 1.0)
    assert m1.shape == m2.shape
