"""Train-step coverage for all three task families (detection / sot /
grounding) on the tiny model over the 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univs_tpu.config import TrainConfig, tiny_test_config
from univs_tpu.losses.criterion import TrainTargets
from univs_tpu.models.univs import UniVSModel
from univs_tpu.parallel.mesh import make_mesh
from univs_tpu.parallel.train_state import TrainBatch, create_train_state, make_train_step
from univs_tpu.structures import TextPrompts


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config().replace(
        train=TrainConfig(num_points=32, oversample_ratio=2.0),
    )
    model = UniVSModel(cfg)
    B, T, H, W = 2, 2, 64, 96
    N, K = 3, 4
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, T, H, W, 3) * 255, jnp.float32)
    fi = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(
        embs=jnp.broadcast_to(cls_emb[None, :, None, :], (B, K, 1, cls_emb.shape[-1])),
        valid=jnp.ones((B, K), bool),
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        images, fi, task="detection", text_prompts=tp, cls_emb=cls_emb, train=True,
    )["params"]
    targets = TrainTargets(
        labels=jnp.asarray(rng.randint(1, K + 1, (B, N)), jnp.int32),
        ids=jnp.broadcast_to(jnp.arange(N)[None, :, None], (B, N, T)).astype(jnp.int32),
        masks=jnp.asarray(rng.rand(B, N, T, H // 4, W // 4) > 0.7, jnp.float32),
        valid=jnp.ones((B, N), bool),
        prompt_obj_ids=jnp.broadcast_to(jnp.arange(N)[None], (B, N)).astype(jnp.int32),
    )
    return cfg, model, params, images, fi, targets, cls_emb


def _run(cfg, model, params, batch, task):
    mesh = make_mesh(jax.devices()[:2])
    # the train step donates the state; keep the shared fixture intact
    state = create_train_state(cfg, jax.tree.map(jnp.copy, params))
    step = make_train_step(cfg, model, mesh, task=task)
    with mesh:
        state, logged = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(logged["total_loss"])), logged["total_loss"]
    return logged


def test_train_step_grounding(setup):
    cfg, model, params, images, fi, targets, cls_emb = setup
    B, N = targets.valid.shape
    rng = np.random.RandomState(1)
    L = 1 + 7
    batch = TrainBatch(
        images=images, frame_indices=fi, targets=targets,
        exp_embs=jnp.asarray(rng.randn(B, N, L, cls_emb.shape[-1]), jnp.float32),
        exp_valid=jnp.ones((B, N), bool),
    )
    logged = _run(cfg, model, params, batch, "grounding")
    assert "loss_l2v_attn_weight_0" in logged  # per-level keys now


def test_train_step_sot(setup):
    cfg, model, params, images, fi, targets, cls_emb = setup
    batch = TrainBatch(images=images, frame_indices=fi, targets=targets)
    logged = _run(cfg, model, params, batch, "sot")
    assert any(k.startswith("loss_mask") for k in logged)


def test_remat_heads_is_semantically_identity(setup):
    """remat_heads + swin-style checkpointing must not change the loss
    (jax.checkpoint recomputes, never re-randomizes: the shuffle rng
    stream is preserved by the lifted transform)."""
    import dataclasses

    cfg, model, params, images, fi, targets, cls_emb = setup
    B, N = targets.valid.shape
    K = cls_emb.shape[0]
    tp = TextPrompts(
        embs=jnp.broadcast_to(cls_emb[None, :, None, :], (B, K, 1, cls_emb.shape[-1])),
        valid=jnp.ones((B, K), bool),
    )

    def loss(cfg_v):
        m = UniVSModel(cfg_v)
        out = m.apply(
            {"params": params}, images, fi, task="detection",
            text_prompts=tp, cls_emb=cls_emb, train=True,
            rngs={"shuffle": jax.random.PRNGKey(3), "prompt": jax.random.PRNGKey(4)},
        )
        return float(jnp.sum(out["pred_masks"].astype(jnp.float32)) +
                     jnp.sum(out["pred_logits"].astype(jnp.float32)))

    base = loss(cfg)
    cfg_r = cfg.replace(decoder=dataclasses.replace(cfg.decoder, remat_heads=True))
    rem = loss(cfg_r)
    assert np.isclose(base, rem, rtol=1e-5), (base, rem)


def test_train_step_boxvis_teacher_pseudo_masks(setup):
    """Box-only targets + EMA teacher: the projection loss replaces the
    point-sampled mask loss, and the teacher pseudo-mask CE+dice is
    produced and finite (reference: video_criterion.py:242-306 +
    univs_prompt.py:395-401)."""
    import dataclasses

    cfg, model, params, images, fi, targets, cls_emb = setup
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, boxvis_enabled=True, boxvis_ema_enabled=True,
            # random-init teacher confidences are tiny; gate at 0 so the
            # pseudo CE+dice path is exercised
            pseudo_score_thresh=0.0,
        )
    )
    B, N = targets.valid.shape
    T = targets.masks.shape[2]
    h, w = targets.masks.shape[-2:]
    # box-region masks (axis-aligned rectangles), as BoxVIS provides
    rng = np.random.RandomState(7)
    boxes = np.zeros((B, N, T, h, w), np.float32)
    for b in range(B):
        for n in range(N):
            y0, x0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
            boxes[b, n, :, y0 : y0 + h // 2, x0 : x0 + w // 2] = 1.0
    # prompt slots: one per target + one negative pad (as the detection
    # train path builds them — see __graft_entry__.dryrun_multichip)
    Qp = N + 1
    prompt_embs = jnp.concatenate(
        [cls_emb[targets.labels - 1],
         jnp.broadcast_to(cls_emb[:1][None], (B, 1, cls_emb.shape[-1]))], axis=1,
    )
    poi = jnp.concatenate(
        [jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N)),
         jnp.full((B, 1), -1, jnp.int32)], axis=1,
    )
    targets_box = dataclasses.replace(
        targets, masks=jnp.asarray(boxes), prompt_obj_ids=poi
    )

    K = cls_emb.shape[0]
    batch = TrainBatch(
        images=images, frame_indices=fi, targets=targets_box,
        prompt_category_embs=prompt_embs,
        prompt_category_valid=jnp.ones((B, Qp), bool),
        category_bank=cls_emb,
        category_bank_valid=jnp.ones((K,), bool),
    )
    logged = _run(cfg, model, params, batch, "detection")
    assert "loss_mask_proj" in logged and np.isfinite(float(logged["loss_mask_proj"]))
    assert "loss_mask" in logged and np.isfinite(float(logged["loss_mask"]))
    assert "loss_dice" in logged and np.isfinite(float(logged["loss_dice"]))
