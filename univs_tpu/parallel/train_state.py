"""Training state + pjit train step (AdamW, EMA teacher, DP mesh).

Replaces the reference's Detectron2 engine pieces:
- ``build_optimizer`` — AdamW, backbone 0.1x LR, no-decay for
  norms/embeddings (reference: train_net.py:211-292);
- gradient clipping by full-model norm 0.01
  (train_net.py:262-292, configs/univs/Base.yaml:92-96);
- ``AMPTrainer`` — bf16 compute is set at the model level
  (UniVSConfig.dtype), fp32 params/optimizer here;
- EMA teacher copy (univs_prompt.py:206-216,454-489) — kept as an
  ``ema_params`` pytree updated after each step.

The train step is one jit'd SPMD program over the ("data", "model")
mesh: batch sharded on data, params replicated, XLA inserts the
gradient psum (the reference's DDP all-reduce).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from univs_tpu.config import UniVSConfig
from univs_tpu.losses.criterion import TrainTargets, UniCriterion
from univs_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    frame_sharding,
    replicated_sharding,
)
from univs_tpu.structures import TextPrompts


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any


@struct.dataclass
class TrainBatch:
    """One sharded training batch (leading axis = videos).

    For the detection task, prompt queries at train time are the
    category text-embeddings of the sampled targets padded with
    negative categories to Qp slots (reference:
    prepare_targets.py:324-385); ``targets.prompt_obj_ids`` binds each
    slot to its target (-1 for negative/padding slots).
    ``category_bank`` is the dataset's full class slice used by the
    classification head.
    """

    images: jnp.ndarray  # [B, T, H, W, 3]
    frame_indices: jnp.ndarray  # [B, T]
    targets: TrainTargets
    prompt_category_embs: Optional[jnp.ndarray] = None  # [B, Qp, Dt]
    prompt_category_valid: Optional[jnp.ndarray] = None  # [B, Qp]
    category_bank: Optional[jnp.ndarray] = None  # [K, Dt]
    category_bank_valid: Optional[jnp.ndarray] = None  # [K]
    # grounding: per-expression [sentence; words] CLIP features
    exp_embs: Optional[jnp.ndarray] = None  # [B, Qp, 1+L, Dt]
    exp_valid: Optional[jnp.ndarray] = None  # [B, Qp]


def _label_params(params) -> Any:
    """'backbone' vs 'rest' labels for LR scaling; 'no_decay' for
    norm/bias/embedding tables (train_net.py:211-292)."""

    def label(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        if "backbone" in keys[0:1]:
            return "backbone"
        return "rest"

    return jax.tree_util.tree_map_with_path(label, params)


def _decay_mask(params) -> Any:
    def mask(path, leaf):
        keys = [getattr(p, "key", "") for p in path]
        name = keys[-1] if keys else ""
        is_norm = any("norm" in k.lower() or k in ("scale", "bias", "mean", "var") for k in keys[-2:])
        is_embed = any(
            k in ("query_feat", "query_embed", "level_embed", "cls_temp", "reid_temp",
                  "prompt_detection", "prompt_sot", "prompt_grounding")
            for k in keys
        )
        return not (is_norm or is_embed or leaf.ndim <= 1)

    return jax.tree_util.tree_map_with_path(mask, params)


def _lr_schedule(c) -> optax.Schedule:
    """LR schedule family matching the reference's deeplab
    ``build_lr_scheduler`` (dispatched on SOLVER.LR_SCHEDULER_NAME).

    - multistep (reference default, WarmupMultiStepLR): linear warmup
      from ``warmup_factor * lr`` over ``warmup_iters``, then step decay
      by ``lr_gamma`` at each boundary in ``lr_steps``.
    - poly (deeplab WarmupPolyLR): lr * (1 - it/max_iter)^poly_power.
    - cosine: warmup-cosine (kept for TPU-native recipes).
    """
    if c.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=c.lr, warmup_steps=c.warmup_iters,
            decay_steps=c.max_iter, end_value=c.lr * 0.01,
        )

    def warmup(step):
        if c.warmup_iters <= 0 or c.warmup_factor >= 1.0:
            return jnp.float32(1.0)
        a = jnp.clip(step / c.warmup_iters, 0.0, 1.0)
        return c.warmup_factor * (1.0 - a) + a

    if c.lr_scheduler == "poly":
        def sched(step):
            frac = jnp.clip(1.0 - step / max(c.max_iter, 1), 0.0, 1.0)
            return c.lr * warmup(step) * frac ** c.poly_power
        return sched

    assert c.lr_scheduler == "multistep", c.lr_scheduler
    boundaries = jnp.asarray(sorted(c.lr_steps), jnp.float32) if c.lr_steps else None

    def sched(step):
        decays = (
            c.lr_gamma ** jnp.sum(step >= boundaries)
            if boundaries is not None else 1.0
        )
        return c.lr * warmup(step) * decays

    return sched


def make_optimizer(cfg: UniVSConfig, params) -> optax.GradientTransformation:
    c = cfg.train
    sched = _lr_schedule(c)

    def adamw(lr_scale):
        return optax.chain(
            optax.clip_by_global_norm(c.clip_gradients_value),
            optax.scale_by_adam(),
            optax.add_decayed_weights(c.weight_decay, mask=_decay_mask(params)),
            optax.scale_by_schedule(sched),
            optax.scale(-lr_scale),
        )

    return optax.multi_transform(
        {"backbone": adamw(c.backbone_lr_multiplier), "rest": adamw(1.0)},
        _label_params(params),
    )


def create_train_state(cfg: UniVSConfig, params) -> TrainState:
    tx = make_optimizer(cfg, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
    )


def make_train_step(
    cfg: UniVSConfig,
    model,
    mesh,
    task: str = "detection",
) -> Callable[[TrainState, TrainBatch, jax.Array], Tuple[TrainState, Dict]]:
    """Build the jit'd SPMD train step for one task family."""
    criterion = UniCriterion(cfg.train, cfg.decoder.num_queries, cfg.num_frames)
    ema_decay = cfg.train.ema_decay

    def loss_fn(params, batch: TrainBatch, rng, ema_params=None):
        r_model, r_crit, r_shuffle, r_prompt = jax.random.split(rng, 4)
        kwargs = dict(train=True)
        level_sizes = None
        if task == "detection":
            tp = TextPrompts(
                embs=batch.prompt_category_embs[:, :, None, :],
                valid=batch.prompt_category_valid,
            )
            kwargs.update(text_prompts=tp, cls_emb=batch.category_bank)
            cls_valid = batch.category_bank_valid
        elif task == "grounding":
            tp = TextPrompts(embs=batch.exp_embs, valid=batch.exp_valid)
            kwargs.update(text_prompts=tp)
            cls_valid = jnp.ones((1,), bool)
            h, w = batch.images.shape[2:4]
            level_sizes = ((h // 32, w // 32), (h // 16, w // 16), (h // 8, w // 8))
        else:  # sot: GT-driven visual prompts
            B, N = batch.targets.valid.shape
            T = batch.images.shape[1]
            kwargs.update(
                cls_emb=jnp.zeros((1, cfg.decoder.clip_cls_emb_dim)),
                gt_masks=batch.targets.masks,
                gt_boxes=_boxes_from_masks(batch.targets.masks),
                gt_occur=batch.targets.ids >= 0,
                gt_obj_valid=batch.targets.valid,
            )
            cls_valid = jnp.ones((1,), bool)

        out = model.apply(
            {"params": params}, batch.images, batch.frame_indices, task=task,
            rngs={"shuffle": r_shuffle, "prompt": r_prompt}, **kwargs,
        )
        targets = batch.targets
        if task == "sot":
            # prompt slot i <- target slot i (GT-driven sampling keeps order)
            poi = jnp.where(
                targets.valid, jnp.arange(targets.valid.shape[1])[None], -1
            )
            targets = dataclasses.replace(targets, prompt_obj_ids=poi)

        # BoxVIS EMA-teacher pseudo masks (univs_prompt.py:395-401 +
        # video_criterion.py:242-306): no-grad teacher forward, match to
        # the box targets, build soft pseudo masks + confidences
        pseudo = None
        if cfg.train.boxvis_enabled and cfg.train.boxvis_ema_enabled and ema_params is not None:
            from univs_tpu.losses.criterion import boxvis_teacher_pseudo_masks

            out_t = model.apply(
                {"params": jax.lax.stop_gradient(ema_params)},
                batch.images, batch.frame_indices, task=task,
                rngs={"shuffle": r_model, "prompt": r_prompt}, **kwargs,
            )
            Ql = cfg.decoder.num_queries
            pseudo = boxvis_teacher_pseudo_masks(
                jax.random.fold_in(r_crit, 31337),
                out_t["pred_logits"][:, :Ql],
                out_t["pred_masks"][:, :Ql],
                targets, cls_valid, cfg.train,
            )

        total, logged = criterion(
            r_crit, out, targets, cls_valid, task=task,
            boxvis=cfg.train.boxvis_enabled,
            pseudo=pseudo,
            # sot datasets without a category namespace skip the class
            # loss (reference: loss_labels_clip continues when the
            # dataset is absent from combined_datasets_category_info)
            class_loss=(task != "sot"),
            sem_loss=(task == "detection"),
            level_sizes=level_sizes,
            tokens_per_prompt=(batch.exp_embs.shape[2] if task == "grounding" else 1),
        )
        return total, logged

    tx = None  # created lazily against param structure

    def train_step(state: TrainState, batch: TrainBatch, rng: jax.Array):
        nonlocal tx
        if tx is None:
            tx = make_optimizer(cfg, state.params)
        rng = jax.random.fold_in(rng, state.step)
        (loss, logged), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, state.ema_params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree.map(
            lambda e, p: e * ema_decay + p * (1.0 - ema_decay), state.ema_params, params
        )
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema
        )
        logged = dict(logged)
        logged["total_loss"] = loss
        return new_state, logged

    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    fsh = frame_sharding(mesh)
    model_size = mesh.shape[MODEL_AXIS] if MODEL_AXIS in mesh.shape else 1

    # shard: state replicated, per-video batch leaves on the data axis,
    # shared banks (no leading B) replicated.  With a model axis >1 the
    # images' FRAME axis shards over it (per-frame encoder split — see
    # parallel/mesh.py frame_sharding).
    def batch_spec(batch):
        B, T = batch.images.shape[:2]
        img_sh = fsh if (model_size > 1 and T % model_size == 0) else bsh

        def leaf_spec(x):
            if not (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B):
                return rep
            if x is batch.images:
                return img_sh
            return bsh

        return jax.tree.map(leaf_spec, batch)

    jitted = jax.jit(
        train_step,
        donate_argnums=(0,),
    )

    def run(state, batch, rng):
        batch = jax.device_put(batch, batch_spec(batch))
        state = jax.device_put(state, jax.tree.map(lambda _: rep, state))
        return jitted(state, batch, rng)

    return run


def _boxes_from_masks(masks: jnp.ndarray) -> jnp.ndarray:
    """[B, N, T, H, W] -> normalized xyxy [B, N, T, 4]."""
    from univs_tpu.ops.mask_ops import masks_to_boxes

    H, W = masks.shape[-2:]
    b = masks_to_boxes(masks)
    return b / jnp.array([W, H, W, H], jnp.float32)
