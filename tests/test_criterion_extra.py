"""Extra criterion losses: semantic mask CE + l2v attention loss."""

import numpy as np
import jax
import jax.numpy as jnp

from univs_tpu.config import TrainConfig
from univs_tpu.losses.criterion import (
    TrainTargets,
    UniCriterion,
    loss_l2v_attn_weights,
    loss_masks_sem,
)


def _targets(B=1, N=3, Qp=2, T=2, h=16, w=16, seed=0):
    rng = np.random.RandomState(seed)
    masks = (rng.rand(B, N, T, h, w) > 0.8).astype(np.float32)
    return TrainTargets(
        labels=jnp.ones((B, N), jnp.int32),
        ids=jnp.zeros((B, N, T), jnp.int32),
        masks=jnp.asarray(masks),
        valid=jnp.ones((B, N), bool),
        prompt_obj_ids=jnp.array([[0, 1]], jnp.int32),
    )


def test_loss_masks_sem():
    cfg = TrainConfig(num_points=32, oversample_ratio=2.0)
    targets = _targets()
    rng = np.random.RandomState(1)
    pm = jnp.asarray(rng.randn(1, 2, 2, 16, 16), jnp.float32)
    v = loss_masks_sem(jax.random.PRNGKey(0), pm, targets, cfg)
    assert bool(jnp.isfinite(v)) and float(v) > 0
    # perfect prediction scores lower
    gt = jax.vmap(lambda m, q: m[q])(targets.masks, targets.prompt_obj_ids)
    pm_perfect = gt * 20 - 10
    v2 = loss_masks_sem(jax.random.PRNGKey(0), pm_perfect, targets, cfg)
    assert float(v2) < float(v)


def test_loss_l2v():
    cfg = TrainConfig(num_points=32, oversample_ratio=2.0)
    targets = _targets()
    sizes = ((2, 3), (4, 6), (8, 12))
    S = sum(a * b for a, b in sizes)
    rng = np.random.RandomState(2)
    L = 3  # sentence + 2 word tokens
    l2v = jnp.asarray(rng.rand(2, 2 * L, S), jnp.float32)  # [B*T, Qp*L, S]
    num_masks = jnp.float32(2 * 2)  # B*Qp*T prompt normalizer
    v = loss_l2v_attn_weights(
        jax.random.PRNGKey(0), l2v, sizes, L, targets, cfg, t=2, num_masks=num_masks
    )
    assert set(v) == {f"loss_l2v_attn_weight_{i}" for i in range(3)}
    assert all(bool(jnp.isfinite(x)) for x in v.values())


def test_criterion_with_sem_and_l2v():
    cfg = TrainConfig(num_points=32, oversample_ratio=2.0)
    targets = _targets()
    rng = np.random.RandomState(3)
    Q = 4 + 2
    sizes = ((2, 3), (4, 6), (8, 12))
    S = sum(a * b for a, b in sizes)
    out = {
        "pred_logits": jnp.asarray(rng.randn(1, Q, 3), jnp.float32),
        "pred_masks": jnp.asarray(rng.randn(1, Q, 2, 16, 16), jnp.float32),
        "pred_embds": jnp.asarray(rng.randn(1, Q, 2, 8), jnp.float32),
        "aux_outputs": [],
        "l2v_attn_weights": jnp.asarray(rng.rand(2, 2, S), jnp.float32),
    }
    crit = UniCriterion(cfg, num_learnable=4, num_frames=2)
    total, logged = crit(
        jax.random.PRNGKey(0), out, targets, jnp.ones(3, bool),
        task="grounding", sem_loss=False, level_sizes=sizes, tokens_per_prompt=1,
    )
    assert "loss_l2v_attn_weight_0" in logged
    assert bool(jnp.isfinite(total))
    # detection with sem loss
    out.pop("l2v_attn_weights")
    total2, logged2 = crit(
        jax.random.PRNGKey(0), out, targets, jnp.ones(3, bool),
        task="detection", sem_loss=True,
    )
    assert bool(jnp.isfinite(total2))


def test_contrastive_negative_subsample_law():
    """Random negative-column subsample (video_criterion.py:184-188):
    when every eligible column fits the 15/5 budget the subsampled loss
    equals the full-set loss; when columns are plentiful, the selection
    is capped and varies with the rng."""
    from univs_tpu.losses.criterion import contrastive_loss

    rng = np.random.RandomState(0)
    R, K = 24, 24
    sim = jnp.asarray(rng.randn(R, K), jnp.float32)
    ids = np.arange(12).repeat(2)
    pos = (ids[:, None] == ids[None]).astype(np.float32)
    pos_many = pos.copy()
    pos_many[:, 14:] = 0  # 14 active cols, 10 background cols
    keep = jnp.ones((R,), bool)
    full = contrastive_loss(sim, jnp.asarray(pos_many), keep, keep)
    sub = contrastive_loss(sim, jnp.asarray(pos_many), keep, keep,
                           rng=jax.random.PRNGKey(0))
    # 10 bg cols exceed the 5-col budget -> restricted negative set
    assert not np.isclose(float(full), float(sub))

    # exact case: 15 active cols, 5 bg cols fit the budget exactly
    pos_fit = pos.copy()
    pos_fit[:, 15:] = 0
    sim_t = sim[:, :20]
    keep20 = jnp.ones((20,), bool)
    full = contrastive_loss(sim_t, jnp.asarray(pos_fit[:, :20]), keep, keep20)
    sub = contrastive_loss(sim_t, jnp.asarray(pos_fit[:, :20]), keep, keep20,
                           rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(full), float(sub), rtol=1e-6)

    # different rngs -> different subsets
    s1 = contrastive_loss(sim, jnp.asarray(pos_many), keep, keep, rng=jax.random.PRNGKey(2))
    s2 = contrastive_loss(sim, jnp.asarray(pos_many), keep, keep, rng=jax.random.PRNGKey(3))
    assert not np.isclose(float(s1), float(s2))
