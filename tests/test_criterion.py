"""Criterion tests: finiteness, gradient flow, and discrimination."""

import numpy as np
import jax
import jax.numpy as jnp

from univs_tpu.config import TrainConfig
from univs_tpu.losses.criterion import TrainTargets, UniCriterion


def _mk(cfg=None, B=1, Ql=4, Qp=2, T=2, K=3, N=3, H=16, W=16, seed=0, perfect=False):
    rng = np.random.RandomState(seed)
    tgt_masks = (rng.rand(B, N, T, H, W) > 0.8).astype(np.float32)
    labels = np.array([[1, 2, 3]], np.int64)[:B, :N]
    ids = np.arange(N)[None, :, None].repeat(T, 2).repeat(B, 0)
    valid = np.ones((B, N), bool)
    valid[:, -1] = False  # one padding slot
    prompt_obj_ids = np.array([[0, 1]])

    Q = Ql + Qp
    if perfect:
        pm = np.full((B, Q, T, H, W), -10.0, np.float32)
        pm[:, :N] = np.where(tgt_masks > 0, 10.0, -10.0)
        pm[:, Ql : Ql + 2] = np.where(tgt_masks[:, :2] > 0, 10.0, -10.0)
        pl = np.full((B, Q, K), -10.0, np.float32)
        for n in range(N):
            pl[:, n, labels[0, n] - 1] = 10.0
        for i, t in enumerate([0, 1]):
            pl[:, Ql + i, labels[0, t] - 1] = 10.0
        pe = rng.randn(B, Q, T, 8).astype(np.float32) * 0.01
        for n in range(N):
            pe[:, n] += np.eye(8)[n % 8] * 5
        for i, t in enumerate([0, 1]):
            pe[:, Ql + i] += np.eye(8)[t % 8] * 5
    else:
        pm = rng.randn(B, Q, T, H, W).astype(np.float32)
        pl = rng.randn(B, Q, K).astype(np.float32)
        pe = rng.randn(B, Q, T, 8).astype(np.float32)

    out = {
        "pred_logits": jnp.array(pl),
        "pred_masks": jnp.array(pm),
        "pred_embds": jnp.array(pe),
        "aux_outputs": [],
    }
    targets = TrainTargets(
        labels=jnp.array(labels),
        ids=jnp.array(ids),
        masks=jnp.array(tgt_masks),
        valid=jnp.array(valid),
        prompt_obj_ids=jnp.array(prompt_obj_ids),
    )
    return out, targets


def _cfg():
    return TrainConfig(num_points=64, oversample_ratio=2.0, importance_sample_ratio=0.75)


def test_criterion_finite_and_nonzero():
    out, targets = _mk()
    crit = UniCriterion(_cfg(), num_learnable=4, num_frames=2)
    total, logged = crit(jax.random.PRNGKey(0), out, targets, jnp.ones(3, bool))
    assert bool(jnp.isfinite(total))
    assert float(total) > 0
    for k in ["loss_ce", "loss_mask", "loss_dice", "loss_reid", "loss_reid_l2p"]:
        assert k in logged, logged.keys()
        assert bool(jnp.isfinite(logged[k])), k


def test_perfect_prediction_scores_lower():
    crit = UniCriterion(_cfg(), num_learnable=4, num_frames=2)
    out_r, targets = _mk(perfect=False)
    out_p, _ = _mk(perfect=True)
    t_r, _ = crit(jax.random.PRNGKey(0), out_r, targets, jnp.ones(3, bool))
    t_p, _ = crit(jax.random.PRNGKey(0), out_p, targets, jnp.ones(3, bool))
    assert float(t_p) < float(t_r)


def test_criterion_grad_flows():
    out, targets = _mk()
    crit = UniCriterion(_cfg(), num_learnable=4, num_frames=2)

    def loss_fn(masks):
        o = dict(out)
        o["pred_masks"] = masks
        total, _ = crit(jax.random.PRNGKey(1), o, targets, jnp.ones(3, bool))
        return total

    g = jax.grad(loss_fn)(out["pred_masks"])
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_criterion_jits_with_aux():
    out, targets = _mk()
    out["aux_outputs"] = [
        {k: v for k, v in out.items() if k != "aux_outputs"} for _ in range(2)
    ]
    crit = UniCriterion(_cfg(), num_learnable=4, num_frames=2)

    @jax.jit
    def run(out, targets):
        return crit(jax.random.PRNGKey(0), out, targets, jnp.ones(3, bool))[0]

    v = run(out, targets)
    assert bool(jnp.isfinite(v))
