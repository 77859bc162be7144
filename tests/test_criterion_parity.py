"""Per-loss-term activation parity vs the REFERENCE criterion stack
(univs/modeling/video_criterion_uni.py + video_criterion.py +
video_criterion_prompt.py + video_matcher.py) — round-2 verdict item 3.

The only randomness on both sides is point sampling (PointRend
importance sampling in the losses, the shared random point set in the
matcher) and the contrastive negative-column subsample.  We inject ONE
deterministic point grid into both stacks (the reference's
``get_uncertain_point_coords_with_randomness`` / ``torch.rand`` are
patched; ours exposes ``_FIXED_LOSS_COORDS`` / ``_FIXED_MATCH_COORDS``
hooks) and size the fixtures so the column subsample selects every
column (#active <= int(0.75*cap)), making both criteria fully
deterministic.  Every loss term (final + aux layer) must then agree to
float32 tolerance.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import ref_shim
from univs_tpu.config import TrainConfig
from univs_tpu.losses import criterion as crit_mod
from univs_tpu.losses.criterion import TrainTargets, UniCriterion

TOL = 5e-4

B, N, T, K, C = 1, 3, 2, 6, 8
QL, QP = 5, 3
H, W = 16, 24
P = 32  # points

_GRID = (np.random.RandomState(0).rand(P, 2) * 0.9 + 0.05).astype(np.float32)


def _fake_cfg():
    def ns(**kw):
        return types.SimpleNamespace(**kw)

    return ns(
        INPUT=ns(SAMPLING_FRAME_NUM=T),
        MODEL=ns(
            MASK_FORMER=ns(
                NUM_OBJECT_QUERIES=QL, TRAIN_NUM_POINTS=P,
                OVERSAMPLE_RATIO=3.0, IMPORTANCE_SAMPLE_RATIO=0.75,
            ),
            UniVS=ns(
                DISABLE_LEARNABLE_QUERIES_SA1B=False, PROMPT_AS_QUERIES=True,
                USE_CONTRASTIVE_LOSS=True, NUM_POS_QUERIES=50,
            ),
            SEM_SEG_HEAD=ns(PIXEL_DECODER_NAME="MSDeformAttnPixelDecoder"),
            BoxVIS=ns(BoxVIS_ENABLED=False),
        ),
    )


@pytest.fixture(scope="module")
def ref_criterion():
    crit_uni_mod, crit_m, crit_p_mod, matcher_mod = ref_shim.load_reference_criterion_modules()
    # register the parity category namespace (shared dict singleton)
    crit_m.combined_datasets_category_info["parity_test"] = (K, 0)

    # deterministic point grid on the reference side
    def fixed_coords(coarse_logits, *a, **kw):
        R = coarse_logits.shape[0]
        return torch.from_numpy(np.tile(_GRID[None], (R, 1, 1)))

    crit_m.get_uncertain_point_coords_with_randomness = fixed_coords
    crit_p_mod.get_uncertain_point_coords_with_randomness = fixed_coords

    matcher = matcher_mod.VideoHungarianMatcherUni(
        cost_class=3.0, cost_mask=5.0, cost_dice=5.0, num_points=P
    )
    uni = crit_uni_mod.VideoSetCriterionUni(
        _fake_cfg(), num_classes=K, matcher=matcher, weight_dict={},
        eos_coef=0.1, losses=["labels", "masks", "reid"],
    )
    return uni


def _fixture(seed, task="sot", with_absent=True):
    rng = np.random.RandomState(seed)
    Q = QL + QP
    logits = rng.randn(B, Q, K).astype(np.float32)
    masks = (rng.randn(B, Q, T, H, W) * 2).astype(np.float32)
    embds = rng.randn(B, Q, T, C).astype(np.float32)
    reid = np.zeros((B * Q * T, B * Q * T), np.float32)

    labels = rng.randint(1, K + 1, (B, N)).astype(np.int64)
    ids = np.tile((10 * (1 + np.arange(N)))[None, :, None], (B, 1, T)).astype(np.int64)
    if with_absent:
        ids[0, 1, 1] = -1  # object 1 absent in frame 1
    gt_masks = (rng.rand(B, N, T, H, W) > 0.7).astype(np.float32)
    poi = np.tile(np.arange(QP)[None], (B, 1)).astype(np.int64)
    return logits, masks, embds, reid, labels, ids, gt_masks, poi


def _ref_outputs(logits, masks, embds, reid, aux):
    def layer(l, m, e):
        return {
            "pred_logits": torch.from_numpy(l),
            "pred_masks": torch.from_numpy(m),
            "pred_embds": torch.from_numpy(e),
            "pred_reid_logits": torch.from_numpy(reid),
        }

    out = layer(logits, masks, embds)
    out["aux_outputs"] = [layer(*a) for a in aux]
    return out


def _our_outputs(logits, masks, embds, aux):
    def layer(l, m, e):
        return {
            "pred_logits": jnp.asarray(l),
            "pred_masks": jnp.asarray(m),
            "pred_embds": jnp.asarray(e),
        }

    out = layer(logits, masks, embds)
    out["aux_outputs"] = [layer(*a) for a in aux]
    return out


@pytest.fixture(autouse=True)
def _inject_points(monkeypatch):
    monkeypatch.setattr(crit_mod, "_FIXED_MATCH_COORDS", _GRID)
    monkeypatch.setattr(crit_mod, "_FIXED_LOSS_COORDS",
                        lambda R, P_: np.tile(_GRID[None], (R, 1, 1)))
    orig_rand = torch.rand

    def fake_rand(*shape, **kw):
        if tuple(shape) == (1, P, 2):
            return torch.from_numpy(_GRID[None]).clone()
        return orig_rand(*shape, **kw)

    monkeypatch.setattr(torch, "rand", fake_rand)
    yield


def test_criterion_parity_sot(ref_criterion):
    logits, masks, embds, reid, labels, ids, gt_masks, poi = _fixture(3)
    # the reference hardcodes l_layer=9 for the final layer's stage-3
    # embedding stash (video_criterion.py:710), so 9 aux layers are
    # structurally required
    aux_np = [tuple(a * s for a in (logits, masks, embds))
              for s in np.linspace(0.5, 0.9, 9, dtype=np.float32)]

    targets_ref = [{
        "task": "sot", "dataset_name": "parity_test", "prompt_type": "visual",
        "labels": torch.from_numpy(labels[0]),
        "ids": torch.from_numpy(ids[0]),
        "masks": torch.from_numpy(gt_masks[0]),
        "prompt_obj_ids": torch.from_numpy(poi[0]),
    }]
    with torch.no_grad():
        losses_ref = ref_criterion(_ref_outputs(logits, masks, embds, reid, aux_np), targets_ref)

    ours = UniCriterion(
        TrainConfig(num_points=P, class_weight_matcher=3.0,
                    mask_weight_matcher=5.0, dice_weight_matcher=5.0),
        num_learnable=QL, num_frames=T,
    )
    tt = TrainTargets(
        labels=jnp.asarray(labels, jnp.int32),
        ids=jnp.asarray(ids, jnp.int32),
        masks=jnp.asarray(gt_masks),
        valid=jnp.ones((B, N), bool),
        prompt_obj_ids=jnp.asarray(poi, jnp.int32),
    )
    import jax

    _, logged = ours(
        jax.random.PRNGKey(0), _our_outputs(logits, masks, embds, aux_np), tt,
        cls_valid=jnp.ones((K,), bool), task="sot", prompt_type="visual",
    )

    keys = ["loss_ce", "loss_mask", "loss_dice", "loss_reid", "loss_reid_aux",
            "loss_reid_l2p", "loss_reid_l2p_aux"]
    for suffix in ("", "_0", "_5"):
        for k in keys:
            r = float(losses_ref[k + suffix])
            o = float(logged[k + suffix])
            assert abs(r - o) < TOL * max(1.0, abs(r)), (
                f"{k + suffix}: ref {r} vs ours {o}"
            )


def test_criterion_parity_text_detection(ref_criterion):
    """Text-detection: prompt slots bound to SEMANTIC targets
    (sem_labels/sem_masks), l2p by class, sem CE folded into loss_mask."""
    logits, masks, embds, reid, labels, ids, gt_masks, poi = _fixture(7, with_absent=False)
    rng = np.random.RandomState(8)
    S = QP  # semantic targets (categories present)
    sem_labels = np.asarray([[2, 4, 5]], np.int64)
    sem_masks = (rng.rand(B, S, T, H, W) > 0.6).astype(np.float32)
    aux_np = [tuple(a * s for a in (logits, masks, embds))
              for s in np.linspace(0.5, 0.9, 9, dtype=np.float32)]

    targets_ref = [{
        "task": "detection", "dataset_name": "parity_test", "prompt_type": "text",
        "labels": torch.from_numpy(labels[0]),
        "ids": torch.from_numpy(ids[0]),
        "masks": torch.from_numpy(gt_masks[0]),
        "prompt_obj_ids": torch.from_numpy(poi[0]),
        "sem_labels": torch.from_numpy(sem_labels[0]),
        "sem_masks": torch.from_numpy(sem_masks[0]),
        "prompt_gt_labels": torch.from_numpy(sem_labels[0]),
    }]
    with torch.no_grad():
        losses_ref = ref_criterion(_ref_outputs(logits, masks, embds, reid, aux_np), targets_ref)

    ours = UniCriterion(
        TrainConfig(num_points=P, class_weight_matcher=3.0,
                    mask_weight_matcher=5.0, dice_weight_matcher=5.0),
        num_learnable=QL, num_frames=T,
    )
    tt = TrainTargets(
        labels=jnp.asarray(labels, jnp.int32),
        ids=jnp.asarray(ids, jnp.int32),
        masks=jnp.asarray(gt_masks),
        valid=jnp.ones((B, N), bool),
        prompt_obj_ids=jnp.asarray(poi, jnp.int32),
        sem_labels=jnp.asarray(sem_labels, jnp.int32),
        sem_masks=jnp.asarray(sem_masks),
    )
    import jax

    _, logged = ours(
        jax.random.PRNGKey(0), _our_outputs(logits, masks, embds, aux_np), tt,
        cls_valid=jnp.ones((K,), bool), task="detection", prompt_type="text",
        sem_loss=True,
    )

    keys = ["loss_ce", "loss_mask", "loss_dice", "loss_reid", "loss_reid_aux",
            "loss_reid_l2p"]
    for suffix in ("", "_0", "_5"):
        for k in keys:
            r = float(losses_ref[k + suffix])
            o = float(logged[k + suffix])
            assert abs(r - o) < TOL * max(1.0, abs(r)), (
                f"{k + suffix}: ref {r} vs ours {o}"
            )
