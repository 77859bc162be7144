"""VPS pixel-variant newly-entity detection vs torch transcription
oracles (reference: inference_video_entity.py:654-765
detect_newly_entities_per_clip_pixel + the hardcoded quasi-track
matcher :157,:711-716) — round-2 verdict item 6.

The oracles are deliberate, clearly-labeled torch transcriptions of the
reference algorithms used only as test fixtures.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from univs_tpu.ops import mask_ops


# ---------------------------------------------------------------------------
# triu-law dedup (NOT greedy NMS)
# ---------------------------------------------------------------------------


def _triu_oracle(iou, scores, thresh):
    """Transcription of :553-559 / :682-685: sort desc, keep where max
    IoU vs ALL higher-ranked < thresh."""
    iou = torch.from_numpy(iou)
    order = torch.from_numpy(scores).sort(descending=True)[1]
    m = iou[order][:, order]
    max_from_higher = torch.triu(m, diagonal=1).max(0)[0]
    keep_sorted = max_from_higher < thresh
    keep = torch.zeros(len(scores), dtype=torch.bool)
    keep[order] = keep_sorted
    return keep.numpy()


def test_nms_triu_vs_oracle():
    rng = np.random.RandomState(0)
    N = 12
    iou = rng.rand(N, N).astype(np.float32)
    iou = (iou + iou.T) / 2
    np.fill_diagonal(iou, 1.0)
    scores = rng.rand(N).astype(np.float32)
    want = _triu_oracle(iou, scores, 0.6)
    got = np.asarray(mask_ops.nms_triu_keep_from_iou(jnp.asarray(iou), jnp.asarray(scores), 0.6))
    np.testing.assert_array_equal(got, want)
    # differs from greedy NMS in general: suppressed candidates still
    # suppress in the triu law — verify at least one fixture shows it
    greedy = np.asarray(mask_ops.nms_keep_from_iou(jnp.asarray(iou), jnp.asarray(scores), 0.6))
    assert (greedy != want).any() or want.all()


def test_nms_triu_with_subset():
    rng = np.random.RandomState(1)
    N = 10
    iou = rng.rand(N, N).astype(np.float32)
    iou = (iou + iou.T) / 2
    scores = rng.rand(N).astype(np.float32)
    valid = rng.rand(N) > 0.4
    want = np.zeros(N, bool)
    idx = np.nonzero(valid)[0]
    sub = _triu_oracle(iou[np.ix_(idx, idx)], scores[idx], 0.5)
    want[idx] = sub
    got = np.asarray(mask_ops.nms_triu_keep_from_iou(
        jnp.asarray(iou), jnp.asarray(scores), 0.5, jnp.asarray(valid)))
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# quasi-track bisoftmax matching
# ---------------------------------------------------------------------------


def _quasi_oracle(tgt, cand, thresh):
    """Transcription of :711-716: raw-dot pair sims, bisoftmax,
    sub-threshold zeroing, Hungarian."""
    from scipy.optimize import linear_sum_assignment

    tgt = torch.from_numpy(tgt)
    cand = torch.from_numpy(cand)
    sim = torch.einsum("ntc,mfc->nmtf", tgt, cand).flatten(2)
    sim_bi = (sim.softmax(1) + sim.softmax(0)).mean(-1) / 2.0
    sim_bi[sim_bi < thresh] = 0
    rows, cols = linear_sum_assignment((1 - sim_bi).numpy())
    return rows, cols, sim_bi.numpy()


def test_quasi_track_match_vs_oracle():
    from univs_tpu.inference import memory_pool as mp

    rng = np.random.RandomState(2)
    E, Qc, T, C = 4, 6, 2, 8
    pool = mp.create_entity_memory(E, 3, C, (8, 8), window=4,
                                   num_prompt_points=4, embd_history=4, prompt_history=3)
    tgt = rng.randn(E, 3, C).astype(np.float32)
    pool = pool.replace(
        valid=jnp.ones((E,), bool),
        embds=pool.embds.at[:, -3:].set(jnp.asarray(tgt)),
    )
    cand = rng.randn(Qc, T, C).astype(np.float32)
    thresh = 0.1
    c2s, sim = mp.match_candidates_to_memory(
        pool, jnp.asarray(cand), jnp.ones((Qc,), bool), thresh
    )
    rows, cols, sim_bi = _quasi_oracle(tgt, cand, thresh)
    want_c2s = np.full(Qc, -1)
    for r, c in zip(rows, cols):
        want_c2s[c] = r
    got = np.asarray(c2s)
    # assignments must agree wherever the similarity is meaningfully
    # above zero (ties among zeroed entries are assignment-arbitrary)
    for c in range(Qc):
        if want_c2s[c] >= 0 and sim_bi[want_c2s[c], c] > thresh:
            assert got[c] == want_c2s[c], (c, got, want_c2s)
            np.testing.assert_allclose(float(sim[c]), sim_bi[want_c2s[c], c], atol=1e-5)


# ---------------------------------------------------------------------------
# first-clip pixel admission (thing/stuff split)
# ---------------------------------------------------------------------------


def _first_clip_pixel_oracle(logits, masks, thing_mask, nms_thresh, cls_thres):
    """Transcription of :671-698 (quality already folded into logits)."""
    pred_logits = torch.from_numpy(logits)
    pred_masks = torch.from_numpy(masks)
    Q = pred_logits.shape[0]
    h, w = masks.shape[-2:]
    nms_scores, nms_labels = pred_logits.max(-1)

    def mask_to_box(m):
        boxes = torch.zeros(m.shape[0], m.shape[1], 4)
        for i in range(m.shape[0]):
            for t in range(m.shape[1]):
                ys, xs = torch.nonzero(m[i, t], as_tuple=True)
                if len(ys):
                    boxes[i, t] = torch.tensor(
                        [xs.min() / w, ys.min() / h, (xs.max() + 1) / w, (ys.max() + 1) / h]
                    )
        return boxes

    pred_boxes = mask_to_box(pred_masks > 0)

    sorted_indices = nms_scores.sort(descending=True)[1][:100]
    sorted_labels = nms_labels[sorted_indices]
    isthing = torch.as_tensor([bool(thing_mask[int(l)]) for l in sorted_labels])
    idx_thing = sorted_indices[isthing][:70]
    idx_stuff = sorted_indices[~isthing][:30]

    def box_iou_t(a, b):
        # [N, T, 4] pairwise per-frame IoU -> [N, M, T]
        lt = torch.max(a[:, None, :, :2], b[None, :, :, :2])
        rb = torch.min(a[:, None, :, 2:], b[None, :, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
        area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
        return inter / (area_a[:, None] + area_b[None] - inter).clamp(min=1e-6)

    if len(idx_thing):
        biou = box_iou_t(pred_boxes[idx_thing], pred_boxes[idx_thing]).max(-1)[0]
        max_biou = torch.triu(biou, diagonal=1).max(0)[0]
        idx_thing = idx_thing[max_biou < nms_thresh]
    if len(idx_stuff):
        m0 = (pred_masks[idx_stuff][:, 0] > 0).float().flatten(1)
        inter = m0 @ m0.t()
        union = m0.sum(-1)[:, None] + m0.sum(-1)[None] - inter
        miou = inter / union.clamp(min=1)
        max_miou = torch.triu(miou, diagonal=1).max(0)[0]
        idx_stuff = idx_stuff[max_miou < 0.6]
    newly = torch.cat([idx_thing, idx_stuff])
    newly = newly[nms_scores[newly] > cls_thres]
    return set(int(i) for i in newly)


def test_first_clip_pixel_admission_vs_oracle():
    from univs_tpu.inference import memory_pool as mp
    from univs_tpu.inference.entity import EntityClipConfig, _detect_newly_pixel

    rng = np.random.RandomState(5)
    Ql, K, T, C = 20, 5, 2, 8
    H4, W4 = 16, 24
    logits = rng.rand(Ql, K).astype(np.float32)
    # blobby masks with ±4 logits so quality = count(>1)/count(>-1) == 1
    masks = np.where(rng.rand(Ql, T, H4, W4) > 0.8, 4.0, -4.0).astype(np.float32)
    embds = rng.randn(Ql, T, C).astype(np.float32)
    thing_mask = np.array([True, True, False, True, False])
    cc = EntityClipConfig(num_queries=Ql, apply_cls_thres=0.25, nms_thres=0.85,
                          num_dense_points=4, num_frames=T, variant="pixel")
    E = Ql
    pool = mp.create_entity_memory(E, K, C, (H4, W4), window=T + 2,
                                   num_prompt_points=4, embd_history=4, prompt_history=3)
    pool2 = _detect_newly_pixel(
        pool, jnp.int32(0), jnp.arange(T), jnp.bool_(True),
        jnp.asarray(logits), jnp.asarray(masks), jnp.asarray(embds),
        jnp.asarray(thing_mask), cc,
    )
    # quality == 1 here, so scored == logits and the oracle's score
    # space matches
    want = _first_clip_pixel_oracle(logits, masks, thing_mask, 0.85, 0.25)
    got_count = int(pool2.valid.sum())
    assert got_count == len(want), (got_count, len(want))
    # admitted slots carry the candidates' class scores; check the set
    # of admitted max-scores matches the oracle's candidate set
    got_scores = sorted(
        float(s) for s, v in zip(np.asarray(pool2.logits_last).max(-1), np.asarray(pool2.valid)) if v
    )
    want_scores = sorted(float(logits[i].max()) for i in want)
    np.testing.assert_allclose(got_scores, want_scores, atol=1e-5)
