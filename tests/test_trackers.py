"""Standalone tracker tests."""

import numpy as np

from univs_tpu.inference.trackers import FastOverTracker


def _mk_clip(embds_dirs, h=8, w=8):
    N = len(embds_dirs)
    embds = np.zeros((N, 16), np.float32)
    masks = np.full((N, 2, h, w), -5.0, np.float32)
    logits = np.zeros((N, 3), np.float32)
    for i, d in enumerate(embds_dirs):
        embds[i, d] = 1.0
        masks[i, :, i * 2 : i * 2 + 3] = 5.0
        logits[i, d % 3] = 0.9
    return embds, logits, masks


def test_track_continuity_and_new():
    tr = FastOverTracker(match_threshold=0.3, new_score_thres=0.25)
    e, l, m = _mk_clip([0, 1])
    tr.update(0, e, l, m)
    assert len(tr.tracks) == 2
    # same objects next clip (swapped order) -> matched, no new tracks
    e2, l2, m2 = _mk_clip([1, 0])
    tr.update(2, e2, l2, m2)
    assert len(tr.tracks) == 2
    # brand-new object appears
    e3, l3, m3 = _mk_clip([0, 1, 2])
    tr.update(4, e3, l3, m3)
    assert len(tr.tracks) == 3
    res = tr.results(video_len=6)
    assert len(res) == 3
    assert all("masks" in r and "category_id" in r for r in res)
    # the track matched across all clips covers frames 0..5
    r0 = next(r for r in res if r["track_id"] == 0)
    frames_covered = set(r0["masks"].keys())
    assert 0 in frames_covered and 5 in frames_covered


def test_low_score_not_admitted():
    tr = FastOverTracker(new_score_thres=0.95)
    e, l, m = _mk_clip([0])
    tr.update(0, e, l, m)
    assert len(tr.tracks) == 0


def test_mdqe_tracker_vs_reference():
    """Faithful MDQETracker vs the REAL reference tracker
    (mdqe_overtracker_efficient.py) over a 2-window stream — round-2
    verdict item 9 (I4 fidelity)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    import pytest

    torch = pytest.importorskip("torch")
    import ref_shim

    mod = ref_shim.load_reference_mdqe_module()
    from univs_tpu.inference.trackers import MDQETracker

    K, E, T, W, S = 4, 8, 3, 6, 2
    H, Wd = 12, 16
    ref = mod.MDQE_OverTrackerEfficient(
        video_len=20, num_classes=K, num_max_inst=10, num_frames=T,
        num_frames_window_track=W, clip_stride=S, embed_dim=E,
        apply_cls_thres=0.2, device=torch.device("cpu"), data_name="ytvis_2021",
    )
    ours = MDQETracker(num_classes=K, num_frames=T, num_frames_window_track=W,
                       clip_stride=S, embed_dim=E, apply_cls_thres=0.2,
                       data_name="ytvis_2021")

    rng = np.random.RandomState(0)

    def mk_clip(n, f0):
        cls_probs = rng.rand(n, K).astype(np.float32)
        return {
            "scores": cls_probs.max(-1),
            "mask_logits": (rng.randn(n, T, H, Wd) * 3).astype(np.float32),
            "cls_probs": cls_probs,
            "query_embeds": rng.randn(n, E).astype(np.float32),
            "frame_idx": list(range(f0, f0 + T)),
        }

    def to_ref(c):
        return mod.Clips((H, Wd), c["frame_idx"],
                         scores=torch.from_numpy(np.asarray(c["scores"])),
                         mask_logits=torch.from_numpy(c["mask_logits"]),
                         cls_probs=torch.from_numpy(c["cls_probs"]),
                         query_embeds=torch.from_numpy(c["query_embeds"]))

    def check_result(r_ref, r_ours):
        np.testing.assert_allclose(
            r_ref["pred_masks"].numpy(), r_ours["pred_masks"], atol=1e-5)
        np.testing.assert_allclose(
            r_ref["pred_cls_scores"].numpy(), r_ours["pred_cls_scores"], atol=1e-5)
        np.testing.assert_array_equal(r_ref["obj_ids"].numpy(), r_ours["obj_ids"])

    # window 1: clips at local frames 0, 2, 4
    for i, f0 in enumerate((0, 2, 4)):
        c = mk_clip(3 + i, f0)
        ref.update(to_ref(c), is_first_clip=(i == 0))
        ours.update(c, is_first_clip=(i == 0))
    check_result(ref.get_result(is_last_clip=False), ours.get_result(is_last_clip=False))

    # window 2 (memory rolled over; local frames restart)
    for f0 in (2, 4):
        c = mk_clip(3, f0)
        ref.update(to_ref(c))
        ours.update(c)
    check_result(ref.get_result(is_last_clip=True), ours.get_result(is_last_clip=True))
    assert ours.num_inst_prev_windows == ref.num_inst_prev_windows


def test_mdqe_vis_driver():
    """MDQE VIS driver end-to-end on the tiny model (I4 path)."""
    import jax
    import jax.numpy as jnp

    from univs_tpu.config import InferenceConfig, tiny_test_config
    from univs_tpu.inference.fast_vis import MDQEVISDriver
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts

    cfg = tiny_test_config().replace(
        inference=InferenceConfig(num_frames=2, clip_stride=1, num_frames_window=4)
    )
    model = UniVSModel(cfg)
    rng = np.random.RandomState(0)
    K = 4
    images = jnp.asarray(rng.rand(1, 2, 64, 96, 3) * 255, jnp.float32)
    cls_bank = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_bank[None, :, None, :], valid=jnp.ones((1, K), bool))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, images, jnp.arange(2)[None],
        task="detection", text_prompts=tp, cls_emb=cls_bank,
    )["params"]
    frames = rng.rand(7, 64, 96, 3).astype(np.float32) * 255
    driver = MDQEVISDriver(cfg, params)
    res = driver.run(frames, cls_bank, score_thres=0.0, window_track=4, topk=5)
    assert len(res) >= 1
    for r in res:
        assert {"track_id", "score", "category_id", "masks"} <= set(r)
        for f, m in r["masks"].items():
            assert 0 <= f < 7 and m.shape == (16, 24)
            assert np.isfinite(m).all()
