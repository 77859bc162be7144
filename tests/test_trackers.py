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


def test_mdqe_tracker():
    from univs_tpu.inference.trackers import MDQEOverTracker

    tr = MDQEOverTracker(new_score_thres=0.25)
    e, l, m = _mk_clip([0, 1])
    tr.update(0, e, l, m)
    assert len(tr.tracks) == 2
    # matching by spatial overlap keeps identities even with noisy embds
    e2 = e + np.random.RandomState(0).randn(*e.shape).astype(np.float32) * 0.15
    tr.update(2, e2, l, m)
    assert len(tr.tracks) == 2
    # inactive tracks decay
    e3, l3, m3 = _mk_clip([0])
    tr.update(4, e3, l3, m3)
    assert tr._activity[1] < 1.0
