"""Augmentation family tests (reference univs/data/augmentation.py
semantics: per-clip flip, per-frame rotation progression, per-frame
ResizeScale, FixedSizeCrop pseudo-temporal shift, color jitter)."""

import numpy as np
import pytest

from univs_tpu.data.augment import (
    FrameTransform,
    TrainAugConfig,
    sample_clip_transforms,
)

cv2 = pytest.importorskip("cv2")


def _img(h=40, w=60):
    rng = np.random.RandomState(0)
    return rng.randint(0, 255, (h, w, 3), np.uint8)


def test_flip_shared_rotation_progresses():
    rng = np.random.RandomState(1)
    cfg = TrainAugConfig(image_size=64, rotation=True, color_jitter=True)
    tfs = sample_clip_transforms(rng, (40, 60), 4, cfg)
    assert len(tfs) == 4
    # flip is one decision per clip
    assert len({t.flip for t in tfs}) == 1
    # rotation angles are monotone (sorted, possibly reversed) and share a center
    angles = [t.rot_angle for t in tfs]
    assert angles == sorted(angles) or angles == sorted(angles, reverse=True)
    assert len({t.rot_center for t in tfs}) == 1
    # per-frame scale jitter (plain T.ResizeScale in the reference)
    assert len({t.scale for t in tfs}) > 1


def test_crop_offsets_shift_within_bounds():
    rng = np.random.RandomState(2)
    S = 32
    cfg = TrainAugConfig(image_size=S, min_scale=2.0, max_scale=2.0)
    tfs = sample_clip_transforms(rng, (64, 64), 5, cfg)
    # constant scale -> shared max offset; later frames shift around frame 0
    base = (tfs[0].crop_y, tfs[0].crop_x)
    nh = int(round(64 * tfs[0].scale))
    for t in tfs:
        assert 0 <= t.crop_y <= nh - S and 0 <= t.crop_x <= nh - S
        # pseudo-temporal shift bounded by 10% of crop size
        assert abs(t.crop_y - base[0]) <= int(0.1 * S)
        assert abs(t.crop_x - base[1]) <= int(0.1 * S)


def test_geometry_shapes_and_mask_binary():
    rng = np.random.RandomState(3)
    cfg = TrainAugConfig(image_size=64, rotation=True, color_jitter=True)
    tfs = sample_clip_transforms(rng, (40, 60), 2, cfg)
    img = _img()
    mask = (np.arange(40)[:, None] + np.arange(60)[None] < 50).astype(np.uint8)
    for t in tfs:
        out = t.apply_image(img)
        assert out.shape == (64, 64, 3) and out.dtype == np.uint8
        m = t.apply_mask(mask)
        assert m.shape == (64, 64)
        assert set(np.unique(m)).issubset({0, 1})


def test_color_jitter_matches_d2_blend_semantics():
    img = _img()
    t = FrameTransform(
        flip=False, out_size=img.shape[:2], scale=1.0,
        brightness=1.1, contrast=0.9, saturation=1.05,
    )
    out = t.apply_image(img).astype(np.float32)
    x = img.astype(np.float32) * 1.1
    x = x.mean() * 0.1 + x * 0.9
    gray = x @ np.array([0.299, 0.587, 0.114], np.float32)
    x = gray[..., None] * (-0.05) + x * 1.05
    expect = np.clip(x, 0, 255).astype(np.uint8)
    assert np.abs(out - expect).max() <= 1


def test_rotation_identity_at_zero_and_real_at_angle():
    img = _img(64, 64)
    t0 = FrameTransform(flip=False, out_size=(64, 64), scale=1.0, rot_angle=0.0)
    assert np.array_equal(t0.apply_image(img), img)
    t1 = FrameTransform(
        flip=False, out_size=(64, 64), scale=1.0,
        rot_angle=15.0, rot_center=(0.5, 0.5),
    )
    out = t1.apply_image(img)
    assert out.shape == img.shape and not np.array_equal(out, img)
