"""Clip-consistent augmentations (numpy/PIL, host-side).

Rebuild of the reference's clip augmentation stack
(reference: univs/data/augmentation.py:22-440 — RandomFlipClip,
ResizeShortestEdgeClip, ResizeScaleClip + FixedSizeCropClip = LSJ at
1024^2 with scale 0.25-4.0 per configs/univs/Base.yaml:107-111).  One
transform is sampled per CLIP and applied to every frame, keeping
temporal consistency.  Masks use nearest, images bilinear.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class ClipTransform:
    """Resolved per-clip geometric transform."""

    flip: bool
    scale: float  # resize factor applied before crop/pad
    crop_y: int
    crop_x: int
    out_size: Tuple[int, int]  # final (H, W)

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        import cv2

        h, w = img.shape[:2]
        nh, nw = max(1, int(round(h * self.scale))), max(1, int(round(w * self.scale)))
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if self.flip:
            img = img[:, ::-1]
        out = np.zeros((*self.out_size, img.shape[2]) if img.ndim == 3 else self.out_size, img.dtype)
        ys, xs = self.crop_y, self.crop_x
        src = img[ys : ys + self.out_size[0], xs : xs + self.out_size[1]]
        out[: src.shape[0], : src.shape[1]] = src
        return out

    def apply_mask(self, mask: np.ndarray) -> np.ndarray:
        import cv2

        h, w = mask.shape[:2]
        nh, nw = max(1, int(round(h * self.scale))), max(1, int(round(w * self.scale)))
        m = cv2.resize(mask.astype(np.uint8), (nw, nh), interpolation=cv2.INTER_NEAREST)
        if self.flip:
            m = m[:, ::-1]
        out = np.zeros(self.out_size, np.uint8)
        src = m[self.crop_y : self.crop_y + self.out_size[0], self.crop_x : self.crop_x + self.out_size[1]]
        out[: src.shape[0], : src.shape[1]] = src
        return out


def sample_lsj_transform(
    rng: np.random.RandomState,
    image_hw: Tuple[int, int],
    image_size: int = 1024,
    min_scale: float = 0.25,
    max_scale: float = 4.0,
    flip_prob: float = 0.5,
) -> ClipTransform:
    """Large-scale jitter: random scale into a fixed square canvas with
    random crop (reference: ResizeScaleClip + FixedSizeCropClip)."""
    h, w = image_hw
    scale = rng.uniform(min_scale, max_scale)
    # fit the scaled longer side relative to the canvas
    r = min(image_size * scale / h, image_size * scale / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    max_cy = max(nh - image_size, 0)
    max_cx = max(nw - image_size, 0)
    return ClipTransform(
        flip=bool(rng.rand() < flip_prob),
        scale=r,
        crop_y=int(rng.randint(0, max_cy + 1)),
        crop_x=int(rng.randint(0, max_cx + 1)),
        out_size=(image_size, image_size),
    )


def resize_shortest_edge(
    image_hw: Tuple[int, int], short: int = 640, max_size: int = 1333,
    size_divisibility: int = 32,
) -> ClipTransform:
    """Deterministic eval transform: shortest edge -> ``short``, padded
    to divisibility (reference eval path: ResizeShortestEdgeClip)."""
    h, w = image_hw
    r = short / min(h, w)
    if max(h, w) * r > max_size:
        r = max_size / max(h, w)
    nh, nw = int(round(h * r)), int(round(w * r))
    pad = lambda v: ((v + size_divisibility - 1) // size_divisibility) * size_divisibility
    return ClipTransform(flip=False, scale=r, crop_y=0, crop_x=0, out_size=(pad(nh), pad(nw)))


def transformed_image_size(t: ClipTransform, image_hw: Tuple[int, int]) -> Tuple[int, int]:
    """Actual (unpadded) content size after the transform."""
    h, w = image_hw
    return (
        min(int(round(h * t.scale)) - t.crop_y, t.out_size[0]),
        min(int(round(w * t.scale)) - t.crop_x, t.out_size[1]),
    )
