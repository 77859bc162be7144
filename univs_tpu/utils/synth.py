"""Synthetic test videos for benchmarks and demos.

Why not random noise: (1) the axon host->device tunnel compresses
transfers — measured H2D is ~16 MB/s for noise vs ~55 MB/s for
natural-statistics frames (tools/probe_upload_hiding.py family), so a
noise video overstates the wire cost of real video ~3.5x; (2) persistent
moving objects exercise the admission/tracking paths with object-like
inputs instead of frame-decorrelated static.
"""

from __future__ import annotations

import numpy as np


def synth_blob_video(V: int, h: int, w: int, n_blobs: int = 24,
                     seed: int = 0) -> np.ndarray:
    """[V, h, w, 3] uint8 video of persistent moving Gaussian blobs."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy0 = rng.rand(n_blobs) * h
    cx0 = rng.rand(n_blobs) * w
    vy = (rng.rand(n_blobs) - 0.5) * 12
    vx = (rng.rand(n_blobs) - 0.5) * 12
    sig = 20 + rng.rand(n_blobs) * 40
    col = rng.rand(n_blobs, 3) * 220 + 35
    video = np.zeros((V, h, w, 3), np.uint8)
    for t in range(V):
        acc = np.zeros((h, w, 3), np.float32)
        cy = (cy0 + vy * t) % h
        cx = (cx0 + vx * t) % w
        for b in range(n_blobs):
            g = np.exp(-(((yy - cy[b]) / sig[b]) ** 2
                         + ((xx - cx[b]) / sig[b]) ** 2))
            acc += g[..., None] * col[b]
        video[t] = np.clip(acc, 0, 255).astype(np.uint8)
    return video
