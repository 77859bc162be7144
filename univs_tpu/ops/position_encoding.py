"""3D sine positional encodings, TPU-native.

Semantics match the reference's ``PositionEmbeddingSine3D`` /
``PositionEmbeddingSine3DArbitraryT``
(reference: univs/modeling/transformer_decoder/position_encoding.py:12-236):

- x/y use ``num_pos_feats = C/2`` channels each (interleaved sin/cos),
  z uses the full ``C`` channels and is ADDED to concat(pos_y, pos_x).
- FixedT mode: z = cumulative frame index (1-based), normalized over the
  clip length; ArbitraryT mode: z = absolute frame index / num_max_frames
  (0-based), so clips starting at any offset are encodable
  (position_encoding.py:113-236).
- y/x are 1-based cumsums normalized by the max, times 2*pi.

Everything here is shape-static and jit-friendly; no data-dependent
control flow.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _dim_t(num_feats: int, temperature: float, dtype=jnp.float32) -> jnp.ndarray:
    """temperature ** (2 * (i // 2) / num_feats) for i in [0, num_feats)."""
    i = jnp.arange(num_feats, dtype=dtype)
    return jnp.asarray(temperature, dtype) ** (2.0 * jnp.floor(i / 2.0) / num_feats)


def _interleave_sin_cos(x: jnp.ndarray) -> jnp.ndarray:
    """stack(sin(x[..., 0::2]), cos(x[..., 1::2])) interleaved on last dim.

    Matches torch's ``torch.stack((p[...,0::2].sin(), p[...,1::2].cos()),
    dim=-1).flatten(-2)``.
    """
    s = jnp.sin(x[..., 0::2])
    c = jnp.cos(x[..., 1::2])
    return jnp.stack([s, c], axis=-1).reshape(*x.shape[:-1], -1)


def sine_pe_1d(coords: jnp.ndarray, num_feats: int, temperature: float = 10000.0) -> jnp.ndarray:
    """Sine PE over a single scalar coordinate array.

    coords: any shape [...]; returns [..., num_feats].
    """
    p = coords[..., None] / _dim_t(num_feats, temperature, coords.dtype)
    return _interleave_sin_cos(p)


class SinePositionEncoding3D:
    """Stateless 3D sine PE generator (no parameters).

    mode="fixed":  z = (frame_index + 1) / T * scale              (PositionEmbeddingSine3D)
    mode="arbitrary": z = frame_index / num_max_frames * scale    (PositionEmbeddingSine3DArbitraryT)
    """

    def __init__(
        self,
        num_pos_feats: int = 128,
        temperature: float = 10000.0,
        normalize: bool = True,
        scale: Optional[float] = None,
        mode: str = "arbitrary",
        num_max_frames: int = 128,
    ):
        self.num_pos_feats = num_pos_feats
        self.temperature = temperature
        self.normalize = normalize
        self.scale = 2 * math.pi if scale is None else scale
        assert mode in ("fixed", "arbitrary")
        self.mode = mode
        self.num_max_frames = num_max_frames

    # ---- internals ------------------------------------------------------

    def _z_embed(self, t_indices: jnp.ndarray) -> jnp.ndarray:
        """Normalized z embedding per frame. t_indices: [T] (absolute idx)."""
        t = t_indices.shape[0]
        if self.mode == "fixed":
            z = (jnp.arange(t, dtype=jnp.float32) + 1.0)
            if self.normalize:
                z = z / (z[-1] + 1e-6) * self.scale
        else:
            z = t_indices.astype(jnp.float32)
            z = z / self.num_max_frames * self.scale
        return z

    def _yx_embed(self, h: int, w: int):
        y = jnp.arange(1, h + 1, dtype=jnp.float32)
        x = jnp.arange(1, w + 1, dtype=jnp.float32)
        if self.normalize:
            y = y / (float(h) + 1e-6) * self.scale
            x = x / (float(w) + 1e-6) * self.scale
        return y, x

    # ---- public API ------------------------------------------------------

    def grid(self, t: int, h: int, w: int, t_indices: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """PE for a (T, H, W) grid -> [T, H, W, 2*num_pos_feats] (channels-last).

        Equivalent to the reference's ``forward_with_size``
        (position_encoding.py:60-79, :171-194) modulo NCHW->NHWC.
        """
        if t_indices is None:
            t_indices = jnp.arange(t)
        z = self._z_embed(t_indices)  # [T]
        y, x = self._yx_embed(h, w)

        dim_t = _dim_t(self.num_pos_feats, self.temperature)
        dim_t_z = _dim_t(self.num_pos_feats * 2, self.temperature)

        pos_x = _interleave_sin_cos(x[:, None] / dim_t)  # [W, F]
        pos_y = _interleave_sin_cos(y[:, None] / dim_t)  # [H, F]
        pos_z = _interleave_sin_cos(z[:, None] / dim_t_z)  # [T, 2F]

        pos_yx = jnp.concatenate(
            [
                jnp.broadcast_to(pos_y[:, None, :], (h, w, self.num_pos_feats)),
                jnp.broadcast_to(pos_x[None, :, :], (h, w, self.num_pos_feats)),
            ],
            axis=-1,
        )  # [H, W, 2F]
        return pos_yx[None] + pos_z[:, None, None, :]  # [T, H, W, 2F]

    def grid2d(self, h: int, w: int) -> jnp.ndarray:
        """Plain 2D DETR sine PE (no z term) -> [H, W, 2*num_pos_feats].

        Used by the pixel decoder (reference: PositionEmbeddingSine with
        N_steps=conv_dim//2, normalize=True — msdeformattn.py:242-243).
        """
        y, x = self._yx_embed(h, w)
        dim_t = _dim_t(self.num_pos_feats, self.temperature)
        pos_x = _interleave_sin_cos(x[:, None] / dim_t)
        pos_y = _interleave_sin_cos(y[:, None] / dim_t)
        return jnp.concatenate(
            [
                jnp.broadcast_to(pos_y[:, None, :], (h, w, self.num_pos_feats)),
                jnp.broadcast_to(pos_x[None, :, :], (h, w, self.num_pos_feats)),
            ],
            axis=-1,
        )

    def points(self, xy_normalized: jnp.ndarray, t_indices: jnp.ndarray) -> jnp.ndarray:
        """PE for N normalized (x, y) points per frame ->
        [T, N, 2*num_pos_feats].

        Equivalent to the reference's ``forward_points_with_size``
        (position_encoding.py:81-110, :196-236).

        xy_normalized: [N, 2] in [0, 1] (x, y order)
        t_indices: [T] absolute frame indices
        """
        z = self._z_embed(t_indices)  # [T]
        xn = xy_normalized[:, 0] * self.scale
        yn = xy_normalized[:, 1] * self.scale

        dim_t = _dim_t(self.num_pos_feats, self.temperature)
        dim_t_z = _dim_t(self.num_pos_feats * 2, self.temperature)

        pos_x = _interleave_sin_cos(xn[:, None] / dim_t)  # [N, F]
        pos_y = _interleave_sin_cos(yn[:, None] / dim_t)  # [N, F]
        pos_z = _interleave_sin_cos(z[:, None] / dim_t_z)  # [T, 2F]

        pos_yx = jnp.concatenate([pos_y, pos_x], axis=-1)  # [N, 2F]
        return pos_yx[None, :, :] + pos_z[:, None, :]  # [T, N, 2F]
