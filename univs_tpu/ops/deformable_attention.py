"""Multi-scale deformable attention, TPU-native.

The reference's only compiled extension is a CUDA MSDeformAttn kernel
(reference: mask2former/modeling/pixel_decoder/ops/src/,
ms_deform_im2col_cuda.cuh).  Its semantics are fully specified by the
pure-PyTorch fallback ``ms_deform_attn_core_pytorch``
(reference: ops/functions/ms_deform_attn_func.py:52-72): per level, a
bilinear ``grid_sample`` (align_corners=False, zero padding) at
``2*loc-1`` grid coords, then a weighted sum over (levels x points).

Here we provide:

- :func:`ms_deform_attn_reference` — a direct, readable JAX
  transcription of those semantics (loop over levels, vectorized
  bilinear gather).  Used as the numerics oracle in tests.
- :func:`ms_deform_attn` — the production path.  Same math, but all
  levels gathered from one flattened value tensor in a single fused
  computation so XLA emits one gather + one reduction; fp32
  accumulation regardless of input dtype (the reference force-runs
  deformable attn in fp32 under AMP — msdeformattn.py @autocast(False)).
- A Pallas kernel variant lives in :mod:`univs_tpu.ops.pallas_msda`
  and is dispatched automatically on TPU for supported shapes.

Coordinate convention (torch grid_sample, align_corners=False):
``pix = loc * size - 0.5`` where ``loc`` in [0, 1]; out-of-range
neighbours contribute zero.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather_2d(value: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with zero padding (grid_sample align_corners=False).

    value: [H, W, D]; x, y: [...] pixel coords (already loc*size-0.5).
    Returns [..., D].
    """
    H, W, D = value.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def gather(xi, yi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = value.reshape(H * W, D)
        v = flat[yc * W + xc]  # [..., D]
        return v * inb[..., None].astype(value.dtype)

    out = (
        gather(x0, y0) * (wx0 * wy0)[..., None]
        + gather(x1, y0) * (wx1 * wy0)[..., None]
        + gather(x0, y1) * (wx0 * wy1)[..., None]
        + gather(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out


def ms_deform_attn_reference(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Readable oracle implementation (per-level loop).

    value: [N, S, M, D] where S = sum(H_l*W_l)
    spatial_shapes: static list of (H_l, W_l)
    sampling_locations: [N, Lq, M, L, P, 2] in [0, 1] (x, y)
    attention_weights: [N, Lq, M, L, P] (already softmaxed over L*P)
    returns [N, Lq, M*D]
    """
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    starts = [0]
    for (h, w) in spatial_shapes:
        starts.append(starts[-1] + h * w)
    assert starts[-1] == S

    out = jnp.zeros((N, Lq, M, D), dtype=jnp.float32)
    for lid, (h, w) in enumerate(spatial_shapes):
        vl = value[:, starts[lid] : starts[lid + 1]].reshape(N, h, w, M, D)
        loc = sampling_locations[:, :, :, lid]  # [N, Lq, M, P, 2]
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        # vmap over batch and heads
        def sample_one(v_hw, xs, ys):  # v_hw: [h,w,D]; xs,ys: [Lq,P]
            return _bilinear_gather_2d(v_hw.astype(jnp.float32), xs, ys)

        sampled = jax.vmap(  # over N
            jax.vmap(sample_one, in_axes=(2, 0, 0), out_axes=2),  # over M
            in_axes=(0, 0, 0),
        )(vl, jnp.moveaxis(x, 2, 1), jnp.moveaxis(y, 2, 1))
        # x moveaxis: [N, Lq, M, P] -> [N, M, Lq, P]; sampled: [N, Lq, P, M, D]
        w_l = attention_weights[:, :, :, lid]  # [N, Lq, M, P]
        out = out + jnp.einsum(
            "nqpmd,nqmp->nqmd", sampled, w_l.astype(jnp.float32)
        )
    return out.reshape(N, Lq, M * D)


@partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Production multi-scale deformable attention (fused XLA gather).

    Same signature/semantics as :func:`ms_deform_attn_reference`, but
    all L levels are sampled with a single gather from the flattened
    [S, ...] value tensor: per-level (H, W) geometry is folded into
    precomputed flat base offsets, and out-of-bounds handling is done
    with per-corner validity masks.  Accumulation is fp32.

    Output dtype follows ``value.dtype``.
    """
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)

    compute_dtype = jnp.float32
    loc = sampling_locations.astype(compute_dtype)

    hs = jnp.array([h for h, _ in spatial_shapes], dtype=compute_dtype)
    ws = jnp.array([w for _, w in spatial_shapes], dtype=compute_dtype)
    starts_list = [0]
    for (h, w) in spatial_shapes:
        starts_list.append(starts_list[-1] + h * w)
    level_start = jnp.array(starts_list[:-1], dtype=jnp.int32)

    # pixel coords per level: [N, Lq, M, L, P]
    x = loc[..., 0] * ws[None, None, None, :, None] - 0.5
    y = loc[..., 1] * hs[None, None, None, :, None] - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    w_attn = attention_weights.astype(compute_dtype)

    # value laid out per head: [N, M, S, D] so gathers index [S] contiguously
    v = jnp.moveaxis(value, 2, 1).astype(compute_dtype)  # [N, M, S, D]

    Wl = ws[None, None, None, :, None]
    Hl = hs[None, None, None, :, None]

    def corner(xi, yi, wgt):
        inb = (xi >= 0) & (xi <= Wl - 1) & (yi >= 0) & (yi <= Hl - 1)
        xc = jnp.clip(xi, 0.0, Wl - 1.0).astype(jnp.int32)
        yc = jnp.clip(yi, 0.0, Hl - 1.0).astype(jnp.int32)
        flat_idx = level_start[None, None, None, :, None] + yc * Wl.astype(jnp.int32) + xc
        # combine bilinear weight * attention weight * in-bounds
        wfull = wgt * w_attn * inb.astype(compute_dtype)  # [N, Lq, M, L, P]
        # reshape for one take_along_axis per (N, M)
        idx = jnp.moveaxis(flat_idx, 2, 1).reshape(N, M, Lq * L * P)  # [N,M,K]
        g = jnp.take_along_axis(v, idx[..., None], axis=2)  # [N, M, K, D]
        g = g.reshape(N, M, Lq, L * P, D)
        wf = jnp.moveaxis(wfull, 2, 1).reshape(N, M, Lq, L * P)
        return jnp.einsum("nmqkd,nmqk->nmqd", g, wf)

    out = (
        corner(x0, y0, (1.0 - wx1) * (1.0 - wy1))
        + corner(x0 + 1.0, y0, wx1 * (1.0 - wy1))
        + corner(x0, y0 + 1.0, (1.0 - wx1) * wy1)
        + corner(x0 + 1.0, y0 + 1.0, wx1 * wy1)
    )  # [N, M, Lq, D]
    out = jnp.moveaxis(out, 1, 2).reshape(N, Lq, M * D)
    return out.astype(value.dtype)
