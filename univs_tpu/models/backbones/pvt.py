"""PVTv2 backbone (b0-b5), NHWC flax.

Rebuild of the reference's vendored PVTv2
(reference: mask2former/modeling/backbone/pvt_v2.py, 360 LoC):
overlapping patch embeddings (7x7/4 then 3x3/2), spatial-reduction
attention with conv-downsampled K/V, Mix-FFN with a 3x3 depthwise
conv, per-stage LayerNorm outputs res2..res5.

Two SRA flavors, selected by ``linear`` exactly as in the reference
(pvt_v2.py:57-131): ``linear=False`` uses a strided sr_ratio x sr_ratio
conv per stage; ``linear=True`` (what the reference's ONLY registered
builder ``build_pvtv2_b2_backbone`` uses, pvt_v2.py:339-359) pools K/V
to a fixed 7x7 grid (torch AdaptiveAvgPool2d law), 1x1-convs, norms,
and GELUs them — at EVERY stage, including sr_ratio=1.  The linear
variant also inserts a ReLU after the Mix-FFN's fc1 (Mlp.forward,
pvt_v2.py:45-55).  All GELUs are exact-erf (torch nn.GELU), all
LayerNorms eps=1e-6 (builder's partial).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

VARIANTS = {
    "pvt_v2_b0": dict(dims=(32, 64, 160, 256), depths=(2, 2, 2, 2), heads=(1, 2, 5, 8)),
    "pvt_v2_b1": dict(dims=(64, 128, 320, 512), depths=(2, 2, 2, 2), heads=(1, 2, 5, 8)),
    "pvt_v2_b2": dict(dims=(64, 128, 320, 512), depths=(3, 4, 6, 3), heads=(1, 2, 5, 8)),
    "pvt_v2_b3": dict(dims=(64, 128, 320, 512), depths=(3, 4, 18, 3), heads=(1, 2, 5, 8)),
    "pvt_v2_b5": dict(dims=(64, 128, 320, 512), depths=(3, 6, 40, 3), heads=(1, 2, 5, 8)),
}
SR_RATIOS = (8, 4, 2, 1)
MLP_RATIOS = (8, 8, 4, 4)

_gelu = functools.partial(nn.gelu, approximate=False)  # torch nn.GELU = erf


def adaptive_avg_pool2d(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """torch ``AdaptiveAvgPool2d(out)`` on NHWC: output cell i averages
    input rows [floor(i*H/out), ceil((i+1)*H/out)) — exact law."""

    def pool_axis(y, axis):
        size = y.shape[axis]
        segs = []
        for i in range(out):
            s = (i * size) // out
            e = -((-(i + 1) * size) // out)
            segs.append(
                jax.lax.slice_in_dim(y, s, e, axis=axis).mean(axis, keepdims=True)
            )
        return jnp.concatenate(segs, axis=axis)

    return pool_axis(pool_axis(x, 1), 2)


class SRAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    linear: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, w):
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        q = nn.Dense(C, dtype=self.dtype, name="q")(x).reshape(B, N, H, hd)
        if self.linear:
            # linear SRA (pvt_v2.py:116-121): pool to 7x7, 1x1 conv,
            # norm, GELU — regardless of sr_ratio
            xm = adaptive_avg_pool2d(x.reshape(B, h, w, C), 7)
            xm = nn.Conv(C, (1, 1), dtype=self.dtype, name="sr")(xm)
            kv_in = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="sr_norm")(
                xm.reshape(B, -1, C)
            ).astype(x.dtype)
            kv_in = _gelu(kv_in)
        elif self.sr_ratio > 1:
            xm = x.reshape(B, h, w, C)
            xm = nn.Conv(C, (self.sr_ratio,) * 2, strides=(self.sr_ratio,) * 2,
                         dtype=self.dtype, name="sr")(xm)
            kv_in = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="sr_norm")(
                xm.reshape(B, -1, C)
            ).astype(x.dtype)
        else:
            kv_in = x
        kv = nn.Dense(2 * C, dtype=self.dtype, name="kv")(kv_in)
        k, v = jnp.split(kv.reshape(B, -1, 2, H, hd), 2, axis=2)
        k, v = k[:, :, 0], v[:, :, 0]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / (hd ** 0.5)
        attn = jax.nn.softmax(logits, -1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class MixFFN(nn.Module):
    dim: int
    hidden: int
    linear: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, w):
        B, N, C = x.shape
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        if self.linear:  # Mlp.forward: relu after fc1 (pvt_v2.py:48-49)
            y = nn.relu(y)
        ym = y.reshape(B, h, w, self.hidden)
        ym = nn.Conv(self.hidden, (3, 3), padding="SAME", feature_group_count=self.hidden,
                     dtype=self.dtype, name="dwconv")(ym)
        y = _gelu(ym.reshape(B, N, self.hidden))
        return nn.Dense(C, dtype=self.dtype, name="fc2")(y)


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int
    linear: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, w):
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x).astype(x.dtype)
        x = x + SRAttention(self.dim, self.num_heads, self.sr_ratio,
                            self.linear, self.dtype, name="attn")(y, h, w)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x).astype(x.dtype)
        x = x + MixFFN(self.dim, self.dim * self.mlp_ratio, self.linear,
                       self.dtype, name="mlp")(y, h, w)
        return x


class PVTv2(nn.Module):
    dims: Tuple[int, ...] = (64, 128, 320, 512)
    depths: Tuple[int, ...] = (3, 4, 6, 3)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    linear: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        outs = {}
        for s in range(4):
            patch = (7, 4, 3) if s == 0 else (3, 2, 1)
            k, stride, pad = patch
            x = nn.Conv(self.dims[s], (k, k), strides=(stride, stride),
                        padding=[(pad, pad)] * 2, dtype=self.dtype,
                        name=f"patch_embed{s}")(x.astype(self.dtype))
            B, h, w, C = x.shape
            t = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"patch_norm{s}")(
                x.reshape(B, h * w, C)
            ).astype(self.dtype)
            for b in range(self.depths[s]):
                t = PVTBlock(self.dims[s], self.num_heads[s], SR_RATIOS[s],
                             MLP_RATIOS[s], self.linear, self.dtype,
                             name=f"stage{s}_block{b}")(t, h, w)
            t = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"out_norm{s}")(t).astype(self.dtype)
            x = t.reshape(B, h, w, C)
            name = f"res{s + 2}"
            if name in self.out_features:
                outs[name] = x
        return outs


def build_pvt(name: str = "pvt_v2_b2", dtype=jnp.float32, linear: bool = True) -> PVTv2:
    """``linear=True`` matches the reference's only registered builder
    (build_pvtv2_b2_backbone, pvt_v2.py:339-359)."""
    v = VARIANTS[name]
    return PVTv2(dims=v["dims"], depths=v["depths"], num_heads=v["heads"],
                 linear=linear, dtype=dtype)
