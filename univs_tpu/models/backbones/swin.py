"""Swin Transformer backbone (T/B/L), NHWC flax.

Rebuild of the reference's vendored ``D2SwinTransformer``
(reference: mask2former/modeling/backbone/swin.py:687 — window
attention :74, patch merging :298, per-stage LayerNorm outputs) written
TPU-first: window partition/shift via reshapes + jnp.roll (static
shapes), attention as batched MXU matmuls with the relative-position
bias added as a precomputed [heads, w*w, w*w] table, bf16-ready.

Geometry per variant (reference Model_zoo.md / swin defaults):
  tiny:  dim 96,  depths (2,2,6,2),  heads (3,6,12,24)
  base:  dim 128, depths (2,2,18,2), heads (4,8,16,32)
  large: dim 192, depths (2,2,18,2), heads (6,12,24,48)
Feature map strides: res2=4 ... res5=32.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VARIANTS = {
    "swin_tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swin_small": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "swin_base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swin_large": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}


def _rel_pos_index(w: int) -> np.ndarray:
    """Relative position index table for a w x w window -> [w*w, w*w]."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + np.array([w - 1, w - 1])
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray | None) -> jnp.ndarray:
        """x: [nW, w*w, C]; bias: additive [nW_mask, 1, w*w, w*w] or None."""
        w2 = self.window * self.window
        H = self.num_heads
        hd = self.dim // H
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(*x.shape[:-1], 3, H, hd), 3, axis=-3)
        q = q[..., 0, :, :]
        k = k[..., 0, :, :]
        v = v[..., 0, :, :]
        rpb = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, H),
            jnp.float32,
        )
        idx = jnp.asarray(_rel_pos_index(self.window))
        rel_bias = rpb[idx.reshape(-1)].reshape(w2, w2, H).transpose(2, 0, 1)  # [H, w2, w2]

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits / np.sqrt(hd) + rel_bias[None]
        if bias is not None:
            nW = bias.shape[0]
            logits = logits.reshape(-1, nW, H, w2, w2) + bias[None, :, :, :, :]
            logits = logits.reshape(-1, H, w2, w2)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(*x.shape[:-1], self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, H, W, C] — UNPADDED.

        Window padding happens INSIDE the block, after norm1, with
        zeros, and the attention output is cropped back before the
        residual (reference swin.py:235-276): the zero-padded keys DO
        participate in every window's softmax, so padding outside the
        block (where pad rows would evolve through residuals) changes
        real-token activations — caught by the round-4 parity test."""
        B, H, W, C = x.shape
        w = self.window
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(x.dtype)
        ph = (w - H % w) % w
        pw = (w - W % w) % w
        y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
        Hp, Wp = H + ph, W + pw
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
        # window partition
        yw = y.reshape(B, Hp // w, w, Wp // w, w, C).transpose(0, 1, 3, 2, 4, 5)
        yw = yw.reshape(-1, w * w, C)
        bias = None
        if self.shift > 0:
            bias = jnp.asarray(_shift_mask(Hp, Wp, w, self.shift))  # [nW, 1, w2, w2]
        yw = WindowAttention(self.dim, self.num_heads, w, self.dtype, name="attn")(yw, bias)
        y = yw.reshape(B, Hp // w, Wp // w, w, w, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + y[:, :H, :W]
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(x.dtype)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        # exact (erf) GELU: torch nn.GELU default; flax defaults to tanh
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(nn.gelu(y, approximate=False))
        return x + y


def _shift_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """Additive attention mask for shifted windows [nW, 1, w2, w2].

    Region labels are assigned directly in the POST-ROLL coordinate
    space (reference swin.py:239-258 builds img_mask on the padded map
    without rolling): the (0,-w)/(-w,-shift)/(-shift,None) boundaries
    already describe where rolled-in content lands, so only the last
    window row/column mixes regions.  (Labelling the origin space and
    rolling the labels over-masks contiguous rows — a real accuracy
    bug caught by the round-4 activation-parity test.)"""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(H // w, w, W // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    diff = win[:, None, :] != win[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)[:, None]


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        B, H0, W0, _ = x.shape
        # patch embed: 4x4 conv
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype, name="patch_embed")(
            x.astype(self.dtype)
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")(x).astype(self.dtype)

        outs = {}
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            B_, H, W, C = x.shape
            w = self.window
            block_cls = nn.remat(SwinBlock) if self.use_checkpoint else SwinBlock
            for blk in range(depth):
                x = block_cls(
                    dim=dim, num_heads=self.num_heads[stage], window=w,
                    shift=0 if blk % 2 == 0 else w // 2, dtype=self.dtype,
                    name=f"stage{stage}_block{blk}",
                )(x)
            name = f"res{stage + 2}"
            if name in self.out_features:
                outs[name] = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"out_norm{stage}")(x).astype(self.dtype)
            if stage < len(self.depths) - 1:
                # patch merging: 2x2 concat + LN + linear to 2*dim
                ph2, pw2 = H % 2, W % 2
                xm = jnp.pad(x, ((0, 0), (0, ph2), (0, pw2), (0, 0)))
                h2, w2 = xm.shape[1] // 2, xm.shape[2] // 2
                # concat order (0,0), (1,0), (0,1), (1,1) matches torch swin
                xm = jnp.concatenate(
                    [xm[:, 0::2, 0::2], xm[:, 1::2, 0::2], xm[:, 0::2, 1::2], xm[:, 1::2, 1::2]],
                    axis=-1,
                )
                xm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"merge_norm{stage}")(xm).astype(self.dtype)
                x = nn.Dense(2 * dim, use_bias=False, dtype=self.dtype, name=f"merge_reduction{stage}")(xm)
                dim *= 2
        return outs


def build_swin(cfg, dtype=jnp.float32) -> SwinTransformer:
    v = VARIANTS[cfg.name]
    return SwinTransformer(
        embed_dim=v["embed_dim"], depths=v["depths"], num_heads=v["num_heads"],
        window=cfg.swin_window_size, out_features=cfg.out_features,
        use_checkpoint=cfg.swin_use_checkpoint, dtype=dtype,
    )
