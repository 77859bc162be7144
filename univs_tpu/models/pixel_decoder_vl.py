"""Vision-language pixel decoder: deformable encoder + per-layer
bi-directional vision<->language fusion.

Rebuild of the reference's ``MSDeformAttnPixelDecoderVL``
(reference: univs/modeling/pixel_decoder/msdeformattn_vl.py:143-374 +
vision_lang_biattn_layers.py — UNINEXT/GLIP-style VLFuse: a shared
bi-attention matrix between vision tokens and language tokens, softmax
over opposite axes, layer-scale gammas, inserted before each
deformable encoder layer).  Used for RefVOS early fusion.

The bi-attention runs one (Sv x Sl) logits matrix per head and softmaxes
it both ways — MXU-native.  Logit clamping (+-50000) from the reference
protects fp16; kept for bf16.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from univs_tpu.models.pixel_decoder import (
    DeformableEncoderLayer,
    _reference_points,
)
from univs_tpu.ops.position_encoding import SinePositionEncoding3D


class BiMultiHeadAttention(nn.Module):
    """Shared-logits bi-attention (vision_lang_biattn_layers.py:9-135)."""

    embed_dim: int
    num_heads: int
    v_dim: int
    l_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v, l, lang_valid=None):
        """v: [B, Sv, Cv], l: [B, Sl, Cl] -> (dv, dl)."""
        H = self.num_heads
        hd = self.embed_dim // H
        scale = hd ** -0.5

        def proj(x, name):
            y = nn.Dense(self.embed_dim, dtype=self.dtype, name=name)(x)
            return y.reshape(*y.shape[:-1], H, hd)

        q = proj(v, "v_proj") * scale
        k = proj(l, "l_proj")
        vv = proj(v, "values_v_proj")
        vl = proj(l, "values_l_proj")

        logits = jnp.einsum("bvhd,blhd->bhvl", q, k).astype(jnp.float32)
        logits = jnp.clip(logits, -50000.0, 50000.0)

        # language->vision softmax (over vision axis, max-normalized)
        lt = logits - logits.max(axis=2, keepdims=True)
        attn_l = jax.nn.softmax(jnp.clip(lt, -50000.0, 50000.0), axis=2)

        if lang_valid is not None:
            logits = jnp.where(lang_valid[:, None, None, :], logits, -9e15)
        attn_v = jax.nn.softmax(logits, axis=3)

        dv = jnp.einsum("bhvl,blhd->bvhd", attn_v.astype(vl.dtype), vl)
        dl = jnp.einsum("bhvl,bvhd->blhd", attn_l.astype(vv.dtype), vv)
        dv = dv.reshape(*dv.shape[:-2], self.embed_dim)
        dl = dl.reshape(*dl.shape[:-2], self.embed_dim)
        dv = nn.Dense(self.v_dim, dtype=self.dtype, name="out_v_proj")(dv)
        dl = nn.Dense(self.l_dim, dtype=self.dtype, name="out_l_proj")(dl)
        return dv, dl


class VLFuse(nn.Module):
    """Pre-LN bi-attention with layer-scale gammas (GLIP VLFuse)."""

    v_dim: int = 256
    l_dim: int = 640
    embed_dim: int = 512  # 2 * v_dim, GLIP default
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v, l, lang_valid=None):
        # NOTE the residual law: the reference REASSIGNS v/l to the
        # normed values before adding the scaled deltas
        # (vision_lang_biattn_layers.py:192-202 — `v = self.layer_norm_v(v);
        # ... v = v + self.drop_path(self.gamma_v * delta_v)`), so the
        # residual base is the NORMED feature, not the block input.
        vn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm_v")(v).astype(v.dtype)
        ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm_l")(l).astype(l.dtype)
        dv, dl = BiMultiHeadAttention(
            self.embed_dim, self.num_heads, self.v_dim, self.l_dim,
            self.dtype, name="attn",
        )(vn, ln, lang_valid)
        gamma_v = self.param("gamma_v", nn.initializers.constant(1 / 6), (self.v_dim,), jnp.float32)
        gamma_l = self.param("gamma_l", nn.initializers.constant(1 / 6), (self.l_dim,), jnp.float32)
        return vn + gamma_v.astype(v.dtype) * dv, ln + gamma_l.astype(l.dtype) * dl


class MSDeformAttnPixelDecoderVL(nn.Module):
    """Pixel decoder with early vision-language fusion.

    __call__(features, lang_feats [B*T? no — B, Sl, Cl], lang_valid)
    -> (mask_features, mask_features_bfe_conv, enc_feat,
        multi_scale_features, lang_features)
    matching the reference's VL forward contract
    (msdeformattn_vl.py:331-374).
    """

    hidden_dim: int = 256
    mask_dim: int = 256
    num_layers: int = 6
    num_heads: int = 8
    num_points: int = 4
    ffn_dim: int = 1024
    lang_dim: int = 640
    transformer_in_features: Tuple[str, ...] = ("res3", "res4", "res5")
    fpn_in_features: Tuple[str, ...] = ("res2",)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], lang_feats: jnp.ndarray,
                 lang_valid: Optional[jnp.ndarray] = None):
        C = self.hidden_dim
        L = len(self.transformer_in_features)
        pe = SinePositionEncoding3D(num_pos_feats=C // 2, normalize=True)

        names_td = list(self.transformer_in_features)[::-1]
        srcs, poss, shapes = [], [], []
        for i, name in enumerate(names_td):
            x = features[name]
            n, h, w, _ = x.shape
            y = nn.Conv(C, (1, 1), dtype=self.dtype, name=f"input_proj_{i}")(x)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name=f"input_proj_gn_{i}")(y)
            srcs.append(y.reshape(n, h * w, C))
            pos2d = pe.grid2d(h, w).astype(self.dtype)
            level_embed = self.param(f"level_embed_{i}", nn.initializers.normal(1.0), (C,), jnp.float32)
            poss.append(pos2d.reshape(1, h * w, C) + level_embed.astype(self.dtype)[None, None])
            shapes.append((h, w))

        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate([jnp.broadcast_to(p, (src.shape[0],) + p.shape[1:]) for p in poss], axis=1)
        spatial_shapes = tuple(shapes)
        ref_pts = _reference_points(spatial_shapes)

        lang = lang_feats.astype(self.dtype)
        if lang.shape[0] != src.shape[0]:
            lang = jnp.broadcast_to(lang, (src.shape[0],) + lang.shape[1:])
        for li in range(self.num_layers):
            # the reference builds VLFuse with embed_dim =
            # dim_feedforward (msdeformattn_vl.py:37 `VLFuse(d_model,
            # d_lang, dim_feedforward, nhead)`), NOT the GLIP default
            src, lang = VLFuse(
                v_dim=C, l_dim=self.lang_dim, embed_dim=self.ffn_dim,
                dtype=self.dtype, name=f"vl_fuse_{li}"
            )(src, lang, lang_valid)
            src = DeformableEncoderLayer(
                d_model=C, ffn_dim=self.ffn_dim, n_levels=L,
                n_heads=self.num_heads, n_points=self.num_points,
                dtype=self.dtype, name=f"encoder_layer_{li}",
            )(src, pos, ref_pts, spatial_shapes)

        outs: List[jnp.ndarray] = []
        start = 0
        n = src.shape[0]
        for (h, w) in spatial_shapes:
            outs.append(src[:, start : start + h * w].reshape(n, h, w, C))
            start += h * w

        for i, name in enumerate(list(self.fpn_in_features)[::-1]):
            x = features[name]
            lat = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype, name=f"adapter_{i}")(x)
            lat = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name=f"adapter_gn_{i}")(lat)
            up = jax.image.resize(outs[-1], (n, x.shape[1], x.shape[2], C), method="bilinear").astype(self.dtype)
            y = nn.Conv(C, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name=f"layer_{i}")(lat + up)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name=f"layer_gn_{i}")(y)
            outs.append(nn.relu(y))

        mask_features_bfe = outs[-1]
        mask_features = nn.Conv(self.mask_dim, (1, 1), dtype=self.dtype, name="mask_features")(mask_features_bfe)
        return mask_features, mask_features_bfe, outs[0], outs[:3], lang
