"""Multi-scale deformable-attention pixel decoder (encoder + FPN), NHWC.

TPU-native rebuild of the reference's ``MSDeformAttnPixelDecoder``
(reference: mask2former/modeling/pixel_decoder/msdeformattn.py):
a 6-layer deformable-DETR encoder over the {res3, res4, res5} pyramid
(8 heads, 4 points, FFN 1024) followed by a 1-step FPN down to the 1/4
``mask_features`` map.  Differences from the reference are deliberate
TPU choices:

- channels-last feature maps; all per-level token concat/splitting is
  static-shape (spatial shapes are Python ints at trace time);
- the deformable attention core is :func:`univs_tpu.ops.ms_deform_attn`
  (fused XLA gather / Pallas kernel) instead of a CUDA extension, with
  fp32 accumulation (the reference forces fp32 here too —
  msdeformattn.py:316 @autocast(enabled=False));
- no padding masks: videos in a batch are resized/padded to one static
  shape up front, so valid_ratios == 1 and reference points are the
  static pixel-center grid (msdeformattn.py:142-155 simplifies to this
  when masks are empty, which is also the reference's runtime behavior
  — masks are all-zeros at msdeformattn.py:62).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from univs_tpu.ops.deformable_attention import ms_deform_attn
from univs_tpu.ops.position_encoding import SinePositionEncoding3D

# TPU-only fused kernels (ops/msda_rows.py, ops/fused_mlp.py); module
# flag so probes can A/B the unfused path (tools/probe_encode_attrib.py)
_FUSED_ENCODER = True


def _use_fused(mod: nn.Module) -> bool:
    return (
        _FUSED_ENCODER
        and jax.default_backend() == "tpu"
        and not mod.is_initializing()
    )


def _msda_offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Direction-grid init for sampling-offset bias (deformable DETR).

    Head h points along angle 2*pi*h/H, scaled 1..n_points per point,
    replicated over levels (reference: ops/modules/ms_deform_attn.py:66-74).
    """

    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * np.pi / n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [H, 2]
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        for i in range(n_points):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


class MSDeformAttnLayer(nn.Module):
    """The deformable attention module: offset/weight prediction +
    sampling core + output projection
    (reference: ops/modules/ms_deform_attn.py:34-121)."""

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [N, Lq, C]
        reference_points: jnp.ndarray,  # [Lq, L, 2] in [0,1] (shared over batch)
        value_src: jnp.ndarray,  # [N, S, C]
        spatial_shapes: Tuple[Tuple[int, int], ...],
    ) -> jnp.ndarray:
        N, Lq, C = query.shape
        M, L, P = self.n_heads, self.n_levels, self.n_points
        head_dim = C // M

        value = nn.Dense(C, dtype=self.dtype, name="value_proj")(value_src)
        value = value.reshape(N, -1, M, head_dim)

        if _use_fused(self):
            # fused sampling path (ops/msda_rows.py): ONE Pallas kernel
            # computes both Dense projections, the (L*P) softmax, the
            # sampling-location arithmetic, and writes the tent kernels'
            # packed row array directly — the unfused path below
            # materializes ~250 MB/layer of offsets/transposes that
            # exist only to be re-laid-out (probe_glue.py: 6.7 ms of
            # the 42.9 ms encoder layer).  Params created by the init
            # trace of the unfused path; custom VJP differentiates the
            # gather law.  Valid because reference points here are the
            # static pixel-center grid (no padding masks — module doc).
            from univs_tpu.ops.msda_rows import msda_sample_fused

            po = self.get_variable("params", "sampling_offsets")
            pa = self.get_variable("params", "attention_weights")
            out = msda_sample_fused(
                value, query, po["kernel"], po["bias"], pa["kernel"],
                pa["bias"], tuple(spatial_shapes), M, P,
            )
            return nn.Dense(C, dtype=self.dtype, name="output_proj")(out)

        offsets = nn.Dense(
            M * L * P * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=_msda_offset_bias_init(M, L, P),
            name="sampling_offsets",
        )(query).reshape(N, Lq, M, L, P, 2)

        attn = nn.Dense(
            M * L * P,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(N, Lq, M, L * P)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).reshape(N, Lq, M, L, P)

        normalizer = jnp.array(
            [[w, h] for h, w in spatial_shapes], dtype=jnp.float32
        )  # [L, 2] (x, y)
        locs = (
            reference_points[None, :, None, :, None, :]
            + offsets.astype(jnp.float32) / normalizer[None, None, None, :, None, :]
        )  # [N, Lq, M, L, P, 2]

        out = ms_deform_attn(value, spatial_shapes, locs, attn)
        return nn.Dense(C, dtype=self.dtype, name="output_proj")(out)


class DeformableEncoderLayer(nn.Module):
    """Deformable self-attn + LN, FFN + LN (post-norm)
    (reference: msdeformattn.py:92-133)."""

    d_model: int = 256
    ffn_dim: int = 1024
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        q = src + pos
        attn_out = MSDeformAttnLayer(
            d_model=self.d_model,
            n_levels=self.n_levels,
            n_heads=self.n_heads,
            n_points=self.n_points,
            dtype=self.dtype,
            name="self_attn",
        )(q, reference_points, src, spatial_shapes)
        if _use_fused(self):
            # fused residual+LN+FFN Pallas kernel: keeps the [tokens,
            # ffn_dim] hidden activation in VMEM instead of a 161 MB
            # HBM round-trip per layer (ops/fused_mlp.py).  The unfused
            # path below runs at init (creating the identical param
            # tree) and on non-TPU backends.
            from univs_tpu.ops.fused_mlp import fused_ffn_ln

            return fused_ffn_ln(
                src, attn_out,
                self.get_variable("params", "norm1"),
                self.get_variable("params", "linear1"),
                self.get_variable("params", "linear2"),
                self.get_variable("params", "norm2"),
            )
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + attn_out)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(src)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src + y)


def _reference_points(spatial_shapes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """Static pixel-center reference grid, broadcast over levels.

    [S, L, 2] where S = sum(H*W); coords normalized to [0,1] (x, y).
    """
    pts = []
    for (h, w) in spatial_shapes:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = jnp.concatenate(pts, axis=0)  # [S, 2]
    L = len(spatial_shapes)
    return jnp.broadcast_to(ref[:, None, :], (ref.shape[0], L, 2))


class MSDeformAttnPixelDecoder(nn.Module):
    """Pixel decoder: per-level 1x1 proj + GN, 6 deformable encoder
    layers, FPN fusion to 1/4, and the mask-features 1x1 conv.

    __call__(features) -> (mask_features, mask_features_before_conv,
    transformer_encoder_features, multi_scale_features)
    matching the reference's forward_features contract
    (msdeformattn.py:316-360), in NHWC.
    """

    hidden_dim: int = 256
    mask_dim: int = 256
    num_layers: int = 6
    num_heads: int = 8
    num_points: int = 4
    ffn_dim: int = 1024
    transformer_in_features: Tuple[str, ...] = ("res3", "res4", "res5")
    fpn_in_features: Tuple[str, ...] = ("res2",)  # high-res maps fused by FPN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        C = self.hidden_dim
        L = len(self.transformer_in_features)
        pe = SinePositionEncoding3D(num_pos_feats=C // 2, normalize=True)

        # top-down order (lowest resolution first): res5, res4, res3
        names_td = list(self.transformer_in_features)[::-1]
        srcs, poss, shapes = [], [], []
        for i, name in enumerate(names_td):
            x = features[name]
            n, h, w, _ = x.shape
            y = nn.Conv(C, (1, 1), dtype=self.dtype, name=f"input_proj_{i}")(x)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name=f"input_proj_gn_{i}")(y)
            srcs.append(y.reshape(n, h * w, C))
            pos2d = pe.grid2d(h, w).astype(self.dtype)  # [h, w, C]
            level_embed = self.param(
                f"level_embed_{i}", nn.initializers.normal(1.0), (C,), jnp.float32
            )
            poss.append(
                (pos2d.reshape(1, h * w, C) + level_embed.astype(self.dtype)[None, None])
            )
            shapes.append((h, w))

        src = jnp.concatenate(srcs, axis=1)  # [N, S, C]
        pos = jnp.concatenate(
            [jnp.broadcast_to(p, (src.shape[0],) + p.shape[1:]) for p in poss], axis=1
        )
        spatial_shapes = tuple(shapes)
        ref_pts = _reference_points(spatial_shapes)

        for li in range(self.num_layers):
            src = DeformableEncoderLayer(
                d_model=C,
                ffn_dim=self.ffn_dim,
                n_levels=L,
                n_heads=self.num_heads,
                n_points=self.num_points,
                dtype=self.dtype,
                name=f"encoder_layer_{li}",
            )(src, pos, ref_pts, spatial_shapes)

        # split back to maps (static shapes)
        outs: List[jnp.ndarray] = []
        start = 0
        n = src.shape[0]
        for (h, w) in spatial_shapes:
            outs.append(src[:, start : start + h * w].reshape(n, h, w, C))
            start += h * w

        # FPN: fuse high-res backbone maps down to common stride (1/4)
        for i, name in enumerate(list(self.fpn_in_features)[::-1]):
            x = features[name]
            lat = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype, name=f"adapter_{i}")(x)
            lat = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name=f"adapter_gn_{i}")(lat)
            up = jax.image.resize(
                outs[-1], (n, x.shape[1], x.shape[2], C), method="bilinear"
            ).astype(self.dtype)
            y = lat + up
            y = nn.Conv(C, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name=f"layer_{i}")(y)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name=f"layer_gn_{i}")(y)
            outs.append(nn.relu(y))

        mask_features_bfe_conv = outs[-1]  # 1/4, C channels
        mask_features = nn.Conv(self.mask_dim, (1, 1), dtype=self.dtype, name="mask_features")(
            mask_features_bfe_conv
        )
        multi_scale_features = outs[:3]  # [1/32, 1/16, 1/8]
        return mask_features, mask_features_bfe_conv, outs[0], multi_scale_features
