"""ResNet backbone (torchvision-style bottlenecks, frozen BN), NHWC.

Mirrors the capability of the reference's detectron2
``build_resnet_backbone`` configuration
(reference: configs/univs/Base.yaml:2-15 — R50, basic stem,
STRIDE_IN_1X1=False i.e. torchvision geometry, FrozenBN, out features
res2..res5) but is written TPU-first: channels-last layout so XLA maps
convolutions straight onto the MXU, frozen-BN folded into a single
fused scale/bias (no batch statistics ever computed), and bf16-ready
via the ``dtype`` attribute with fp32 parameters.

Feature map strides: res2=4, res3=8, res4=16, res5=32.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics: a per-channel affine transform.

    Stores (scale, bias, mean, var) as non-trainable-by-convention
    parameters so torchvision/d2 checkpoints convert 1:1; the forward
    pass folds them into one multiply-add (XLA fuses it into the
    preceding conv).
    """

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        mul = scale * (var + self.eps) ** -0.5
        add = bias - mean * mul
        return x * mul.astype(self.dtype) + add.astype(self.dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (stride here; torchvision geometry) -> 1x1 + residual."""

    mid_channels: int
    out_channels: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        conv = lambda ch, k, s, d, name: nn.Conv(
            ch, (k, k), strides=(s, s), padding=[(d * (k // 2),) * 2] * 2,
            kernel_dilation=(d, d), use_bias=False, dtype=self.dtype, name=name,
        )
        y = conv(self.mid_channels, 1, 1, 1, "conv1")(x)
        y = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(y))
        y = conv(self.mid_channels, 3, self.stride, self.dilation, "conv2")(y)
        y = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn2")(y))
        y = conv(self.out_channels, 1, 1, 1, "conv3")(y)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn3")(y)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            residual = conv(self.out_channels, 1, self.stride, 1, "shortcut")(x)
            residual = FrozenBatchNorm(dtype=self.dtype, name="shortcut_bn")(residual)
        return nn.relu(y + residual)


_STAGE_SPECS = {
    # depth 10: one bottleneck per stage — NOT a torchvision geometry;
    # a test/dryrun-only trunk with the same stride/channel contract as
    # R50 so the full graph (pixel decoder, decoder, criterion) exercises
    # identically while compiling ~6x faster on the CPU dryrun mesh
    10: (1, 1, 1, 1),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}


class ResNet(nn.Module):
    """ResNet-50/101 trunk emitting a {res2..res5} feature pyramid.

    Input: [N, H, W, 3] (normalized images). Output: dict of NHWC maps.
    """

    depth: int = 50
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        blocks = _STAGE_SPECS[self.depth]
        x = x.astype(self.dtype)
        # stem: 7x7/2 + frozen BN + relu + 3x3/2 maxpool
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = {}
        channels = (256, 512, 1024, 2048)
        for stage_idx, (n_blocks, out_ch) in enumerate(zip(blocks, channels)):
            mid = out_ch // 4
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage_idx > 0) else 1
                x = Bottleneck(
                    mid_channels=mid,
                    out_channels=out_ch,
                    stride=stride,
                    dtype=self.dtype,
                    name=f"res{stage_idx + 2}_block{b}",
                )(x)
            name = f"res{stage_idx + 2}"
            if name in self.out_features:
                outs[name] = x
        return outs


def build_backbone(cfg, dtype=jnp.float32) -> nn.Module:
    """Factory from a BackboneConfig (config.py)."""
    name = cfg.name
    if name.startswith("resnet"):
        return ResNet(depth=cfg.resnet_depth, out_features=cfg.out_features, dtype=dtype)
    if name.startswith("swin"):
        from univs_tpu.models.backbones.swin import build_swin

        return build_swin(cfg, dtype=dtype)
    if name.startswith("pvt"):
        from univs_tpu.models.backbones.pvt import build_pvt

        return build_pvt(name, dtype=dtype)
    raise ValueError(f"unknown backbone {name!r}")
