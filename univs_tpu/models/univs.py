"""UniVS meta-architecture: backbone -> pixel decoder -> UniVS decoder.

TPU-native equivalent of the reference's ``UniVS_Prompt``
(reference: univs/univs_prompt.py:66-489) plus the ``MaskFormerHead``
coupling layer (reference: mask2former/modeling/meta_arch/
mask_former_head.py:20-230).  The whole clip forward is one pure
function of (params, images, prompts) with static shapes, so a single
``jit`` covers normalize -> backbone -> encoder -> decoder; training
adds the criterion outside.

Inference drivers (univs_tpu.inference) call :meth:`__call__` per clip
with memory-pool prompts; they own all cross-clip state.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from univs_tpu.config import UniVSConfig
from univs_tpu.models.backbones.resnet import build_backbone
from univs_tpu.models.decoder import UniVSDecoder
from univs_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
from univs_tpu.prompts.visual_prompt import (
    broadcast_prompt_sample,
    sample_train_clip_prompts,
)
from univs_tpu.structures import TextPrompts, VisualPrompts, make_visual_prompts


def compute_dtype_of(cfg: UniVSConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def build_pixel_decoder(cfg: UniVSConfig, name=None) -> MSDeformAttnPixelDecoder:
    c = cfg.pixel_decoder
    return MSDeformAttnPixelDecoder(
        hidden_dim=c.hidden_dim, mask_dim=c.mask_dim, num_layers=c.num_layers,
        num_heads=c.num_heads, num_points=c.num_points, ffn_dim=c.ffn_dim,
        dtype=compute_dtype_of(cfg), name=name,
    )


def build_decoder(cfg: UniVSConfig, name=None) -> UniVSDecoder:
    c = cfg.decoder
    return UniVSDecoder(
        hidden_dim=c.hidden_dim, num_queries=c.num_queries, num_layers=c.num_layers,
        num_heads=c.num_heads, ffn_dim=c.ffn_dim, pre_norm=c.pre_norm,
        mask_dim=c.mask_dim, text_emb_dim=c.clip_cls_emb_dim,
        self_attn_mask_type=c.self_attn_mask_type, num_max_frames=c.num_max_frames,
        l4p_fusion=c.l4p_fusion, temporal_query_shuffle=c.temporal_query_shuffle,
        remat_heads=c.remat_heads,
        dtype=compute_dtype_of(cfg), name=name,
    )


class UniVSModel(nn.Module):
    cfg: UniVSConfig

    def setup(self):
        c = self.cfg
        self.compute_dtype = compute_dtype_of(c)
        self.backbone = build_backbone(c.backbone, dtype=self.compute_dtype)
        self.pixel_decoder = build_pixel_decoder(c, name="pixel_decoder")
        self.decoder = build_decoder(c, name="decoder")

    # ------------------------------------------------------------------

    def normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        """[..., H, W, 3] raw RGB (0-255) -> normalized
        (reference: univs_prompt.py:379-385 pixel mean/std)."""
        mean = jnp.asarray(self.cfg.pixel_mean, jnp.float32)
        std = jnp.asarray(self.cfg.pixel_std, jnp.float32)
        return ((images - mean) / std).astype(self.compute_dtype)

    def encode_features(self, images: jnp.ndarray):
        """images [B, T, H, W, 3] raw -> (mask_features [B*T, H/4, W/4, Cm],
        multi_scale [coarse->fine], finest-level grid)."""
        b, t, h, w, _ = images.shape
        x = self.normalize(images).reshape(b * t, h, w, 3)
        feats = self.backbone(x)
        mask_features, _, _, ms = self.pixel_decoder(feats)
        return mask_features, ms

    # ------------------------------------------------------------------

    def __call__(
        self,
        images: jnp.ndarray,  # [B, T, H, W, 3] raw RGB
        frame_indices: jnp.ndarray,  # [B, T]
        task: str = "detection",
        text_prompts: Optional[TextPrompts] = None,
        visual_prompts: Optional[VisualPrompts] = None,
        cls_emb: Optional[jnp.ndarray] = None,
        # training-time visual prompt annotations (sot / visual detection)
        gt_masks: Optional[jnp.ndarray] = None,  # [B, Qp, T, Hm, Wm]
        gt_boxes: Optional[jnp.ndarray] = None,  # [B, Qp, T, 4] normalized
        gt_occur: Optional[jnp.ndarray] = None,  # [B, Qp, T] bool
        gt_obj_valid: Optional[jnp.ndarray] = None,  # [B, Qp] bool
        train: bool = False,
    ) -> Dict:
        mask_features, ms = self.encode_features(images)

        if train and task == "sot" and visual_prompts is None and gt_masks is not None:
            grid_feats, grid_pos = self.decoder.prompt_feature_grid(ms[-1], frame_indices)
            rng = self.make_rng("prompt")
            b = images.shape[0]
            rngs = jax.random.split(rng, b + 1)
            samples, _ = jax.vmap(
                lambda f, p, m, bx, oc, ov, r: sample_train_clip_prompts(
                    f, p, m, bx, oc, ov, self.cfg.prompt.num_dense_points_train, r
                )
            )(grid_feats, grid_pos, gt_masks, gt_boxes, gt_occur, gt_obj_valid, rngs[:b])
            t = images.shape[1]
            kv, kv_pe, kv_valid = jax.vmap(lambda s: broadcast_prompt_sample(s, t))(samples)
            use_pe = jax.random.uniform(rngs[b], ()) > 0.5  # coin flip (decoder_univs.py:646-649)
            visual_prompts = make_visual_prompts(kv, kv_pe, kv_valid, samples.valid, use_pe, t=t)

        return self.decoder(
            ms,
            mask_features,
            frame_indices,
            task=task,
            visual_prompts=visual_prompts,
            text_prompts=text_prompts,
            cls_emb=cls_emb,
            train=train,
        )
