"""Activation parity for the two previously shape-only model components:
the VL pixel decoder (MSDeformAttnPixelDecoderVL + VLFuse bi-attention,
reference univs/modeling/pixel_decoder/msdeformattn_vl.py +
vision_lang_biattn_layers.py) and the PVTv2 backbone
(mask2former/modeling/backbone/pvt_v2.py) — both run as the REAL
reference torch modules under tests/ref_shim.py, converted, and
compared <= 1e-4 on every output (vision AND language for the VL path).
"""

import sys

import numpy as np
import pytest
import jax.numpy as jnp
import torch

import ref_shim
from univs_tpu.utils.convert_univs import convert_pixel_decoder_vl, convert_pvt

TOL = 1e-4


def _sd_numpy(module, prefix=""):
    return {prefix + k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# VLFuse bi-attention block
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_vl_mod():
    return ref_shim.load_reference_pixel_decoder_vl_module()


def test_vlfuse_activation_parity(ref_vl_mod):
    """Standalone VLFuse: shared bi-attention logits, opposite-axis
    softmaxes, layer-scale gammas, and the normed-residual law
    (vision_lang_biattn_layers.py:192-202) — incl. the language mask."""
    from univs_tpu.models.pixel_decoder_vl import VLFuse

    vl_mod = sys.modules["univs.modeling.pixel_decoder.vision_lang_biattn_layers"]
    torch.manual_seed(0)
    ref = vl_mod.VLFuse(img_dim=32, lang_dim=24, embed_dim=64, n_head=4)
    ref.eval()

    B, Sv, Sl = 2, 50, 7
    v_t = torch.randn(B, Sv, 32)
    l_t = torch.randn(B, Sl, 24)
    mask_t = torch.ones(B, Sl, dtype=torch.int64)
    mask_t[:, -2:] = 0
    with torch.no_grad():
        v_ref, l_ref = ref(v_t, l_t, attention_mask_l=mask_t)
        v_ref_nm, l_ref_nm = ref(v_t, l_t)

    sd = _sd_numpy(ref)  # keys already carry the "b_attn." prefix
    params = {
        "layer_norm_v": {"scale": sd["b_attn.layer_norm_v.weight"],
                         "bias": sd["b_attn.layer_norm_v.bias"]},
        "layer_norm_l": {"scale": sd["b_attn.layer_norm_l.weight"],
                         "bias": sd["b_attn.layer_norm_l.bias"]},
        "gamma_v": sd["b_attn.gamma_v"],
        "gamma_l": sd["b_attn.gamma_l"],
        "attn": {
            n: {"kernel": sd[f"b_attn.attn.{n}.weight"].T,
                "bias": sd[f"b_attn.attn.{n}.bias"]}
            for n in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                      "out_v_proj", "out_l_proj")
        },
    }
    ours = VLFuse(v_dim=32, l_dim=24, embed_dim=64, num_heads=4)
    v_j, l_j = ours.apply(
        {"params": params}, jnp.asarray(v_t.numpy()), jnp.asarray(l_t.numpy()),
        jnp.asarray(mask_t.numpy()).astype(bool),
    )
    assert np.abs(np.asarray(v_j) - v_ref.numpy()).max() < TOL
    assert np.abs(np.asarray(l_j) - l_ref.numpy()).max() < TOL

    v_j, l_j = ours.apply(
        {"params": params}, jnp.asarray(v_t.numpy()), jnp.asarray(l_t.numpy())
    )
    assert np.abs(np.asarray(v_j) - v_ref_nm.numpy()).max() < TOL
    assert np.abs(np.asarray(l_j) - l_ref_nm.numpy()).max() < TOL


# ---------------------------------------------------------------------------
# full VL pixel decoder
# ---------------------------------------------------------------------------


def test_vl_pixel_decoder_activation_parity(ref_vl_mod):
    """forward_features parity on every output: mask_features, bfe,
    enc_feat, all multi-scale levels, AND the fused language features
    (msdeformattn_vl.py:331-374)."""
    from univs_tpu.models.pixel_decoder_vl import MSDeformAttnPixelDecoderVL

    ShapeSpec = sys.modules["detectron2.layers"].ShapeSpec
    torch.manual_seed(1)
    input_shape = {
        "res2": ShapeSpec(channels=96, stride=4),
        "res3": ShapeSpec(channels=192, stride=8),
        "res4": ShapeSpec(channels=384, stride=16),
        "res5": ShapeSpec(channels=768, stride=32),
    }
    ref = ref_vl_mod.MSDeformAttnPixelDecoderVL(
        input_shape=input_shape,
        lang_dim=48,
        transformer_dropout=0.0,
        transformer_nheads=8,
        transformer_dim_feedforward=128,
        transformer_enc_layers=2,
        conv_dim=64,
        mask_dim=64,
        norm="GN",
        transformer_in_features=["res3", "res4", "res5"],
        common_stride=4,
    )
    ref.eval()

    torch.manual_seed(2)
    bt, H, W = 2, 64, 96
    feats_t = {
        "res2": torch.randn(bt, 96, H // 4, W // 4),
        "res3": torch.randn(bt, 192, H // 8, W // 8),
        "res4": torch.randn(bt, 384, H // 16, W // 16),
        "res5": torch.randn(bt, 768, H // 32, W // 32),
    }
    lang_t = torch.randn(bt, 7, 48)
    with torch.no_grad():
        mf_ref, bfe_ref, enc_ref, ms_ref, lang_ref = ref.forward_features(
            feats_t, lang_t
        )

    sd = _sd_numpy(ref, "sem_seg_head.pixel_decoder.")
    params = convert_pixel_decoder_vl(sd, num_layers=2)
    ours = MSDeformAttnPixelDecoderVL(
        hidden_dim=64, mask_dim=64, num_layers=2, ffn_dim=128, lang_dim=48
    )
    feats_j = {k: jnp.asarray(v.numpy().transpose(0, 2, 3, 1)) for k, v in feats_t.items()}
    mf, bfe, enc, ms, lang = ours.apply(
        {"params": params}, feats_j, jnp.asarray(lang_t.numpy())
    )

    def diff(j, t):
        return float(np.abs(np.asarray(j) - t.numpy().transpose(0, 2, 3, 1)).max())

    assert diff(mf, mf_ref) < TOL, f"mask_features {diff(mf, mf_ref)}"
    assert diff(bfe, bfe_ref) < TOL
    assert diff(enc, enc_ref) < TOL
    for a, b in zip(ms, ms_ref):
        assert diff(a, b) < TOL
    lang_err = float(np.abs(np.asarray(lang) - lang_ref.numpy()).max())
    assert lang_err < TOL, f"language features {lang_err}"


# ---------------------------------------------------------------------------
# PVTv2 backbone (the production linear-SRA variant)
# ---------------------------------------------------------------------------


def test_pvt_activation_parity():
    """PVTv2 with the reference's ONLY registered config shape:
    linear=True (AdaptiveAvgPool-7 SRA + post-fc1 ReLU), qkv_bias,
    eps=1e-6, mlp_ratios 8/8/4/4 (build_pvtv2_b2_backbone,
    pvt_v2.py:339-359) — all four res outputs <= 1e-4."""
    from functools import partial

    from univs_tpu.models.backbones.pvt import PVTv2

    pvt_mod = ref_shim.load_reference_pvt_module()
    torch.manual_seed(3)
    ref = pvt_mod.PyramidVisionTransformerV2(
        patch_size=4,
        embed_dims=[16, 32, 64, 128],
        num_heads=[1, 2, 4, 8],
        mlp_ratios=[8, 8, 4, 4],
        qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        depths=[1, 2, 1, 1],
        sr_ratios=[8, 4, 2, 1],
        drop_rate=0.0,
        drop_path_rate=0.0,
        linear=True,
        out_features=["res2", "res3", "res4", "res5"],
    )
    ref.eval()

    torch.manual_seed(4)
    x_t = torch.randn(1, 3, 64, 96)
    with torch.no_grad():
        out_ref = ref(x_t)

    params = convert_pvt(_sd_numpy(ref), depths=(1, 2, 1, 1), prefix="")
    ours = PVTv2(dims=(16, 32, 64, 128), depths=(1, 2, 1, 1),
                 num_heads=(1, 2, 4, 8), linear=True)
    out_j = ours.apply({"params": params}, jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)))

    for name in ("res2", "res3", "res4", "res5"):
        t = out_ref[name].numpy().transpose(0, 2, 3, 1)
        err = float(np.abs(np.asarray(out_j[name]) - t).max())
        assert err < TOL, f"{name}: {err}"
