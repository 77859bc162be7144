"""End-to-end full-model activation parity vs the assembled REFERENCE chain.

Each stage already has isolated parity (test_convert, test_ref_parity);
this asserts the ASSEMBLED forward — normalize -> backbone -> pixel
decoder -> decoder — against the reference meta-arch's law
(univs/univs_prompt.py:379-385 normalization, 403-405 backbone+head;
mask2former/modeling/meta_arch/mask_former_head.py:148-165 the
pixel-decoder->predictor chain with multi_scale_features in
coarse->fine order and the post-conv mask features;
mask_features_bfe_conv is reshaped but never consumed by the predictor,
decoder_univs.py:305-313).  Stage-boundary conventions (feature
ordering, pre/post-conv mask features, NCHW<->NHWC, dtype) are exactly
where isolated tests can't see bugs.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import ref_shim
from univs_tpu.utils.convert import convert_swin, flatten_torch
from univs_tpu.utils.convert_univs import convert_decoder, convert_pixel_decoder

TOL = 1e-3  # four compounding stages (each stage alone holds 1e-4)

C = 64
DT = 48
QL = 16
K = 7
T = 2
ENC_LAYERS = 2
DEC_LAYERS = 3
EMBED = 32  # swin embed dim -> channels (32, 64, 128, 256)


def test_full_graph_activation_parity(tmp_path):
    from univs_tpu.config import (
        BackboneConfig,
        DecoderConfig,
        PixelDecoderConfig,
        UniVSConfig,
    )
    from univs_tpu.models import backbones
    from univs_tpu.models.backbones import swin as swin_mod
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts

    # ---------------- reference chain (torch, random init) ----------------
    smod = ref_shim.load_reference_swin_module()
    pmod = ref_shim.load_reference_pixel_decoder_module()
    dmod = ref_shim.load_reference_decoder_module()
    ShapeSpec = sys.modules["detectron2.layers"].ShapeSpec

    torch.manual_seed(0)
    depths, heads = (2, 2, 2, 2), (2, 4, 8, 16)
    ref_bb = smod.SwinTransformer(
        pretrain_img_size=224, patch_size=4, in_chans=3, embed_dim=EMBED,
        depths=list(depths), num_heads=list(heads), window_size=7,
        mlp_ratio=4.0, qkv_bias=True, qk_scale=None, drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0, ape=False, patch_norm=True,
        out_indices=(0, 1, 2, 3), frozen_stages=-1, use_checkpoint=False,
    )
    ref_bb.eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p_ in ref_bb.parameters():
            p_.copy_(torch.randn(p_.shape, generator=g) * 0.05)

    input_shape = {
        "res2": ShapeSpec(channels=EMBED, stride=4),
        "res3": ShapeSpec(channels=EMBED * 2, stride=8),
        "res4": ShapeSpec(channels=EMBED * 4, stride=16),
        "res5": ShapeSpec(channels=EMBED * 8, stride=32),
    }
    torch.manual_seed(1)
    ref_pd = pmod.MSDeformAttnPixelDecoder(
        input_shape=input_shape,
        transformer_dropout=0.0,
        transformer_nheads=8,
        transformer_dim_feedforward=256,
        transformer_enc_layers=ENC_LAYERS,
        conv_dim=C,
        mask_dim=C,
        norm="GN",
        transformer_in_features=["res3", "res4", "res5"],
        common_stride=4,
    )
    ref_pd.eval()

    torch.manual_seed(2)
    bank = torch.randn(K, DT)
    pth = tmp_path / "cls_emb.pth"
    torch.save(bank, pth)
    dmod.combined_datasets_category_info["parity_test"] = (K, 0)
    ref_dec = dmod.VideoMultiScaleMaskedTransformerDecoderUniVS(
        in_channels=C, mask_classification=True, num_classes=K,
        hidden_dim=C, num_queries=QL, nheads=8, dim_feedforward=128,
        dec_layers=DEC_LAYERS, pre_norm=False, mask_dim=C,
        enforce_input_project=False, num_frames=T,
        clip_class_embed_path=str(pth), visual_prompt_sampler=None,
        num_dense_points=8, text_prompt_enable=True, prompt_as_queries=True,
        text_prompt_to_image_enable=True, maskdec_self_attn_mask_type="sep",
        position_embedding_sin3d_type="ArbitraryT",
    )
    ref_dec.eval()

    # the assembled reference law (univs_prompt.py:379-385, 403-405 +
    # mask_former_head.py:148-165); H, W divisible by 32 so the
    # ImageList padding is a no-op
    H, W = 64, 96
    rng = np.random.RandomState(3)
    images = (rng.rand(T, H, W, 3) * 255).astype(np.float32)
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    frame_indices = torch.arange(T)
    targets = [{
        "task": "detection", "dataset_name": "parity_test",
        "prompt_type": "text", "frame_indices": frame_indices,
    }]
    with torch.no_grad():
        x_t = torch.from_numpy(
            ((images - mean) / std).transpose(0, 3, 1, 2).copy())
        feats_t = ref_bb(x_t)
        mf_t, mf_bfe_t, _, ms_t = ref_pd.forward_features(feats_t)
        out_ref = ref_dec(list(ms_t), mf_t, mask_features_bfe_conv=mf_bfe_t,
                          mask=None, targets=targets)

    # ---------------- ours: one assembled UniVSModel forward --------------
    swin_mod.VARIANTS["swin_parity_test"] = {
        "embed_dim": EMBED, "depths": depths, "num_heads": heads,
    }
    cfg = UniVSConfig(
        backbone=BackboneConfig(name="swin_parity_test"),
        pixel_decoder=PixelDecoderConfig(
            hidden_dim=C, num_layers=ENC_LAYERS, num_heads=8, num_points=4,
            ffn_dim=256, mask_dim=C),
        decoder=DecoderConfig(
            hidden_dim=C, num_queries=QL, num_layers=DEC_LAYERS, num_heads=8,
            ffn_dim=128, mask_dim=C, clip_cls_emb_dim=DT, num_classes=K,
            lang_dim=DT),
        num_frames=T,
    )
    model = UniVSModel(cfg)

    params = {
        "backbone": convert_swin(
            flatten_torch({k: v for k, v in ref_bb.state_dict().items()}),
            depths=depths),
        "pixel_decoder": convert_pixel_decoder(
            {"sem_seg_head.pixel_decoder." + k: v.detach().numpy()
             for k, v in ref_pd.state_dict().items()},
            num_layers=ENC_LAYERS),
        "decoder": convert_decoder(
            {"sem_seg_head.predictor." + k: v.detach().numpy()
             for k, v in ref_dec.state_dict().items()},
            num_layers=DEC_LAYERS),
    }

    bank_j = jnp.asarray(bank.numpy())
    tp = TextPrompts(embs=bank_j[None, :, None, :],
                     valid=jnp.ones((1, K), bool))
    out = model.apply(
        {"params": params},
        jnp.asarray(images)[None],
        jnp.asarray(frame_indices.numpy())[None],
        task="detection",
        text_prompts=tp,
        cls_emb=bank_j,
    )

    for key, ref_key in (("pred_logits", "pred_logits"),
                         ("pred_masks", "pred_masks"),
                         ("pred_embds", "pred_embds")):
        r = out_ref[ref_key].numpy()
        o = np.asarray(out[key])
        scale = max(float(np.abs(r).max()), 1e-3)
        d = float(np.abs(o - r).max()) / scale
        assert d < TOL, f"{key}: rel diff {d} (scale {scale})"
