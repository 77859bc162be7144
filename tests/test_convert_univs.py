"""Full UniVS checkpoint converter: structural round-trip on tiny dims."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univs_tpu.config import tiny_test_config
from univs_tpu.models.univs import build_decoder, build_pixel_decoder
from univs_tpu.utils.convert import report_unconverted
from univs_tpu.utils.convert_univs import convert_decoder, convert_pixel_decoder


def _fabricate_pixel_decoder_sd(C=32, layers=2, in_chans=(384, 192, 96), fpn_chans=(48,)):
    rng = np.random.RandomState(0)
    sd = {}
    p = "sem_seg_head.pixel_decoder."
    for i, cin in enumerate(in_chans):
        sd[f"{p}input_proj.{i}.0.weight"] = rng.randn(C, cin, 1, 1).astype(np.float32)
        sd[f"{p}input_proj.{i}.0.bias"] = rng.randn(C).astype(np.float32)
        sd[f"{p}input_proj.{i}.1.weight"] = rng.randn(C).astype(np.float32)
        sd[f"{p}input_proj.{i}.1.bias"] = rng.randn(C).astype(np.float32)
    sd[f"{p}transformer.level_embed"] = rng.randn(3, C).astype(np.float32)
    H, L, P = 4, 3, 2
    for li in range(layers):
        q = f"{p}transformer.encoder.layers.{li}."
        for name, (o, i_) in {
            "self_attn.sampling_offsets": (H * L * P * 2, C),
            "self_attn.attention_weights": (H * L * P, C),
            "self_attn.value_proj": (C, C),
            "self_attn.output_proj": (C, C),
            "linear1": (64, C),
            "linear2": (C, 64),
        }.items():
            sd[q + name + ".weight"] = rng.randn(o, i_).astype(np.float32)
            sd[q + name + ".bias"] = rng.randn(o).astype(np.float32)
        for name in ("norm1", "norm2"):
            sd[q + name + ".weight"] = np.ones(C, np.float32)
            sd[q + name + ".bias"] = np.zeros(C, np.float32)
    for i, cin in enumerate(fpn_chans):
        sd[f"{p}adapter_{i + 1}.weight"] = rng.randn(C, cin, 1, 1).astype(np.float32)
        sd[f"{p}adapter_{i + 1}.norm.weight"] = np.ones(C, np.float32)
        sd[f"{p}adapter_{i + 1}.norm.bias"] = np.zeros(C, np.float32)
        sd[f"{p}layer_{i + 1}.weight"] = rng.randn(C, C, 3, 3).astype(np.float32)
        sd[f"{p}layer_{i + 1}.norm.weight"] = np.ones(C, np.float32)
        sd[f"{p}layer_{i + 1}.norm.bias"] = np.zeros(C, np.float32)
    sd[f"{p}mask_features.weight"] = rng.randn(C, C, 1, 1).astype(np.float32)
    sd[f"{p}mask_features.bias"] = rng.randn(C).astype(np.float32)
    return sd


def _mha(sd, prefix, d, rng, key="multihead_attn"):
    sd[f"{prefix}.{key}.in_proj_weight"] = rng.randn(3 * d, d).astype(np.float32)
    sd[f"{prefix}.{key}.in_proj_bias"] = rng.randn(3 * d).astype(np.float32)
    sd[f"{prefix}.{key}.out_proj.weight"] = rng.randn(d, d).astype(np.float32)
    sd[f"{prefix}.{key}.out_proj.bias"] = rng.randn(d).astype(np.float32)
    sd[f"{prefix}.norm.weight"] = np.ones(d, np.float32)
    sd[f"{prefix}.norm.bias"] = np.zeros(d, np.float32)


def _fabricate_decoder_sd(C=32, layers=3, Q=8, Dt=16, mask_dim=32):
    rng = np.random.RandomState(1)
    sd = {}
    p = "sem_seg_head.predictor."
    sd[p + "query_feat.weight"] = rng.randn(Q, C).astype(np.float32)
    sd[p + "query_embed.weight"] = rng.randn(Q, C).astype(np.float32)
    sd[p + "level_embed.weight"] = rng.randn(3, C).astype(np.float32)
    for nm in ("cls_temp", "reid_temp", "prompt_detection", "prompt_sot", "prompt_grounding"):
        dim = 1 if "temp" in nm else C
        sd[p + nm + ".weight"] = rng.randn(1, dim).astype(np.float32)
    sd[p + "decoder_norm.weight"] = np.ones(C, np.float32)
    sd[p + "decoder_norm.bias"] = np.zeros(C, np.float32)
    for nm, (o, i_) in {
        "vis2text_projection": (Dt, C),
        "text2vis_projection": (C, Dt),
    }.items():
        sd[p + nm + ".weight"] = rng.randn(o, i_).astype(np.float32)
        sd[p + nm + ".bias"] = rng.randn(o).astype(np.float32)
    sd[p + "text_norm.weight"] = np.ones(Dt, np.float32)
    sd[p + "text_norm.bias"] = np.zeros(Dt, np.float32)
    for i in range(layers):
        _mha(sd, p + f"transformer_self_attention_layers.{i}", C, rng, key="self_attn")
        _mha(sd, p + f"transformer_cross_attention_layers.{i}", C, rng)
        _mha(sd, p + f"transformer_prompt_self_attention_layers.{i}", C, rng)
        for nm, (o, i_) in {"linear1": (64, C), "linear2": (C, 64)}.items():
            sd[p + f"transformer_ffn_layers.{i}.{nm}.weight"] = rng.randn(o, i_).astype(np.float32)
            sd[p + f"transformer_ffn_layers.{i}.{nm}.bias"] = rng.randn(o).astype(np.float32)
        sd[p + f"transformer_ffn_layers.{i}.norm.weight"] = np.ones(C, np.float32)
        sd[p + f"transformer_ffn_layers.{i}.norm.bias"] = np.zeros(C, np.float32)
    _mha(sd, p + "lang2vision_cross_attention_layer", C, rng)
    dims = [(C, C), (C, C), (mask_dim, C)]
    for i, (o, i_) in enumerate(dims):
        sd[p + f"mask_embed.layers.{i}.weight"] = rng.randn(o, i_).astype(np.float32)
        sd[p + f"mask_embed.layers.{i}.bias"] = rng.randn(o).astype(np.float32)
    return sd


def test_pixel_decoder_conversion_structure():
    cfg = tiny_test_config()
    pd = build_pixel_decoder(cfg)
    feats = {
        "res2": jnp.ones((1, 16, 24, 48)),
        "res3": jnp.ones((1, 8, 12, 96)),
        "res4": jnp.ones((1, 4, 6, 192)),
        "res5": jnp.ones((1, 2, 3, 384)),
    }
    ref = pd.init(jax.random.PRNGKey(0), feats)["params"]
    conv = convert_pixel_decoder(_fabricate_pixel_decoder_sd(), num_layers=2)
    missing = report_unconverted(ref, conv)
    assert missing == [], missing[:8]
    out = pd.apply({"params": conv}, feats)
    assert all(bool(jnp.isfinite(v).all()) for v in jax.tree.leaves(out))


def test_decoder_conversion_structure():
    cfg = tiny_test_config()
    dec = build_decoder(cfg)
    x_levels = [jnp.ones((2, 2, 3, 32)), jnp.ones((2, 4, 6, 32)), jnp.ones((2, 8, 12, 32))]
    mf = jnp.ones((2, 16, 24, 32))
    fi = jnp.arange(2)[None]
    cls_emb = jnp.ones((5, 16))
    from univs_tpu.structures import TextPrompts

    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, 5), bool))
    ref = dec.init({"params": jax.random.PRNGKey(0)}, x_levels, mf, fi,
                   task="detection", text_prompts=tp, cls_emb=cls_emb)["params"]
    conv = convert_decoder(_fabricate_decoder_sd(), num_layers=3)
    missing = report_unconverted(ref, conv)
    assert missing == [], missing[:8]
    out = dec.apply({"params": conv}, x_levels, mf, fi,
                    task="detection", text_prompts=tp, cls_emb=cls_emb)
    assert bool(jnp.isfinite(out["pred_masks"]).all())


def _d2_resnet50_sd():
    """Fabricated d2-naming ResNet-50 backbone state dict
    ('backbone.stem.conv1', 'backbone.res{2-5}.{b}.conv{1-3}.norm.*')."""
    rng = np.random.RandomState(7)

    def conv(sd, name, cout, cin, k):
        sd[name + ".weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.05
        sd[name + ".norm.weight"] = (rng.rand(cout) + 0.5).astype(np.float32)
        sd[name + ".norm.bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[name + ".norm.running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[name + ".norm.running_var"] = (rng.rand(cout) + 0.5).astype(np.float32)

    sd = {}
    conv(sd, "backbone.stem.conv1", 64, 3, 7)
    blocks, cins = (3, 4, 6, 3), (64, 256, 512, 1024)
    for s, nb in enumerate(blocks):
        cout, mid = 256 * 2 ** s, 64 * 2 ** s
        for b in range(nb):
            cin = cins[s] if b == 0 else cout
            pre = f"backbone.res{s + 2}.{b}"
            conv(sd, f"{pre}.conv1", mid, cin, 1)
            conv(sd, f"{pre}.conv2", mid, mid, 3)
            conv(sd, f"{pre}.conv3", cout, mid, 1)
            if b == 0:
                conv(sd, f"{pre}.shortcut", cout, cin, 1)
    return sd


def test_load_params_routes_full_checkpoint(tmp_path):
    """load_params on a reference-style UniVS .pth must return the
    CONVERTED param tree (backbone/pixel_decoder/decoder), with encoder
    and decoder layer counts inferred from the checkpoint keys — not
    the raw flat torch dict (which would break --weights on the CLI)."""
    import torch

    from univs_tpu.utils.checkpoint import load_params

    sd = {}
    sd.update(_fabricate_pixel_decoder_sd())  # 2 encoder layers
    sd.update(_fabricate_decoder_sd())  # 3 decoder layers
    sd.update(_d2_resnet50_sd())
    path = tmp_path / "univs_tiny.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}}, path)

    params = load_params(str(path))
    assert set(params) == {"backbone", "pixel_decoder", "decoder"}
    # layer counts inferred from keys
    assert "encoder_layer_1" in params["pixel_decoder"]
    assert "encoder_layer_2" not in params["pixel_decoder"]
    assert any("cross" in k and k.endswith("_2") for k in params["decoder"])
    assert params["backbone"]["stem_conv"]["kernel"].shape == (7, 7, 3, 64)

    # the converted tree drives the tiny modules end-to-end
    cfg = tiny_test_config()
    pd = build_pixel_decoder(cfg)
    feats = {
        "res2": jnp.ones((1, 16, 24, 48)),
        "res3": jnp.ones((1, 8, 12, 96)),
        "res4": jnp.ones((1, 4, 6, 192)),
        "res5": jnp.ones((1, 2, 3, 384)),
    }
    out = pd.apply({"params": params["pixel_decoder"]}, feats)
    assert all(bool(jnp.isfinite(v).all()) for v in jax.tree.leaves(out))
