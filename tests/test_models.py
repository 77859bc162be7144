"""Structural tests: backbone, pixel decoder, UniVS decoder."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univs_tpu.models.backbones.resnet import ResNet
from univs_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
from univs_tpu.models.decoder import UniVSDecoder, build_self_attn_bias
from univs_tpu.structures import TextPrompts, VisualPrompts, make_visual_prompts


def test_resnet_strides_and_channels():
    model = ResNet(depth=50)
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert set(out) == {"res2", "res3", "res4", "res5"}
    assert out["res2"].shape == (1, 16, 24, 256)
    assert out["res3"].shape == (1, 8, 12, 512)
    assert out["res4"].shape == (1, 4, 6, 1024)
    assert out["res5"].shape == (1, 2, 3, 2048)


def test_frozen_bn_is_affine():
    from univs_tpu.models.backbones.resnet import FrozenBatchNorm

    bn = FrozenBatchNorm()
    x = jnp.array(np.random.RandomState(0).randn(2, 4, 4, 3), jnp.float32)
    params = bn.init(jax.random.PRNGKey(0), x)
    p = params["params"]
    p = jax.tree.map(lambda a: a, p)
    p["mean"] = jnp.array([1.0, 2.0, 3.0])
    p["var"] = jnp.array([4.0, 1.0, 0.25])
    p["scale"] = jnp.array([2.0, 1.0, 1.0])
    p["bias"] = jnp.array([0.0, 1.0, -1.0])
    y = bn.apply({"params": p}, x)
    want = (np.asarray(x) - [1, 2, 3]) / np.sqrt(np.array([4, 1, 0.25]) + 1e-5) * [2, 1, 1] + [0, 1, -1]
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_pixel_decoder_out():
    C = 32
    bt = 2
    feats = {
        "res2": jnp.ones((bt, 16, 24, 48)),
        "res3": jnp.ones((bt, 8, 12, 96)),
        "res4": jnp.ones((bt, 4, 6, 192)),
        "res5": jnp.ones((bt, 2, 3, 384)),
    }
    pd = MSDeformAttnPixelDecoder(hidden_dim=C, mask_dim=C, num_layers=2, num_heads=4, num_points=2, ffn_dim=64)
    params = pd.init(jax.random.PRNGKey(0), feats)
    return pd, params, feats


def test_pixel_decoder_shapes(tiny_pixel_decoder_out):
    pd, params, feats = tiny_pixel_decoder_out
    mask_feat, mask_feat_pre, enc_feat, ms = pd.apply(params, feats)
    assert mask_feat.shape == (2, 16, 24, 32)
    assert mask_feat_pre.shape == (2, 16, 24, 32)
    assert enc_feat.shape == (2, 2, 3, 32)  # res5 scale
    assert [m.shape for m in ms] == [(2, 2, 3, 32), (2, 4, 6, 32), (2, 8, 12, 32)]
    assert all(bool(jnp.isfinite(m).all()) for m in [mask_feat] + ms)


def _tiny_decoder(**kw):
    return UniVSDecoder(
        hidden_dim=32, num_queries=8, num_layers=3, num_heads=4, ffn_dim=64,
        mask_dim=32, text_emb_dim=16, **kw,
    )


def _decoder_inputs(b=1, t=2):
    C = 32
    bt = b * t
    x_levels = [
        jnp.array(np.random.RandomState(1).randn(bt, 2, 3, C), jnp.float32),
        jnp.array(np.random.RandomState(2).randn(bt, 4, 6, C), jnp.float32),
        jnp.array(np.random.RandomState(3).randn(bt, 8, 12, C), jnp.float32),
    ]
    mask_features = jnp.array(np.random.RandomState(4).randn(bt, 16, 24, C), jnp.float32)
    frame_indices = jnp.arange(t)[None].repeat(b, 0)
    return x_levels, mask_features, frame_indices


def test_decoder_detection_with_text_prompts():
    b, t, K = 1, 2, 5
    dec = _tiny_decoder()
    x_levels, mask_features, frame_indices = _decoder_inputs(b, t)
    cls_emb = jnp.array(np.random.RandomState(5).randn(K, 16), jnp.float32)
    tp = TextPrompts(
        embs=cls_emb[None, :, None, :],  # [B, K, 1, 16]
        valid=jnp.ones((b, K), bool),
    )
    params = dec.init(
        {"params": jax.random.PRNGKey(0)},
        x_levels, mask_features, frame_indices,
        task="detection", text_prompts=tp, cls_emb=cls_emb,
    )
    out = dec.apply(
        params, x_levels, mask_features, frame_indices,
        task="detection", text_prompts=tp, cls_emb=cls_emb,
    )
    Q = 8 + K
    assert out["pred_logits"].shape == (b, Q, K)
    assert out["pred_masks"].shape == (b, Q, t, 16, 24)
    assert out["pred_embds"].shape == (b, Q, t, 32)
    assert out["aux_outputs"] == []  # aux only materialized at train
    assert bool(jnp.isfinite(out["pred_masks"]).all())
    assert bool(jnp.isfinite(out["pred_logits"]).all())


def test_decoder_sot_with_visual_prompts():
    b, t, Qp, L = 1, 2, 3, 4
    C = 32
    dec = _tiny_decoder()
    x_levels, mask_features, frame_indices = _decoder_inputs(b, t)
    rng = np.random.RandomState(7)
    kv = jnp.array(rng.randn(b, Qp, L, t, C), jnp.float32)
    kv_pe = jnp.array(rng.randn(b, Qp, L, t, C), jnp.float32)
    kv_valid = jnp.ones((b, Qp, L, t), bool).at[:, 2].set(False)  # slot 2 blank
    valid = jnp.array([[True, True, False]])
    vp = make_visual_prompts(kv, kv_pe, kv_valid, valid)
    cls_emb = jnp.array(rng.randn(5, 16), jnp.float32)
    params = dec.init(
        {"params": jax.random.PRNGKey(0)},
        x_levels, mask_features, frame_indices,
        task="sot", visual_prompts=vp, cls_emb=cls_emb,
    )
    out = dec.apply(
        params, x_levels, mask_features, frame_indices,
        task="sot", visual_prompts=vp, cls_emb=cls_emb,
    )
    assert out["pred_masks"].shape == (b, 8 + Qp, t, 16, 24)
    assert bool(jnp.isfinite(out["pred_masks"]).all())  # blank slot must not NaN


def test_decoder_grounding_l4p():
    b, t, Qe = 1, 2, 2
    dec = _tiny_decoder()
    x_levels, mask_features, frame_indices = _decoder_inputs(b, t)
    rng = np.random.RandomState(9)
    embs = jnp.array(rng.randn(b, Qe, 1 + 7, 16), jnp.float32)  # sentence + 7 word tokens
    tp = TextPrompts(embs=embs, valid=jnp.ones((b, Qe), bool))
    params = dec.init(
        {"params": jax.random.PRNGKey(0)},
        x_levels, mask_features, frame_indices, task="grounding", text_prompts=tp,
    )
    out = dec.apply(
        params, x_levels, mask_features, frame_indices, task="grounding", text_prompts=tp,
    )
    assert out["pred_logits"].shape == (b, 8 + Qe, Qe)
    assert bool(jnp.isfinite(out["pred_masks"]).all())


def test_decoder_train_mode_rngs():
    b, t, K = 1, 2, 4
    dec = _tiny_decoder()
    x_levels, mask_features, frame_indices = _decoder_inputs(b, t)
    cls_emb = jnp.array(np.random.RandomState(5).randn(K, 16), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((b, K), bool))
    params = dec.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        x_levels, mask_features, frame_indices,
        task="detection", text_prompts=tp, cls_emb=cls_emb, train=True,
    )
    out = dec.apply(
        params, x_levels, mask_features, frame_indices,
        task="detection", text_prompts=tp, cls_emb=cls_emb, train=True,
        rngs={"shuffle": jax.random.PRNGKey(2)},
    )
    assert "l2v_attn_weights" in out
    assert bool(jnp.isfinite(out["pred_masks"]).all())


def test_self_attn_bias_blocks():
    bias = build_self_attn_bias(2, 2, 2, "sep", "sot")[0, 0]
    n = bias.shape[0]
    assert n == 8
    b = np.asarray(bias)
    assert (b[:4, :4] == 0).all()  # learnable block allowed
    assert (b[4:, 4:] == 0).all()  # prompt block allowed (sep)
    assert (b[:4, 4:] < 0).all() and (b[4:, :4] < 0).all()
    # grounding forces per-object diagonal blocks
    bg = np.asarray(build_self_attn_bias(2, 2, 2, "sep", "grounding")[0, 0])
    assert (bg[4:6, 4:6] == 0).all() and (bg[6:8, 6:8] == 0).all()
    assert (bg[4:6, 6:8] < 0).all()
