"""VL pixel decoder + HOTA tests."""

import numpy as np
import jax
import jax.numpy as jnp

from univs_tpu.evaluation.hota import hota_single_video
from univs_tpu.models.pixel_decoder_vl import MSDeformAttnPixelDecoderVL, VLFuse


def test_vl_fuse_shapes():
    vf = VLFuse(v_dim=32, l_dim=16, embed_dim=64, num_heads=4)
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(2, 50, 32), jnp.float32)
    l = jnp.asarray(rng.randn(2, 7, 16), jnp.float32)
    params = vf.init(jax.random.PRNGKey(0), v, l)
    dv, dl = vf.apply(params, v, l, jnp.ones((2, 7), bool))
    assert dv.shape == v.shape and dl.shape == l.shape
    assert bool(jnp.isfinite(dv).all()) and bool(jnp.isfinite(dl).all())


def test_vl_pixel_decoder():
    bt = 2
    feats = {
        "res2": jnp.ones((bt, 16, 24, 48)),
        "res3": jnp.ones((bt, 8, 12, 96)),
        "res4": jnp.ones((bt, 4, 6, 192)),
        "res5": jnp.ones((bt, 2, 3, 384)),
    }
    lang = jnp.asarray(np.random.RandomState(0).randn(1, 7, 16), jnp.float32)
    pd = MSDeformAttnPixelDecoderVL(
        hidden_dim=32, mask_dim=32, num_layers=2, num_heads=4,
        num_points=2, ffn_dim=64, lang_dim=16,
    )
    params = pd.init(jax.random.PRNGKey(0), feats, lang)
    mf, mfb, enc, ms, lang_out = pd.apply(params, feats, lang)
    assert mf.shape == (bt, 16, 24, 32)
    assert lang_out.shape == (bt, 7, 16)
    assert bool(jnp.isfinite(mf).all())


def _m(y0, y1, x0, x1, h=16, w=16):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return m


def test_hota_perfect_and_swapped():
    gt = [{1: _m(0, 8, 0, 8), 2: _m(8, 16, 8, 16)} for _ in range(4)]
    res = hota_single_video(gt, gt)
    assert abs(res["HOTA"] - 1.0) < 1e-6
    # identity-swapped prediction halfway: association degrades
    pr = [dict(t) for t in gt]
    for t in range(2, 4):
        pr[t] = {1: gt[t][2], 2: gt[t][1]}
    res2 = hota_single_video(gt, pr)
    assert res2["DetA"] > 0.99
    assert res2["AssA"] < 0.8
    assert res2["HOTA"] < res["HOTA"]
