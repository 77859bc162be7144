"""Attribute encode time: backbone vs MSDA kernels vs encoder glue vs FPN.

Round-3b left "non-MSDA pixel-decoder cost ~49 ms / 5 frames" and
"backbone ~38 ms / 5 frames" as unattributed 2x-roofline lines.  This
probe times, at the production 640x960 / T=5 geometry (sync-amortized):

  backbone       — R50 forward (jitted alone)
  enc_layer      — ONE DeformableEncoderLayer in situ (proj + offsets +
                   softmax + MSDA op + output proj + FFN + LNs)
  msda_op        — just the ms_deform_attn op (all 3 per-level kernels +
                   the location/weight transposes feeding them)
  kernels        — the 3 pallas kernels alone on pre-packed rows
  proj_glue      — enc_layer minus msda_op (Dense/FFN/LN/softmax)
  pack_glue      — msda_op minus kernels (transposes/reshapes/slab prep)
  fpn            — input projections + FPN fusion + mask_features conv

    python tools/probe_encode_attrib.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from univs_tpu.config import UniVSConfig
from univs_tpu.models.univs import UniVSModel, build_pixel_decoder
from univs_tpu.models.pixel_decoder import DeformableEncoderLayer, _reference_points
from univs_tpu.ops.deformable_attention import ms_deform_attn, ms_deform_attn_tent


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf[(0,) * leaf.ndim]))


def timeit(fn, *args, iters=10):
    for _ in range(2):
        sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    cfg = UniVSConfig(dtype="bfloat16")
    model = UniVSModel(cfg)
    t, h, w = 5, 640, 960
    C, M, P, L = 256, 8, 4, 3
    shapes = ((h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32))
    S = sum(hh * ww for hh, ww in shapes)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, t, h, w, 3) * 255, jnp.float32)

    # --- backbone + full encode (production fns) ---
    @jax.jit
    def backbone_fn(p, x):
        return model.apply(
            {"params": p}, x.reshape(t, h, w, 3),
            method=lambda m, y: m.backbone(m.normalize(y)),
        )

    @jax.jit
    def encode_fn(p, x):
        return model.apply({"params": p}, x, method=lambda m, y: m.encode_features(y))

    fi = jnp.arange(t)[None]
    from univs_tpu.structures import TextPrompts
    K = 40
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))

    # init at a small spatial size: params are shape-independent and the
    # full-size init compile alone costs minutes on the remote-compile path
    images_small = jnp.asarray(rng.rand(1, t, 64, 96, 3) * 255, jnp.float32)

    @jax.jit
    def init_fn(r, x, fi):
        return model.init({"params": r}, x, fi, task="detection",
                          text_prompts=tp, cls_emb=cls_emb)

    params = init_fn(jax.random.PRNGKey(0), images_small, fi)["params"]

    t_bb = timeit(backbone_fn, params, images)
    print(f"backbone        : {t_bb*1e3:7.1f} ms / 5 frames", flush=True)
    t_enc = timeit(encode_fn, params, images)
    print(f"encode (bb+pd)  : {t_enc*1e3:7.1f} ms / 5 frames", flush=True)

    # --- one encoder layer in situ ---
    layer = DeformableEncoderLayer(d_model=C, ffn_dim=1024, n_levels=L,
                                   n_heads=M, n_points=P, dtype=jnp.bfloat16)
    src = jnp.asarray(rng.randn(t, S, C), jnp.bfloat16)
    pos = jnp.asarray(rng.randn(t, S, C), jnp.bfloat16)
    ref = _reference_points(shapes)
    lparams = layer.init(jax.random.PRNGKey(1), src, pos, ref, shapes)["params"]

    @jax.jit
    def layer_fn(p, s):
        return layer.apply({"params": p}, s, pos, ref, shapes)

    t_layer = timeit(layer_fn, lparams, src)
    print(f"enc_layer       : {t_layer*1e3:7.1f} ms  (x6 = {6*t_layer*1e3:.0f})", flush=True)

    # --- the msda op alone (realistic clustered locations) ---
    value = jnp.asarray(rng.randn(t, S, M, C // M), jnp.bfloat16)
    base = np.concatenate([
        np.stack(np.meshgrid((np.arange(ww) + 0.5) / ww, (np.arange(hh) + 0.5) / hh),
                 -1).reshape(-1, 2)
        for hh, ww in shapes
    ])  # [S, 2] (x, y)
    locs = base[None, :, None, None, None, :] + rng.randn(t, S, M, L, P, 2) * 0.01
    locs = jnp.asarray(locs, jnp.float32)
    attn = jax.nn.softmax(jnp.asarray(rng.randn(t, S, M, L * P), jnp.float32)
                          ).reshape(t, S, M, L, P)

    @jax.jit
    def msda_fn(v, l, a):
        return ms_deform_attn(v, shapes, l, a, impl="tent")

    t_msda = timeit(msda_fn, value, locs, attn)
    print(f"msda_op         : {t_msda*1e3:7.1f} ms", flush=True)

    # --- kernels alone on pre-packed per-level rows ---
    packed = []
    for lid, (hh, ww) in enumerate(shapes):
        x = (locs[..., lid, :, 0] * ww - 0.5).transpose(0, 1, 3, 2).reshape(t, S * P, M)
        y = (locs[..., lid, :, 1] * hh - 0.5).transpose(0, 1, 3, 2).reshape(t, S * P, M)
        wa = attn[:, :, :, lid].transpose(0, 1, 3, 2).reshape(t, S * P, M)
        packed.append((jnp.asarray(x), jnp.asarray(y), jnp.asarray(wa)))

    starts = [0]
    for (hh, ww) in shapes:
        starts.append(starts[-1] + hh * ww)

    from univs_tpu.ops.deformable_attention import (
        _msda_tent2d_level, _msda_tent_win_level, _tent_window_rows, _TENT2D_MAX_S,
    )
    D = C // M
    slabs, metas = [], []
    for lid, (hh, ww) in enumerate(shapes):
        vl = value[:, starts[lid]:starts[lid + 1]]
        if hh * ww <= _TENT2D_MAX_S:
            slabs.append(jnp.moveaxis(vl, 2, 1))
            metas.append(("2d", ww, 0))
        else:
            s = jnp.moveaxis(vl, 2, 1).reshape(t, M, hh, ww, D)
            s = s.transpose(0, 1, 3, 2, 4).reshape(t, M, ww, hh * D)
            slabs.append(s)
            metas.append(("win", ww, _tent_window_rows(hh, D) or hh))

    @jax.jit
    def kernels_fn(slab_args, packed_args):
        outs = []
        for (kind, ww, hw), slab, (x, y, wa) in zip(metas, slab_args, packed_args):
            if kind == "2d":
                outs.append(_msda_tent2d_level(slab, x, y, wa, D, P, ww))
            else:
                outs.append(_msda_tent_win_level(slab, x, y, wa, D, P, hw))
        return sum(outs)

    t_kern = timeit(kernels_fn, slabs, packed)
    print(f"kernels         : {t_kern*1e3:7.1f} ms", flush=True)
    print(f"proj_glue       : {(t_layer - t_msda)*1e3:7.1f} ms  (Dense/FFN/LN/softmax)", flush=True)
    print(f"pack_glue       : {(t_msda - t_kern)*1e3:7.1f} ms  (transpose/slab prep)", flush=True)

    # --- FPN + projections: encode minus backbone minus 6 layers ---
    print(f"fpn+proj (resid): {(t_enc - t_bb - 6*t_layer)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
