"""Fused sampling-row kernel vs the XLA packing law (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from univs_tpu.ops.deformable_attention import pack_tent_rows, tent_row_pad
from univs_tpu.ops.msda_rows import fused_sampling_rows


def _reference_rows(q, wo, bo, wa_k, ba, shapes, M, P):
    """The module law: Dense -> softmax -> ref + off/normalizer -> pack
    (models/pixel_decoder.py MSDeformAttnLayer + pack_tent_rows)."""
    N, Lq, C = q.shape
    L = len(shapes)
    offs = (q @ wo + bo).reshape(N, Lq, M, L, P, 2)
    attn = (q @ wa_k + ba).reshape(N, Lq, M, L * P)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).reshape(N, Lq, M, L, P)
    # reference points: pixel centers per level, broadcast over levels
    pts = []
    for (h, w) in shapes:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = jnp.concatenate(pts, axis=0)  # [Lq, 2]
    ref = jnp.broadcast_to(ref[:, None, :], (ref.shape[0], L, 2))  # [Lq, L, 2]
    normalizer = jnp.array([[w, h] for h, w in shapes], jnp.float32)
    locs = (
        ref[None, :, None, :, None, :]
        + offs.astype(jnp.float32) / normalizer[None, None, None, :, None, :]
    )
    return pack_tent_rows(tuple(shapes), locs, attn)


def test_fused_rows_match_packing_law():
    rng = np.random.RandomState(0)
    shapes = ((4, 6), (8, 12))  # Lq = 24 + 96 = 120
    M, P, C = 4, 4, 32
    L = len(shapes)
    Lq = sum(h * w for h, w in shapes)
    N = 2
    q = jnp.asarray(rng.randn(N, Lq, C), jnp.float32)
    wo = jnp.asarray(rng.randn(C, M * L * P * 2) * 0.1, jnp.float32)
    bo = jnp.asarray(rng.randn(M * L * P * 2), jnp.float32)
    wa = jnp.asarray(rng.randn(C, M * L * P) * 0.1, jnp.float32)
    ba = jnp.asarray(rng.randn(M * L * P) * 0.1, jnp.float32)

    want = _reference_rows(q, wo, bo, wa, ba, shapes, M, P)
    got = fused_sampling_rows(
        q, wo, bo, wa, ba, shapes, M, P,
        block_queries=32, pad_rows_to=tent_row_pad(), interpret=True,
    )
    assert got.shape == want.shape, (got.shape, want.shape)
    R = Lq * P
    np.testing.assert_allclose(
        np.asarray(got[:, :R]), np.asarray(want[:, :R]), rtol=1e-5, atol=1e-5
    )
    # pad rows inert: coords far outside, weights zero
    lanes = L * 3 * M
    coord = (np.arange(lanes) % (3 * M)) < 2 * M
    pad = np.asarray(got[:, R:])
    assert (pad[..., coord] == -10.0).all()
    assert (pad[..., ~coord] == 0.0).all()


def test_tent_rows_dispatch_matches_oracle():
    """ms_deform_attn_tent_rows (the fused path's level dispatch) vs the
    readable gather oracle, through the XLA packing."""
    from univs_tpu.ops.deformable_attention import (
        ms_deform_attn_reference,
        ms_deform_attn_tent_rows,
    )

    rng = np.random.RandomState(1)
    shapes = ((4, 6), (16, 24), (40, 48))  # 2d-tent, 2d-tent, windowed
    M, P, D = 4, 4, 16
    Lq = sum(h * w for h, w in shapes)
    S = Lq
    N = 2
    value = jnp.asarray(rng.randn(N, S, M, D), jnp.float32)
    locs = jnp.asarray(rng.rand(N, Lq, M, len(shapes), P, 2), jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(N, Lq, M, len(shapes) * P), jnp.float32), axis=-1
    ).reshape(N, Lq, M, len(shapes), P)

    rows = pack_tent_rows(shapes, locs, attn)
    got = ms_deform_attn_tent_rows(value, shapes, rows, Lq, P, interpret=True)
    want = ms_deform_attn_reference(value, shapes, locs, attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
