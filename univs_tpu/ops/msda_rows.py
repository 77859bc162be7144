"""Fused sampling-row builder for the tent MSDA kernels.

The encoder's per-layer glue between the token tensor and the tent
kernels is: offsets Dense (C -> M*L*P*2), attention Dense (C -> M*L*P),
softmax over (L*P), sampling-location arithmetic, per-level transposes
to (query, point)-row layout, and the concat into the ONE packed row
array [N, Rp, L*3M] the kernels DMA (docs/PERFORMANCE.md round 3c).
Measured at ~6.7 ms/layer (offsets+softmax 2.0 + pack 4.7,
tools/probe_glue.py) — all bandwidth: the [N, Lq, M, L, P, 2] f32
offsets tensor and three per-level coordinate transposes materialize
~250 MB/layer that exist only to be re-laid-out.

This kernel reads the query tokens once and writes the packed row
array once.  Per query block it computes both Dense projections on the
MXU, a lane-grouped softmax (common per-row shift — softmax is
shift-invariant per group), scatters (m, l, p, xy) lanes into the
[x(M), y(M), wa(M)]-per-level row layout with static 0/1 selection
matmuls, adds the static pixel-center reference-point terms (derived
in-kernel from the query index), and interleaves the P point-rows by a
sublane reshape.

Semantics fused (reference): sampling_offsets/attention_weights Dense +
softmax + ``ref + off/normalizer`` of
mask2former/modeling/pixel_decoder/ops/modules/ms_deform_attn.py:85-113,
then the row packing of ops/deformable_attention.py:ms_deform_attn_tent.
Row value laws: x = ref_x*W_l + off_x - 0.5, y = ref_y*H_l + off_y - 0.5
(= ``loc*size - 0.5`` with loc = ref + off/normalizer).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _row_kernel(C: int, M: int, L: int, P: int, bq: int,
                shapes: Tuple[Tuple[int, int], ...], Lq: int, dtype):
    """bq queries -> bq*P packed rows of L*3M lanes."""
    lanes = L * 3 * M
    Do, Da = M * L * P * 2, M * L * P
    starts = [0]
    for (h, w) in shapes:
        starts.append(starts[-1] + h * w)

    def kernel(q_ref, wo_ref, bo_ref, wa_ref, ba_ref, o_ref):
        f32 = jnp.float32
        q = q_ref[0]  # [bq, C]
        offs = jnp.dot(q, wo_ref[...], preferred_element_type=f32) + bo_ref[0].astype(f32)
        attn = jnp.dot(q, wa_ref[...], preferred_element_type=f32) + ba_ref[0].astype(f32)

        # softmax over each head's (L*P) lane group: subtract a per-row
        # constant (shift-invariant), exp, group-sum via one 0/1 matmul
        attn = attn - attn.max(axis=-1, keepdims=True)
        ex = jnp.exp(attn)  # [bq, Da]
        gi = jax.lax.broadcasted_iota(jnp.int32, (Da, Da), 0) // (L * P)
        gj = jax.lax.broadcasted_iota(jnp.int32, (Da, Da), 1) // (L * P)
        S_sum = (gi == gj).astype(f32)
        wa = ex / jnp.dot(ex, S_sum, preferred_element_type=f32)

        # query's static reference point (pixel centers, level-relative)
        blk = pl.program_id(1)
        qidx = blk * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        ref_x = jnp.zeros((bq, 1), f32)
        ref_y = jnp.zeros((bq, 1), f32)
        for lid, (h, w) in enumerate(shapes):
            s = qidx - starts[lid]
            in_l = (qidx >= starts[lid]) & (qidx < starts[lid + 1])
            rx = (jnp.mod(s, w).astype(f32) + 0.5) / w
            ry = ((s // w).astype(f32) + 0.5) / h
            ref_x = jnp.where(in_l, rx, ref_x)
            ref_y = jnp.where(in_l, ry, ref_y)
        in_range = qidx < Lq  # [bq, 1] — grid-pad queries become inert

        # per-lane constants of the output layout
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
        l_out = lane // (3 * M)
        within = jnp.mod(lane, 3 * M)
        is_x = within < M
        is_y = (within >= M) & (within < 2 * M)
        w_tab = jnp.zeros((1, lanes), f32)
        h_tab = jnp.zeros((1, lanes), f32)
        for lid, (h, w) in enumerate(shapes):
            w_tab = jnp.where(l_out == lid, float(w), w_tab)
            h_tab = jnp.where(l_out == lid, float(h), h_tab)
        refvec = (
            jnp.where(is_x, ref_x * w_tab - 0.5, 0.0)
            + jnp.where(is_y, ref_y * h_tab - 0.5, 0.0)
        )  # [bq, lanes]
        coord_lane = is_x | is_y

        # offsets-lane decode: i -> (m, l, p, xy)
        oi = jax.lax.broadcasted_iota(jnp.int32, (Do, lanes), 0)
        oj_l = jax.lax.broadcasted_iota(jnp.int32, (Do, lanes), 1) // (3 * M)
        oj_w = jnp.mod(jax.lax.broadcasted_iota(jnp.int32, (Do, lanes), 1), 3 * M)
        o_m, o_l = oi // (L * P * 2), jnp.mod(oi // (P * 2), L)
        o_p, o_xy = jnp.mod(oi // 2, P), jnp.mod(oi, 2)
        ai = jax.lax.broadcasted_iota(jnp.int32, (Da, lanes), 0)
        aj_l = jax.lax.broadcasted_iota(jnp.int32, (Da, lanes), 1) // (3 * M)
        aj_w = jnp.mod(jax.lax.broadcasted_iota(jnp.int32, (Da, lanes), 1), 3 * M)
        a_m, a_l = ai // (L * P), jnp.mod(ai // P, L)
        a_p = jnp.mod(ai, P)

        outs = []
        for p in range(P):
            Sx = (
                (o_p == p) & (o_l == oj_l)
                & (((o_xy == 0) & (oj_w < M) & (o_m == oj_w))
                   | ((o_xy == 1) & (oj_w >= M) & (oj_w < 2 * M) & (o_m == oj_w - M)))
            ).astype(f32)
            Sw = ((a_p == p) & (a_l == aj_l) & (aj_w >= 2 * M) & (a_m == aj_w - 2 * M)).astype(f32)
            row_p = (
                jnp.dot(offs, Sx, preferred_element_type=f32)
                + jnp.dot(wa, Sw, preferred_element_type=f32)
                + refvec
            )
            # inert out-of-range rows: far-outside coords, zero weights
            row_p = jnp.where(in_range, row_p, jnp.where(coord_lane, -10.0, 0.0))
            outs.append(row_p)
        rows = jnp.stack(outs, axis=1).reshape(bq * P, lanes)  # sublane interleave
        o_ref[0] = rows

    return kernel


def fused_sampling_rows(
    query: jnp.ndarray,  # [N, Lq, C] (src + pos, compute dtype)
    wo: jnp.ndarray, bo: jnp.ndarray,  # sampling_offsets Dense params
    wa: jnp.ndarray, ba: jnp.ndarray,  # attention_weights Dense params
    spatial_shapes: Sequence[Tuple[int, int]],
    n_heads: int,
    n_points: int,
    *,
    block_queries: int = 512,
    pad_rows_to: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed tent-kernel row array [N, Rp, L*3M] f32 (Rp = R padded to
    ``pad_rows_to``; pad rows are inert: coords -10, weights 0)."""
    from jax.experimental.pallas import tpu as pltpu

    N, Lq, C = query.shape
    M, P = n_heads, n_points
    L = len(spatial_shapes)
    lanes = L * 3 * M
    bq = block_queries
    nblk = -(-Lq // bq)
    R = Lq * P
    dtype = query.dtype

    kern = _row_kernel(C, M, L, P, bq, tuple(spatial_shapes), Lq, dtype)
    rows = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, nblk * bq * P, lanes), jnp.float32),
        grid=(N, nblk),
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda n, b: (n, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, M * L * P * 2), lambda n, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M * L * P * 2), lambda n, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, M * L * P), lambda n, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M * L * P), lambda n, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq * P, lanes), lambda n, b: (n, b, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(
        _pad_queries(query, nblk * bq),
        wo.astype(dtype), bo.reshape(1, -1),
        wa.astype(dtype), ba.reshape(1, -1),
    )
    # trim grid padding to true R, then pad to the tent kernels' block
    # multiple with the same inert rows
    rows = rows[:, :R]
    tgt = -(-R // pad_rows_to) * pad_rows_to
    if tgt > R:
        coord = (jnp.arange(lanes) % (3 * M)) < 2 * M
        pad_row = jnp.broadcast_to(
            jnp.where(coord, -10.0, 0.0).astype(jnp.float32)[None, None],
            (N, tgt - R, lanes),
        )
        rows = jnp.concatenate([rows, pad_row], axis=1)
    return rows


def _pad_queries(q: jnp.ndarray, lq_to: int) -> jnp.ndarray:
    N, Lq, C = q.shape
    if lq_to > Lq:
        q = jnp.pad(q, ((0, 0), (0, lq_to - Lq), (0, 0)))
    return q


# ---------------------------------------------------------------------------
# full fused sampling op (rows kernel + tent kernels) with custom VJP
# ---------------------------------------------------------------------------


def _xla_sampling_law(value, query, wo, bo, wa_k, ba, shapes, M, P):
    """The unfused law (Dense -> softmax -> ref+off/normalizer -> gather
    MSDA) — differentiable backward reference for the fused forward."""
    from univs_tpu.ops.deformable_attention import _msda_gather

    N, Lq, C = query.shape
    L = len(shapes)
    dt = query.dtype
    offs = (query @ wo.astype(dt) + bo.astype(dt)).reshape(N, Lq, M, L, P, 2)
    attn = (query @ wa_k.astype(dt) + ba.astype(dt)).reshape(N, Lq, M, L * P)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).reshape(N, Lq, M, L, P)
    pts = []
    for (h, w) in shapes:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = jnp.concatenate(pts, axis=0)
    normalizer = jnp.array([[w, h] for h, w in shapes], jnp.float32)
    locs = (
        ref[None, :, None, None, None, :]
        + offs.astype(jnp.float32) / normalizer[None, None, None, :, None, :]
    )
    return _msda_gather(value, tuple(shapes), locs, attn)


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def msda_sample_fused(value, query, wo, bo, wa_k, ba, shapes, M, P):
    """Fused MSDA sampling: offsets/weights/row-pack Pallas kernel +
    tent kernels, from raw query tokens and Dense params.

    Forward-only kernels; the VJP differentiates the equivalent gather
    formulation (same pattern as the tent op's custom_vjp).  Assumes
    static pixel-center reference points (no padding masks — the
    production pixel-decoder contract, models/pixel_decoder.py doc).
    """
    from univs_tpu.ops.deformable_attention import (
        ms_deform_attn_tent_rows,
        tent_row_pad,
    )

    N, Lq, C = query.shape
    rows = fused_sampling_rows(
        query, wo, bo, wa_k, ba, shapes, M, P, pad_rows_to=tent_row_pad(P)
    )
    return ms_deform_attn_tent_rows(value, tuple(shapes), rows, Lq, P)


def _msf_fwd(value, query, wo, bo, wa_k, ba, shapes, M, P):
    out = msda_sample_fused(value, query, wo, bo, wa_k, ba, shapes, M, P)
    return out, (value, query, wo, bo, wa_k, ba)


def _msf_bwd(shapes, M, P, res, g):
    value, query, wo, bo, wa_k, ba = res
    _, vjp = jax.vjp(
        lambda v, q, a, b, c, d: _xla_sampling_law(v, q, a, b, c, d, shapes, M, P),
        value, query, wo, bo, wa_k, ba,
    )
    return vjp(g)


msda_sample_fused.defvjp(_msf_fwd, _msf_bwd)
