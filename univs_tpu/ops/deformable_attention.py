"""Multi-scale deformable attention, TPU-native.

The reference's only compiled extension is a CUDA MSDeformAttn kernel
(reference: mask2former/modeling/pixel_decoder/ops/src/,
ms_deform_im2col_cuda.cuh).  Its semantics are fully specified by the
pure-PyTorch fallback ``ms_deform_attn_core_pytorch``
(reference: ops/functions/ms_deform_attn_func.py:52-72): per level, a
bilinear ``grid_sample`` (align_corners=False, zero padding) at
``2*loc-1`` grid coords, then a weighted sum over (levels x points).

Here we provide:

- :func:`ms_deform_attn_reference` — a direct, readable JAX
  transcription of those semantics (loop over levels, vectorized
  bilinear gather).  Used as the numerics oracle in tests.
- :func:`ms_deform_attn` — the production path.  Same math, but all
  levels gathered from one flattened value tensor in a single fused
  computation so XLA emits one gather + one reduction; fp32
  accumulation regardless of input dtype (the reference force-runs
  deformable attn in fp32 under AMP — msdeformattn.py @autocast(False)).
- :func:`ms_deform_attn_tent` — the TPU Pallas kernel (2.2x the fused
  gather on v5e).  Key idea: bilinear interpolation weights ARE the
  tent function ``relu(1 - |i - x|)`` on the integer grid — including
  grid_sample's zero padding (out-of-range corners get zero weight
  automatically).  So sampling becomes two dense contractions per
  (frame, head, level): an MXU matmul of the x-tent matrix [rows, W]
  with the slab laid out [W, D*H], then a tiled y-tent multiply and a
  second tiny matmul against a constant 0/1 grouping matrix (Mosaic
  cannot lane-split-reshape, so the grouped y-reduction rides the MXU
  too).  No per-row gather issue cost at all; measured per 5-frame
  encoder layer at 640x960 (v5e): 47ms vs 104ms for the XLA gather.
  Forward-only: :func:`ms_deform_attn` wraps it in a ``jax.custom_vjp``
  whose backward differentiates the gather formulation.

Dispatch: ``ms_deform_attn(..., impl='auto')`` picks the tent kernel on
TPU backends and the fused gather elsewhere (CPU tests, interpret runs).

Coordinate convention (torch grid_sample, align_corners=False):
``pix = loc * size - 0.5`` where ``loc`` in [0, 1]; out-of-range
neighbours contribute zero.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather_2d(value: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with zero padding (grid_sample align_corners=False).

    value: [H, W, D]; x, y: [...] pixel coords (already loc*size-0.5).
    Returns [..., D].
    """
    H, W, D = value.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def gather(xi, yi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = value.reshape(H * W, D)
        v = flat[yc * W + xc]  # [..., D]
        return v * inb[..., None].astype(value.dtype)

    out = (
        gather(x0, y0) * (wx0 * wy0)[..., None]
        + gather(x1, y0) * (wx1 * wy0)[..., None]
        + gather(x0, y1) * (wx0 * wy1)[..., None]
        + gather(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out


def ms_deform_attn_reference(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Readable oracle implementation (per-level loop).

    value: [N, S, M, D] where S = sum(H_l*W_l)
    spatial_shapes: static list of (H_l, W_l)
    sampling_locations: [N, Lq, M, L, P, 2] in [0, 1] (x, y)
    attention_weights: [N, Lq, M, L, P] (already softmaxed over L*P)
    returns [N, Lq, M*D]
    """
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    starts = [0]
    for (h, w) in spatial_shapes:
        starts.append(starts[-1] + h * w)
    assert starts[-1] == S

    out = jnp.zeros((N, Lq, M, D), dtype=jnp.float32)
    for lid, (h, w) in enumerate(spatial_shapes):
        vl = value[:, starts[lid] : starts[lid + 1]].reshape(N, h, w, M, D)
        loc = sampling_locations[:, :, :, lid]  # [N, Lq, M, P, 2]
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        # vmap over batch and heads
        def sample_one(v_hw, xs, ys):  # v_hw: [h,w,D]; xs,ys: [Lq,P]
            return _bilinear_gather_2d(v_hw.astype(jnp.float32), xs, ys)

        sampled = jax.vmap(  # over N
            jax.vmap(sample_one, in_axes=(2, 0, 0), out_axes=2),  # over M
            in_axes=(0, 0, 0),
        )(vl, jnp.moveaxis(x, 2, 1), jnp.moveaxis(y, 2, 1))
        # x moveaxis: [N, Lq, M, P] -> [N, M, Lq, P]; sampled: [N, Lq, P, M, D]
        w_l = attention_weights[:, :, :, lid]  # [N, Lq, M, P]
        out = out + jnp.einsum(
            "nqpmd,nqmp->nqmd", sampled, w_l.astype(jnp.float32)
        )
    return out.reshape(N, Lq, M * D)


# NOTE: deliberately NOT @jax.jit — callers always jit; a global jit
# wrapper shares traced jaxprs across different outer traces, which
# trips a jax-0.9 buffer-accounting bug on this stack ("Execution
# supplied N buffers but compiled program expected M").
def _msda_gather(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Fused-gather multi-scale deformable attention (2x2 patch gathers).

    Same signature/semantics as :func:`ms_deform_attn_reference`.  Each
    bilinear sample's four corners are fetched with ONE ``lax.gather``
    of a (2, 2, D) patch from the zero-padded per-level map — 4x fewer
    gather indices than per-corner row gathers, which on TPU (where
    gathers are issue-rate-bound, ~22 cycles/row measured on v5e) is a
    ~3.6x speedup for the encoder's hot loop.  Out-of-bounds corners
    read the zero border and/or get their bilinear weight masked,
    reproducing grid_sample's zero padding exactly.  Accumulation fp32;
    output dtype follows ``value.dtype``.
    """
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)

    f32 = jnp.float32
    # ONE head-major transpose up front; all per-level math then happens
    # in the gather layout (no per-level moveaxis of Lq-sized tensors)
    loc = jnp.moveaxis(sampling_locations, 2, 1).astype(f32)  # [N, M, Lq, L, P, 2]
    w_attn = jnp.moveaxis(attention_weights, 2, 1).astype(f32)  # [N, M, Lq, L, P]

    starts = [0]
    for (h, w) in spatial_shapes:
        starts.append(starts[-1] + h * w)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    out = jnp.zeros((N, M, Lq, D), f32)
    for lid, (h, w) in enumerate(spatial_shapes):
        # [N, M, H+2, W+2, D] zero-padded level map (per-head).  Gather
        # in the INPUT dtype (bf16 is ~1.5x faster than fp32 on v5e);
        # accumulate fp32 after the gather.
        vl = value[:, starts[lid] : starts[lid + 1]].reshape(N, h, w, M, D)
        vl = jnp.moveaxis(vl, 3, 1)  # [N, M, h, w, D]
        vp = jnp.pad(vl, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))

        x = loc[:, :, :, lid, :, 0] * w - 0.5  # [N, M, Lq, P]
        y = loc[:, :, :, lid, :, 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0

        # corner validity (true coords) -> per-corner weights [.., 2, 2]
        wa = w_attn[:, :, :, lid]  # [N, M, Lq, P]
        wx = jnp.stack(
            [(1 - fx) * ((x0 >= 0) & (x0 <= w - 1)), fx * ((x0 + 1 >= 0) & (x0 + 1 <= w - 1))], -1
        )  # [.., 2]
        wy = jnp.stack(
            [(1 - fy) * ((y0 >= 0) & (y0 <= h - 1)) * wa, fy * ((y0 + 1 >= 0) & (y0 + 1 <= h - 1)) * wa], -1
        )
        wcorner = (wy[..., :, None] * wx[..., None, :]).astype(value.dtype)

        # patch starts in padded coords, clamped so patches stay in range
        sy = jnp.clip(y0 + 1, 0, h).astype(jnp.int32).reshape(N, M, Lq * P)
        sx = jnp.clip(x0 + 1, 0, w).astype(jnp.int32).reshape(N, M, Lq * P)
        starts_idx = jnp.stack([sy, sx], axis=-1)

        def gather_one(vmap_, st):
            return jax.lax.gather(
                vmap_, st, dnums, slice_sizes=(2, 2, D),
                mode=jax.lax.GatherScatterMode.CLIP,
            )  # [K, 2, 2, D]

        patches = jax.vmap(jax.vmap(gather_one))(vp, starts_idx)  # [N, M, K, 2, 2, D]
        patches = patches.reshape(N, M, Lq, P, 2, 2, D)
        # elementwise multiply + reduce IN THE VALUE DTYPE so XLA fuses
        # it into the gather consumer; an einsum with
        # preferred_element_type=f32 materializes the (4x lane-padded)
        # patch tensor in fp32 and costs ~70ms/layer extra on v5e
        level_out = (patches * wcorner[..., None]).sum(axis=(3, 4, 5))
        out = out + level_out.astype(f32)

    out = jnp.moveaxis(out, 1, 2).reshape(N, Lq, M * D)
    return out.astype(value.dtype)


# ---------------------------------------------------------------------------
# Pallas tent-matmul kernels (TPU)
#
# Three per-level variants, dispatched on level geometry (round 3b —
# measured numbers in docs/PERFORMANCE.md "tent kernel v2"):
#
# - 2D-tent (_msda_tent2d_level): for tiny levels (H*W <= ~1k pixels)
#   the separable two-matmul scheme is dominated by per-head fixed
#   costs and lane-padded G matmuls.  Instead build the full 2D tent
#   plane tentx*tenty*wa [bq, S] on the VPU and contract against the
#   raster slab [S, D] in ONE matmul per head (K = S fills the MXU,
#   no wide plane, no grouping matmul).
# - windowed tent (_msda_tent_win_level): bilinear tents have support
#   only at j in {floor(y), floor(y)+1}, and a block of consecutive
#   (raster-order) queries spans few image rows.  With a j-major slab
#   ([W, H*D], lane = j*D + d) each row-block contracts only a
#   128-aligned dynamic lane window of 2*Hw rows around its queries —
#   T1 lanes, the y-tent plane, and the grouping-matmul contraction
#   all shrink by H/(2*Hw) (2.5x at the 1/8 level).  A per-(frame,
#   block) scalar pair (ystart, ok) is computed outside the kernel;
#   blocks whose y-spread exceeds the window take an exact full-H
#   fallback branch, so results are independent of the window hit
#   rate (the hit rate only affects speed; with the reference's
#   grid-init offset scale >90% of blocks hit).
# - base tent (_msda_tent_level): the original d-major wide-plane
#   kernel, kept for geometries not covered above and as the
#   int8-slab variant host.
# ---------------------------------------------------------------------------

# levels with at most this many pixels take the fused 2D-tent kernel
_TENT2D_MAX_S = 1024


def _tent_window_rows(H: int, D: int) -> int:
    """Window height (rows) for the windowed kernel; 0 = ineligible.

    The window start/extent are aligned so the dynamic lane slice
    ystart*D is 128-aligned: both are multiples of align = 128/D.
    ~0.3*H measured fastest at the 1/8 level (Hw=24 of H=80): small
    enough to shrink the VMEM-bandwidth-bound wide planes, large
    enough to keep the per-block window hit rate >0.9."""
    align = max(1, -(-128 // D))
    w = min(32, (3 * H // 10) // align * align)
    return w if (w >= 2 * align and w >= 8 and w < H) else 0


def _tent_block_size(DH: int) -> int:
    """Query-row block so the f32 [bq, D*H] intermediate stays ~<=4MB."""
    if DH <= 768:
        return 2048
    if DH <= 1536:
        return 1024
    if DH <= 3072:
        return 1024
    return 512


def _tent_kernel(H: int, W: int, bq: int, M: int, D: int, P: int, dtype,
                 int8_slab: bool = False):
    DH = D * H
    BQ = bq // P  # output rows (queries) per block; input rows are (q, p)

    def kernel(x_ref, y_ref, wa_ref, v_ref, *rest):
        # x/y/wa: [1, bq, M] pixel coords + attention weight per row
        # (rows are point-minor: row = q*P + p)
        # v: [1, M, W, D*H] (x contracted first; lanes are d-major, j-minor)
        # int8_slab: v is int8; the T1 contraction runs on the int8 MXU
        # path (2x bf16 rate on v5e) with int32 accumulation.  The
        # per-(batch, head) dequant scale commutes through the y tents
        # and both grouping matmuls (all linear in t1, and the output
        # keeps the head axis), so it is applied OUTSIDE the kernel.
        (o_ref,) = rest
        xio = jax.lax.broadcasted_iota(jnp.int32, (bq, W), 1).astype(jnp.float32)
        # y tent built tiled directly: lane l of the [bq, D*H] plane is
        # (d = l // H, j = l % H)
        jio = (jax.lax.broadcasted_iota(jnp.int32, (bq, DH), 1) % H).astype(jnp.float32)
        # grouping matrix G[(d, j), d'] = (d == d'): the grouped
        # y-reduction out[q, d] = sum_j P[q, d*H + j] as an MXU matmul
        # (Mosaic cannot lane-split reshape [bq, D*H] -> [bq, H, D])
        g_rows = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 0)
        g_cols = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 1)
        G = (g_rows // H == g_cols).astype(dtype)
        for m in range(M):
            x = x_ref[0, :, m][:, None]  # [bq, 1]
            y = y_ref[0, :, m][:, None]
            wa = wa_ref[0, :, m][:, None]
            # tents computed in f32 (coords are large), stored in the
            # value dtype — same weight precision as the gather path.
            # the attention weight multiplies the NARROW x-tent ([bq, W])
            # rather than the [bq, D*H] y-plane
            mx_f = jnp.maximum(1.0 - jnp.abs(xio - x), 0.0) * wa  # [bq, W]
            if int8_slab:
                # x-tent quantized at scale 127 (values in [0, 1]);
                # raw int32 counts flow on — descaled outside
                mx_q = jnp.round(mx_f * 127.0).astype(jnp.int8)
                t1 = jnp.dot(
                    mx_q, v_ref[0, m], preferred_element_type=jnp.int32
                ).astype(jnp.float32)  # [bq, D*H]
            else:
                mx = mx_f.astype(dtype)
                t1 = jnp.dot(
                    mx, v_ref[0, m], preferred_element_type=jnp.float32
                )  # [bq, D*H] (f32 MXU accumulate)
            my_tile = jnp.maximum(1.0 - jnp.abs(jio - y), 0.0)  # [bq, D*H] f32
            p2 = (my_tile * t1).astype(dtype)
            per_row = jnp.dot(p2, G, preferred_element_type=jnp.float32)  # [bq, D]
            # point sum (q, p) -> q as a sublane reshape-sum (sublane
            # splits are legal; only lane splits are not)
            o_ref[0, :, m] = per_row.reshape(BQ, P, D).sum(axis=1)

    return kernel


def _msda_tent_level(slab_xmajor, xs, ys, was, D: int, P: int, *, interpret=False,
                     int8_slab: bool = False):
    """One level's attention-weighted, point-summed bilinear samples.

    slab_xmajor [N, M, W, D*H] (element (x; d, j) = V[j, x, d]);
    xs/ys/was [N, R, M] pixel coords + attention weights per sample row,
    rows point-minor (row = q*P + p).
    Returns [N, R//P, M, D] f32: sum over each query's P points.

    ``int8_slab``: quantize the value slab per (batch, head) to int8 and
    run the T1 contraction on the int8 MXU path (~2x bf16 rate on v5e);
    the x-tent weights quantize at scale 127.  Expected error
    ~|v|_max/127 per sample — a flagged trade, see docs/PERFORMANCE.md.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, m, W, DH = slab_xmajor.shape
    _, R, _ = xs.shape
    H = DH // D
    bq = _tent_block_size(DH)
    bq = max(P, (bq // P) * P)  # block must hold whole queries
    assert R % P == 0
    pad = (-R) % bq
    if pad:
        # padded rows get far-outside coords -> zero tents -> zero output
        xs = jnp.concatenate([xs, jnp.full((n, pad, m), -10.0, xs.dtype)], axis=1)
        ys = jnp.concatenate([ys, jnp.full((n, pad, m), -10.0, ys.dtype)], axis=1)
        was = jnp.concatenate([was, jnp.zeros((n, pad, m), was.dtype)], axis=1)
    Rp = R + pad

    in_specs = [
        pl.BlockSpec((1, bq, m), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, m), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, m), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, W, DH), lambda b, r: (b, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [xs, ys, was]
    dtype = slab_xmajor.dtype
    scale = None
    if int8_slab:
        scale = jnp.maximum(
            jnp.abs(slab_xmajor.astype(jnp.float32)).max(axis=(2, 3)), 1e-6
        )  # [N, M]
        slab_q = jnp.round(
            slab_xmajor.astype(jnp.float32) / scale[:, :, None, None] * 127.0
        ).astype(jnp.int8)
        operands.append(slab_q)
    else:
        operands.append(slab_xmajor)

    out = pl.pallas_call(
        _tent_kernel(H, W, bq, m, D, P, dtype, int8_slab=int8_slab),
        out_shape=jax.ShapeDtypeStruct((n, Rp // P, m, D), jnp.float32),
        grid=(n, Rp // bq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, bq // P, m, D), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*operands)
    if scale is not None:
        # dequant: slab scale/127 (value quant) * 1/127 (x-tent quant)
        out = out * (scale * (1.0 / (127.0 * 127.0)))[:, None, :, None]
    return out[:, : R // P]


def _pad_rows(xs, ys, was, bq):
    """Pad sample rows to a block multiple with inert (-10, w=0) rows."""
    n, R, m = xs.shape
    pad = (-R) % bq
    if pad:
        xs = jnp.concatenate([xs, jnp.full((n, pad, m), -10.0, xs.dtype)], axis=1)
        ys = jnp.concatenate([ys, jnp.full((n, pad, m), -10.0, ys.dtype)], axis=1)
        was = jnp.concatenate([was, jnp.zeros((n, pad, m), was.dtype)], axis=1)
    return xs, ys, was, R + pad


def _tent2d_kernel(S: int, W: int, bq: int, sub: int, M: int, D: int, P: int, dtype,
                   col0: int = 0):
    from jax.experimental import pallas as pl

    nsub = bq // sub
    SQ = sub // P

    def kernel(rows_ref, v_ref, o_ref):
        sio = jax.lax.broadcasted_iota(jnp.int32, (sub, S), 1)
        iio = (sio % W).astype(jnp.float32)
        jio = (sio // W).astype(jnp.float32)
        for c in range(nsub):
            rsl = slice(c * sub, (c + 1) * sub)
            for m in range(M):
                x = rows_ref[0, rsl, col0 + m][:, None]
                y = rows_ref[0, rsl, col0 + M + m][:, None]
                wa = rows_ref[0, rsl, col0 + 2 * M + m][:, None]
                t2 = (
                    jnp.maximum(1.0 - jnp.abs(iio - x), 0.0)
                    * jnp.maximum(1.0 - jnp.abs(jio - y), 0.0)
                    * wa
                ).astype(dtype)
                p = jnp.dot(t2, v_ref[0, m], preferred_element_type=jnp.float32)
                o_ref[0, m, pl.ds(c * SQ, SQ)] = p.reshape(SQ, P, D).sum(axis=1)

    return kernel


def _msda_tent2d_packed(slab_raster, rows, R: int, D: int, P: int, W: int,
                        col0: int, *, interpret=False):
    """Tiny-level MSDA: one fused 2D-tent matmul per head.

    slab_raster [N, M, S, D] (s = j*W + i raster); ``rows`` is the
    block-padded packed row array [N, Rp, lanes] shared by ALL levels
    (per-level column blocks [x(M), y(M), wa(M)] at lane ``col0`` —
    sharing one lane-padded array instead of writing three per level is
    what the packing costs, see docs/PERFORMANCE.md round 3c).
    Returns [N, R//P, M, D] f32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, m, S, _ = slab_raster.shape
    _, Rp, lanes = rows.shape
    sub = max(P, (_TENT_SUB // P) * P)
    bq = max(sub, (_TENT_BQ // sub) * sub)
    assert Rp % bq == 0

    out = pl.pallas_call(
        _tent2d_kernel(S, W, bq, sub, m, D, P, slab_raster.dtype, col0),
        out_shape=jax.ShapeDtypeStruct((n, m, Rp // P, D), jnp.float32),
        grid=(n, Rp // bq),
        in_specs=[
            pl.BlockSpec((1, bq, lanes), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, S, D), lambda b, r: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m, bq // P, D), lambda b, r: (b, 0, r, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(rows, slab_raster)
    return jnp.moveaxis(out, 1, 2)[:, : R // P]


def _msda_tent2d_level(slab_raster, xs, ys, was, D: int, P: int, W: int,
                       *, interpret=False):
    """Back-compat wrapper over :func:`_msda_tent2d_packed`: packs one
    level's xs/ys/was [N, R, M] into a [N, Rp, 3M] row array itself."""
    _, R, _ = xs.shape
    assert R % P == 0
    sub = max(P, (_TENT_SUB // P) * P)
    bq = max(sub, (_TENT_BQ // sub) * sub)
    xs, ys, was, _ = _pad_rows(xs, ys, was, bq)
    rows = jnp.concatenate([xs, ys, was], axis=2)  # [N, Rp, 3M]
    return _msda_tent2d_packed(slab_raster, rows, R, D, P, W, 0,
                               interpret=interpret)


def _tent_win_kernel(H: int, W: int, bq: int, sub: int, M: int, D: int, P: int,
                     dtype, Hw: int, col0: int = 0):
    """Unified windowed/full kernel body over packed rows.

    rows_ref [1, bq, lanes] (this level's block starts at lane ``col0``:
    x columns col0..col0+M-1, y next M, wa next M);
    v_ref [1, M, W, H*D] j-major; o_ref [1, M, bq//P, D].
    The grid block of bq rows is processed in sub-row chunks so the
    wide intermediates stay small while DMA blocks stay big (this
    hardware has a ~25us fixed cost per DMA block transfer — block
    count, not block size, is what the grid layout must minimize).
    Hw == H disables windowing (single full-H path, no meta branch).
    """
    from jax.experimental import pallas as pl

    DH = D * H
    DHw = D * Hw
    nsub = bq // sub
    SQ = sub // P
    windowed = Hw < H

    def kernel(meta_ref, rows_ref, v_ref, o_ref):
        xio = jax.lax.broadcasted_iota(jnp.int32, (sub, W), 1).astype(jnp.float32)
        gw_rows = jax.lax.broadcasted_iota(jnp.int32, (DHw, D), 0)
        gw_cols = jax.lax.broadcasted_iota(jnp.int32, (DHw, D), 1)
        Gw = (gw_rows % D == gw_cols).astype(dtype)  # j-major group matrix
        jw = jax.lax.broadcasted_iota(jnp.int32, (sub, DHw), 1) // D
        if windowed:
            gf_rows = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 0)
            gf_cols = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 1)
            Gf = (gf_rows % D == gf_cols).astype(dtype)
            jf = (jax.lax.broadcasted_iota(jnp.int32, (sub, DH), 1) // D).astype(jnp.float32)
        for c in range(nsub):
            rsl = slice(c * sub, (c + 1) * sub)
            for m in range(M):
                x = rows_ref[0, rsl, col0 + m][:, None]
                y = rows_ref[0, rsl, col0 + M + m][:, None]
                wa = rows_ref[0, rsl, col0 + 2 * M + m][:, None]
                mx = (jnp.maximum(1.0 - jnp.abs(xio - x), 0.0) * wa).astype(dtype)

                def fast(ys0):
                    start = pl.multiple_of(ys0 * D, 128)
                    vw = v_ref[0, m, :, pl.ds(start, DHw)]  # [W, DHw]
                    t1 = jnp.dot(mx, vw, preferred_element_type=jnp.float32)
                    my = jnp.maximum(
                        1.0 - jnp.abs((jw + ys0).astype(jnp.float32) - y), 0.0
                    )
                    p2 = (my * t1).astype(dtype)
                    per_row = jnp.dot(p2, Gw, preferred_element_type=jnp.float32)
                    o_ref[0, m, pl.ds(c * SQ, SQ)] = per_row.reshape(SQ, P, D).sum(axis=1)

                if not windowed:
                    fast(jnp.int32(0))
                    continue

                ys0 = meta_ref[0, 0, c, m, 0]
                ok = meta_ref[0, 0, c, m, 1]

                @pl.when(ok == 1)
                def _():
                    fast(ys0)

                @pl.when(ok == 0)
                def _():
                    t1 = jnp.dot(mx, v_ref[0, m], preferred_element_type=jnp.float32)
                    my = jnp.maximum(1.0 - jnp.abs(jf - y), 0.0)
                    p2 = (my * t1).astype(dtype)
                    per_row = jnp.dot(p2, Gf, preferred_element_type=jnp.float32)
                    o_ref[0, m, pl.ds(c * SQ, SQ)] = per_row.reshape(SQ, P, D).sum(axis=1)

    return kernel


_TENT_BQ = 8192
_TENT_SUB = 2048


def _msda_tent_win_packed(slab_jmajor, rows, R: int, D: int, P: int, Hw: int,
                          col0: int, *, interpret=False):
    """Windowed MSDA level: j-major slab, per-chunk dynamic y-window.

    slab_jmajor [N, M, W, H*D] (lane = j*D + d); ``rows`` is the
    block-padded packed row array [N, Rp, lanes] shared by all levels
    (this level's [x(M), y(M), wa(M)] block starts at lane ``col0``).
    Hw: window rows (from :func:`_tent_window_rows`); Hw == H runs the
    full-H path without branches.
    Returns [N, R//P, M, D] f32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, m, W, DH = slab_jmajor.shape
    H = DH // D
    _, Rp, lanes = rows.shape
    align = max(1, -(-128 // D))
    sub = max(P, (_TENT_SUB // P) * P)
    bq = max(sub, (_TENT_BQ // sub) * sub)
    assert Rp % bq == 0
    nb = Rp // bq
    nsub = bq // sub

    if Hw < H:
        # per-(frame, block, chunk, head) window metadata.  Support of
        # an in-range sample is {floor(y), floor(y)+1} ∩ [0, H-1]; the
        # clipped floor keeps inert/out-of-range rows (whose tents are
        # zero at every in-range j anyway) from inflating the window.
        ys = rows[:, :, col0 + m : col0 + 2 * m]  # this level's y columns
        y0c = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)  # [N, Rp, M]
        y0b = y0c.reshape(n, nb, nsub, sub, m)
        ymin = y0b.min(axis=3)  # [N, nb, nsub, M]
        ymax = y0b.max(axis=3)
        ystart = jnp.minimum((ymin // align) * align, H - Hw)
        ok = (jnp.minimum(ymax + 1, H - 1) < ystart + Hw).astype(jnp.int32)
        meta = jnp.stack([ystart, ok], axis=-1)  # [N, nb, nsub, M, 2]
    else:
        meta = jnp.zeros((n, nb, nsub, m, 2), jnp.int32)

    out = pl.pallas_call(
        _tent_win_kernel(H, W, bq, sub, m, D, P, slab_jmajor.dtype, Hw, col0),
        out_shape=jax.ShapeDtypeStruct((n, m, Rp // P, D), jnp.float32),
        grid=(n, nb),
        in_specs=[
            # blocked SMEM meta: the whole array would blow the ~1MB
            # SMEM budget (each scalar costs 256B of SMEM allocation)
            pl.BlockSpec((1, 1, nsub, m, 2), lambda b, r: (b, r, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, lanes), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, W, DH), lambda b, r: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m, bq // P, D), lambda b, r: (b, 0, r, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(meta, rows, slab_jmajor)
    return jnp.moveaxis(out, 1, 2)[:, : R // P]


def _msda_tent_win_level(slab_jmajor, xs, ys, was, D: int, P: int, Hw: int,
                         *, interpret=False):
    """Back-compat wrapper over :func:`_msda_tent_win_packed`: packs one
    level's xs/ys/was [N, R, M] into a [N, Rp, 3M] row array itself."""
    _, R, _ = xs.shape
    assert R % P == 0
    sub = max(P, (_TENT_SUB // P) * P)
    bq = max(sub, (_TENT_BQ // sub) * sub)
    xs, ys, was, _ = _pad_rows(xs, ys, was, bq)
    rows = jnp.concatenate([xs, ys, was], axis=2)  # [N, Rp, 3M] — ONE dma/step
    return _msda_tent_win_packed(slab_jmajor, rows, R, D, P, Hw, 0,
                                 interpret=interpret)


def tent_row_pad(num_points: int = 4) -> int:
    """Row-block multiple the packed tent kernels require (the kernels
    chunk bq rows of sub whole-query groups — both multiples of P)."""
    sub = max(num_points, (_TENT_SUB // num_points) * num_points)
    return max(sub, (_TENT_BQ // sub) * sub)


def ms_deform_attn_tent_rows(
    value: jnp.ndarray,  # [N, S, M, D]
    spatial_shapes: Tuple[Tuple[int, int], ...],
    rows_all: jnp.ndarray,  # [N, Rp, L*3M] packed rows (see module doc)
    num_queries: int,
    num_points: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Tent-matmul MSDA forward from a PRE-PACKED row array.

    ``rows_all`` carries per level the lane block [x(M), y(M), wa(M)]
    with x/y in pixel coords (``loc*size - 0.5``), rows point-minor
    (row = q*P + p), padded to :func:`tent_row_pad` with inert rows
    (coords -10, weights 0).  Production entry for the fused row-builder
    kernel (ops/msda_rows.py); every level takes a packed variant
    (2D-tent for tiny levels, windowed otherwise)."""
    N, S, M, D = value.shape
    Lq, P = num_queries, num_points
    R = Lq * P

    starts = [0]
    for (h, w) in spatial_shapes:
        starts.append(starts[-1] + h * w)

    out = jnp.zeros((N, Lq, M, D), jnp.float32)
    col0 = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        vl = value[:, starts[lid] : starts[lid + 1]]  # [N, S_l, M, D]
        hw = _tent_window_rows(h, D)
        if h * w <= _TENT2D_MAX_S:
            slab2d = jnp.moveaxis(vl, 2, 1)  # [N, M, S_l, D] raster
            o = _msda_tent2d_packed(slab2d, rows_all, R, D, P, w, col0,
                                    interpret=interpret)
        else:
            slab = jnp.moveaxis(vl, 2, 1).reshape(N, M, h, w, D)
            slab = slab.transpose(0, 1, 3, 2, 4).reshape(N, M, w, h * D)  # j-major
            o = _msda_tent_win_packed(slab, rows_all, R, D, P, hw or h, col0,
                                      interpret=interpret)
        col0 += 3 * M
        out = out + o
    return out.reshape(N, Lq, M * D).astype(value.dtype)


def pack_tent_rows(
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    level_mask: Optional[Sequence[bool]] = None,
) -> jnp.ndarray:
    """XLA row packing (the fused kernel's reference law): per-level
    pixel coords + weights as point-minor (query, point) rows, all
    levels in one lane-packed array, block-padded with inert rows."""
    N, Lq, M, L, P, _ = sampling_locations.shape
    R = Lq * P
    packed_cols = []
    for lid, (h, w) in enumerate(spatial_shapes):
        if level_mask is not None and not level_mask[lid]:
            continue
        loc = sampling_locations[:, :, :, lid]  # [N, Lq, M, P, 2]
        wa = attention_weights[:, :, :, lid]  # [N, Lq, M, P]
        packed_cols += [
            (loc[..., 0].astype(jnp.float32) * w - 0.5).transpose(0, 1, 3, 2).reshape(N, R, M),
            (loc[..., 1].astype(jnp.float32) * h - 0.5).transpose(0, 1, 3, 2).reshape(N, R, M),
            wa.astype(jnp.float32).transpose(0, 1, 3, 2).reshape(N, R, M),
        ]
    rows_all = jnp.concatenate(packed_cols, axis=2)
    pad = (-R) % tent_row_pad(P)
    if pad:
        # inert pad rows: far-outside coords -> zero tents -> zero output
        # (weight lanes padded -10 too — harmless, they only multiply
        # tents that are zero for every in-range pixel)
        rows_all = jnp.pad(rows_all, ((0, 0), (0, pad), (0, 0)),
                           constant_values=-10.0)
    return rows_all


def ms_deform_attn_tent(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    interpret: bool = False,
    int8_slab: bool = False,
    level_impl: str = "auto",
) -> jnp.ndarray:
    """Tent-matmul MSDA forward (same contract as the gather impl).

    level_impl: 'auto' picks per level (2D-tent for tiny levels,
    windowed for tall levels, base otherwise); '2d'/'win'/'base' force
    one variant for every eligible level (tests).
    """
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)

    starts = [0]
    for (h, w) in spatial_shapes:
        starts.append(starts[-1] + h * w)

    def pick(h, w):
        if level_impl != "auto":
            return level_impl
        if int8_slab:
            return "base"
        return "2d" if h * w <= _TENT2D_MAX_S else "win"

    variants = [pick(h, w) for (h, w) in spatial_shapes]

    # ONE packed row array shared by every packed-kernel level (blocks
    # [x(M), y(M), wa(M)] per level): the per-row lane count is padded
    # to 128 in HBM either way, so packing all levels into one array
    # cuts the materialized row bytes (and their writes) by ~L x.
    rows_all = None
    if any(v in ("2d", "win") for v in variants):
        rows_all = pack_tent_rows(
            spatial_shapes, sampling_locations, attention_weights,
            level_mask=[v in ("2d", "win") for v in variants],
        )

    R = Lq * P
    out = jnp.zeros((N, Lq, M, D), jnp.float32)
    col0 = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        vl = value[:, starts[lid] : starts[lid + 1]]  # [N, S_l, M, D]
        hw = _tent_window_rows(h, D)
        variant = variants[lid]
        if variant == "2d":
            slab2d = jnp.moveaxis(vl, 2, 1)  # [N, M, S_l, D] raster
            o = _msda_tent2d_packed(slab2d, rows_all, R, D, P, w, col0,
                                    interpret=interpret)
            col0 += 3 * M
        elif variant == "win":
            slab = jnp.moveaxis(vl, 2, 1).reshape(N, M, h, w, D)
            slab = slab.transpose(0, 1, 3, 2, 4).reshape(N, M, w, h * D)  # j-major
            o = _msda_tent_win_packed(slab, rows_all, R, D, P, hw or h, col0,
                                      interpret=interpret)
            col0 += 3 * M
        else:
            loc = sampling_locations[:, :, :, lid]
            wa_l = attention_weights[:, :, :, lid]
            x = (loc[..., 0].astype(jnp.float32) * w - 0.5).transpose(0, 1, 3, 2).reshape(N, R, M)
            y = (loc[..., 1].astype(jnp.float32) * h - 0.5).transpose(0, 1, 3, 2).reshape(N, R, M)
            was = wa_l.astype(jnp.float32).transpose(0, 1, 3, 2).reshape(N, R, M)
            slab = jnp.moveaxis(vl, 2, 1).reshape(N, M, h, w, D)
            slab = slab.transpose(0, 1, 3, 4, 2).reshape(N, M, w, D * h)  # d-major
            o = _msda_tent_level(slab, x, y, was, D, P, interpret=interpret,
                                 int8_slab=int8_slab)  # [N, Lq, M, D]
        out = out + o
    return out.reshape(N, Lq, M * D).astype(value.dtype)


# ---------------------------------------------------------------------------
# public op with dispatch + custom VJP
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _msda_tent_diff(value, spatial_shapes, sampling_locations, attention_weights):
    return ms_deform_attn_tent(value, spatial_shapes, sampling_locations, attention_weights)


def _msda_tent_fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = ms_deform_attn_tent(value, spatial_shapes, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _msda_tent_bwd(spatial_shapes, res, g):
    value, loc, attn = res
    # backward through the (equivalent) gather formulation
    _, vjp = jax.vjp(lambda v, l, a: _msda_gather(v, spatial_shapes, l, a), value, loc, attn)
    return vjp(g)


_msda_tent_diff.defvjp(_msda_tent_fwd, _msda_tent_bwd)


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    impl: str = "auto",
) -> jnp.ndarray:
    """Production multi-scale deformable attention.

    impl: 'auto' (tent kernel on TPU, fused gather elsewhere),
    'tent', 'tent-int8' (int8 slab contraction — flagged accuracy
    trade, see docs/PERFORMANCE.md), or 'gather'.
    """
    if impl == "auto":
        # The tent kernel is Mosaic/TPU-only; any other backend (cpu, gpu)
        # takes the XLA gather formulation.
        impl = "tent" if jax.default_backend() == "tpu" else "gather"
    if impl == "tent-int8":
        return ms_deform_attn_tent(
            value, tuple(spatial_shapes), sampling_locations, attention_weights,
            int8_slab=True,
        )
    if impl == "tent":
        return _msda_tent_diff(
            value, tuple(spatial_shapes), sampling_locations, attention_weights
        )
    return _msda_gather(value, spatial_shapes, sampling_locations, attention_weights)
