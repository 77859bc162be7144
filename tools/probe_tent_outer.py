"""Probe: OUTER-PRODUCT point-summed 2D-tent MSDA kernels.

probe_tent_psum established the 2D-tent kernel is VPU-bound on tent
evaluations (4x fewer rows with 4x points each is exactly flat).  This
probe cuts the per-element VPU work ~5x by building each point's 2D
tent plane as an outer product instead of evaluating both tents wide:

    tentx part: tx_p = relu(1-|i-x_p|)*wa_p is built NARROW [subq, W]
        and tiled to [subq, H*W] with pltpu.repeat (lane s = j*W+i
        reads tx[i] -- exactly the repeat pattern).
    tenty part: ty_p = relu(1-|j-y_p|) built NARROW [subq, H] and
        expanded with one MXU matmul against the 0/1 matrix
        E[j, s] = (s//W == j).

    plane += tiled_tx * expanded_ty        (2 wide VPU ops per point)

Variants: full-raster (1/32, 1/16) and dynamic-sublane-window (1/16,
1/8) where the fallback for chunks exceeding the window is an exact
sum over H/Hw STATIC window positions (same plane width as the hit
path -- no extra compile risk).

    python tools/probe_tent_outer.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import univs_tpu.ops.deformable_attention as da
from tools.probe_tent_psum import (production_loc, rows_pointminor, rows_qmajor,
                                   timeit)


def _outer2d_kernel(S, W, H, bqq, subq, M, P, dtype):
    nsub = bqq // subq

    def kernel(rows_ref, v_ref, o_ref):
        wio = jax.lax.broadcasted_iota(jnp.int32, (subq, W), 1).astype(jnp.float32)
        hio = jax.lax.broadcasted_iota(jnp.int32, (subq, H), 1).astype(jnp.float32)
        e_r = jax.lax.broadcasted_iota(jnp.int32, (H, S), 0)
        e_c = jax.lax.broadcasted_iota(jnp.int32, (H, S), 1) // W
        E = (e_r == e_c).astype(dtype)
        for c in range(nsub):
            rsl = slice(c * subq, (c + 1) * subq)
            for m in range(M):
                acc = None
                for p in range(P):
                    x = rows_ref[0, rsl, m * P + p][:, None]
                    y = rows_ref[0, rsl, M * P + m * P + p][:, None]
                    wa = rows_ref[0, rsl, 2 * M * P + m * P + p][:, None]
                    tx = jnp.maximum(1.0 - jnp.abs(wio - x), 0.0) * wa
                    ty = jnp.maximum(1.0 - jnp.abs(hio - y), 0.0)
                    typ = jnp.dot(ty.astype(dtype), E,
                                  preferred_element_type=jnp.float32)
                    txp = pltpu.repeat(tx, H, 1)  # [subq, H*W] tiled
                    t = txp * typ
                    acc = t if acc is None else acc + t
                o_ref[0, m, pl.ds(c * subq, subq)] = jnp.dot(
                    acc.astype(dtype), v_ref[0, m],
                    preferred_element_type=jnp.float32)

    return kernel


def msda_outer2d(slab_raster, rows, RQ, D, P, W, *, bqq=2048, subq=512):
    n, m, S, _ = slab_raster.shape
    H = S // W
    _, Qp, lanes = rows.shape
    assert Qp % bqq == 0
    out = pl.pallas_call(
        _outer2d_kernel(S, W, H, bqq, subq, m, P, slab_raster.dtype),
        out_shape=jax.ShapeDtypeStruct((n, m, Qp, D), jnp.float32),
        grid=(n, Qp // bqq),
        in_specs=[
            pl.BlockSpec((1, bqq, lanes), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, S, D), lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, bqq, D), lambda b, r: (b, 0, r, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )(rows, slab_raster)
    return jnp.moveaxis(out, 1, 2)[:, :RQ]


def _outer2d_win_kernel(S, W, H, bqq, subq, M, P, dtype, Hw, align):
    nsub = bqq // subq
    SW = Hw * W
    NFB = H // Hw  # static fallback window positions

    def kernel(meta_ref, rows_ref, v_ref, o_ref):
        wio = jax.lax.broadcasted_iota(jnp.int32, (subq, W), 1).astype(jnp.float32)
        hio = jax.lax.broadcasted_iota(jnp.int32, (subq, Hw), 1).astype(jnp.float32)
        e_r = jax.lax.broadcasted_iota(jnp.int32, (Hw, SW), 0)
        e_c = jax.lax.broadcasted_iota(jnp.int32, (Hw, SW), 1) // W
        E = (e_r == e_c).astype(dtype)

        for c in range(nsub):
            rsl = slice(c * subq, (c + 1) * subq)
            for m in range(M):
                ys0 = meta_ref[0, 0, c, m, 0]
                ok = meta_ref[0, 0, c, m, 1]

                def cols(p):
                    x = rows_ref[0, rsl, m * P + p][:, None]
                    y = rows_ref[0, rsl, M * P + m * P + p][:, None]
                    wa = rows_ref[0, rsl, 2 * M * P + m * P + p][:, None]
                    return x, y, wa

                def plane(y0f):
                    acc = None
                    for p in range(P):
                        x, y, wa = cols(p)
                        tx = jnp.maximum(1.0 - jnp.abs(wio - x), 0.0) * wa
                        ty = jnp.maximum(1.0 - jnp.abs(hio + y0f - y), 0.0)
                        typ = jnp.dot(ty.astype(dtype), E,
                                      preferred_element_type=jnp.float32)
                        t = pltpu.repeat(tx, Hw, 1) * typ
                        acc = t if acc is None else acc + t
                    return acc.astype(dtype)

                @pl.when(ok == 1)
                def _(c=c, m=m, ys0=ys0):
                    # ystart = k*align only guarantees ys0*W % 8 == 0
                    # (via (W*align) % 8 == 0), not % (8*align)
                    start = pl.multiple_of(ys0 * W, 8)
                    vw = v_ref[0, m, pl.ds(start, SW), :]
                    o_ref[0, m, pl.ds(c * subq, subq)] = jnp.dot(
                        plane(ys0.astype(jnp.float32)), vw,
                        preferred_element_type=jnp.float32)

                @pl.when(ok == 0)
                def _(c=c, m=m):
                    out = jnp.zeros((subq, o_ref.shape[-1]), jnp.float32)
                    for wpos in range(NFB):
                        vw = v_ref[0, m, wpos * SW:(wpos + 1) * SW, :]
                        out = out + jnp.dot(plane(float(wpos * Hw)), vw,
                                            preferred_element_type=jnp.float32)
                    o_ref[0, m, pl.ds(c * subq, subq)] = out

    return kernel


def msda_outer2d_win(slab_raster, rows, RQ, D, P, W, Hw, *, bqq=2048, subq=512):
    n, m, S, _ = slab_raster.shape
    H = S // W
    assert H % Hw == 0
    _, Qp, lanes = rows.shape
    assert Qp % bqq == 0
    nb = Qp // bqq
    nsub = bqq // subq
    # ystart*W must be a multiple of 8 sublanes
    align = 1
    while (W * align) % 8:
        align *= 2

    ys = rows[:, :, m * P: 2 * m * P]
    y0c = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    y0b = y0c.reshape(n, nb, nsub, subq, m * P)
    ymin = y0b.min(axis=3)
    ymax = y0b.max(axis=3)
    ymin = ymin.reshape(n, nb, nsub, m, P).min(axis=4)
    ymax = ymax.reshape(n, nb, nsub, m, P).max(axis=4)
    ystart = jnp.minimum(ymin // align * align, (H - Hw) // align * align)
    ok = (jnp.minimum(ymax + 1, H - 1) < ystart + Hw).astype(jnp.int32)
    meta = jnp.stack([ystart, ok], axis=-1)

    out = pl.pallas_call(
        _outer2d_win_kernel(S, W, H, bqq, subq, m, P, slab_raster.dtype, Hw,
                            align),
        out_shape=jax.ShapeDtypeStruct((n, m, Qp, D), jnp.float32),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, 1, nsub, m, 2), lambda b, r: (b, r, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bqq, lanes), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, S, D), lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, bqq, D), lambda b, r: (b, 0, r, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )(meta, rows, slab_raster)
    return jnp.moveaxis(out, 1, 2)[:, :RQ], meta


def main():
    shapes = ((80, 120), (40, 60), (20, 30))
    M, P, N, D = 8, 4, 5, 32
    rng = np.random.RandomState(1)

    for lid in (2, 1, 0):
        loc, wa, hh, ww = production_loc(shapes, lid, M, P, N)
        S = hh * ww
        xs, ys, was = rows_pointminor(loc, wa, hh, ww)
        rowsq = rows_qmajor(loc, wa, hh, ww)
        slab5 = rng.randn(N, M, hh, ww, D).astype(np.float32)
        slab_j = jnp.asarray(
            slab5.transpose(0, 1, 3, 2, 4).reshape(N, M, ww, hh * D), jnp.bfloat16)
        slab_r = jnp.asarray(slab5.reshape(N, M, S, D), jnp.bfloat16)
        RQ = loc.shape[1]
        print(f"--- level 1/{8 * 2**lid} ({hh}x{ww}, S={S}) ---", flush=True)

        if lid == 2:
            fcur = jax.jit(lambda s, x, y, w, ww=ww: da._msda_tent2d_level(
                s, x, y, w, D, P, ww))
            t = timeit(fcur, slab_r, xs, ys, was)
            ref = np.asarray(fcur(slab_r, xs, ys, was), np.float32)
            print(f"cur 2d       : {t*1e3:6.2f} ms", flush=True)
        else:
            hw = da._tent_window_rows(hh, D)
            fcur = jax.jit(lambda s, x, y, w, hw=hw: da._msda_tent_win_level(
                s, x, y, w, D, P, hw))
            t = timeit(fcur, slab_j, xs, ys, was)
            ref = np.asarray(fcur(slab_j, xs, ys, was), np.float32)
            print(f"cur win Hw={hw:2d}: {t*1e3:6.2f} ms", flush=True)

        if lid in (1, 2):
            for subq in (512, 2048):
                try:
                    f = jax.jit(lambda s, r, subq=subq, ww=ww: msda_outer2d(
                        s, r, RQ, D, P, ww, subq=subq))
                    t = timeit(f, slab_r, rowsq)
                    o = np.asarray(f(slab_r, rowsq), np.float32)
                    err = float(np.abs(o - ref).max() / np.abs(ref).max())
                    print(f"outer2d sub={subq:4d}: {t*1e3:6.2f} ms  err={err:.5f}",
                          flush=True)
                except Exception as e:
                    print(f"outer2d sub={subq}: FAIL {str(e)[:90]}", flush=True)

        if lid in (0, 1):
            hws = (16, 20) if lid == 0 else (8, 20)
            for Hw in hws:
                if hh % Hw:
                    continue
                try:
                    f = jax.jit(lambda s, r, Hw=Hw, ww=ww: msda_outer2d_win(
                        s, r, RQ, D, P, ww, Hw)[0])
                    t = timeit(f, slab_r, rowsq)
                    o = np.asarray(f(slab_r, rowsq), np.float32)
                    _, meta = msda_outer2d_win(slab_r, rowsq, RQ, D, P, ww, Hw)
                    hr = float(np.asarray(meta[..., 1], np.float32).mean())
                    err = float(np.abs(o - ref).max() / np.abs(ref).max())
                    print(f"outer2d-win Hw={Hw:2d}: {t*1e3:6.2f} ms  hit={hr:.2f}"
                          f"  err={err:.5f}", flush=True)
                except Exception as e:
                    print(f"outer2d-win Hw={Hw}: FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
