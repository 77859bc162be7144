"""Probe: POINT-SUMMED 2D-tent MSDA kernels.

Every measured binder so far points at a per-(head, row) fixed cost in
Mosaic scheduling, independent of plane width / window / chunk size
(docs/PERFORMANCE.md round 3c).  The untried lever: the MSDA output is
LINEAR in the P sampling points, so the per-point 2D tent planes can be
accumulated into ONE plane row per query *before* the matmul:

    out[q, d] = sum_p wa_p * sum_s tentx_p(i_s) tenty_p(j_s) v[s, d]
              = ( sum_p wa_p tentx_p tenty_p )[q, :] @ v      -- one row

4x fewer matmul rows (and per-row iterations) for the SAME number of
tent evaluations.  If the floor is per-row, this is ~4x on the plane
phase; if it is per-tent-eval (VPU), it is flat.  Variants probed at
production geometry (640x960, T=5, M=8, P=4, D=32):

  - psum2d: full-raster plane [subq, S] per head (1/32 S=600, 1/16
    S=2400, 1/8 S=9600 -- the latter as a VMEM stress test)
  - psum2d-win: 1/8 and 1/16 with a dynamic SUBLANE window into the
    raster slab [S, D] (rows ystart*W .. (ystart+Hw)*W; W%8==0 makes
    any ystart 8-aligned), exact full-S fallback per missed chunk.

vs the current production per-level winners (2d / win Hw=24).

    python tools/probe_tent_psum.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import univs_tpu.ops.deformable_attention as da


def sync(x):
    return float(jnp.sum(x[(0,) * x.ndim]))


def timeit(fn, *args, iters=20):
    for _ in range(2):
        sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / iters


# --------------------------------------------------------------------------
# point-summed kernels: rows are QUERIES; points live in row lanes
# rows [N, Qp, 3*M*P]: lanes [x(M*P), y(M*P), wa(M*P)], point-minor in
# each block (column m*P+p).
# --------------------------------------------------------------------------

def _psum2d_kernel(S, W, bqq, subq, M, P, dtype):
    nsub = bqq // subq

    def kernel(rows_ref, v_ref, o_ref):
        sio = jax.lax.broadcasted_iota(jnp.int32, (subq, S), 1)
        iio = (sio % W).astype(jnp.float32)
        jio = (sio // W).astype(jnp.float32)
        for c in range(nsub):
            rsl = slice(c * subq, (c + 1) * subq)
            for m in range(M):
                acc = None
                for p in range(P):
                    x = rows_ref[0, rsl, m * P + p][:, None]
                    y = rows_ref[0, rsl, M * P + m * P + p][:, None]
                    wa = rows_ref[0, rsl, 2 * M * P + m * P + p][:, None]
                    t = (jnp.maximum(1.0 - jnp.abs(iio - x), 0.0)
                         * (jnp.maximum(1.0 - jnp.abs(jio - y), 0.0) * wa))
                    acc = t if acc is None else acc + t
                o_ref[0, m, pl.ds(c * subq, subq)] = jnp.dot(
                    acc.astype(dtype), v_ref[0, m],
                    preferred_element_type=jnp.float32)

    return kernel


def msda_psum2d(slab_raster, rows, RQ, D, P, W, *, bqq=2048, subq=512):
    n, m, S, _ = slab_raster.shape
    _, Qp, lanes = rows.shape
    assert Qp % bqq == 0
    out = pl.pallas_call(
        _psum2d_kernel(S, W, bqq, subq, m, P, slab_raster.dtype),
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


def _psum2d_win_kernel(H, W, bqq, subq, M, P, dtype, Hw):
    nsub = bqq // subq
    SW = Hw * W
    S = H * W

    def kernel(meta_ref, rows_ref, v_ref, o_ref):
        lio = jax.lax.broadcasted_iota(jnp.int32, (subq, SW), 1)
        iio = (lio % W).astype(jnp.float32)
        jof = (lio // W).astype(jnp.float32)
        fio = jax.lax.broadcasted_iota(jnp.int32, (subq, S), 1)
        fiio = (fio % W).astype(jnp.float32)
        fjio = (fio // W).astype(jnp.float32)
        for c in range(nsub):
            rsl = slice(c * subq, (c + 1) * subq)
            for m in range(M):
                ys0 = meta_ref[0, 0, c, m, 0]
                ok = meta_ref[0, 0, c, m, 1]

                @pl.when(ok == 1)
                def _(c=c, m=m, rsl=rsl, ys0=ys0):
                    start = pl.multiple_of(ys0 * W, 8)
                    vw = v_ref[0, m, pl.ds(start, SW), :]
                    acc = None
                    jwin = jof + ys0.astype(jnp.float32)
                    for p in range(P):
                        x = rows_ref[0, rsl, m * P + p][:, None]
                        y = rows_ref[0, rsl, M * P + m * P + p][:, None]
                        wa = rows_ref[0, rsl, 2 * M * P + m * P + p][:, None]
                        t = (jnp.maximum(1.0 - jnp.abs(iio - x), 0.0)
                             * (jnp.maximum(1.0 - jnp.abs(jwin - y), 0.0) * wa))
                        acc = t if acc is None else acc + t
                    o_ref[0, m, pl.ds(c * subq, subq)] = jnp.dot(
                        acc.astype(dtype), vw, preferred_element_type=jnp.float32)

                @pl.when(ok == 0)
                def _(c=c, m=m, rsl=rsl):
                    acc = None
                    for p in range(P):
                        x = rows_ref[0, rsl, m * P + p][:, None]
                        y = rows_ref[0, rsl, M * P + m * P + p][:, None]
                        wa = rows_ref[0, rsl, 2 * M * P + m * P + p][:, None]
                        t = (jnp.maximum(1.0 - jnp.abs(fiio - x), 0.0)
                             * (jnp.maximum(1.0 - jnp.abs(fjio - y), 0.0) * wa))
                        acc = t if acc is None else acc + t
                    o_ref[0, m, pl.ds(c * subq, subq)] = jnp.dot(
                        acc.astype(dtype), v_ref[0, m],
                        preferred_element_type=jnp.float32)

    return kernel


def msda_psum2d_win(slab_raster, rows, RQ, D, P, W, Hw, *, bqq=2048, subq=512):
    n, m, S, _ = slab_raster.shape
    H = S // W
    _, Qp, lanes = rows.shape
    assert Qp % bqq == 0
    nb = Qp // bqq
    nsub = bqq // subq

    ys = rows[:, :, m * P: 2 * m * P]  # [N, Qp, M*P]
    y0c = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    y0b = y0c.reshape(n, nb, nsub, subq, m, P)
    ymin = y0b.min(axis=(3, 5))  # [N, nb, nsub, M]
    ymax = y0b.max(axis=(3, 5))
    # ystart*W must be a multiple of 8 sublanes: round ystart down to the
    # smallest align with (W*align)%8 == 0 (W=60 at level 1/16 gives 2)
    align = 1
    while (W * align) % 8:
        align *= 2
    ystart = jnp.minimum(ymin // align * align, (H - Hw) // align * align)
    ok = (jnp.minimum(ymax + 1, H - 1) < ystart + Hw).astype(jnp.int32)
    meta = jnp.stack([ystart, ok], axis=-1)

    out = pl.pallas_call(
        _psum2d_win_kernel(H, W, bqq, subq, m, P, slab_raster.dtype, Hw),
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


def production_loc(shapes, lid, M=8, P=4, N=5, seed=0):
    rng = np.random.RandomState(seed)
    base = np.concatenate([
        np.stack(np.meshgrid((np.arange(ww) + 0.5) / ww,
                             (np.arange(hh) + 0.5) / hh), -1).reshape(-1, 2)
        for hh, ww in shapes
    ])
    S = base.shape[0]
    thetas = np.arange(M) * (2 * np.pi / M)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    pts = grid[:, None, :] * (np.arange(P) + 1)[None, :, None]
    hh, ww = shapes[lid]
    off = pts[None, None] + rng.randn(N, S, M, P, 2) * 0.5
    loc = base[None, :, None, None, :] + off / np.array([ww, hh])
    wa = rng.rand(N, S, M, P)
    return loc, wa, hh, ww


def rows_pointminor(loc, wa, hh, ww):
    N, S, M, P, _ = loc.shape
    x = (loc[..., 0] * ww - 0.5).transpose(0, 1, 3, 2).reshape(N, S * P, M)
    y = (loc[..., 1] * hh - 0.5).transpose(0, 1, 3, 2).reshape(N, S * P, M)
    w = wa.transpose(0, 1, 3, 2).reshape(N, S * P, M)
    return (jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(w, jnp.float32))


def rows_qmajor(loc, wa, hh, ww, bqq=2048):
    N, S, M, P, _ = loc.shape
    x = (loc[..., 0] * ww - 0.5).reshape(N, S, M * P)
    y = (loc[..., 1] * hh - 0.5).reshape(N, S, M * P)
    w = wa.reshape(N, S, M * P)
    rows = np.concatenate([x, y, w], axis=2)  # [N, S, 3MP]
    pad = (-S) % bqq
    if pad:
        # pad x far out of range (zero tent) but y MID-RANGE: a -10 y
        # sentinel clips to y0=0 in the window min/max metadata and
        # artificially deflates the reported hit rate
        fill = np.zeros((N, pad, rows.shape[2]))
        fill[:, :, : M * P] = -10.0
        fill[:, :, M * P: 2 * M * P] = float(hh // 2)
        rows = np.concatenate([rows, fill], axis=1)
    return jnp.asarray(rows, jnp.float32)


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

        # current production winner
        if lid == 2:
            fcur = jax.jit(lambda s, x, y, w: da._msda_tent2d_level(
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

        # p-summed full-raster plane
        for subq in (256, 512):
            try:
                f = jax.jit(lambda s, r, subq=subq: msda_psum2d(
                    s, r, RQ, D, P, ww, subq=subq))
                t = timeit(f, slab_r, rowsq)
                o = np.asarray(f(slab_r, rowsq), np.float32)
                err = float(np.abs(o - ref).max() / np.abs(ref).max())
                print(f"psum2d sub={subq:4d}: {t*1e3:6.2f} ms  err={err:.5f}",
                      flush=True)
            except Exception as e:
                print(f"psum2d sub={subq}: FAIL {type(e).__name__}: {str(e)[:120]}",
                      flush=True)

        # p-summed windowed raster plane (tall levels)
        if lid in (0, 1):
            for Hw in ((8, 16, 24) if lid == 0 else (8, 16)):
                try:
                    f = jax.jit(lambda s, r, Hw=Hw: msda_psum2d_win(
                        s, r, RQ, D, P, ww, Hw)[0])
                    t = timeit(f, slab_r, rowsq)
                    o = np.asarray(f(slab_r, rowsq), np.float32)
                    _, meta = msda_psum2d_win(slab_r, rowsq, RQ, D, P, ww, Hw)
                    hr = float(np.asarray(meta[..., 1], np.float32).mean())
                    err = float(np.abs(o - ref).max() / np.abs(ref).max())
                    print(f"psum2d-win Hw={Hw:2d}: {t*1e3:6.2f} ms  hit={hr:.2f}"
                          f"  err={err:.5f}", flush=True)
                except Exception as e:
                    print(f"psum2d-win Hw={Hw}: FAIL {type(e).__name__}: "
                          f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
