"""Probe: matmul-expanded y-tents for the windowed MSDA kernel.

The round-3b accounting left the windowed tent kernel ~2x above its
compute floor, with Mosaic serializing per-head VPU->MXU chains.  The
dominant VPU term is building the dense y-tent plane ``my[q, j*D+d] =
tent(j - y_q)`` over the full [sub, D*Hw] wide plane (~5 passes).  But
``my`` is RANK-1 along lanes — it does not depend on d — so it can be
built at [sub, 128] width (Hw <= 128) and expanded onto the wide plane
with one tiny MXU matmul against the 0/1 expansion matrix
``E[j, jj*D+d] = (j == jj)``:

    my_exp = my_small @ E        # [sub, 128] @ [128, D*Hw], MXU
    p2     = my_exp * t1         # unchanged
    out    = p2 @ Gw             # unchanged

VPU passes over the wide plane drop from ~5 to ~2 (multiply + cast);
the expansion matmul adds ~0.4 GFLOP per (chunk, head) — noise on the
MXU.  Numerics: expansion with f32 accumulate of a 0/1 matrix is exact;
TPU default-precision f32 dot truncates to bf16 so the y weights carry
bf16 rounding (~4e-3 rel) — same order as the slab's own bf16.

Variants at the production 1/8-level geometry (realistic clustered ys):
  win      — production windowed kernel (import, bq=8192/sub=2048)
  winexp   — expanded y-tents, f32 plane multiply (as production)
  winexpb  — expanded y-tents, all-bf16 p2

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_tent_v5.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from univs_tpu.ops.deformable_attention import (
    _msda_tent_win_level,
    _pad_rows,
    _TENT_BQ,
    _TENT_SUB,
)


def sync(x):
    return float(jnp.sum(x[(0,) * x.ndim]))


def timeit(fn, *args, iters=10):
    for _ in range(2):
        sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / iters


def _round_up(a, b):
    return -(-a // b) * b


def make_exp_kernel(H, W, bq, sub, M, D, P, dtype, Hw, b16p2):
    DH = D * H
    DHw = D * Hw
    nsub = bq // sub
    SQ = sub // P
    Hp = _round_up(H, 128)      # lanes of the small fallback tent
    Hwp = 128                   # lanes of the small windowed tent
    windowed = Hw < H

    def kernel(meta_ref, rows_ref, v_ref, o_ref):
        xio = jax.lax.broadcasted_iota(jnp.int32, (sub, W), 1).astype(jnp.float32)
        # windowed expansion: E[j, jj*D + d] = (j == jj), j < Hwp
        ew_r = jax.lax.broadcasted_iota(jnp.int32, (Hwp, DHw), 0)
        ew_c = jax.lax.broadcasted_iota(jnp.int32, (Hwp, DHw), 1)
        Ew = (ew_r == ew_c // D).astype(dtype)
        jsw = jax.lax.broadcasted_iota(jnp.int32, (sub, Hwp), 1)
        gw_rows = jax.lax.broadcasted_iota(jnp.int32, (DHw, D), 0)
        gw_cols = jax.lax.broadcasted_iota(jnp.int32, (DHw, D), 1)
        Gw = (gw_rows % D == gw_cols).astype(dtype)
        if windowed:
            ef_r = jax.lax.broadcasted_iota(jnp.int32, (Hp, DH), 0)
            ef_c = jax.lax.broadcasted_iota(jnp.int32, (Hp, DH), 1)
            Ef = (ef_r == ef_c // D).astype(dtype)
            jsf = jax.lax.broadcasted_iota(jnp.int32, (sub, Hp), 1).astype(jnp.float32)
            gf_rows = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 0)
            gf_cols = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 1)
            Gf = (gf_rows % D == gf_cols).astype(dtype)
        for c in range(nsub):
            rsl = slice(c * sub, (c + 1) * sub)
            for m in range(M):
                x = rows_ref[0, rsl, m][:, None]
                y = rows_ref[0, rsl, M + m][:, None]
                wa = rows_ref[0, rsl, 2 * M + m][:, None]
                mx = (jnp.maximum(1.0 - jnp.abs(xio - x), 0.0) * wa).astype(dtype)

                def fast(ys0):
                    start = pl.multiple_of(ys0 * D, 128)
                    vw = v_ref[0, m, :, pl.ds(start, DHw)]
                    t1 = jnp.dot(mx, vw, preferred_element_type=jnp.float32)
                    mys = jnp.maximum(
                        1.0 - jnp.abs((jsw + ys0).astype(jnp.float32) - y), 0.0
                    ).astype(dtype)
                    mye = jnp.dot(mys, Ew, preferred_element_type=jnp.float32)
                    if b16p2:
                        p2 = mye.astype(dtype) * t1.astype(dtype)
                    else:
                        p2 = (mye * t1).astype(dtype)
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
                    mys = jnp.maximum(1.0 - jnp.abs(jsf - y), 0.0).astype(dtype)
                    mye = jnp.dot(mys, Ef, preferred_element_type=jnp.float32)
                    if b16p2:
                        p2 = mye.astype(dtype) * t1.astype(dtype)
                    else:
                        p2 = (mye * t1).astype(dtype)
                    per_row = jnp.dot(p2, Gf, preferred_element_type=jnp.float32)
                    o_ref[0, m, pl.ds(c * SQ, SQ)] = per_row.reshape(SQ, P, D).sum(axis=1)

    return kernel


def run_exp(slab_jmajor, xs, ys, was, D, P, Hw, b16p2):
    n, m, W, DH = slab_jmajor.shape
    H = DH // D
    _, R, _ = xs.shape
    align = max(1, -(-128 // D))
    sub = max(P, (_TENT_SUB // P) * P)
    bq = max(sub, (_TENT_BQ // sub) * sub)
    xs, ys, was, Rp = _pad_rows(xs, ys, was, bq)
    nb = Rp // bq
    nsub = bq // sub

    if Hw < H:
        y0c = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
        y0b = y0c.reshape(n, nb, nsub, sub, m)
        ymin = y0b.min(axis=3)
        ymax = y0b.max(axis=3)
        ystart = jnp.minimum((ymin // align) * align, H - Hw)
        ok = (jnp.minimum(ymax + 1, H - 1) < ystart + Hw).astype(jnp.int32)
        meta = jnp.stack([ystart, ok], axis=-1)
    else:
        meta = jnp.zeros((n, nb, nsub, m, 2), jnp.int32)

    rows = jnp.concatenate([xs, ys, was], axis=2)
    out = pl.pallas_call(
        make_exp_kernel(H, W, bq, sub, m, D, P, slab_jmajor.dtype, Hw, b16p2),
        out_shape=jax.ShapeDtypeStruct((n, m, Rp // P, D), jnp.float32),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, 1, nsub, m, 2), lambda b, r: (b, r, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, 3 * m), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, W, DH), lambda b, r: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m, bq // P, D), lambda b, r: (b, 0, r, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(meta, rows, slab_jmajor)
    return jnp.moveaxis(out, 1, 2)[:, : R // P]


def main():
    H, W, D, M, P, N = 80, 120, 32, 8, 4, 5
    Lq, Hw = 12600, 24
    R = Lq * P
    rng = np.random.RandomState(0)
    slab_j = jnp.asarray(rng.randn(N, M, H, W, D).transpose(0, 1, 3, 2, 4)
                         .reshape(N, M, W, H * D), jnp.bfloat16)
    baseq = (np.arange(Lq) // W) % H * 1.0
    ys_n = np.broadcast_to(baseq[None, :, None, None], (N, Lq, P, M)) + rng.randn(N, Lq, P, M) * 2
    xs_n = rng.rand(N, Lq, P, M) * W
    xs = jnp.asarray(xs_n.reshape(N, R, M), jnp.float32)
    ys = jnp.asarray(ys_n.reshape(N, R, M), jnp.float32)
    was = jnp.asarray(rng.rand(N, R, M), jnp.float32)

    fns = [
        ("win    ", jax.jit(lambda s, x, y, w: _msda_tent_win_level(s, x, y, w, D, P, Hw))),
        ("winexp ", jax.jit(lambda s, x, y, w: run_exp(s, x, y, w, D, P, Hw, False))),
        ("winexpb", jax.jit(lambda s, x, y, w: run_exp(s, x, y, w, D, P, Hw, True))),
    ]
    ref = None
    for name, f in fns:
        try:
            t = timeit(f, slab_j, xs, ys, was)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:300]}", flush=True)
            continue
        o = np.asarray(f(slab_j, xs, ys, was), np.float32)
        if ref is None:
            ref, err = o, 0.0
        else:
            err = float(np.abs(o - ref).max() / np.abs(ref).max())
        print(f"{name}: {t*1e3:6.1f} ms / 5-frame level-1/8   rel-err {err:.5f}", flush=True)


if __name__ == "__main__":
    main()
