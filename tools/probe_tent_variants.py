"""Probe: tent-kernel micro-variants at the dominant 1/8-level geometry.

The round-3 ideal-cost accounting (docs/PERFORMANCE.md) says the tent
kernel should run ~12 ms per 5-frame layer if VPU work (y tents) and
MXU work (T1/G/Gp) overlapped perfectly; it measures ~40 ms.  Variants:

  base   — production kernel (f32 t1 plane, f32 my multiply)
  b16t1  — t1 cast to bf16 at the MXU boundary (halves wide-plane traffic)
  b16all — y-tent + multiply fully in bf16
  gridm  — heads as the slowest grid axis (per-head programs) instead of
           an in-kernel python loop

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_tent_variants.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(m, flush=True)


def sync(x):
    return float(jnp.sum(x[(0,) * x.ndim]))


def timeit(fn, *args, iters=10):
    for _ in range(2):
        sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / iters


def make_kernel(H, W, bq, M, D, P, variant):
    DH = D * H
    BQ = bq // P
    b16 = variant in ("b16t1", "b16all")

    def body(m_sel, x_ref, y_ref, wa_ref, v_ref, o_ref):
        xio = jax.lax.broadcasted_iota(jnp.int32, (bq, W), 1).astype(jnp.float32)
        jio_f = (jax.lax.broadcasted_iota(jnp.int32, (bq, DH), 1) % H).astype(jnp.float32)
        g_rows = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 0)
        g_cols = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 1)
        G = (g_rows // H == g_cols).astype(jnp.bfloat16)
        gp_rows = jax.lax.broadcasted_iota(jnp.int32, (BQ, bq), 0)
        gp_cols = jax.lax.broadcasted_iota(jnp.int32, (BQ, bq), 1)
        Gp = (gp_rows == gp_cols // P).astype(jnp.bfloat16)
        for m in m_sel:
            x = x_ref[0, :, m][:, None]
            y = y_ref[0, :, m][:, None]
            wa = wa_ref[0, :, m][:, None]
            mx = (jnp.maximum(1.0 - jnp.abs(xio - x), 0.0) * wa).astype(jnp.bfloat16)
            vm = v_ref[0, 0] if len(m_sel) == 1 else v_ref[0, m]
            if b16:
                t1 = jnp.dot(mx, vm, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            else:
                t1 = jnp.dot(mx, vm, preferred_element_type=jnp.float32)
            if variant == "b16all":
                my = jnp.maximum(1.0 - jnp.abs(jio_f - y), 0.0).astype(jnp.bfloat16)
                p2 = my * t1
            else:
                my = jnp.maximum(1.0 - jnp.abs(jio_f - y), 0.0)
                p2 = (my * t1.astype(jnp.float32)).astype(jnp.bfloat16)
            per_row = jnp.dot(p2, G, preferred_element_type=jnp.float32)
            om = 0 if len(m_sel) == 1 else m
            o_ref[0, :, om] = jnp.dot(Gp, per_row.astype(jnp.bfloat16),
                                      preferred_element_type=jnp.float32)

    if variant == "gridm":
        def kernel(x_ref, y_ref, wa_ref, v_ref, o_ref):
            m = pl.program_id(2)
            # select head column dynamically is awkward; x_ref block still
            # carries all M columns — read column m via dynamic slice
            body_gridm(m, x_ref, y_ref, wa_ref, v_ref, o_ref)

        def body_gridm(m, x_ref, y_ref, wa_ref, v_ref, o_ref):
            xio = jax.lax.broadcasted_iota(jnp.int32, (bq, W), 1).astype(jnp.float32)
            jio_f = (jax.lax.broadcasted_iota(jnp.int32, (bq, DH), 1) % H).astype(jnp.float32)
            g_rows = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 0)
            g_cols = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 1)
            G = (g_rows // H == g_cols).astype(jnp.bfloat16)
            gp_rows = jax.lax.broadcasted_iota(jnp.int32, (BQ, bq), 0)
            gp_cols = jax.lax.broadcasted_iota(jnp.int32, (BQ, bq), 1)
            Gp = (gp_rows == gp_cols // P).astype(jnp.bfloat16)
            xc = jax.lax.dynamic_slice(x_ref[0], (0, m), (bq, 1))
            yc = jax.lax.dynamic_slice(y_ref[0], (0, m), (bq, 1))
            wac = jax.lax.dynamic_slice(wa_ref[0], (0, m), (bq, 1))
            mx = (jnp.maximum(1.0 - jnp.abs(xio - xc), 0.0) * wac).astype(jnp.bfloat16)
            t1 = jnp.dot(mx, v_ref[0, 0], preferred_element_type=jnp.float32)
            my = jnp.maximum(1.0 - jnp.abs(jio_f - yc), 0.0)
            p2 = (my * t1).astype(jnp.bfloat16)
            per_row = jnp.dot(p2, G, preferred_element_type=jnp.float32)
            o_ref[0, 0] = jnp.dot(Gp, per_row.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
        return kernel

    def kernel(x_ref, y_ref, wa_ref, v_ref, o_ref):
        body(range(M), x_ref, y_ref, wa_ref, v_ref, o_ref)
    return kernel


def run_level(slab, xs, ys, was, D, P, variant):
    n, m, W, DH = slab.shape
    _, R, _ = xs.shape
    H = DH // D
    bq = 1024
    assert R % P == 0
    pad = (-R) % bq
    if pad:
        xs = jnp.concatenate([xs, jnp.full((n, pad, m), -10.0, xs.dtype)], axis=1)
        ys = jnp.concatenate([ys, jnp.full((n, pad, m), -10.0, ys.dtype)], axis=1)
        was = jnp.concatenate([was, jnp.zeros((n, pad, m), was.dtype)], axis=1)
    Rp = R + pad
    if variant == "gridm":
        grid = (n, Rp // bq, m)
        in_specs = [
            pl.BlockSpec((1, bq, m), lambda b, r, mm: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, m), lambda b, r, mm: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, m), lambda b, r, mm: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, DH), lambda b, r, mm: (b, mm, 0, 0), memory_space=pltpu.VMEM),
        ]
        # out laid out [n, m, R/P, D] so the head axis stays off the
        # tiled last-two dims; transposed back after the call
        out_specs = pl.BlockSpec((1, 1, bq // P, D), lambda b, r, mm: (b, mm, r, 0),
                                 memory_space=pltpu.VMEM)
    else:
        grid = (n, Rp // bq)
        in_specs = [
            pl.BlockSpec((1, bq, m), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, m), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, m), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, W, DH), lambda b, r: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec((1, bq // P, m, D), lambda b, r: (b, r, 0, 0),
                                 memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((n, m, Rp // P, D), jnp.float32)
        if variant == "gridm"
        else jax.ShapeDtypeStruct((n, Rp // P, m, D), jnp.float32)
    )
    out = pl.pallas_call(
        make_kernel(H, W, bq, m, D, P, variant),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(xs, ys, was, slab)
    if variant == "gridm":
        out = out.transpose(0, 2, 1, 3)
    return out[:, : R // P]


def main():
    H, W, D, M, P, N = 80, 120, 32, 8, 4, 5
    Lq = 9600 + 2400 + 600
    R = Lq * P
    rng = np.random.RandomState(0)
    slab = jnp.asarray(rng.randn(N, M, W, D * H), jnp.bfloat16)
    xs = jnp.asarray(rng.rand(N, R, M) * W, jnp.float32)
    ys = jnp.asarray(rng.rand(N, R, M) * H, jnp.float32)
    was = jnp.asarray(rng.rand(N, R, M), jnp.float32)

    ref = None
    for variant in ("base", "b16t1", "b16all", "gridm"):
        f = jax.jit(lambda s, x, y, w, v=variant: run_level(s, x, y, w, D, P, v))
        try:
            t = timeit(f, slab, xs, ys, was)
        except Exception as e:
            log(f"{variant}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        o = np.asarray(f(slab, xs, ys, was)).astype(np.float32)
        if ref is None:
            ref = o
            err = 0.0
        else:
            err = float(np.abs(o - ref).max() / np.abs(ref).max())
        log(f"{variant:7s}: {t*1e3:6.1f} ms / 5-frame level-1/8   rel-err {err:.5f}")


if __name__ == "__main__":
    main()
