"""Probe: round-3b tent-kernel optimizations at the 1/8-level geometry.

Variants over the production kernel (docs/PERFORMANCE.md round-3
accounting: ~40 ms measured vs ~12-15 ms ideal per 5-frame layer):

  base    — production kernel shape (f32 t1 plane, per-head loop)
  repeat  — y tent built narrow [bq, H] then lane-replicated D times
            with pltpu.repeat (t1 lanes are d-major so the tent plane
            is H-periodic along lanes: ~5x less wide-plane VPU work)
  subsum  — Gp point-sum matmul replaced by a sublane reshape-sum
            ([bq, D] -> [BQ, P, D].sum(1); sublane splits are legal,
            only lane splits are not)
  both    — repeat + subsum
  b16both — both + t1 plane cast to bf16 before the y multiply
  t1only  — T1 matmuls alone (MXU floor check)

    PYTHONPATH=/root/repo python tools/probe_tent_v2.py
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
    use_repeat = variant in ("repeat", "both", "b16both")
    use_subsum = variant in ("subsum", "both", "b16both")
    b16plane = variant == "b16both"

    def kernel(x_ref, y_ref, wa_ref, v_ref, o_ref):
        xio = jax.lax.broadcasted_iota(jnp.int32, (bq, W), 1).astype(jnp.float32)
        if use_repeat:
            jn = jax.lax.broadcasted_iota(jnp.int32, (bq, H), 1).astype(jnp.float32)
        else:
            jio = (jax.lax.broadcasted_iota(jnp.int32, (bq, DH), 1) % H).astype(jnp.float32)
        g_rows = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 0)
        g_cols = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 1)
        G = (g_rows // H == g_cols).astype(jnp.bfloat16)
        if not use_subsum:
            gp_rows = jax.lax.broadcasted_iota(jnp.int32, (BQ, bq), 0)
            gp_cols = jax.lax.broadcasted_iota(jnp.int32, (BQ, bq), 1)
            Gp = (gp_rows == gp_cols // P).astype(jnp.bfloat16)
        for m in range(M):
            x = x_ref[0, :, m][:, None]
            y = y_ref[0, :, m][:, None]
            wa = wa_ref[0, :, m][:, None]
            mx = (jnp.maximum(1.0 - jnp.abs(xio - x), 0.0) * wa).astype(jnp.bfloat16)
            if variant == "t1only":
                t1 = jnp.dot(mx, v_ref[0, m], preferred_element_type=jnp.float32)
                o_ref[0, :, m] = t1[:BQ, :D]
                continue
            t1 = jnp.dot(mx, v_ref[0, m], preferred_element_type=jnp.float32)
            if use_repeat:
                myn = jnp.maximum(1.0 - jnp.abs(jn - y), 0.0)  # [bq, H]
                if b16plane:
                    my = pltpu.repeat(myn.astype(jnp.bfloat16), D, axis=1)
                    p2 = my * t1.astype(jnp.bfloat16)
                else:
                    my = pltpu.repeat(myn, D, axis=1)
                    p2 = (my * t1).astype(jnp.bfloat16)
            else:
                my = jnp.maximum(1.0 - jnp.abs(jio - y), 0.0)
                p2 = (my * t1).astype(jnp.bfloat16)
            per_row = jnp.dot(p2, G, preferred_element_type=jnp.float32)  # [bq, D]
            if use_subsum:
                o_ref[0, :, m] = per_row.reshape(BQ, P, D).sum(axis=1)
            else:
                o_ref[0, :, m] = jnp.dot(Gp, per_row.astype(jnp.bfloat16),
                                         preferred_element_type=jnp.float32)

    return kernel


def run_level(slab, xs, ys, was, D, P, variant):
    n, m, W, DH = slab.shape
    _, R, _ = xs.shape
    H = DH // D
    bq = 1024
    pad = (-R) % bq
    if pad:
        xs = jnp.concatenate([xs, jnp.full((n, pad, m), -10.0, xs.dtype)], axis=1)
        ys = jnp.concatenate([ys, jnp.full((n, pad, m), -10.0, ys.dtype)], axis=1)
        was = jnp.concatenate([was, jnp.zeros((n, pad, m), was.dtype)], axis=1)
    Rp = R + pad
    grid = (n, Rp // bq)
    in_specs = [
        pl.BlockSpec((1, bq, m), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, m), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, m), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, W, DH), lambda b, r: (b, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((1, bq // P, m, D), lambda b, r: (b, r, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        make_kernel(H, W, bq, m, D, P, variant),
        out_shape=jax.ShapeDtypeStruct((n, Rp // P, m, D), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(xs, ys, was, slab)
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
    for variant in ("base", "repeat", "subsum", "both", "b16both", "t1only"):
        f = jax.jit(lambda s, x, y, w, v=variant: run_level(s, x, y, w, D, P, v))
        try:
            t = timeit(f, slab, xs, ys, was)
        except Exception as e:
            log(f"{variant}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        if variant == "t1only":
            log(f"{variant:7s}: {t*1e3:6.1f} ms / 5-frame level-1/8 (not comparable)")
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
