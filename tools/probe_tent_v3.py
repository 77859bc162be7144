"""Probe: windowed tent-kernel layout experiments at the 1/8 level.

Questions (measured on v5e, level 80x120, realistic clustered locs):
  - out layout: interleaved [N, R/P, M, D] vs head-major [N, M, R/P, D]
  - row inputs: interleaved [N, R, M] vs head-major [N, M, R]
  - block size bq: 1024 vs 2048
  - y plane dtype: f32 vs bf16 multiply

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_tent_v3.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.sum(x[(0,) * x.ndim]))


def timeit(fn, *args, iters=10):
    for _ in range(2):
        sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / iters


def make_win(H, W, bq, M, D, P, Hw, *, out_hm, in_hm, b16y):
    DH = D * H
    DHw = D * Hw
    BQ = bq // P
    dtype = jnp.bfloat16

    def kernel(meta_ref, x_ref, y_ref, wa_ref, v_ref, o_ref):
        b = pl.program_id(0)
        r = pl.program_id(1)
        ys0 = meta_ref[b, r, 0]
        ok = meta_ref[b, r, 1]
        xio = jax.lax.broadcasted_iota(jnp.int32, (bq, W), 1).astype(jnp.float32)
        gw_rows = jax.lax.broadcasted_iota(jnp.int32, (DHw, D), 0)
        gw_cols = jax.lax.broadcasted_iota(jnp.int32, (DHw, D), 1)
        Gw = (gw_rows % D == gw_cols).astype(dtype)
        gf_rows = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 0)
        gf_cols = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 1)
        Gf = (gf_rows % D == gf_cols).astype(dtype)
        jw = jax.lax.broadcasted_iota(jnp.int32, (bq, DHw), 1) // D
        jf = (jax.lax.broadcasted_iota(jnp.int32, (bq, DH), 1) // D).astype(jnp.float32)
        for m in range(M):
            if in_hm:
                x = x_ref[0, m, :][:, None]
                y = y_ref[0, m, :][:, None]
                wa = wa_ref[0, m, :][:, None]
            else:
                x = x_ref[0, :, m][:, None]
                y = y_ref[0, :, m][:, None]
                wa = wa_ref[0, :, m][:, None]
            mx = (jnp.maximum(1.0 - jnp.abs(xio - x), 0.0) * wa).astype(dtype)

            @pl.when(ok == 1)
            def _():
                start = pl.multiple_of(ys0 * D, 128)
                vw = v_ref[0, m, :, pl.ds(start, DHw)]
                t1 = jnp.dot(mx, vw, preferred_element_type=jnp.float32)
                if b16y:
                    my = jnp.maximum(1.0 - jnp.abs((jw + ys0).astype(jnp.float32) - y), 0.0).astype(dtype)
                    p2 = my * t1.astype(dtype)
                else:
                    my = jnp.maximum(1.0 - jnp.abs((jw + ys0).astype(jnp.float32) - y), 0.0)
                    p2 = (my * t1).astype(dtype)
                per_row = jnp.dot(p2, Gw, preferred_element_type=jnp.float32)
                res = per_row.reshape(BQ, P, D).sum(axis=1)
                if out_hm:
                    o_ref[0, m, :, :] = res
                else:
                    o_ref[0, :, m] = res

            @pl.when(ok == 0)
            def _():
                t1 = jnp.dot(mx, v_ref[0, m], preferred_element_type=jnp.float32)
                if b16y:
                    my = jnp.maximum(1.0 - jnp.abs(jf - y), 0.0).astype(dtype)
                    p2 = my * t1.astype(dtype)
                else:
                    my = jnp.maximum(1.0 - jnp.abs(jf - y), 0.0)
                    p2 = (my * t1).astype(dtype)
                per_row = jnp.dot(p2, Gf, preferred_element_type=jnp.float32)
                res = per_row.reshape(BQ, P, D).sum(axis=1)
                if out_hm:
                    o_ref[0, m, :, :] = res
                else:
                    o_ref[0, :, m] = res

    return kernel


def run(slab_j, xs, ys, was, D, P, Hw, *, bq, out_hm, in_hm, b16y):
    n, m, W, DH = slab_j.shape
    H = DH // D
    _, R, _ = xs.shape
    pad = (-R) % bq
    if pad:
        xs = jnp.concatenate([xs, jnp.full((n, pad, m), -10.0, xs.dtype)], axis=1)
        ys = jnp.concatenate([ys, jnp.full((n, pad, m), -10.0, ys.dtype)], axis=1)
        was = jnp.concatenate([was, jnp.zeros((n, pad, m), was.dtype)], axis=1)
    Rp = R + pad
    nb = Rp // bq
    align = max(1, -(-128 // D))
    y0c = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    y0b = y0c.reshape(n, nb, bq * m)
    ymin = y0b.min(axis=2)
    ymax = y0b.max(axis=2)
    ystart = jnp.minimum((ymin // align) * align, H - Hw)
    ok = (jnp.minimum(ymax + 1, H - 1) < ystart + Hw).astype(jnp.int32)
    meta = jnp.stack([ystart, ok], axis=-1)

    row_spec = (
        pl.BlockSpec((1, m, bq), lambda b, r: (b, 0, r), memory_space=pltpu.VMEM)
        if in_hm
        else pl.BlockSpec((1, bq, m), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM)
    )
    if in_hm:
        xs, ys, was = (jnp.moveaxis(a, 2, 1) for a in (xs, ys, was))
    out_spec = (
        pl.BlockSpec((1, m, bq // P, D), lambda b, r: (b, 0, r, 0), memory_space=pltpu.VMEM)
        if out_hm
        else pl.BlockSpec((1, bq // P, m, D), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM)
    )
    out_shape = (
        jax.ShapeDtypeStruct((n, m, Rp // P, D), jnp.float32)
        if out_hm
        else jax.ShapeDtypeStruct((n, Rp // P, m, D), jnp.float32)
    )
    out = pl.pallas_call(
        make_win(H, W, bq, m, D, P, Hw, out_hm=out_hm, in_hm=in_hm, b16y=b16y),
        out_shape=out_shape,
        grid=(n, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), row_spec, row_spec, row_spec,
                  pl.BlockSpec((1, m, W, DH), lambda b, r: (b, 0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(meta, xs, ys, was, slab_j)
    if out_hm:
        out = jnp.moveaxis(out, 1, 2)
    return out[:, : R // P]


def main():
    H, W, D, M, P, N = 80, 120, 32, 8, 4, 5
    Lq, Hw = 12600, 32
    R = Lq * P
    rng = np.random.RandomState(0)
    slab_j = jnp.asarray(rng.randn(N, M, W, H * D), jnp.bfloat16)
    # clustered rows: base y per query + +-4px
    # raster base y (the real query order: consecutive queries share rows)
    baseq = (np.arange(Lq) // W) % H * 1.0
    ys_n = np.broadcast_to(baseq[None, :, None, None], (N, Lq, P, M)) + rng.randn(N, Lq, P, M) * 2
    xs_n = rng.rand(N, Lq, P, M) * W
    xs = jnp.asarray(xs_n.reshape(N, R, M), jnp.float32)
    ys = jnp.asarray(ys_n.reshape(N, R, M), jnp.float32)
    was = jnp.asarray(rng.rand(N, R, M), jnp.float32)

    ref = None
    for name, kw in [
        ("cur   ", dict(bq=1024, out_hm=False, in_hm=False, b16y=False)),
        ("outhm ", dict(bq=1024, out_hm=True, in_hm=False, b16y=False)),
        ("inhm  ", dict(bq=1024, out_hm=True, in_hm=True, b16y=False)),
        ("bq2048", dict(bq=2048, out_hm=True, in_hm=True, b16y=False)),
        ("b16y  ", dict(bq=1024, out_hm=True, in_hm=True, b16y=True)),
        ("all   ", dict(bq=2048, out_hm=True, in_hm=True, b16y=True)),
    ]:
        f = jax.jit(lambda s, x, y, w, kw=kw: run(s, x, y, w, D, P, Hw, **kw))
        try:
            t = timeit(f, slab_j, xs, ys, was)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}", flush=True)
            continue
        o = np.asarray(f(slab_j, xs, ys, was), np.float32)
        if ref is None:
            ref, err = o, 0.0
        else:
            err = float(np.abs(o - ref).max() / np.abs(ref).max())
        print(f"{name}: {t*1e3:6.1f} ms   rel-err {err:.5f}", flush=True)


if __name__ == "__main__":
    main()
