"""Probe: Pallas one-hot-matmul deformable sampling vs XLA gather.

The MSDA gather is issue-rate bound (~19ns/sample, docs/PERFORMANCE.md).
For the coarse pyramid levels the source slab is tiny (600 / 2400 rows),
so interpolation can instead be a dense matmul: build, per query row, a
sparse-in-content [bq, S] matrix holding the 4 bilinear corner weights x
4 sampling points (16 nonzeros/row, attention weights folded in), keep
it in VMEM, and contract with the [S, D] value slab on the MXU.  Cost
is VPU one-hot construction (O(bq*S) selects) + an MXU matmul — both
far off the gather's per-row issue floor when S is small.

Run on the real TPU:  python tools/probe_onehot.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# bench shape (640x960, T=5): levels 1/32, 1/16, 1/8
LEVELS = [(20, 30), (40, 60), (80, 120)]
N, M, D, P = 5, 8, 32, 4
LQ = sum(h * w for h, w in LEVELS)  # 12600


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def onehot_level_kernel(S: int, bq: int, dtype=jnp.bfloat16):
    def kernel(c_ref, w_ref, v_ref, o_ref):
        c = c_ref[0]  # [bq, 16] int32
        w = w_ref[0]  # [bq, 16] f32
        iota = jax.lax.broadcasted_iota(jnp.int32, (bq, S), 1)
        m = jnp.zeros((bq, S), jnp.float32)
        for k in range(16):
            m = m + jnp.where(iota == c[:, k : k + 1], w[:, k : k + 1], 0.0)
        o_ref[0] = jnp.dot(
            m.astype(dtype), v_ref[0], preferred_element_type=jnp.float32
        )

    return kernel


def msda_onehot_level(slab, cols, weights, *, bq=512):
    """slab [B, S, D] bf16; cols/weights [B, R, 16] -> [B, R, D] f32."""
    B, S, Dd = slab.shape
    _, R, _ = cols.shape
    assert R % bq == 0, (R, bq)
    grid = (B, R // bq)
    return pl.pallas_call(
        onehot_level_kernel(S, bq, slab.dtype),
        out_shape=jax.ShapeDtypeStruct((B, R, Dd), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 16), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 16), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dd), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, Dd), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
    )(cols, weights, slab)


def build_cols_weights(loc_l, wa_l, h, w):
    """loc_l [B, R, P, 2] in [0,1]; wa_l [B, R, P] ->
    cols [B, R, 4P] int32, weights [B, R, 4P] f32 (zero-padding rules)."""
    x = loc_l[..., 0] * w - 0.5
    y = loc_l[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    cw = []
    cc = []
    for dy, wy in ((0, 1 - fy), (1, fy)):
        yy = y0 + dy
        vy = (yy >= 0) & (yy <= h - 1)
        for dx, wx in ((0, 1 - fx), (1, fx)):
            xx = x0 + dx
            vx = (xx >= 0) & (xx <= w - 1)
            wgt = wa_l * wy * wx * vy * vx
            col = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
            cc.append(col.astype(jnp.int32))
            cw.append(wgt)
    cols = jnp.concatenate(cc, axis=-1)  # [B, R, 4P]
    weights = jnp.concatenate(cw, axis=-1)
    return cols, weights


def main():
    from univs_tpu.ops.deformable_attention import ms_deform_attn, ms_deform_attn_reference

    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    S_total = sum(h * w for h, w in LEVELS)
    value = jnp.asarray(rng.randn(N, S_total, M, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(N, LQ, M, len(LEVELS), P, 2), jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(N, LQ, M, len(LEVELS) * P), jnp.float32), -1
    ).reshape(N, LQ, M, len(LEVELS), P)

    # ---- current production gather (full op) ----
    prod = jax.jit(lambda v, l, a: ms_deform_attn(v, tuple(LEVELS), l, a))
    t = timeit(prod, value, loc, attn)
    print(f"production gather (3 levels): {t*1000:.1f} ms")

    # ---- per-level one-hot kernels ----
    # layout: B = N*M slabs, R = LQ queries padded to bq multiple
    bq = 504  # 12600 = 25*504
    starts = [0]
    for (h, w) in LEVELS:
        starts.append(starts[-1] + h * w)
    out_ref_full = None
    for lid, (h, w) in enumerate(LEVELS):
        S = h * w
        vl = value[:, starts[lid] : starts[lid + 1]]  # [N, S, M, D]
        slab = jnp.moveaxis(vl, 2, 1).reshape(N * M, S, D)
        loc_l = jnp.moveaxis(loc[:, :, :, lid], 2, 1).reshape(N * M, LQ, P, 2)
        wa_l = jnp.moveaxis(attn[:, :, :, lid], 2, 1).reshape(N * M, LQ, P)

        @jax.jit
        def level_fn(slab, loc_l, wa_l, h=h, w=w):
            cols, weights = build_cols_weights(loc_l, wa_l, h, w)
            return msda_onehot_level(slab, cols, weights, bq=bq)

        out_k = level_fn(slab, loc_l, wa_l)
        t_k = timeit(level_fn, slab, loc_l, wa_l)
        print(f"level {lid} ({h}x{w}, S={S}): onehot kernel {t_k*1000:.1f} ms")

        # correctness vs oracle for this level only
        loc1 = np.zeros((N, LQ, M, len(LEVELS), P, 2), np.float32)
        loc1[:, :, :, lid] = np.asarray(loc[:, :, :, lid])
        attn1 = np.zeros((N, LQ, M, len(LEVELS), P), np.float32)
        attn1[:, :, :, lid] = np.asarray(attn[:, :, :, lid])
        oracle = ms_deform_attn_reference(
            value, LEVELS, jnp.asarray(loc1), jnp.asarray(attn1)
        )  # [N, LQ, M*D]
        got = np.asarray(out_k).reshape(N, M, LQ, D)
        got = np.moveaxis(got, 1, 2).reshape(N, LQ, M * D)
        diff = np.abs(got - np.asarray(oracle, np.float32)).max()
        print(f"  max |kernel - oracle| = {diff:.2e}")

    # ---- int8 gather variant for comparison (full op) ----
    @jax.jit
    def prod_int8(v, l, a):
        scale = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=(1, 3), keepdims=True) / 127.0
        vq = jnp.clip(
            jnp.round(v.astype(jnp.float32) / scale), -127, 127
        ).astype(jnp.int8)
        # NOTE: correctness shortcut for timing only (scale folding not wired)
        return ms_deform_attn(vq, tuple(LEVELS), l, a)

    try:
        t8 = timeit(prod_int8, value, loc, attn)
        print(f"int8 gather (3 levels, timing only): {t8*1000:.1f} ms")
    except Exception as e:  # int8 path may need dtype support
        print("int8 gather failed:", e)


if __name__ == "__main__":
    main()
