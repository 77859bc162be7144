"""Probe 3: tuned MSDA kernels.

A) direct one-hot matmul, 8 heads inside one grid step (fewer steps).
B) separable y-matmul + x-select kernel (construction O(H) not O(S)).

Run: PYTHONPATH=/root/repo:... python tools/probe_onehot3.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEVELS = [(20, 30), (40, 60), (80, 120)]
N, M, D, P = 5, 8, 32, 4
LQ = sum(h * w for h, w in LEVELS)


def timeit_sync(fn, args_list, iters=12):
    for a in args_list:
        np.asarray(jnp.sum(fn(*a)))
    t0 = time.perf_counter()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(iters)]
    float(jnp.sum(outs[-1]))
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------------------
# A) direct one-hot, heads inside the kernel
# ---------------------------------------------------------------------------

def direct_kernel(S, bq, M, D, dtype):
    def kernel(c_ref, w_ref, v_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (bq, S), 1)
        for m in range(M):
            c = c_ref[0, :, m]  # [bq, 16]
            w = w_ref[0, :, m]
            mat = jnp.zeros((bq, S), jnp.float32)
            for k in range(16):
                mat = mat + jnp.where(iota == c[:, k : k + 1], w[:, k : k + 1], 0.0)
            o_ref[0, :, m] = jnp.dot(
                mat.astype(dtype), v_ref[0, m], preferred_element_type=jnp.float32
            )

    return kernel


def msda_direct(slab, cols, weights, *, bq):
    """slab [N, M, S, D]; cols/weights [N, R, M, 16] -> [N, R, M, D] f32."""
    n, m, S, d = slab.shape
    _, R, _, _ = cols.shape
    assert R % bq == 0
    return pl.pallas_call(
        direct_kernel(S, bq, m, d, slab.dtype),
        out_shape=jax.ShapeDtypeStruct((n, R, m, d), jnp.float32),
        grid=(n, R // bq),
        in_specs=[
            pl.BlockSpec((1, bq, m, 16), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, m, 16), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, S, d), lambda b, r: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, m, d), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM),
    )(cols, weights, slab)


# ---------------------------------------------------------------------------
# B) separable: y one-hot matmul then x select
#    rows = (query, point) pairs: R4 = R*P per (frame, head)
# ---------------------------------------------------------------------------

def separable_kernel(H, W, bq, M, D, dtype):
    WD = W * D

    def kernel(cy_ref, wy_ref, cx_ref, wx_ref, v_ref, o_ref):
        # cy/wy: [1, bq, M, 2] y corner rows + weights
        # cx/wx: [1, bq, M, 2] x corner cols + weights
        # v: [1, M, H, W*D]; o: [1, bq, M, D] accumulated over points outside
        yio = jax.lax.broadcasted_iota(jnp.int32, (bq, H), 1)
        xio = jax.lax.broadcasted_iota(jnp.int32, (bq, W), 1)
        for m in range(M):
            my = jnp.zeros((bq, H), jnp.float32)
            for k in range(2):
                my = my + jnp.where(
                    yio == cy_ref[0, :, m, k][:, None], wy_ref[0, :, m, k][:, None], 0.0
                )
            tmp = jnp.dot(
                my.astype(dtype), v_ref[0, m], preferred_element_type=jnp.float32
            )  # [bq, W*D]
            tmp = tmp.reshape(bq, W, D)
            acc = jnp.zeros((bq, D), jnp.float32)
            for k in range(2):
                mx = jnp.where(
                    xio == cx_ref[0, :, m, k][:, None], wx_ref[0, :, m, k][:, None], 0.0
                )  # [bq, W]
                acc = acc + jnp.einsum("qw,qwd->qd", mx, tmp)
            o_ref[0, :, m] = acc

    return kernel


def msda_separable(slab_hw, cy, wy, cx, wx, *, bq):
    """slab_hw [N, M, H, W*D]; cy/wy/cx/wx [N, R4, M, 2] -> [N, R4, M, D]."""
    n, m, H, WD = slab_hw.shape
    _, R4, _, _ = cy.shape
    D = WD // (WD // D_GLOBAL) if False else D_GLOBAL
    W = WD // D
    assert R4 % bq == 0
    return pl.pallas_call(
        separable_kernel(H, W, bq, m, D, slab_hw.dtype),
        out_shape=jax.ShapeDtypeStruct((n, R4, m, D), jnp.float32),
        grid=(n, R4 // bq),
        in_specs=[
            pl.BlockSpec((1, bq, m, 2), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, m, 2), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, m, 2), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, m, 2), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, H, WD), lambda b, r: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, m, D), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM),
    )(cy, wy, cx, wx, slab_hw)


D_GLOBAL = D


def build_direct_inputs(loc_l, wa_l, h, w):
    """loc_l [N, R, M, P, 2], wa_l [N, R, M, P] -> cols/weights [N, R, M, 16]."""
    x = loc_l[..., 0] * w - 0.5
    y = loc_l[..., 1] * h - 0.5
    x0, y0 = jnp.floor(x), jnp.floor(y)
    fx, fy = x - x0, y - y0
    cc, cw = [], []
    for dy, wyv in ((0, 1 - fy), (1, fy)):
        yy = y0 + dy
        vy = (yy >= 0) & (yy <= h - 1)
        for dx, wxv in ((0, 1 - fx), (1, fx)):
            xx = x0 + dx
            vx = (xx >= 0) & (xx <= w - 1)
            cc.append((jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)).astype(jnp.int32))
            cw.append(wa_l * wyv * wxv * vy * vx)
    # [N, R, M, P, 4] -> [N, R, M, 16]
    cols = jnp.stack(cc, -1).reshape(*x.shape[:-1], 4 * P)
    weights = jnp.stack(cw, -1).reshape(*x.shape[:-1], 4 * P)
    return cols, weights


def build_separable_inputs(loc_l, wa_l, h, w):
    """-> cy/wy/cx/wx [N, R*P, M, 2] (attention weight folded into wy)."""
    n, R, m, p, _ = loc_l.shape
    x = loc_l[..., 0] * w - 0.5
    y = loc_l[..., 1] * h - 0.5
    x0, y0 = jnp.floor(x), jnp.floor(y)
    fx, fy = x - x0, y - y0

    def pack(c0, f, size, wa=None):
        c1 = c0 + 1
        v0 = (c0 >= 0) & (c0 <= size - 1)
        v1 = (c1 >= 0) & (c1 <= size - 1)
        w0 = (1 - f) * v0
        w1 = f * v1
        if wa is not None:
            w0, w1 = w0 * wa, w1 * wa
        cs = jnp.stack([jnp.clip(c0, 0, size - 1), jnp.clip(c1, 0, size - 1)], -1).astype(jnp.int32)
        ws = jnp.stack([w0, w1], -1)
        return cs, ws

    cy, wy = pack(y0, fy, h, wa_l)
    cx, wx = pack(x0, fx, w)
    # [N, R, M, P, 2] -> [N, R*P, M, 2]
    reorder = lambda a: a.transpose(0, 1, 3, 2, 4).reshape(n, R * p, m, 2)
    return reorder(cy), reorder(wy), reorder(cx), reorder(wx)


def main():
    import sys

    sys.path.insert(0, "/root/repo")

    rng = np.random.RandomState(0)
    S_total = sum(h * w for h, w in LEVELS)

    def make_inputs(seed):
        r = np.random.RandomState(seed)
        value = jnp.asarray(r.randn(N, S_total, M, D), jnp.bfloat16)
        loc = jnp.asarray(r.rand(N, LQ, M, len(LEVELS), P, 2), jnp.float32)
        attn = jax.nn.softmax(
            jnp.asarray(r.randn(N, LQ, M, len(LEVELS) * P), jnp.float32), -1
        ).reshape(N, LQ, M, len(LEVELS), P)
        return value, loc, attn

    sets = [make_inputs(s) for s in range(2)]
    starts = [0]
    for (hh, ww) in LEVELS:
        starts.append(starts[-1] + hh * ww)

    # A) direct with heads inside, bq=1800 (12600 = 7*1800)
    for lid, (h, w) in enumerate(LEVELS[:2]):
        def f(v, l, a, lid=lid, h=h, w=w):
            vl = v[:, starts[lid]:starts[lid+1]]  # [N, S, M, D]
            slab = jnp.moveaxis(vl, 2, 1)  # [N, M, S, D]
            cols, weights = build_direct_inputs(l[:, :, :, lid], a[:, :, :, lid], h, w)
            return msda_direct(slab, cols, weights, bq=1800)

        t = timeit_sync(jax.jit(f), sets)
        print(f"A direct-heads level {lid} (S={h*w}): {t*1000:.1f} ms")

    # B) separable for levels 1 and 2
    for lid, (h, w) in enumerate(LEVELS):
        if lid == 0:
            continue

        def f(v, l, a, lid=lid, h=h, w=w):
            vl = v[:, starts[lid]:starts[lid+1]]  # [N, S, M, D]
            slab = jnp.moveaxis(vl, 2, 1).reshape(N, M, h, w * D)
            cy, wy, cx, wx = build_separable_inputs(
                l[:, :, :, lid], a[:, :, :, lid], h, w
            )
            out = msda_separable(slab, cy, wy, cx, wx, bq=2100)  # R4=50400=24*2100
            return out.reshape(N, LQ, P, M, D).sum(axis=2)  # sum points

        t = timeit_sync(jax.jit(f), sets)
        print(f"B separable level {lid} ({h}x{w}): {t*1000:.1f} ms")

    # correctness of B at level 2 vs oracle
    from univs_tpu.ops.deformable_attention import ms_deform_attn_reference

    v, l, a = sets[0]
    lid, (h, w) = 2, LEVELS[2]
    vl = v[:, starts[lid]:starts[lid+1]]
    slab = jnp.moveaxis(vl, 2, 1).reshape(N, M, h, w * D)
    cy, wy, cx, wx = build_separable_inputs(l[:, :, :, lid], a[:, :, :, lid], h, w)
    out = msda_separable(slab, cy, wy, cx, wx, bq=2100)
    got = np.asarray(out.reshape(N, LQ, P, M, D).sum(axis=2))  # [N, LQ, M, D]
    got = got.reshape(N, LQ, M * D)
    l1 = np.zeros((N, LQ, M, len(LEVELS), P, 2), np.float32)
    l1[:, :, :, lid] = np.asarray(l[:, :, :, lid])
    a1 = np.zeros((N, LQ, M, len(LEVELS), P), np.float32)
    a1[:, :, :, lid] = np.asarray(a[:, :, :, lid])
    oracle = np.asarray(ms_deform_attn_reference(v, LEVELS, jnp.asarray(l1), jnp.asarray(a1)))
    print("B level2 max|err| =", np.abs(got - oracle).max())


if __name__ == "__main__":
    main()
