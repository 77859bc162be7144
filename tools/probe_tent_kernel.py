"""Probe 4: tent-matmul MSDA kernel.

Bilinear interpolation weights ARE the tent function
``relu(1 - |i - x|)`` evaluated on the integer grid — including
grid_sample's zero padding (samples outside [0, size-1] get zero
weight automatically).  So per (frame, head, level):

    Mx[q, i] = relu(1 - |i - x_q|)          # [rows, W], 4 vector ops
    My[q, j] = relu(1 - |j - y_q|) * wa_q   # [rows, H], 5 vector ops
    t1 = Mx @ V.transpose -> [rows, H*D]    # MXU
    out[q, d] = sum_j My[q, j] * t1[q, j, d]  # VPU

No per-corner one-hot construction at all.  rows = queries x points;
heads looped inside the kernel so grid steps stay few and the per-head
value slab [H, W*D] lives in VMEM.
"""

from __future__ import annotations

import time

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


def tent_kernel(H, W, bq, M, D, dtype):
    DH = D * H

    def kernel(x_ref, y_ref, v_ref, o_ref):
        # x/y: [1, bq, M] pixel coords (attention weight applied outside)
        # v: [1, M, W, D*H] (x contracted first; lanes are d-major, j-minor)
        xio = jax.lax.broadcasted_iota(jnp.int32, (bq, W), 1).astype(jnp.float32)
        # y tent built tiled directly: lane l of the [bq, D*H] plane is
        # (d = l // H, j = l % H) -> compare j to y (no lane concat)
        jio = (jax.lax.broadcasted_iota(jnp.int32, (bq, DH), 1) % H).astype(jnp.float32)
        # constant grouping matrix G[(d, j), d'] = (d == d'): the grouped
        # y-reduction out[q, d] = sum_j P[q, d*H + j] as an MXU matmul
        # (Mosaic cannot lane-split reshape [bq, D*H] -> [bq, H, D])
        g_rows = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 0)
        g_cols = jax.lax.broadcasted_iota(jnp.int32, (DH, D), 1)
        G = (g_rows // H == g_cols).astype(dtype)
        for m in range(M):
            x = x_ref[0, :, m][:, None]  # [bq, 1]
            y = y_ref[0, :, m][:, None]
            # tents computed in f32 (coords are large), stored bf16 —
            # same weight precision as the bf16 gather path
            mx = jnp.maximum(1.0 - jnp.abs(xio - x), 0.0).astype(dtype)  # [bq, W]
            t1 = jnp.dot(
                mx, v_ref[0, m], preferred_element_type=jnp.float32
            )  # [bq, D*H] f32
            my_tile = jnp.maximum(1.0 - jnp.abs(jio - y), 0.0)  # [bq, D*H] f32
            p2 = (my_tile * t1).astype(dtype)
            o_ref[0, :, m] = jnp.dot(p2, G, preferred_element_type=jnp.float32)

    return kernel


def msda_tent(v_xmajor, xs, ys, *, bq):
    """v_xmajor [N, M, W, D*H] (lane layout d-major, j-minor);
    xs/ys [N, R4, M] pixel coords -> [N, R4, M, D] f32 bilinear samples
    (zero-padding semantics via the tent function)."""
    n, m, W, DH = v_xmajor.shape
    _, R4, _ = xs.shape
    H = DH // D
    assert R4 % bq == 0
    return pl.pallas_call(
        tent_kernel(H, W, bq, m, D, v_xmajor.dtype),
        out_shape=jax.ShapeDtypeStruct((n, R4, m, D), jnp.float32),
        grid=(n, R4 // bq),
        in_specs=[
            pl.BlockSpec((1, bq, m), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, m), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, W, DH), lambda b, r: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, m, D), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(xs, ys, v_xmajor)


def main():
    import sys

    sys.path.insert(0, "/root/repo")
    from univs_tpu.ops.deformable_attention import ms_deform_attn, ms_deform_attn_reference

    def make_inputs(seed):
        r = np.random.RandomState(seed)
        S_total = sum(h * w for h, w in LEVELS)
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

    for lid, (h, w) in enumerate(LEVELS):
        bq = {600: 2016, 2400: 1008, 9600: 1008}[h * w]  # R4 = 50400

        def f(v, l, a, lid=lid, h=h, w=w, bq=bq):
            vl = v[:, starts[lid]:starts[lid+1]]  # [N, S, M, D]
            # slab [N, M, W, D*H]: element (x; d, j) = V[j, x, d]
            slab = jnp.moveaxis(vl, 2, 1).reshape(N, M, h, w, D)
            slab = slab.transpose(0, 1, 3, 4, 2).reshape(N, M, w, D * h)
            loc_l = l[:, :, :, lid]  # [N, R, M, P, 2]
            wa_l = a[:, :, :, lid]  # [N, R, M, P]
            x = (loc_l[..., 0] * w - 0.5).transpose(0, 1, 3, 2).reshape(N, LQ * P, M)
            y = (loc_l[..., 1] * h - 0.5).transpose(0, 1, 3, 2).reshape(N, LQ * P, M)
            out = msda_tent(slab, x, y, bq=bq)  # [N, R4, M, D]
            out = out.reshape(N, LQ, P, M, D)
            wa = wa_l.transpose(0, 1, 3, 2)  # [N, R, P, M]
            return (out * wa[..., None]).sum(axis=2)  # [N, R, M, D]

        jf = jax.jit(f)
        t = timeit_sync(jf, sets)
        print(f"tent level {lid} ({h}x{w}, bq={bq}): {t*1000:.1f} ms", flush=True)

        # correctness vs oracle
        v, l, a = sets[0]
        got = np.asarray(jf(v, l, a)).reshape(N, LQ, M * D)
        l1 = np.zeros((N, LQ, M, len(LEVELS), P, 2), np.float32)
        l1[:, :, :, lid] = np.asarray(l[:, :, :, lid])
        a1 = np.zeros((N, LQ, M, len(LEVELS), P), np.float32)
        a1[:, :, :, lid] = np.asarray(a[:, :, :, lid])
        oracle = np.asarray(
            ms_deform_attn_reference(v, LEVELS, jnp.asarray(l1), jnp.asarray(a1))
        )
        print(f"  max|err| vs oracle = {np.abs(got - oracle).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
