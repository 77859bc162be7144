"""Probe: int8-slab tent kernel vs bf16 (round-3 verdict item 10).

Times the MSDA tent forward at the encoder's 640x960 geometry (5
frames, 3 levels) for bf16 vs int8 slabs; checks int8 output error vs
the fp32 gather oracle at a SMALL geometry (the full-size oracle is
prohibitively slow to compile under the remote tunnel).

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_int8_tent.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from univs_tpu.ops.deformable_attention import ms_deform_attn_tent, _msda_gather


def log(msg):
    print(msg, flush=True)


def sync(x):
    return float(jnp.sum(x[(0,) * x.ndim]))


def timeit(fn, *args, iters=10):
    for _ in range(2):
        sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / iters


def make(shapes, N=5, M=8, D=32, P=4, seed=0):
    S = sum(h * w for h, w in shapes)
    Lq = S
    rng = np.random.RandomState(seed)
    value = jnp.asarray(rng.randn(N, S, M, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(N, Lq, M, len(shapes), P, 2), jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(N, Lq, M, len(shapes), P), jnp.float32).reshape(N, Lq, M, -1), -1
    ).reshape(N, Lq, M, len(shapes), P)
    return value, loc, attn


def main():
    # ---- error check at small geometry --------------------------------
    small = ((10, 15), (20, 30))
    v, l, a = make(small, N=2)
    log("compiling small oracle...")
    o_ref = np.asarray(jax.jit(
        lambda v, l, a: _msda_gather(v.astype(jnp.float32), small, l, a))(v, l, a))
    o_bf = np.asarray(jax.jit(
        lambda v, l, a: ms_deform_attn_tent(v, small, l, a))(v, l, a)).astype(np.float32)
    o_i8 = np.asarray(jax.jit(
        lambda v, l, a: ms_deform_attn_tent(v, small, l, a, int8_slab=True))(v, l, a)).astype(np.float32)
    scale = np.abs(o_ref).max()
    log(f"rel-err bf16: {np.abs(o_bf - o_ref).max() / scale:.5f}")
    log(f"rel-err int8: {np.abs(o_i8 - o_ref).max() / scale:.5f}")

    # ---- timing at full geometry ---------------------------------------
    shapes = ((20, 30), (40, 60), (80, 120))
    v, l, a = make(shapes)
    f_bf16 = jax.jit(lambda v, l, a: ms_deform_attn_tent(v, shapes, l, a))
    f_int8 = jax.jit(lambda v, l, a: ms_deform_attn_tent(v, shapes, l, a, int8_slab=True))
    log("timing bf16 tent...")
    t_bf = timeit(f_bf16, v, l, a)
    log(f"tent bf16: {t_bf * 1e3:.1f} ms / 5-frame layer")
    log("timing int8 tent...")
    t_i8 = timeit(f_int8, v, l, a)
    log(f"tent int8: {t_i8 * 1e3:.1f} ms / 5-frame layer  ({t_bf / t_i8:.2f}x)")


if __name__ == "__main__":
    main()
