"""Probe 2: careful timing of gather vs one-hot kernel (defeat caching).

Feeds a different input buffer each iteration and syncs via device->host
copy, in case the axon runtime memoizes identical executions.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from probe_onehot import LEVELS, N, M, D, P, LQ, build_cols_weights, msda_onehot_level


def timeit_varied(fn, args_list, iters=12):
    # warmup on each distinct buffer set
    for a in args_list:
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(fn(*args_list[i % len(args_list)]))
    for o in outs:
        jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    import sys

    sys.path.insert(0, "/root/repo")
    from univs_tpu.ops.deformable_attention import ms_deform_attn

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

    sets = [make_inputs(s) for s in range(3)]

    prod = jax.jit(lambda v, l, a: ms_deform_attn(v, tuple(LEVELS), l, a))
    t = timeit_varied(prod, sets)
    print(f"production gather (3 levels, varied inputs): {t*1000:.1f} ms")

    # single-level gather timings
    for lid in range(3):
        def level_gather(v, l, a, lid=lid):
            lz = jnp.zeros_like(l).at[:, :, :, lid].set(l[:, :, :, lid])
            az = jnp.zeros_like(a).at[:, :, :, lid].set(a[:, :, :, lid])
            return ms_deform_attn(v, tuple(LEVELS), lz, az)
        # NOTE: this still gathers ALL levels (zeros weights don't skip);
        # instead time a 1-level op directly:
        h, w = LEVELS[lid]
        starts = [0]
        for (hh, ww) in LEVELS:
            starts.append(starts[-1] + hh * ww)

        def one_level(v, l, a, lid=lid, h=h, w=w):
            vl = v[:, starts[lid]:starts[lid+1]]
            return ms_deform_attn(
                vl, ((h, w),), l[:, :, :, lid:lid+1], a[:, :, :, lid:lid+1]
            )

        f = jax.jit(one_level)
        t = timeit_varied(f, sets)
        print(f"level {lid} gather only: {t*1000:.1f} ms")

    # one-hot kernel per level with varied inputs
    for lid, (h, w) in enumerate(LEVELS):
        S = h * w
        starts = [0]
        for (hh, ww) in LEVELS:
            starts.append(starts[-1] + hh * ww)

        def level_fn(v, l, a, lid=lid, h=h, w=w):
            vl = v[:, starts[lid]:starts[lid+1]]
            slab = jnp.moveaxis(vl, 2, 1).reshape(N * M, h * w, D)
            loc_l = jnp.moveaxis(l[:, :, :, lid], 2, 1).reshape(N * M, LQ, P, 2)
            wa_l = jnp.moveaxis(a[:, :, :, lid], 2, 1).reshape(N * M, LQ, P)
            cols, weights = build_cols_weights(loc_l, wa_l, h, w)
            return msda_onehot_level(slab, cols, weights, bq=504)

        f = jax.jit(level_fn)
        t = timeit_varied(f, sets)
        print(f"level {lid} ({h}x{w}) onehot kernel (incl. cols/weights build): {t*1000:.1f} ms")


if __name__ == "__main__":
    main()
