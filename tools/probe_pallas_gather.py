"""Probe: in-kernel dynamic gather formulations on TPU Mosaic."""

import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, D = 12600, 32
K = 151552  # padded to 128*8 multiple
NM = 40


def probe(name, build):
    try:
        run = build()
        print(f"{name}: compiling...", flush=True)
        t0 = time.time()
        v = float(run())
        print(f"{name}: first {time.time()-t0:.1f}s val={v:.4f}", flush=True)
        t0 = time.time()
        for _ in range(3):
            v = float(run())
        print(f"{name}: steady {(time.time()-t0)/3*1000:.1f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:240]}", flush=True)


def main():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(NM, S, D), jnp.float32)
    table_t = jnp.asarray(rng.randn(NM, D, S), jnp.float32)
    idx2d = jnp.asarray(rng.randint(0, S, (NM, K // 128, 128)), jnp.int32)

    # A: take axis=0 from [S, D] with 2D idx
    def build_a():
        def kern(t_ref, i_ref, o_ref):
            idx = i_ref[:]  # [K//128, 128]
            o_ref[:] = jnp.take(t_ref[:], idx.reshape(-1), axis=0).reshape(K // 128, 128 * D)

        @jax.jit
        def run():
            def one(t, i):
                return pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((K // 128, 128 * D), jnp.float32),
                )(t, i)
            return jax.vmap(one)(table, idx2d).mean()
        return run

    # B: lane-axis gather: table [D, S], idx [128] per tile -> out [D, 128]
    def build_b():
        TI = 512  # index tiles per step: idx block [8, 128]? use [TI//128? ...]
        def kern(t_ref, i_ref, o_ref):
            # i_ref: [8, 128]; t_ref: [D, S]; out: [8, D, 128]
            idx = i_ref[:]
            out = jnp.take(t_ref[:], idx.reshape(-1), axis=1)  # [D, 1024]
            o_ref[:] = out.reshape(D, 8, 128).transpose(1, 0, 2)

        grid = (K // (8 * 128),)

        @jax.jit
        def run():
            def one(t, i):
                return pl.pallas_call(
                    kern,
                    grid=grid,
                    in_specs=[
                        pl.BlockSpec((D, S), lambda k: (0, 0)),
                        pl.BlockSpec((8, 128), lambda k: (k, 0)),
                    ],
                    out_specs=pl.BlockSpec((8, D, 128), lambda k: (k, 0, 0)),
                    out_shape=jax.ShapeDtypeStruct((K // 128, D, 128), jnp.float32),
                )(t, i.reshape(K // 128, 128))
            return jax.vmap(one)(table_t, idx2d).mean()
        return run

    # C: whole-array fancy index in one kernel call
    def build_c():
        def kern(t_ref, i_ref, o_ref):
            o_ref[:] = t_ref[i_ref[:].reshape(-1)].reshape(K // 128, 128 * D)

        @jax.jit
        def run():
            def one(t, i):
                return pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((K // 128, 128 * D), jnp.float32),
                )(t, i)
            return jax.vmap(one)(table, idx2d).mean()
        return run

    probe("A take axis0 whole", build_a)
    probe("B lane-gather tiled", build_b)
    probe("C fancy index whole", build_c)


if __name__ == "__main__":
    main()
