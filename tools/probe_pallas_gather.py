"""Probe: full MSDA-style chunked dynamic-gather kernel pattern."""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 12600
NCHUNK = 48
NG = 10  # (n, head-group) pairs


def main():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(NG, S, 128), jnp.float32)
    idx4 = jnp.asarray(rng.randint(0, S, (NG, NCHUNK, S, 4)), jnp.int32)
    w4 = jnp.asarray(rng.rand(NG, NCHUNK, S, 4), jnp.float32)

    def kern(t_ref, i_ref, w_ref, o_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        idx4_ = i_ref[0, 0]  # [S, 4]
        w4_ = w_ref[0, 0]  # [S, 4]
        # tile-repeat 4 -> 128 lanes (lane l: head l%4, channel l//4)
        idx = pltpu.repeat(idx4_, 32, axis=1)  # [S, 128] pattern abcd abcd ..
        w = pltpu.repeat(w4_, 32, axis=1)
        g = jnp.take_along_axis(t_ref[0], idx, axis=0)  # [S, 128]
        o_ref[0] += g * w

    @jax.jit
    def run():
        return pl.pallas_call(
            kern,
            grid=(NG, NCHUNK),
            in_specs=[
                pl.BlockSpec((1, S, 128), lambda n, c: (n, 0, 0)),
                pl.BlockSpec((1, 1, S, 4), lambda n, c: (n, c, 0, 0)),
                pl.BlockSpec((1, 1, S, 4), lambda n, c: (n, c, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, S, 128), lambda n, c: (n, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NG, S, 128), jnp.float32),
        )(table, idx4, w4)

    try:
        print("compiling...", flush=True)
        t0 = time.time()
        out = np.asarray(run())
        print(f"first {time.time()-t0:.1f}s", flush=True)
        # numpy check
        tb = np.asarray(table)
        i4 = np.asarray(idx4)
        wf = np.asarray(w4)
        exp = np.zeros((NG, S, 128), np.float32)
        lane_head = np.arange(128) % 4  # interleaved-head lanes
        for n in range(2):  # spot check first 2 slabs
            for c in range(NCHUNK):
                idx = i4[n, c][:, lane_head]  # [S, 128]
                w = wf[n, c][:, lane_head]
                exp[n] += tb[n][idx, np.arange(128)[None, :]] * w
        err = np.abs(out[:2] - exp[:2]).max()
        print(f"max err vs numpy: {err:.2e}", flush=True)
        t0 = time.time()
        for _ in range(5):
            s = float(run().mean())
        print(f"steady {(time.time()-t0)/5*1000:.2f} ms/call (one msda layer's gathers)", flush=True)
    except Exception as e:
        import traceback

        traceback.print_exc()


if __name__ == "__main__":
    main()
