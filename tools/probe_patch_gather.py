"""Probe: 2x2-patch lax.gather vs per-corner take_along_axis on TPU."""

import time
import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=5):
    v = float(fn(*args).mean())  # compile+run
    t0 = time.time()
    for _ in range(iters):
        v = float(fn(*args).mean())
    return (time.time() - t0) / iters


def main():
    NM, H, W, D = 40, 80, 120, 32
    K = 151200  # samples per (n, m) (12 per query)
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(NM, H, W, D), jnp.float32)
    v16 = v.astype(jnp.bfloat16)
    iy = jnp.asarray(rng.randint(0, H - 1, (NM, K)), jnp.int32)
    ix = jnp.asarray(rng.randint(0, W - 1, (NM, K)), jnp.int32)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def patch(vv):
        @jax.jit
        def f(vv, iy, ix):
            def per(vs, y, x):
                starts = jnp.stack([y, x], axis=-1)  # [K, 2]
                return jax.lax.gather(
                    vs, starts, dnums, slice_sizes=(2, 2, D),
                    mode=jax.lax.GatherScatterMode.CLIP,
                )  # [K, 2, 2, D]
            g = jax.vmap(per)(vv, iy, ix)
            return g.astype(jnp.float32).sum(axis=(2, 3))
        return f

    # baseline: 4 separate row gathers on flattened HW
    @jax.jit
    def corners(vv, iy, ix):
        vf = vv.reshape(NM, H * W, D)
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                idx = jnp.clip(iy + dy, 0, H - 1) * W + jnp.clip(ix + dx, 0, W - 1)
                g = jnp.take_along_axis(vf, idx[..., None], axis=1)
                out = out + g.astype(jnp.float32)
        return out

    print(f"patch-gather fp32: {timed(patch(v), v, iy, ix)*1000:.1f} ms", flush=True)
    print(f"patch-gather bf16: {timed(patch(v16), v16, iy, ix)*1000:.1f} ms", flush=True)
    print(f"4x corner gathers fp32: {timed(corners, v, iy, ix)*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
