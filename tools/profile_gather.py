"""Microbenchmark pixel-decoder pieces on TPU (forced-sync timing)."""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    N, M, S, D = 5, 8, 12600, 32
    Lq, L, P = 12600, 3, 4
    K = Lq * L * P
    shapes = ((80, 120), (40, 60), (20, 30))
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(N, M, S, D), jnp.float32)
    idx = jnp.asarray(rng.randint(0, S, (N, M, K)), jnp.int32)
    w = jnp.asarray(rng.rand(N, M, K), jnp.float32)

    @jax.jit
    def f_take_along(v, idx, w):
        g = jnp.take_along_axis(v, idx[..., None], axis=2)
        return jnp.einsum("nmkd,nmk->nmd", g, w).mean()

    print(f"gather take_along: {timeit(f_take_along, v, idx, w)*1000:.1f} ms", flush=True)

    from univs_tpu.ops.deformable_attention import ms_deform_attn

    val = jnp.asarray(rng.randn(N, S, M, D), jnp.float32)
    loc = jnp.asarray(rng.rand(N, Lq, M, L, P, 2), jnp.float32)
    attw = jnp.asarray(rng.rand(N, Lq, M, L, P), jnp.float32) / 12

    @jax.jit
    def f_msda(val, loc, attw):
        return ms_deform_attn(val, shapes, loc, attw).mean()

    print(f"ms_deform_attn full: {timeit(f_msda, val, loc, attw)*1000:.1f} ms", flush=True)

    from univs_tpu.models.pixel_decoder import MSDeformAttnLayer, _reference_points

    layer = MSDeformAttnLayer(d_model=256, n_levels=3, n_heads=8, n_points=4, dtype=jnp.bfloat16)
    q = jnp.asarray(rng.randn(N, S, 256), jnp.bfloat16)
    refp = _reference_points(shapes)
    params = layer.init(jax.random.PRNGKey(0), q, refp, q, shapes)

    @jax.jit
    def f_layer(params, q):
        return layer.apply(params, q, refp, q, shapes).astype(jnp.float32).mean()

    print(f"MSDeformAttnLayer: {timeit(f_layer, params, q)*1000:.1f} ms", flush=True)

    # PE grid cost
    from univs_tpu.ops.position_encoding import SinePositionEncoding3D

    pe = SinePositionEncoding3D(num_pos_feats=128, normalize=True)

    @jax.jit
    def f_pe(x):
        return (pe.grid2d(80, 120).sum() + pe.grid2d(40, 60).sum() + x).astype(jnp.float32)

    print(f"grid2d PEs: {timeit(f_pe, jnp.float32(0))*1000:.1f} ms", flush=True)

    # GroupNorm on tokens
    from flax import linen as nn

    gn = nn.GroupNorm(num_groups=32)
    x = jnp.asarray(rng.randn(N, 80, 120, 256), jnp.bfloat16)
    gp = gn.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def f_gn(gp, x):
        return gn.apply(gp, x).astype(jnp.float32).mean()

    print(f"GroupNorm: {timeit(f_gn, gp, x)*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
