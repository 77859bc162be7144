"""Probe: attribute the encoder-layer 'glue' (~10.5 ms/layer beside the
33.6 ms MSDA op) at the production geometry [5, 12600, 256] bf16.

Pieces timed standalone (each jitted, sync-amortized):
  value_proj   — Dense 256->256 over src
  offs+attn    — Dense 256->192 + Dense 256->96 + f32 softmax + reshape
  out_proj     — Dense 256->256
  ffn+ln       — LN, Dense 256->1024, relu, Dense 1024->256, LN
  pack         — per-level loc->pixel transposes to [N, R, M] rows x3

    python tools/probe_glue.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf[(0,) * leaf.ndim]))


def timeit(fn, *args, iters=20):
    for _ in range(2):
        sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    t, S, C, M, L, P = 5, 12600, 256, 8, 3, 4
    shapes = ((80, 120), (40, 60), (20, 30))
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(t, S, C), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(C, C) * 0.05, jnp.bfloat16)
    wo = jnp.asarray(rng.randn(C, M * L * P * 2) * 0.05, jnp.bfloat16)
    wa_ = jnp.asarray(rng.randn(C, M * L * P) * 0.05, jnp.bfloat16)
    wf1 = jnp.asarray(rng.randn(C, 1024) * 0.05, jnp.bfloat16)
    wf2 = jnp.asarray(rng.randn(1024, C) * 0.05, jnp.bfloat16)

    @jax.jit
    def value_proj(s):
        return s @ w1

    @jax.jit
    def offs_attn(s):
        off = (s @ wo).reshape(t, S, M, L, P, 2)
        a = (s @ wa_).reshape(t, S, M, L * P)
        a = jax.nn.softmax(a.astype(jnp.float32), -1).reshape(t, S, M, L, P)
        return off, a

    @jax.jit
    def ffn_ln(s):
        y = nn.relu((s @ wf1)) @ wf2
        m = (s + y).astype(jnp.float32)
        mu = m.mean(-1, keepdims=True)
        v = ((m - mu) ** 2).mean(-1, keepdims=True)
        return ((m - mu) * jax.lax.rsqrt(v + 1e-5)).astype(jnp.bfloat16)

    base = np.concatenate([
        np.stack(np.meshgrid((np.arange(ww) + 0.5) / ww, (np.arange(hh) + 0.5) / hh),
                 -1).reshape(-1, 2) for hh, ww in shapes])
    off_np = rng.randn(t, S, M, L, P, 2).astype(np.float32) * 0.01
    locs = jnp.asarray(base[None, :, None, None, None, :] + off_np)
    attn = jnp.asarray(rng.rand(t, S, M, L, P), jnp.float32)

    @jax.jit
    def pack(l, a):
        outs = []
        for lid, (hh, ww) in enumerate(shapes):
            x = (l[..., lid, :, 0] * ww - 0.5).transpose(0, 1, 3, 2).reshape(t, S * P, M)
            y = (l[..., lid, :, 1] * hh - 0.5).transpose(0, 1, 3, 2).reshape(t, S * P, M)
            w = a[:, :, :, lid].transpose(0, 1, 3, 2).reshape(t, S * P, M)
            outs.append(jnp.concatenate([x, y, w], axis=2))
        return outs

    for name, fn, args in [
        ("value_proj", value_proj, (src,)),
        ("offs+attn ", offs_attn, (src,)),
        ("out_proj  ", value_proj, (src,)),
        ("ffn+ln    ", ffn_ln, (src,)),
        ("pack      ", pack, (locs, attn)),
    ]:
        tt = timeit(fn, *args)
        print(f"{name}: {tt*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
