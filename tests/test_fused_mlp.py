"""Numerics of the fused residual+LN+FFN kernel vs the unfused law."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univs_tpu.ops.fused_mlp import fused_ffn_ln


def _unfused(src, attn_out, n1, l1, l2, n2, eps=1e-5):
    def ln(z, p):
        mu = z.mean(-1, keepdims=True)
        var = ((z - mu) ** 2).mean(-1, keepdims=True)
        return (z - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]

    u = ln(src + attn_out, n1)
    y = jnp.maximum(u @ l1["kernel"] + l1["bias"], 0.0) @ l2["kernel"] + l2["bias"]
    return ln(u + y, n2)


@pytest.mark.parametrize("tokens", [96, 1024 + 17])
def test_fused_ffn_ln_matches_reference_law(tokens):
    rng = np.random.RandomState(0)
    C, F = 64, 128
    src = jnp.asarray(rng.randn(1, tokens, C), jnp.float32)
    attn = jnp.asarray(rng.randn(1, tokens, C), jnp.float32)
    n1 = {"scale": jnp.asarray(rng.rand(C) + 0.5, jnp.float32),
          "bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32)}
    n2 = {"scale": jnp.asarray(rng.rand(C) + 0.5, jnp.float32),
          "bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32)}
    l1 = {"kernel": jnp.asarray(rng.randn(C, F) * 0.05, jnp.float32),
          "bias": jnp.asarray(rng.randn(F) * 0.1, jnp.float32)}
    l2 = {"kernel": jnp.asarray(rng.randn(F, C) * 0.05, jnp.float32),
          "bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32)}

    got = fused_ffn_ln(src, attn, n1, l1, l2, n2, block_tokens=128,
                       interpret=True)
    want = _unfused(src[0], attn[0], n1, l1, l2, n2)[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
