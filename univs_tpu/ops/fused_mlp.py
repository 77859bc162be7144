"""Fused residual+LayerNorm+FFN Pallas kernel for encoder layers.

The deformable encoder layer tail is

    u   = LN1(src + attn_out)
    out = LN2(u + W2 relu(W1 u + b1) + b2)

XLA cannot fuse through the two matmuls, so the [tokens, ffn_dim]
hidden activation round-trips HBM (161 MB bf16 per encoder layer at the
production 5-frame geometry) and the LN/residual passes each re-read
the token tensor — ~1.9 ms/layer measured (tools/probe_glue.py).  This
kernel keeps the hidden activation in VMEM: per token block it reads
src and attn_out once and writes the layer output once.  Matmuls run
in the layer compute dtype with f32 accumulation (same contraction
precision as the XLA path); LayerNorm statistics are computed in f32.

Reference semantics being fused (post-norm DETR FFN block):
mask2former/modeling/pixel_decoder/msdeformattn.py:92-133.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _kernel(x_ref, a_ref, g1_ref, c1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            g2_ref, c2_ref, o_ref, *, eps: float, dtype):
    f32 = jnp.float32
    h = x_ref[...].astype(f32) + a_ref[...].astype(f32)  # [bt, C]

    def ln(z, g_ref, c_ref):
        mu = z.mean(axis=-1, keepdims=True)
        zc = z - mu
        var = (zc * zc).mean(axis=-1, keepdims=True)
        return zc * jax.lax.rsqrt(var + eps) * g_ref[0].astype(f32) + c_ref[0].astype(f32)

    u = ln(h, g1_ref, c1_ref)  # f32 [bt, C]
    y1 = jnp.dot(u.astype(dtype), w1_ref[...], preferred_element_type=f32)
    y1 = jnp.maximum(y1 + b1_ref[0].astype(f32), 0.0)
    y2 = jnp.dot(y1.astype(dtype), w2_ref[...], preferred_element_type=f32)
    z = u + y2 + b2_ref[0].astype(f32)
    o_ref[...] = ln(z, g2_ref, c2_ref).astype(o_ref.dtype)


def fused_ffn_ln(
    src: jnp.ndarray,  # [N, S, C]
    attn_out: jnp.ndarray,  # [N, S, C]
    norm1: dict,  # {"scale": [C], "bias": [C]}
    linear1: dict,  # {"kernel": [C, F], "bias": [F]}
    linear2: dict,  # {"kernel": [F, C], "bias": [C]}
    norm2: dict,
    *,
    eps: float = 1e-5,
    block_tokens: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """LN2(u + FFN(u)) with u = LN1(src + attn_out), hidden kept in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, S, C = src.shape
    F = linear1["kernel"].shape[1]
    dtype = src.dtype

    x = src.reshape(N * S, C)
    a = attn_out.reshape(N * S, C)
    T = N * S
    bt = block_tokens
    pad = (-T) % bt
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        a = jnp.pad(a, ((0, pad), (0, 0)))
    Tp = T + pad

    def vec(v):  # 1D params as (1, len) rows for VMEM
        return v.reshape(1, -1)

    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    tok = pl.BlockSpec((bt, C), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        lambda *refs: _kernel(*refs, eps=eps, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((Tp, C), dtype),
        grid=(Tp // bt,),
        in_specs=[
            tok, tok,
            row(C), row(C),
            mat(C, F), row(F),
            mat(F, C), row(C),
            row(C), row(C),
        ],
        out_specs=tok,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(
        x, a,
        vec(norm1["scale"]), vec(norm1["bias"]),
        linear1["kernel"].astype(dtype), vec(linear1["bias"]),
        linear2["kernel"].astype(dtype), vec(linear2["bias"]),
        vec(norm2["scale"]), vec(norm2["bias"]),
    )
    return out[:T].reshape(N, S, C)
