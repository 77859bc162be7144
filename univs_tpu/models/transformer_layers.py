"""DETR-style attention blocks (flax), batch-major.

Functional equivalents of the reference's SelfAttentionLayer /
CrossAttentionLayer / FFNLayer / MLP
(reference: univs/modeling/transformer_decoder/transformer_layers.py),
with two TPU-first changes: tensors are batch-major ``[B, L, C]``
(torch uses sequence-major), and boolean key masks are additive fp32
biases so the whole attention lowers to two MXU matmuls + fused
softmax with no data-dependent branching.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9  # large-negative instead of -inf: keeps softmax NaN-free
# even for fully-masked rows (the reference needs an explicit all-True
# row fixup — decoder_univs.py:390; a finite bias makes that row
# uniform instead of NaN, and we additionally reproduce the fixup
# where semantics demand it).


class MultiHeadAttention(nn.Module):
    """Multi-head attention with optional additive bias and weights out.

    q/k/v projections are separate Dense layers (a torch
    ``nn.MultiheadAttention`` packed in_proj splits 1:1 on conversion).
    """

    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Lq, C]
        key: jnp.ndarray,  # [B, Lk, C]
        value: jnp.ndarray,  # [B, Lk, C]
        bias: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, Lq, Lk]
        return_weights: bool = False,
    ):
        H = self.num_heads
        C = self.d_model
        hd = C // H

        def proj(x, name):
            y = nn.Dense(C, dtype=self.dtype, name=name)(x)
            return y.reshape(*y.shape[:-1], H, hd)

        q = proj(query, "q_proj")
        k = proj(key, "k_proj")
        v = proj(value, "v_proj")

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(hd))
        if bias is not None:
            if bias.dtype == jnp.bool_:
                # boolean allow-mask: identical softmax to the additive
                # NEG_INF form (masked entries underflow to exactly 0 in
                # both), at 1/4 the bias bytes
                logits = jnp.where(bias, logits, NEG_INF)
            else:
                logits = logits + bias
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
        out = out.reshape(*out.shape[:-2], C)
        out = nn.Dense(C, dtype=self.dtype, name="out_proj")(out)
        if return_weights:
            return out, weights.mean(axis=1)  # head-averaged [B, Lq, Lk]
        return out


class SelfAttentionBlock(nn.Module):
    """q=k=x+pos, v=x; residual + LayerNorm (post- or pre-norm)."""

    d_model: int
    num_heads: int
    pre_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos=None, bias=None):
        attn = MultiHeadAttention(self.d_model, self.num_heads, self.dtype, name="attn")
        ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        if self.pre_norm:
            y = ln(x)
            qk = y if pos is None else y + pos
            return x + attn(qk, qk, y, bias)
        qk = x if pos is None else x + pos
        return ln(x + attn(qk, qk, x, bias))


class CrossAttentionBlock(nn.Module):
    """q=x+query_pos, k=mem+pos, v=mem; residual + LayerNorm."""

    d_model: int
    num_heads: int
    pre_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mem, query_pos=None, pos=None, bias=None, return_weights=False):
        attn = MultiHeadAttention(self.d_model, self.num_heads, self.dtype, name="attn")
        ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        if self.pre_norm:
            y = ln(x)
            q = y if query_pos is None else y + query_pos
        else:
            q = x if query_pos is None else x + query_pos
        k = mem if pos is None else mem + pos
        out = attn(q, k, mem, bias, return_weights=return_weights)
        if return_weights:
            attn_out, weights = out
        else:
            attn_out, weights = out, None
        res = x + attn_out
        res = res if self.pre_norm else ln(res)
        return (res, weights) if return_weights else res


class FFNBlock(nn.Module):
    d_model: int
    ffn_dim: int
    pre_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        def ffn(y):
            y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(y)
            y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(y))
            return y
        if self.pre_norm:
            return x + ffn(ln(x))
        return ln(x + ffn(x))


class MLP(nn.Module):
    """N-layer MLP with ReLU between layers (DETR's mask-embed head)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layer{i}")(x))
        return nn.Dense(self.output_dim, dtype=self.dtype, name=f"layer{self.num_layers - 1}")(x)
