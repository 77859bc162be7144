"""Probe: standalone component costs of the sot clip decode at the
production geometry (640x960, T=5, Q=260 tokens = 200 learnable + 60
prompt, C=256, H=8 heads, levels S = 9600/2400/600, mask feats
160x240).

Components (each its own jit, sync by scalar fetch, median of 3x5):
  xattn 1/8      — masked cross-attn (q 260 x kv 9600 + binary bias)
  xattn 1/16     — same at S=2400
  xattn 1/32     — same at S=600
  xattn 1/8 bf16 — logits/softmax in bf16 (traffic halved; numerics差)
  selfattn       — (Q*T) spatio-temporal self-attn (1300 tokens)
  ffn            — FFN block at [B*T, Q, C]
  proca folded   — shared-kv ProCA (q 60x5 x kv 773)
  heads aux      — decoder_norm + mask_embed + bias einsum at 3 levels
  heads full     — + cls head + full-res mask einsum [260,5,160,240]
  sigmoid+pack   — sigmoid/threshold pass over the full-res masks

    python tools/probe_decode_attrib.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, flush=True)


def main():
    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    bt, Q, C, H = 5, 260, 256, 8
    hd = C // H
    rng = np.random.RandomState(0)

    def mk(*s, dt=dtype):
        return jnp.asarray(rng.randn(*s), dt)

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(jnp.sum(leaf[(0,) * leaf.ndim].astype(jnp.float32)))

    NEG = -1e9

    def xattn(q_in, kv_in, allowed, f32_softmax=True):
        # mirror MultiHeadAttention + residual/LN cost (projections via
        # explicit weights so each variant is one standalone jit)
        Wq, Wk, Wv, Wo = (mk(C, C), mk(C, C), mk(C, C), mk(C, C))

        @jax.jit
        def f(x, mem, alw):
            q = (x @ Wq).reshape(bt, -1, H, hd)
            k = (mem @ Wk).reshape(bt, -1, H, hd)
            v = (mem @ Wv).reshape(bt, -1, H, hd)
            lg = jnp.einsum("bqhd,bkhd->bhqk", q, k)
            if f32_softmax:
                lg = lg.astype(jnp.float32)
            lg = lg / np.sqrt(hd) + jnp.where(alw[:, None], 0.0, NEG)
            w = jax.nn.softmax(lg, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
            return (o.reshape(bt, -1, C) @ Wo) + x

        return f, (q_in, kv_in, allowed)

    comps = []
    for S, name in ((9600, "xattn 1/8"), (2400, "xattn 1/16"), (600, "xattn 1/32")):
        q_in = mk(bt, Q, C)
        kv_in = mk(bt, S, C)
        alw = jnp.asarray(rng.rand(bt, Q, S) > 0.5)
        f, args = xattn(q_in, kv_in, alw)
        comps.append((name, f, args))
    f, args = xattn(mk(bt, Q, C), mk(bt, 9600, C), jnp.asarray(rng.rand(bt, Q, 9600) > 0.5), f32_softmax=False)
    comps.append(("xattn 1/8 bf16sm", f, args))

    # self-attn over Q*T tokens
    Wq, Wk, Wv, Wo = (mk(C, C), mk(C, C), mk(C, C), mk(C, C))

    @jax.jit
    def self_f(x):
        n = x.shape[1]
        q = (x @ Wq).reshape(1, n, H, hd)
        k = (x @ Wk).reshape(1, n, H, hd)
        v = (x @ Wv).reshape(1, n, H, hd)
        lg = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / np.sqrt(hd)
        w = jax.nn.softmax(lg, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
        return (o.reshape(1, n, C) @ Wo) + x

    comps.append(("selfattn QT=1300", self_f, (mk(1, Q * bt, C),)))

    W1, W2 = mk(C, 2048), mk(2048, C)

    @jax.jit
    def ffn_f(x):
        return x + jnp.maximum(x @ W1, 0) @ W2

    comps.append(("ffn", ffn_f, (mk(bt, Q, C),)))

    # folded ProCA: q [E*T(=300), t=5... wait — per entity: [E, T] queries
    E, L = 60, 773
    Wq2, Wk2, Wv2, Wo2 = (mk(C, C), mk(C, C), mk(C, C), mk(C, C))

    @jax.jit
    def proca_f(q_in, kv_in):
        # [E, T+L] keys per entity
        keys = jnp.concatenate([q_in, kv_in], axis=1)
        q = (q_in @ Wq2).reshape(E, -1, H, hd)
        k = (keys @ Wk2).reshape(E, -1, H, hd)
        v = (keys @ Wv2).reshape(E, -1, H, hd)
        lg = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / np.sqrt(hd)
        w = jax.nn.softmax(lg, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
        return (o.reshape(E, -1, C) @ Wo2) + q_in

    comps.append(("proca folded", proca_f, (mk(E, 5, C), mk(E, L - 5, C))))

    # heads: aux (bias only) and full
    h4, w4 = 160, 240
    Wm1, Wm2, Wm3 = mk(C, C), mk(C, C), mk(C, C)
    mfs = {s: mk(1, bt, h4 // s, w4 // s, C) for s in (2, 4, 8)}
    mf_full = mk(1, bt, h4, w4, C)
    Wcls = mk(C, 640)

    def mlp(x):
        return jnp.maximum(jnp.maximum(x @ Wm1, 0) @ Wm2, 0) @ Wm3

    @jax.jit
    def heads_aux(dec, mf_small):
        membed = mlp(dec).reshape(1, bt, Q, C)
        m_small = jnp.einsum("btqc,bthwc->bqthw", membed, mf_small).astype(jnp.float32)
        allowed = jax.nn.sigmoid(m_small) >= 0.5
        return jnp.where(allowed, 0.0, NEG)

    comps.append(("heads aux 1/8(att)", heads_aux, (mk(bt, Q, C), mfs[2])))

    @jax.jit
    def heads_full(dec, mf):
        membed = mlp(dec).reshape(1, bt, Q, C)
        masks = jnp.einsum("btqc,bthwc->bqthw", membed, mf)
        cls = jnp.einsum("nqc,kc->nqk", dec @ Wcls / 100.0, mk(40, 640))
        return masks, cls

    comps.append(("heads full-res", heads_full, (mk(bt, Q, C), mf_full)))

    @jax.jit
    def sig_f(m):
        q = m.astype(jnp.float32)
        hi = (q > 1.0).reshape(Q, -1).astype(jnp.float32).sum(-1)
        lo = (q > -1.0).reshape(Q, -1).astype(jnp.float32).sum(-1)
        return hi / jnp.maximum(lo, 1)

    comps.append(("quality pass f32", sig_f, (mk(Q, bt, h4, w4, dt=jnp.float32),)))

    @jax.jit
    def sig_bf(m):
        hi = (m > 1.0).reshape(Q, -1).astype(jnp.float32).sum(-1)
        lo = (m > -1.0).reshape(Q, -1).astype(jnp.float32).sum(-1)
        return hi / jnp.maximum(lo, 1)

    comps.append(("quality pass bf16", sig_bf, (mk(Q, bt, h4, w4),)))

    for name, f, args in comps:
        sync(f(*args))
    times = {name: [] for name, _, _ in comps}
    for rep in range(3):
        for name, f, args in comps:
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(*args)
            sync(out)
            times[name].append((time.perf_counter() - t0) / 5)
    for name, _, _ in comps:
        ts = sorted(times[name])
        log(f"{name:20s}: median {ts[1]*1e3:7.2f} ms  (all: "
            + ", ".join(f"{t*1e3:.2f}" for t in times[name]) + ")")


if __name__ == "__main__":
    main()
