"""Probe: per-level tent-kernel window sweeps at PRODUCTION offset scales.

The encode attribution (probe_encode_attrib) pins the MSDA kernels at
~33.6 ms of each 44 ms encoder layer.  Docs claim the 1/16 level
"mostly falls back to full-H" with the heuristic window Hw=12 — the
chunk y-spread at init-bias offset scale (up to 4 target-level pixels)
exceeds it.  This probe builds rows exactly as production does (raster
query order over the 3-level concat, reference-point centers +
direction-grid bias offsets + noise) and sweeps:

  - 1/16 level (40x60): Hw in {12 (current), 16, 20, full}, and the
    2D-tent kernel (S=2400, above the current _TENT2D_MAX_S=1024 cap)
  - 1/8 level (80x120): Hw in {16, 24 (current), 32}, sub in {2048, 4096}

reporting per-variant time and the window hit rate.

    python tools/probe_tent_sweep.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import univs_tpu.ops.deformable_attention as da


def sync(x):
    return float(jnp.sum(x[(0,) * x.ndim]))


def timeit(fn, *args, iters=10):
    for _ in range(2):
        sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / iters


def production_rows(shapes, lid, M=8, P=4, N=5, seed=0):
    """xs/ys/was [N, R, M] for sampling level `lid`, built like
    MSDeformAttnLayer at init: reference centers + direction-grid bias
    (pixels of the sampled level) + 0.5px learned-ish noise."""
    rng = np.random.RandomState(seed)
    base = np.concatenate([
        np.stack(np.meshgrid((np.arange(ww) + 0.5) / ww,
                             (np.arange(hh) + 0.5) / hh), -1).reshape(-1, 2)
        for hh, ww in shapes
    ])  # [S, 2] (x, y) normalized, query raster order
    S = base.shape[0]
    thetas = np.arange(M) * (2 * np.pi / M)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)  # [M, 2]
    pts = grid[:, None, :] * (np.arange(P) + 1)[None, :, None]  # [M, P, 2] px
    hh, ww = shapes[lid]
    off = pts[None, None] + rng.randn(N, S, M, P, 2) * 0.5  # px of level lid
    loc = base[None, :, None, None, :] + off / np.array([ww, hh])
    x = (loc[..., 0] * ww - 0.5).transpose(0, 1, 3, 2).reshape(N, S * P, M)
    y = (loc[..., 1] * hh - 0.5).transpose(0, 1, 3, 2).reshape(N, S * P, M)
    wa = rng.rand(N, S * P, M)
    return (jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(wa, jnp.float32))


def hit_rate(ys, H, Hw, D, P):
    align = max(1, -(-128 // D))
    sub = max(P, (da._TENT_SUB // P) * P)
    bq = max(sub, (da._TENT_BQ // sub) * sub)
    n, R, m = ys.shape
    pad = (-R) % bq
    ysp = np.concatenate([np.asarray(ys), np.full((n, pad, m), -10.0)], 1)
    nb = ysp.shape[1] // bq
    y0 = np.clip(np.floor(ysp), 0, H - 1).astype(np.int64)
    y0 = y0.reshape(n, nb, bq // sub, sub, m)
    ymin, ymax = y0.min(3), y0.max(3)
    ystart = np.minimum(ymin // align * align, H - Hw)
    return float((np.minimum(ymax + 1, H - 1) < ystart + Hw).mean())


def main():
    shapes = ((80, 120), (40, 60), (20, 30))
    M, P, N, D = 8, 4, 5, 32
    rng = np.random.RandomState(1)

    for lid in (0, 1):
        hh, ww = shapes[lid]
        xs, ys, was = production_rows(shapes, lid, M, P, N)
        slab5 = rng.randn(N, M, hh, ww, D).astype(np.float32)
        slab_j = jnp.asarray(
            slab5.transpose(0, 1, 3, 2, 4).reshape(N, M, ww, hh * D), jnp.bfloat16)
        slab_r = jnp.asarray(slab5.reshape(N, M, hh * ww, D), jnp.bfloat16)
        print(f"--- level 1/{8 * 2**lid} ({hh}x{ww}) ---", flush=True)

        hws = (16, 24, 32, hh) if lid == 0 else (12, 16, 20, hh)
        ref = None
        for hw in hws:
            f = jax.jit(lambda s, x, y, w, hw=hw: da._msda_tent_win_level(
                s, x, y, w, D, P, hw))
            hr = hit_rate(ys, hh, hw, D, P) if hw < hh else 1.0
            t = timeit(f, slab_j, xs, ys, was)
            o = np.asarray(f(slab_j, xs, ys, was), np.float32)
            if ref is None:
                ref, err = o, 0.0
            else:
                err = float(np.abs(o - ref).max() / np.abs(ref).max())
            tag = " (current)" if hw == da._tent_window_rows(hh, D) else (
                " (full-H)" if hw == hh else "")
            print(f"win Hw={hw:3d}: {t*1e3:6.1f} ms  hit={hr:.2f}  err={err:.5f}{tag}",
                  flush=True)

        if lid == 1:  # 2D-tent above the current size cap
            f2 = jax.jit(lambda s, x, y, w: da._msda_tent2d_level(
                s, x, y, w, D, P, ww))
            t = timeit(f2, slab_r, xs, ys, was)
            o = np.asarray(f2(slab_r, xs, ys, was), np.float32)
            err = float(np.abs(o - ref).max() / np.abs(ref).max())
            print(f"2d  S={hh*ww}: {t*1e3:6.1f} ms  err={err:.5f}", flush=True)

        if lid == 0:  # sub sweep at the best window
            old = da._TENT_SUB
            for sub in (4096,):
                da._TENT_SUB = sub
                f = jax.jit(lambda s, x, y, w: da._msda_tent_win_level(
                    s, x, y, w, D, P, 24))
                t = timeit(f, slab_j, xs, ys, was)
                print(f"win Hw=24 sub={sub}: {t*1e3:6.1f} ms", flush=True)
            da._TENT_SUB = old


if __name__ == "__main__":
    main()
