"""Probe: does hoisting the 3D sine PE grids out of the clip decode pay?

The decoder recomputes `pe3d.grid` for all 3 attention levels (+ the
finest prompt grid) inside every jit'd clip step (decoder.py:379).  At
stride 1 the grids depend only on the clip's absolute frame indices and
the level shapes, so a window-level cache could compute them once per
encode window and dynamic-slice per clip.  This probe measures the
upper bound of that optimization: decode_clip as shipped vs the same
program with all sin/cos PE work replaced by precomputed inputs.

    python tools/probe_pe_cache.py   (real TPU via the tunnel)
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from univs_tpu.config import UniVSConfig
    from univs_tpu.models.univs import UniVSModel, build_decoder, build_pixel_decoder
    from univs_tpu.structures import TextPrompts

    cfg = UniVSConfig(dtype="bfloat16" if jax.default_backend() == "tpu" else "float32")
    model = UniVSModel(cfg)
    T = cfg.inference.num_frames
    h, w = (640, 960) if jax.default_backend() == "tpu" else (128, 192)
    K = 40
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(T, h, w, 3) * 255, jnp.float32)
    fi = jnp.arange(T)[None]
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))

    params = jax.jit(lambda r, x, fi: model.init(
        {"params": r}, x, fi, task="detection", text_prompts=tp, cls_emb=cls_emb,
    ))(jax.random.PRNGKey(0), frames[None], fi)["params"]

    pd, dec = build_pixel_decoder(cfg), build_decoder(cfg)
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.pixel_std, jnp.float32)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    @jax.jit
    def encode(params, frames):
        x = ((frames - mean) / std).astype(dtype)
        feats = model.apply({"params": params}, x, method=lambda m, y: m.backbone(y))
        mf, _, _, ms = pd.apply({"params": params["pixel_decoder"]}, feats)
        return mf, tuple(ms)

    mf, ms = encode(params, frames)

    @jax.jit
    def decode_base(params, mf, ms, fi, cls_emb):
        out = dec.apply({"params": params["decoder"]}, list(ms), mf, fi,
                        task="detection", text_prompts=tp, cls_emb=cls_emb)
        return out["pred_logits"], out["pred_masks"]

    # variant: PE grids precomputed and passed in (module hack: monkeypatch
    # pe3d.grid to return the captured input)
    from univs_tpu.ops.position_encoding import SinePositionEncoding3D

    pe3d = SinePositionEncoding3D(
        num_pos_feats=cfg.decoder.hidden_dim // 2, mode="arbitrary",
        num_max_frames=cfg.decoder.num_max_frames,
    )
    sizes = [x.shape[1:3] for x in ms]

    @jax.jit
    def pe_all(fi):
        return tuple(
            jax.vmap(lambda f: pe3d.grid(T, hh, ww, t_indices=f))(fi)
            for hh, ww in sizes
        )

    pes = pe_all(fi)

    @jax.jit
    def decode_cached(params, mf, ms, fi, cls_emb, pes):
        grids = {s: p for s, p in zip(sizes, pes)}
        orig = SinePositionEncoding3D.grid

        def fake_grid(self, t, hh, ww, t_indices=None):
            if (hh, ww) in grids:
                return grids[(hh, ww)][0]
            return orig(self, t, hh, ww, t_indices=t_indices)

        SinePositionEncoding3D.grid = fake_grid
        try:
            out = dec.apply({"params": params["decoder"]}, list(ms), mf, fi,
                            task="detection", text_prompts=tp, cls_emb=cls_emb)
        finally:
            SinePositionEncoding3D.grid = orig
        return out["pred_logits"], out["pred_masks"]

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(jnp.sum(leaf[(0,) * leaf.ndim]))

    def timeit(fn, *args, iters=20):
        for _ in range(3):
            sync(fn(*args))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        sync(outs[-1])
        return (time.perf_counter() - t0) / iters

    a = decode_base(params, mf, ms, fi, cls_emb)
    b = decode_cached(params, mf, ms, fi, cls_emb, pes)
    err = float(jnp.abs(a[1].astype(jnp.float32) - b[1].astype(jnp.float32)).max())
    print(f"max |masks_base - masks_cached| = {err:.2e}", flush=True)

    t_base = timeit(decode_base, params, mf, ms, fi, cls_emb)
    t_cached = timeit(decode_cached, params, mf, ms, fi, cls_emb, pes)
    t_pe = timeit(pe_all, fi)
    print(f"decode base   {t_base*1e3:7.2f} ms/clip", flush=True)
    print(f"decode cached {t_cached*1e3:7.2f} ms/clip (PE grids as inputs)", flush=True)
    print(f"pe_all alone  {t_pe*1e3:7.2f} ms (amortizable once per window)", flush=True)


if __name__ == "__main__":
    main()
