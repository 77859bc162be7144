"""Per-stage timing of the flagship forward (forced-sync via scalar fetch)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from univs_tpu.config import UniVSConfig
from univs_tpu.models.univs import UniVSModel
from univs_tpu.structures import TextPrompts


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = UniVSConfig(dtype="bfloat16")
    model = UniVSModel(cfg)
    b, t, h, w = 1, 5, 640, 960
    K = 40
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, t, h, w, 3) * 255, jnp.float32)
    fi = jnp.arange(t)[None]
    cls_emb = jnp.asarray(rng.randn(K, 640), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((b, K), bool))

    @jax.jit
    def init_fn(rng_, images, fi):
        return model.init({"params": rng_}, images, fi, task="detection",
                          text_prompts=tp, cls_emb=cls_emb)

    variables = init_fn(jax.random.PRNGKey(0), images, fi)
    params = variables["params"]

    @jax.jit
    def backbone_fn(p, x):
        f = model.apply(
            {"params": p}, x.reshape(b * t, h, w, 3),
            method=lambda m, y: m.backbone(m.normalize(y)),
        )
        return sum(v.astype(jnp.float32).mean() for v in f.values())

    @jax.jit
    def encode_fn(p, x):
        mf, ms = model.apply({"params": p}, x, method=lambda m, y: m.encode_features(y))
        return mf.astype(jnp.float32).mean() + sum(v.astype(jnp.float32).mean() for v in ms)

    @jax.jit
    def full_fn(p, x):
        out = model.apply({"params": p}, x, fi, task="detection", text_prompts=tp, cls_emb=cls_emb)
        return out["pred_logits"].mean() + out["pred_masks"].astype(jnp.float32).mean()

    t_bb = timeit(backbone_fn, params, images)
    print(f"backbone: {t_bb*1000:.1f} ms", flush=True)
    t_enc = timeit(encode_fn, params, images)
    print(f"backbone+pixel_decoder: {t_enc*1000:.1f} ms", flush=True)
    t_full = timeit(full_fn, params, images)
    print(f"full forward: {t_full*1000:.1f} ms -> FPS {t/t_full:.2f}", flush=True)


if __name__ == "__main__":
    main()
