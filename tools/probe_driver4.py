"""Probe: host-side wall time of every dispatch in EntityDriver.run_vis
(the real production loop).  Async dispatches should return in <1 ms;
any call that blocks shows up directly.

    python tools/probe_driver4.py
"""

import sys, os, time, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from univs_tpu.config import UniVSConfig
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts
    from univs_tpu.inference.driver import EntityDriver

    on_tpu = jax.default_backend() != "cpu"
    cfg = UniVSConfig(dtype="bfloat16" if on_tpu else "float32")
    model = UniVSModel(cfg)
    T = cfg.inference.num_frames
    h, w = (640, 960) if on_tpu else (128, 192)
    K = 40
    rng = np.random.RandomState(0)
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    frames0 = jnp.asarray(rng.rand(1, T, h, w, 3) * 255, jnp.float32)

    params = jax.jit(lambda r, x, fi: model.init(
        {"params": r}, x, fi, task="detection", text_prompts=tp, cls_emb=cls_emb,
    ))(jax.random.PRNGKey(0), frames0, jnp.arange(T)[None])["params"]

    driver = EntityDriver(cfg, params, num_classes=K,
                          capacity=cfg.inference.max_num_instances)

    # wrap every step fn with a host timer
    stats = collections.defaultdict(list)

    def wrap(name, fn):
        def g(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            stats[name].append(time.perf_counter() - t0)
            return out
        return g

    driver._encode_window_fn = wrap("encode", driver._encode_window_fn)
    driver._clip_window_fn = wrap("clip_window", driver._clip_window_fn)
    driver._shift_fn = wrap("shift", driver._shift_fn)
    driver._emit_packed_fn = wrap("emit_packed", driver._emit_packed_fn)

    V = 30
    video = np.asarray(rng.rand(V, h, w, 3) * 255, np.float32)
    print("warm-up...", flush=True)
    driver.run_vis(video, cls_emb)
    stats.clear()

    t0 = time.perf_counter()
    results = driver.run_vis(video, cls_emb)
    total = time.perf_counter() - t0
    print(f"run_vis total {total*1e3:.0f} ms  -> {V/total:.2f} FPS "
          f"({len(results)} entities)", flush=True)
    acc = 0.0
    for name, ts in stats.items():
        s = sum(ts)
        acc += s
        print(f"  {name:12s}: n={len(ts):3d} sum={s*1e3:7.0f} ms "
              f"max={max(ts)*1e3:6.1f} mean={s/len(ts)*1e3:6.1f}", flush=True)
    print(f"  [dispatch total {acc*1e3:.0f} ms; rest(host+drain) "
          f"{(total-acc)*1e3:.0f} ms]", flush=True)

    # second run to check variance
    stats.clear()
    t0 = time.perf_counter()
    driver.run_vis(video, cls_emb)
    total2 = time.perf_counter() - t0
    print(f"run_vis again {total2*1e3:.0f} ms -> {V/total2:.2f} FPS", flush=True)


if __name__ == "__main__":
    main()
