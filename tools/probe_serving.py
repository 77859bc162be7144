"""Probe: batched-serving throughput scaling (B videos in lockstep).

Times the vmapped entity clip step and the folded-batch window encode
at B=1/2/4 at the bench geometry (640x960, T=5, E=40 slots, 40 cats).
The decode is overhead-bound at B=1 (~12 ms/clip for ~0.5 ms of
FLOPs — tools/probe_decode.py), so B>1 should scale sublinearly in
time = superlinearly in throughput.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_serving.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from univs_tpu.config import UniVSConfig
    from univs_tpu.inference.serving import BatchedVISServer

    cfg = UniVSConfig(dtype="bfloat16")
    T = cfg.inference.num_frames
    h, w = 640, 960
    K, E = 40, 40
    rng = np.random.RandomState(0)
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)

    # init params once via the single-video model
    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts

    model = UniVSModel(cfg)
    frames0 = jnp.asarray(rng.rand(1, T, h, w, 3) * 255, jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    params = jax.jit(lambda r, x, fi: model.init(
        {"params": r}, x, fi, task="detection", text_prompts=tp, cls_emb=cls_emb,
    ))(jax.random.PRNGKey(0), frames0, jnp.arange(T)[None])["params"]

    from univs_tpu.inference import memory_pool as mp

    for B in (1, 2, 4):
        srv = BatchedVISServer(cfg, params, num_classes=K, capacity=E, batch_size=B)
        pool1 = mp.create_entity_memory(
            E, K, cfg.decoder.hidden_dim, (h // 4, w // 4),
            window=srv.out_window + T,
            num_prompt_points=srv.cc.num_dense_points,
            embd_history=8, prompt_history=T + srv.stride,
        )
        pool = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), pool1)

        Wn = 10  # encode-window frames for timing
        flat = jnp.asarray(rng.rand(B * Wn, h, w, 3) * 255, jnp.float32)

        def sync(x):
            leaf = jax.tree.leaves(x)[0]
            return float(jnp.sum(leaf[(0,) * leaf.ndim]))

        # encode timing (per frame per video)
        for _ in range(2):
            sync(srv._encode_fn(params, flat))
        t0 = time.perf_counter()
        outs = [srv._encode_fn(params, flat) for _ in range(5)]
        sync(outs[-1])
        t_enc = (time.perf_counter() - t0) / 5 / (B * Wn)

        mf, ms = srv._encode_fn(params, flat)
        mf = mf.reshape(B, Wn, *mf.shape[1:])[:, :T]
        ms = tuple(m.reshape(B, Wn, *m.shape[1:])[:, :T] for m in ms)
        fi_b = jnp.broadcast_to(jnp.arange(T)[None], (B, T))

        def step(pool):
            p, _ = srv._clip_fn(params, (mf, ms), pool, fi_b,
                                jnp.int32(0), jnp.bool_(True), cls_emb)
            return p

        for _ in range(2):
            sync(step(pool))
        t0 = time.perf_counter()
        p = pool
        iters = 10
        for _ in range(iters):
            p = step(p)
        sync(p)
        t_clip = (time.perf_counter() - t0) / iters

        # one lockstep cycle advances each of B videos by `stride`
        # frames: wall = stride * (B videos * t_enc/frame) + t_clip
        s = max(srv.stride, 1)
        agg = B * s / (s * B * t_enc + t_clip)
        log(f"B={B}: encode {t_enc*1e3:6.2f} ms/frame (wall, all videos)  "
            f"clip {t_clip*1e3:6.2f} ms/step ({t_clip/B*1e3:.2f}/video)  "
            f"aggregate streaming {agg:.1f} frames/s")


if __name__ == "__main__":
    main()
