"""Probe: per-phase device cost of entity_clip_step (the production VIS
clip program) at the reference geometry (640x960, T=5, E=60, K=40).

Phases, each jit'd standalone and synced by a scalar fetch:
  grid      — decoder.prompt_feature_grid on the 1/8 level
  reencode  — _reencode_prompts (T-key-frame sampler cascade)
  kvread    — memory-pool kv read + VisualPrompts assembly
  decode    — the sot decoder call (ProCA + masked cross-attn + heads)
  track     — step-1 consistency gating + accumulate
  newly     — step-2 instance newly-entity detection
  full      — the whole entity_clip_step

    python tools/probe_clip_attrib.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, flush=True)


def main():
    from univs_tpu.config import UniVSConfig
    from univs_tpu.models.univs import UniVSModel, build_decoder, build_pixel_decoder
    from univs_tpu.structures import TextPrompts, VisualPrompts
    import univs_tpu.inference.memory_pool as mp
    import univs_tpu.inference.entity as ent

    on_tpu = jax.default_backend() != "cpu"
    cfg = UniVSConfig(dtype="bfloat16" if on_tpu else "float32")
    model = UniVSModel(cfg)
    T = cfg.inference.num_frames
    h, w = (640, 960) if on_tpu else (128, 192)
    K = 40
    E = cfg.inference.max_num_instances
    rng = np.random.RandomState(0)
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    frames0 = jnp.asarray(rng.rand(1, T, h, w, 3) * 255, jnp.float32)

    params = jax.jit(lambda r, x, fi: model.init(
        {"params": r}, x, fi, task="detection", text_prompts=tp, cls_emb=cls_emb,
    ))(jax.random.PRNGKey(0), frames0, jnp.arange(T)[None])["params"]

    pixel_decoder, decoder = build_pixel_decoder(cfg), build_decoder(cfg)
    modules = (pixel_decoder, decoder)
    from univs_tpu.inference.entity import EntityClipConfig
    inf = cfg.inference
    cc = EntityClipConfig(
        num_queries=cfg.decoder.num_queries,
        topk_candidates=inf.topk_per_video,
        num_prev_frames_memory=cfg.prompt.num_prev_frames_memory,
        apply_cls_thres=inf.apply_cls_thres,
        newly_thres=inf.newly_entity_thres,
        consistency_thres=inf.consistency_thres[0],
        nms_thres=inf.nms_thres,
        num_dense_points=cfg.prompt.num_dense_points_test,
        clip_stride=inf.clip_stride,
        num_frames=T,
    )

    # encoded features for one clip
    mean = np.asarray(cfg.pixel_mean, np.float32)
    std = np.asarray(cfg.pixel_std, np.float32)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    from univs_tpu.models.univs import build_backbone
    backbone = build_backbone(cfg.backbone, dtype=dtype)

    @jax.jit
    def encode(params, frames):
        x = ((frames - mean) / std).astype(dtype)
        feats = backbone.apply({"params": params["backbone"]}, x)
        mf, _, _, ms = pixel_decoder.apply({"params": params["pixel_decoder"]}, feats)
        return mf, tuple(ms)

    frames = jnp.asarray(rng.rand(T, h, w, 3) * 255, jnp.float32)
    mf, ms = encode(params, frames)

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(jnp.sum(leaf[(0,) * leaf.ndim].astype(jnp.float32)))

    sync(mf)
    pool0 = mp.create_entity_memory(
        E, K, cfg.decoder.hidden_dim, (h // 4, w // 4),
        window=inf.num_frames_window - T + T + T,  # generous
        num_prompt_points=cc.num_dense_points, embd_history=8,
        prompt_history=T + cc.clip_stride)
    fi0 = jnp.arange(T)

    # warm pool: run one full step so valid entities exist
    @jax.jit
    def full_fn(params, mf, ms, pool, fi, off, first, cls_emb):
        return ent.entity_clip_step(modules, params, (mf, ms), pool, fi,
                                    off, first, cls_emb, cc)

    pool1, _ = full_fn(params, mf, ms, pool0, fi0, jnp.int32(0),
                       jnp.bool_(True), cls_emb)
    sync(pool1.logits_count)

    # ---- phase fns -----------------------------------------------------
    @jax.jit
    def ph_grid(params, ms, fi):
        return decoder.apply({"params": params["decoder"]}, ms[-1], fi[None],
                             method="prompt_feature_grid")

    gf, gp = ph_grid(params, ms, fi0)

    @jax.jit
    def ph_reencode(params, pool, gf, gp):
        return ent._reencode_prompts(pool, gf[0], gp[0], jnp.int32(1),
                                     jnp.int32(T - cc.clip_stride), T, cc,
                                     first_frame=jnp.int32(1))

    @jax.jit
    def ph_kvread(pool):
        kv, kv_pe, kv_valid = mp.read_prompt_kv(pool, cc.num_prev_frames_memory)
        q, qp = mp.read_clip_queries(pool, T)
        return kv, kv_pe, kv_valid, q, qp

    kv, kv_pe, kv_valid, q, qp = ph_kvread(pool1)
    L = kv.shape[1]
    vp = VisualPrompts(
        queries=q[None], query_pos=qp[None],
        kv=kv[None, :, :, None], kv_pe=kv_pe[None, :, :, None],
        kv_valid=kv_valid[None, :, :, None], valid=pool1.valid[None],
    )
    vp_bcast = VisualPrompts(
        queries=q[None], query_pos=qp[None],
        kv=jnp.broadcast_to(kv[None, :, :, None], (1, E, L, T, kv.shape[-1])),
        kv_pe=jnp.broadcast_to(kv_pe[None, :, :, None], (1, E, L, T, kv.shape[-1])),
        kv_valid=jnp.broadcast_to(kv_valid[None, :, :, None], (1, E, L, T)),
        valid=pool1.valid[None],
    )

    @jax.jit
    def ph_decode(params, ms, mf, vp, cls_emb):
        out = decoder.apply({"params": params["decoder"]}, ms, mf, fi0[None],
                            task="sot", visual_prompts=vp, cls_emb=cls_emb)
        return out["pred_logits"], out["pred_masks"], out["pred_embds"]

    lg, mk, eb = ph_decode(params, ms, mf, vp, cls_emb)
    Ql = cc.num_queries
    logits = jax.nn.sigmoid(lg[0].astype(jnp.float32))
    masks = mk[0].astype(jnp.float32)
    embds = eb[0].astype(jnp.float32)

    @jax.jit
    def ph_track(pool, masks_p, embds_p, off, first):
        thr = jnp.where(first, cc.consistency_thres * 0.5, cc.consistency_thres)
        is_cons, sim = mp.consistency_gate(
            pool, embds_p, max(cc.num_prev_frames_memory // max(cc.clip_stride, 1), 3), thr)
        q_p = ent.mask_quality_scores(masks_p)
        scores_track = (pool.logits_sum / jnp.maximum(pool.logits_count, 1)[:, None]).max(-1)
        cur = scores_track * sim * q_p
        prob = jax.nn.sigmoid(masks_p).reshape(E, -1)
        owner = jnp.argmax(cur[:, None] * prob, axis=0)
        own_mask = owner[None, :] == jnp.arange(E)[:, None]
        update = is_cons & ((own_mask.sum(-1) / jnp.maximum((prob > 0.5).sum(-1), 1)) > cc.overlap_thres)
        return mp.accumulate_clip_masks(pool, off, masks_p, embds_p.mean(1), update, q_p)

    @jax.jit
    def ph_newly(pool, off, fi, first, logits_l, masks_l, embds_l):
        return ent._detect_newly_instance(pool, off, fi, first,
                                          logits_l, masks_l, embds_l, cc)

    phases = [
        ("grid", lambda: ph_grid(params, ms, fi0)),
        ("reencode", lambda: ph_reencode(params, pool1, gf, gp).prompt_feats),
        ("kvread", lambda: ph_kvread(pool1)),
        ("decode(shared-kv)", lambda: ph_decode(params, ms, mf, vp, cls_emb)),
        ("decode(bcast-kv)", lambda: ph_decode(params, ms, mf, vp_bcast, cls_emb)),
        ("track", lambda: ph_track(pool1, masks[Ql:], embds[Ql:], jnp.int32(1), jnp.bool_(False)).logits_count),
        ("newly", lambda: ph_newly(pool1, jnp.int32(1), fi0, jnp.bool_(False), logits[:Ql], masks[:Ql], embds[:Ql]).logits_count),
        ("full step", lambda: full_fn(params, mf, ms, pool1, fi0, jnp.int32(1), jnp.bool_(False), cls_emb)[0].logits_count),
    ]

    for name, f in phases:
        sync(f())  # warm / compile
    times = {name: [] for name, _ in phases}
    for rep in range(3):
        for name, f in phases:
            t0 = time.perf_counter()
            for _ in range(5):
                out = f()
            sync(out)
            times[name].append((time.perf_counter() - t0) / 5)
    for name, _ in phases:
        ts = sorted(times[name])
        log(f"{name:18s}: median {ts[1]*1e3:7.1f} ms  (all: "
            + ", ".join(f"{t*1e3:.1f}" for t in times[name]) + ")")


if __name__ == "__main__":
    main()
