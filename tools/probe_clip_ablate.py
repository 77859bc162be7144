"""Probe: IN-PROGRAM ablation of entity_clip_step — each variant is ONE
jit (one dispatch), so phase costs appear as deltas against the full
step instead of standalone micro-programs (which all bottom out at the
~1.2 ms per-dispatch fixed cost, see probe_decode_attrib).

Variants:
  full          — production entity_clip_step
  no_reencode   — skip step 0 (prompt re-encoding cascade)
  no_newly      — skip step 2 (newly-entity detection)
  no_track      — skip step 1 (consistency gate + accumulate)
  decode_only   — kv read + sot decode, outputs reduced
  proca0        — decode_only with ProCA layers skipped (monkeypatch)

    python tools/probe_clip_ablate.py
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
    from univs_tpu.models.univs import (
        UniVSModel, build_decoder, build_pixel_decoder, build_backbone,
    )
    from univs_tpu.structures import TextPrompts, VisualPrompts
    import univs_tpu.inference.memory_pool as mp
    import univs_tpu.inference.entity as ent
    from univs_tpu.inference.entity import EntityClipConfig, entity_clip_step

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

    mean = np.asarray(cfg.pixel_mean, np.float32)
    std = np.asarray(cfg.pixel_std, np.float32)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
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
        window=30, num_prompt_points=cc.num_dense_points, embd_history=8,
        prompt_history=T + cc.clip_stride)
    fi0 = jnp.arange(T)

    @jax.jit
    def full_fn(params, pool):
        return entity_clip_step(modules, params, (mf, ms), pool, fi0,
                                jnp.int32(1), jnp.bool_(False), cls_emb, cc)[0].logits_count

    pool1, _ = jax.jit(lambda p, q: entity_clip_step(
        modules, p, (mf, ms), q, fi0, jnp.int32(0), jnp.bool_(True), cls_emb, cc,
    ))(params, pool0)
    sync(pool1.logits_count)

    # ---- variant builders: re-assemble the step with pieces removed ----
    # NOTE: each variant must return a value that DEPENDS ON every live
    # phase, or XLA dead-code-eliminates the phase entirely (the first
    # run of this probe returned 7.8 ms for "no_newly" because only
    # newly writes logits_count — the whole decode had been DCE'd).
    def pool_probe(pool):
        return (pool.logits_count.sum() + pool.mask_logits[:, 0, 0, 0].sum()
                + pool.quality_sum.sum() + pool.prompt_feats[:, 0, 0, 0].sum()
                + pool.embds[:, 0, 0].sum() + pool.occurrence[:, 0].sum())

    def make_variant(reencode=True, decode=True, track=True, newly=True):
        def step(params, pool):
            fi = fi0[None]
            clip_offset = jnp.int32(1)
            is_first = jnp.bool_(False)
            if reencode:
                gf, gp = decoder.apply({"params": params["decoder"]}, ms[-1],
                                       fi, method="prompt_feature_grid")
                n_up = jnp.where(is_first, 1, T - cc.clip_stride)
                pool = ent._reencode_prompts(pool, gf[0], gp[0], clip_offset,
                                             n_up, T, cc, first_frame=fi0[0])
            if not decode:
                return pool.logits_count
            kv, kv_pe, kv_valid = mp.read_prompt_kv(pool, cc.num_prev_frames_memory)
            queries, query_pos = mp.read_clip_queries(pool, T)
            vp = VisualPrompts(
                queries=queries[None], query_pos=query_pos[None],
                kv=kv[None, :, :, None], kv_pe=kv_pe[None, :, :, None],
                kv_valid=kv_valid[None, :, :, None], valid=pool.valid[None],
            )
            out = decoder.apply({"params": params["decoder"]}, ms, mf, fi,
                                task="sot", visual_prompts=vp, cls_emb=cls_emb)
            Ql = cc.num_queries
            logits = jax.nn.sigmoid(out["pred_logits"][0].astype(jnp.float32))
            masks = out["pred_masks"][0].astype(jnp.float32)
            embds = out["pred_embds"][0].astype(jnp.float32)
            if not (track or newly):
                return (masks.sum() + embds.sum() + logits.sum())
            if track:
                thr = jnp.where(is_first | (fi0[0] < cc.num_frames),
                                cc.consistency_thres * 0.5, cc.consistency_thres)
                is_cons, sim = mp.consistency_gate(
                    pool, embds[Ql:],
                    max(cc.num_prev_frames_memory // max(cc.clip_stride, 1), 3), thr)
                q_p = ent.mask_quality_scores(masks[Ql:])
                scores_track = (pool.logits_sum / jnp.maximum(pool.logits_count, 1)[:, None]).max(-1)
                cur = scores_track * sim * q_p
                prob = jax.nn.sigmoid(masks[Ql:]).reshape(E, -1)
                is_bg = (prob < 0.5).all(0)
                owner = jnp.argmax(cur[:, None] * prob, axis=0)
                owner = jnp.where(is_bg, -1, owner)
                own_mask = owner[None, :] == jnp.arange(E)[:, None]
                orig_area = jnp.maximum((prob > 0.5).sum(-1), 1)
                above = (own_mask.sum(-1) / orig_area) > cc.overlap_thres
                mask_over = (own_mask & (prob > 0.5)).any(-1)
                update = is_cons & above & mask_over
                pool = mp.accumulate_clip_masks(pool, clip_offset, masks[Ql:],
                                                embds[Ql:].mean(1), update, q_p)
            if newly:
                pool = ent._detect_newly_instance(
                    pool, clip_offset, fi0, is_first,
                    logits[:Ql], masks[:Ql], embds[:Ql], cc)
            return pool.logits_count
        return jax.jit(step)

    variants = [
        ("full", make_variant()),
        ("no_reencode", make_variant(reencode=False)),
        ("no_newly", make_variant(newly=False)),
        ("no_track", make_variant(track=False)),
        ("decode_only", make_variant(track=False, newly=False)),
        ("reencode_only", make_variant(decode=False)),
    ]

    for name, f in variants:
        sync(f(params, pool1))
    times = {name: [] for name, _ in variants}
    for rep in range(3):
        for name, f in variants:
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(params, pool1)
            sync(out)
            times[name].append((time.perf_counter() - t0) / 5)
    base = None
    for name, _ in variants:
        ts = sorted(times[name])
        med = ts[1] * 1e3
        if name == "full":
            base = med
        delta = f"  (delta {base - med:+.1f})" if base is not None and name != "full" else ""
        log(f"{name:14s}: median {med:7.1f} ms{delta}  (all: "
            + ", ".join(f"{t*1e3:.1f}" for t in times[name]) + ")")


if __name__ == "__main__":
    main()
