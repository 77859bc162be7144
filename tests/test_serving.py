"""Batched serving: B equal-length videos in lockstep must reproduce
the single-video driver (vmap batches the same pure clip program).
Mixed-length batches pad short videos by repeating the last frame —
their extra (padded) clips may keep updating pool scores, a documented
serving deviation — so those only get shape/consistency checks.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from univs_tpu.config import tiny_test_config
from univs_tpu.structures import TextPrompts


def _setup():
    from univs_tpu.models.univs import UniVSModel

    cfg = tiny_test_config()
    cfg = cfg.replace(inference=dataclasses.replace(
        cfg.inference, num_frames=2, clip_stride=1, num_frames_window=4,
    ))
    T, H, W = 2, 64, 96
    K = 4
    rng = np.random.RandomState(0)
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    model = UniVSModel(cfg)
    images = jnp.asarray(rng.rand(1, T, H, W, 3) * 255, jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((1, K), bool))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, images, jnp.arange(T)[None],
        task="detection", text_prompts=tp, cls_emb=cls_emb,
    )["params"]
    return cfg, params, cls_emb, rng, (H, W), K


def test_batched_vis_matches_single_driver():
    from univs_tpu.inference.driver import EntityDriver
    from univs_tpu.inference.serving import BatchedVISServer

    cfg, params, cls_emb, rng, (H, W), K = _setup()
    E = 5
    v0 = (rng.rand(5, H, W, 3) * 255).astype(np.float32)
    v1 = (rng.rand(5, H, W, 3) * 255).astype(np.float32)

    single = EntityDriver(cfg, params, num_classes=K, capacity=E)
    refs = [single.run_vis(v0, cls_emb), single.run_vis(v1, cls_emb)]

    srv = BatchedVISServer(cfg, params, num_classes=K, capacity=E, batch_size=2)
    gots = srv.run_vis([v0, v1], cls_emb)

    for b, (ref, got) in enumerate(zip(refs, gots)):
        assert len(ref) == len(got), b
        for a, g in zip(ref, got):
            assert a["obj_id"] == g["obj_id"], b
            np.testing.assert_allclose(
                a["score"], g["score"], atol=1e-5, rtol=1e-4, err_msg=str(b)
            )
            assert len(a["segmentations"]) == len(g["segmentations"]), b
            same = sum(
                sa == sg for sa, sg in zip(a["segmentations"], g["segmentations"])
            )
            # fp16 emission + vmap'd reductions: allow rare borderline
            # pixels to flip an RLE, but the streams must agree
            assert same >= len(a["segmentations"]) - 1, (b, same)

    # mixed lengths: shorter video's results truncate to its true length
    v2 = (rng.rand(3, H, W, 3) * 255).astype(np.float32)
    got0, got2 = srv.run_vis([v0, v2], cls_emb)
    for res in got2:
        assert len(res["segmentations"]) == 3
    for res in got0:
        assert len(res["segmentations"]) == 5
