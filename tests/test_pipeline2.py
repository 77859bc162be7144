"""Two-chip pipelined serving: encode on device 0, decode on device 1
(EntityDriver pipeline_devices) must reproduce the single-device driver
exactly — same math, different placement + eager next-window prefetch.
Runs on the virtual 8-device CPU mesh from conftest.py.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


def test_pipelined_vis_matches_single_device():
    from univs_tpu.inference.driver import EntityDriver

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    cfg, params, cls_emb, rng, (H, W), K = _setup()
    # 11 frames with window 4 -> several window installs + prefetches
    video = (rng.rand(11, H, W, 3) * 255).astype(np.float32)

    single = EntityDriver(cfg, params, num_classes=K, capacity=5)
    ref = single.run_vis(video, cls_emb)

    d0, d1 = jax.devices()[:2]
    piped = EntityDriver(cfg, params, num_classes=K, capacity=5,
                         pipeline_devices=(d0, d1))
    got = piped.run_vis(video, cls_emb)

    assert len(ref) == len(got) > 0
    for a, g in zip(ref, got):
        assert a["obj_id"] == g["obj_id"]
        np.testing.assert_allclose(a["score"], g["score"], atol=1e-5, rtol=1e-4)
        assert a["segmentations"] == g["segmentations"]
