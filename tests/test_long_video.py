"""Stage-3 long-video training loss: runs, finite, grads flow."""

import numpy as np
import jax
import jax.numpy as jnp

from univs_tpu.config import TrainConfig, tiny_test_config
from univs_tpu.losses.criterion import TrainTargets, UniCriterion
from univs_tpu.models.univs import UniVSModel
from univs_tpu.parallel.long_video import clip_starts, long_video_loss
from univs_tpu.structures import TextPrompts


def test_clip_starts():
    assert clip_starts(7, 3) == [0, 2, 4]
    assert clip_starts(7, 5) == [0, 2]
    assert clip_starts(5, 5) == [0]


def test_long_video_loss_runs():
    cfg = tiny_test_config().replace(
        num_frames=2,
        train=TrainConfig(num_points=32, oversample_ratio=2.0),
    )
    model = UniVSModel(cfg)
    B, Tv, H, W = 1, 4, 64, 96
    N = cfg.prompt.num_max_instances
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, Tv, H, W, 3) * 255, jnp.float32)
    fi = jnp.broadcast_to(jnp.arange(Tv)[None], (B, Tv))

    K = 5
    cls_emb = jnp.asarray(rng.randn(K, cfg.decoder.clip_cls_emb_dim), jnp.float32)
    tp = TextPrompts(embs=cls_emb[None, :, None, :], valid=jnp.ones((B, K), bool))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        images[:, :2], fi[:, :2], task="detection", text_prompts=tp,
        cls_emb=cls_emb, train=True,
    )["params"]

    masks = jnp.asarray(rng.rand(B, N, Tv, 16, 24) > 0.8, jnp.float32)
    targets = TrainTargets(
        labels=jnp.ones((B, N), jnp.int32),
        ids=jnp.broadcast_to(jnp.arange(N)[None, :, None], (B, N, Tv)).astype(jnp.int32),
        masks=masks,
        valid=jnp.array([[True, True, True, False]]),
        prompt_obj_ids=jnp.zeros((B, N), jnp.int32),
    )
    criterion = UniCriterion(cfg.train, cfg.decoder.num_queries, cfg.num_frames)

    @jax.jit
    def loss_fn(params):
        total, logged = long_video_loss(
            model, params, criterion, images, fi, targets, cfg, jax.random.PRNGKey(2)
        )
        return total

    v = loss_fn(params)
    assert bool(jnp.isfinite(v)), float(v)
    g = jax.grad(lambda p: loss_fn(p))(params)
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0
