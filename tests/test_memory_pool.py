"""Memory-pool mechanics: admission, accumulation, ring shifts, reads."""

import numpy as np
import jax
import jax.numpy as jnp

from univs_tpu.inference import memory_pool as mp


def _pool(E=4, K=3, C=8, hw=(8, 12), W=6, R=4):
    return mp.create_entity_memory(E, K, C, hw, W, R, embd_history=4, prompt_history=3)


def test_admit_and_capacity():
    pool = _pool()
    Qc, T = 3, 2
    rng = np.random.RandomState(0)
    masks = jnp.array(rng.randn(Qc, T, 8, 12), jnp.float32)
    logits = jnp.array(rng.rand(Qc, 3), jnp.float32)
    embds = jnp.array(rng.randn(Qc, 8), jnp.float32)
    q = jnp.ones((Qc,))
    pool = mp.admit_entities(pool, jnp.int32(0), jnp.int32(0), masks, logits, embds, q,
                             is_new=jnp.array([True, False, True]))
    assert int(pool.valid.sum()) == 2
    assert int(pool.logits_count.sum()) == 2
    # admitted entities' last logits match
    v = np.asarray(pool.valid)
    np.testing.assert_allclose(
        np.sort(np.asarray(pool.logits_last[v]).sum(-1)),
        np.sort(np.asarray(logits[jnp.array([0, 2])]).sum(-1)), rtol=1e-5,
    )
    # overflow: admit 5 more -> capped at capacity 4
    pool = mp.admit_entities(pool, jnp.int32(0), jnp.int32(1),
                             jnp.tile(masks, (2, 1, 1, 1))[:5],
                             jnp.tile(logits, (2, 1))[:5],
                             jnp.tile(embds, (2, 1))[:5],
                             jnp.ones((5,)), is_new=jnp.ones((5,), bool))
    assert int(pool.valid.sum()) == 4


def test_accumulate_and_shift():
    pool = _pool()
    E, T = 4, 2
    masks = jnp.ones((E, T, 8, 12)) * 2.0
    embds = jnp.ones((E, 8))
    pool = pool.replace(valid=jnp.array([True, True, False, False]))
    update = jnp.array([True, False, False, False])
    pool = mp.accumulate_clip_masks(pool, jnp.int32(1), masks, embds, update, jnp.ones((E,)))
    assert float(pool.mask_logits[0, 1].mean()) == 2.0
    assert float(pool.mask_logits[0, 0].mean()) == 0.0
    assert float(pool.mask_logits[1].sum()) == 0.0
    assert float(pool.occurrence[0, 1]) == 1.0
    # embds written at last ring slot for updated entity
    assert float(jnp.abs(pool.embds[0, -1]).sum()) > 0
    assert float(jnp.abs(pool.embds[1, -1]).sum()) == 0

    shifted = mp.shift_clip(pool, stride=1)
    # logits history mean counts increase only for valid entities
    assert int(shifted.logits_count[0]) == int(pool.logits_count[0]) + 1
    assert int(shifted.logits_count[2]) == 0

    evicted = mp.evict_window(pool, out_frames=2)
    assert float(evicted.mask_logits[0, 0].sum()) > 0  # old frame 2.. wait frame1 -> idx -1? check shape
    assert int(evicted.window_start) == 2


def test_prompt_ring_and_read():
    pool = _pool()
    E, R, C = 4, 4, 8
    feats = jnp.ones((E, R, C))
    pe = jnp.ones((E, R, C)) * 2
    valid = jnp.ones((E, R), bool)
    pool = pool.replace(valid=jnp.array([True, False, False, False]))
    pool = mp.write_prompt_frame(pool, 2, feats, pe, valid, pool.valid)
    kv, kv_pe, kv_valid = mp.read_prompt_kv(pool, num_prev=3)
    # first-appearance set filled + last ring slot
    assert kv.shape == (E, (1 + 3) * R, C)
    assert bool(kv_valid[0].any())
    assert not bool(kv_valid[1].any())
    # shift: the written frame moves left
    shifted = mp.shift_clip(pool, stride=1)
    assert bool(shifted.prompt_valid[0, :, 1].all())
    assert not bool(shifted.prompt_valid[0, :, 2].any())


def test_consistency_gate():
    pool = _pool()
    e = jnp.zeros((4, 4, 8)).at[0, :, 0].set(1.0).at[1, :, 1].set(1.0)
    pool = pool.replace(embds=e, valid=jnp.array([True, True, False, False]))
    cur = jnp.zeros((4, 2, 8)).at[0, :, 0].set(1.0).at[1, :, 0].set(1.0)
    ok, sim = mp.consistency_gate(pool, cur, num_prev=3, threshold=jnp.float32(0.5))
    assert bool(ok[0])       # same direction
    assert not bool(ok[1])   # orthogonal
    assert not bool(ok[2])   # invalid slot


def test_match_candidates():
    pool = _pool()
    e = jnp.zeros((4, 4, 8)).at[0, :, 0].set(1.0).at[1, :, 1].set(1.0)
    pool = pool.replace(embds=e, valid=jnp.array([True, True, False, False]))
    cand = jnp.zeros((3, 2, 8)).at[0, :, 1].set(1.0).at[1, :, 0].set(1.0)
    c2s, sim = mp.match_candidates_to_memory(pool, cand, jnp.array([True, True, False]), 0.1)
    c2s = np.asarray(c2s)
    assert c2s[0] == 1 and c2s[1] == 0  # crossed match
    assert c2s[2] == -1 or float(sim[2]) <= 0
