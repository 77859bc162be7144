"""Device-side packed mask emission parity.

run_vis moved the reference's host-side upsample law
(save_results_vis, inference_video_entity.py:932-939: bilinear to the
padded size -> crop -> bilinear to the output size -> threshold > 0)
onto the device (driver._upsample_threshold_pack) and transfers
bit-packed masks.  These tests pin:

1. the traced law == the host torch law (_upsample_and_threshold) on
   random mixed-sign logits, including crop + second resize;
2. bitpack/unpackbits round trip;
3. assemble_vis_results produces IDENTICAL RLEs through the packed
   path (with entity-row slicing) and the fp16-logit host path.
"""

import numpy as np
import jax.numpy as jnp

from univs_tpu.inference.driver import (
    _pack_bits,
    _upsample_and_threshold,
    _upsample_threshold_pack,
    assemble_vis_results,
)


def test_pack_bits_roundtrip():
    rng = np.random.RandomState(0)
    bits = rng.rand(3, 5, 17, 43) > 0.5  # W=43 exercises padding
    packed = np.asarray(_pack_bits(jnp.asarray(bits)))
    assert packed.shape == (3, 5, 17, 6)
    un = np.unpackbits(packed, axis=-1)[..., :43]
    np.testing.assert_array_equal(un.astype(bool), bits)


def test_packed_emission_matches_host():
    rng = np.random.RandomState(1)
    logits = rng.randn(4, 3, 16, 24).astype(np.float32)  # [E, n, H4, W4]
    padded = (64, 96)
    image = (60, 89)
    out = (120, 178)
    packed = np.asarray(
        _upsample_threshold_pack(jnp.asarray(logits), image, out, padded)
    )
    for e in range(4):
        ref = _upsample_and_threshold(logits[e], image, out, padded)
        got = np.unpackbits(packed[e], axis=-1)[..., : out[1]]
        np.testing.assert_array_equal(got, ref)


def test_assemble_packed_equals_host_path():
    rng = np.random.RandomState(2)
    E, V, H4, W4 = 6, 7, 8, 12
    H, W = H4 * 4, W4 * 4
    win1 = rng.randn(E, 4, H4, W4).astype(np.float16)
    win2 = rng.randn(E, 3, H4, W4).astype(np.float16)
    starts = [0, 4]
    scores = [rng.rand(E, 5).astype(np.float32)] * 2
    valid = np.array([1, 0, 1, 1, 0, 1], bool)
    qsum = rng.rand(E).astype(np.float32)
    sizes = ((H, W), (H, W), (H, W))

    ref = assemble_vis_results([win1, win2], starts, scores, valid, qsum,
                               V, *sizes)

    # packed path with entity-row slicing (rows = valid indices, padded)
    rows = np.flatnonzero(valid)
    idx = np.concatenate([rows, np.repeat(rows[-1:], (-rows.size) % 8)])
    p1 = np.asarray(_upsample_threshold_pack(
        jnp.asarray(win1, jnp.float32), *sizes))[idx]
    p2 = np.asarray(_upsample_threshold_pack(
        jnp.asarray(win2, jnp.float32), *sizes))[idx]
    got = assemble_vis_results([p1, p2], starts, scores, valid, qsum,
                               V, *sizes, packed_width=W, entity_rows=rows)

    assert len(got) == len(ref) == int(valid.sum())
    for a, b in zip(got, ref):
        assert a["obj_id"] == b["obj_id"]
        np.testing.assert_allclose(a["score"], b["score"])
        assert a["segmentations"] == b["segmentations"]
