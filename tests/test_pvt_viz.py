"""PVTv2 backbone + visualization writer tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from univs_tpu.models.backbones.pvt import PVTv2
from univs_tpu.utils.visualization import overlay_instances, save_vos_video


def test_pvt_shapes():
    m = PVTv2(dims=(16, 32, 64, 128), depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8))
    x = jnp.ones((1, 64, 96, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out["res2"].shape == (1, 16, 24, 16)
    assert out["res5"].shape == (1, 2, 3, 128)
    assert all(bool(jnp.isfinite(v).all()) for v in out.values())


def test_vos_png_roundtrip(tmp_path):
    from PIL import Image

    labels = np.zeros((2, 8, 8), np.uint8)
    labels[0, :4] = 1
    labels[1, 4:] = 2
    save_vos_video(labels, str(tmp_path), file_names=["a/0001.jpg", "a/0002.jpg"])
    p = tmp_path / "0001.png"
    assert p.exists()
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, labels[0])


def test_overlay():
    frame = np.zeros((8, 8, 3), np.uint8)
    m = np.zeros((8, 8), np.uint8)
    m[:4] = 1
    out = overlay_instances(frame, [m])
    assert out[0, 0].sum() > 0 and out[7, 7].sum() == 0
