"""RLE codec tests: roundtrip, C++ vs numpy agreement, IoU."""

import numpy as np
import pytest

from univs_tpu.utils import rle


@pytest.mark.parametrize("seed,h,w", [(0, 7, 9), (1, 64, 48), (2, 1, 1), (3, 100, 3)])
def test_roundtrip(seed, h, w):
    rng = np.random.RandomState(seed)
    m = (rng.rand(h, w) > 0.5).astype(np.uint8)
    enc = rle.encode(m)
    dec = rle.decode(enc)
    np.testing.assert_array_equal(m, dec)
    assert rle.area(enc) == int(m.sum())


def test_empty_and_full():
    z = np.zeros((5, 6), np.uint8)
    f = np.ones((5, 6), np.uint8)
    assert rle.area(rle.encode(z)) == 0
    assert rle.area(rle.encode(f)) == 30
    np.testing.assert_array_equal(rle.decode(rle.encode(z)), z)
    np.testing.assert_array_equal(rle.decode(rle.encode(f)), f)


def test_cpp_matches_numpy():
    lib = rle._load_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(4)
    m = (rng.rand(33, 17) > 0.3).astype(np.uint8)
    fast = rle.encode(m)
    slow_counts = rle._string_from_counts(rle._counts_from_mask(m))
    assert fast["counts"] == slow_counts


def test_iou_and_intersection():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b[3:8] = 1
    ea, eb = rle.encode(a), rle.encode(b)
    assert rle.intersection(ea, eb) == 20
    assert abs(rle.iou(ea, eb) - 20 / 80) < 1e-9


def test_known_simple_encoding():
    # column-major: mask with first 3 pixels of column 0 set
    m = np.zeros((4, 2), np.uint8)
    m[0:3, 0] = 1
    enc = rle.encode(m)
    dec_counts = rle._counts_from_string(enc["counts"])
    assert dec_counts == [0, 3, 5]
