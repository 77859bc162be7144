"""COCO RLE encode/decode/IoU with native C++ fast path.

Replaces the reference's pycocotools dependency (used in emitters and
the ytvis evaluator).  The native library (csrc/rle.cpp) is built on
first use with g++; a pure-numpy implementation covers environments
without a toolchain.  Both follow the public COCO RLE spec (column-
major runs, delta/base-32 char encoding).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "librle.so")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    src = os.path.join(_CSRC, "rle.cpp")
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rle_encode.restype = ctypes.c_int
        lib.rle_encode.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_char_p]
        lib.rle_decode.restype = ctypes.c_int
        lib.rle_decode.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_char_p]
        lib.rle_area.restype = ctypes.c_int64
        lib.rle_area.argtypes = [ctypes.c_char_p]
        lib.rle_intersection.restype = ctypes.c_int64
        lib.rle_intersection.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


# ---------------------------------------------------------------------------
# numpy reference implementation
# ---------------------------------------------------------------------------


def _counts_from_mask(mask: np.ndarray) -> np.ndarray:
    flat = np.asfortranarray(mask).reshape(-1, order="F").astype(np.uint8)
    changes = np.nonzero(np.diff(flat))[0] + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    counts = np.diff(bounds)
    if flat.size and flat[0] == 1:
        counts = np.concatenate([[0], counts])
    return counts.astype(np.int64)


def _string_from_counts(counts: np.ndarray) -> str:
    s = []
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = x != -1 if (ch & 0x10) else x != 0
            if more:
                ch |= 0x20
            s.append(chr(ch + 48))
    return "".join(s)


def _counts_from_string(s: str) -> List[int]:
    counts: List[int] = []
    p = 0
    n = len(s)
    while p < n:
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


# ---------------------------------------------------------------------------
# public API (pycocotools-compatible dicts)
# ---------------------------------------------------------------------------


def encode(mask: np.ndarray) -> Dict:
    """Binary mask [H, W] -> {"size": [H, W], "counts": str}."""
    h, w = mask.shape
    m = np.asfortranarray(mask).astype(np.uint8)
    lib = _load_lib()
    if lib is not None:
        buf = ctypes.create_string_buffer(6 * h * w + 16)
        n = lib.rle_encode(m.tobytes(order="F"), h, w, buf)
        counts = buf.raw[:n].decode("ascii")
    else:
        counts = _string_from_counts(_counts_from_mask(m))
    return {"size": [int(h), int(w)], "counts": counts}


def decode(rle: Dict) -> np.ndarray:
    """{"size": [H, W], "counts": str} -> binary mask [H, W] uint8."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, bytes):
        counts = counts.decode("ascii")
    lib = _load_lib()
    if lib is not None:
        buf = ctypes.create_string_buffer(h * w)
        lib.rle_decode(counts.encode("ascii"), h, w, buf)
        m = np.frombuffer(buf.raw, np.uint8, count=h * w)
        return m.reshape(h, w, order="F").copy()
    cnts = _counts_from_string(counts)
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    v = 0
    for c in cnts:
        c = min(c, h * w - pos)
        if v:
            flat[pos : pos + c] = 1
        pos += c
        v = 1 - v
        if pos >= h * w:
            break
    return flat.reshape(h, w, order="F")


def area(rle: Dict) -> int:
    counts = rle["counts"]
    if isinstance(counts, bytes):
        counts = counts.decode("ascii")
    lib = _load_lib()
    if lib is not None:
        return int(lib.rle_area(counts.encode("ascii")))
    cnts = _counts_from_string(counts)
    return int(sum(cnts[1::2]))


def intersection(a: Dict, b: Dict) -> int:
    ca, cb = a["counts"], b["counts"]
    if isinstance(ca, bytes):
        ca = ca.decode("ascii")
    if isinstance(cb, bytes):
        cb = cb.decode("ascii")
    lib = _load_lib()
    if lib is not None:
        return int(lib.rle_intersection(ca.encode("ascii"), cb.encode("ascii")))
    ma, mb = decode(a), decode(b)
    return int(np.logical_and(ma, mb).sum())


def iou(a: Dict, b: Dict) -> float:
    inter = intersection(a, b)
    union = area(a) + area(b) - inter
    return inter / union if union > 0 else 0.0


def encode_mask_batch(masks: np.ndarray) -> List[Dict]:
    """[N, H, W] -> list of RLE dicts."""
    return [encode(m) for m in masks]
