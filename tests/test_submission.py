"""Codalab submission emitters: tree layout diff vs reference-format
fixtures (reference: inference_video_vos.py:622-714)."""

import os
import zipfile

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from univs_tpu.evaluation.submission import (
    emit_rvos_submission,
    emit_vos_submission,
    zip_submission,
)


def test_vos_submission_tree(tmp_path):
    out = str(tmp_path)
    labels = np.zeros((3, 16, 20), np.uint8)
    labels[0, 2:6, 3:9] = 1
    labels[1, 4:8, 5:11] = 2
    files = ["00000.jpg", "00005.jpg", "00010.jpg"]
    emit_vos_submission(out, "bike-packing", files, labels, obj_ids=[1, 2])

    # reference layout: inference/Annotations/{video}/{frame}.png
    expect = {
        f"inference/Annotations/bike-packing/{f.replace('.jpg', '.png')}" for f in files
    }
    got = set()
    for dirpath, _, fs in os.walk(out):
        for f in fs:
            got.add(os.path.relpath(os.path.join(dirpath, f), out))
    assert got == expect

    # palette PNG, pixel value = object id
    im = Image.open(os.path.join(out, "inference/Annotations/bike-packing/00000.png"))
    assert im.mode == "P"
    arr = np.asarray(im)
    assert set(np.unique(arr)) == {0, 1}
    im2 = np.asarray(Image.open(os.path.join(out, "inference/Annotations/bike-packing/00005.png")))
    assert set(np.unique(im2)) == {0, 2}


def test_rvos_submission_tree_and_zip(tmp_path):
    out = str(tmp_path)
    masks = np.zeros((2, 2, 8, 10), np.uint8)
    masks[0, :, 1:4, 2:6] = 1
    masks[1, 1, 5:7, 5:9] = 1
    files = ["00000.jpg", "00005.jpg"]
    emit_rvos_submission(out, "0062a9", ["0", "1"], files, masks)

    expect = {
        f"inference/Annotations/0062a9/{e}/{f.replace('.jpg', '.png')}"
        for e in ("0", "1") for f in files
    }
    got = set()
    for dirpath, _, fs in os.walk(out):
        for f in fs:
            got.add(os.path.relpath(os.path.join(dirpath, f), out))
    assert got == expect

    # binary 0/255 grayscale (reference: m * 255)
    arr = np.asarray(Image.open(os.path.join(out, "inference/Annotations/0062a9/0/00000.png")))
    assert set(np.unique(arr)) == {0, 255}

    zp = zip_submission(out)
    with zipfile.ZipFile(zp) as zf:
        names = set(zf.namelist())
    assert names == {
        f"Annotations/0062a9/{e}/{f.replace('.jpg', '.png')}"
        for e in ("0", "1") for f in files
    }


def test_vps_submission_layout(tmp_path):
    from univs_tpu.evaluation.submission import (
        emit_vps_submission,
        id2rgb,
        write_vps_pred_json,
    )

    out = str(tmp_path)
    pan = np.zeros((2, 10, 12), np.int32)
    pan[0, 2:5, 3:8] = 1
    pan[:, 6:9, 1:5] = 2
    segs = [
        {"id": 1, "isthing": True, "category_id": 3},
        {"id": 2, "isthing": False, "category_id": 7},
    ]
    rec = emit_vps_submission(out, "vid01", ["f0.jpg", "f1.jpg"], pan, segs)
    assert rec["video_id"] == "vid01"
    assert len(rec["annotations"]) == 2
    # frame 0 has both segments, frame 1 only the stuff one
    a0 = rec["annotations"][0]["segments_info"]
    a1 = rec["annotations"][1]["segments_info"]
    assert {d["id"] for d in a0} == {1, 2}
    assert {d["id"] for d in a1} == {2}
    assert a0[0]["category_id"] in (2, 6)  # 0-based in the json

    # png colors encode the segment id (rgb2id convention)
    img = np.asarray(Image.open(os.path.join(out, "pan_pred", "vid01", "f0.png")))
    rgb = tuple(img[3, 4])
    assert rgb == id2rgb(1)
    assert tuple(img[7, 2]) == id2rgb(2)
    assert tuple(img[0, 0]) == (0, 0, 0)

    path = write_vps_pred_json(out, [rec])
    import json
    with open(path) as f:
        j = json.load(f)
    assert j["annotations"][0]["video_id"] == "vid01"
