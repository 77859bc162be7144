"""tools/validate_datasets.py against synthetic good/broken trees."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from univs_tpu.data.datasets import DatasetSpec, register
from univs_tpu.utils import rle


@pytest.fixture()
def tree(tmp_path, monkeypatch):
    monkeypatch.setenv("UNIVS_TPU_DATA_ROOT", str(tmp_path))
    from PIL import Image

    img_dir = tmp_path / "toy" / "imgs" / "v0"
    img_dir.mkdir(parents=True)
    H, W = 16, 24
    names = []
    for i in range(2):
        arr = (np.random.RandomState(i).rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:05d}.jpg")
        names.append(f"v0/{i:05d}.jpg")
    m = np.zeros((H, W), np.uint8)
    m[2:8, 3:9] = 1
    data = {
        "videos": [{"id": 1, "file_names": names, "height": H, "width": W, "length": 2}],
        "categories": [{"id": 1, "name": "a"}],
        "annotations": [{"id": 1, "video_id": 1, "category_id": 1,
                         "segmentations": [rle.encode(m)] * 2, "iscrowd": 0}],
    }
    (tmp_path / "toy" / "train.json").write_text(json.dumps(data))
    return tmp_path, data


def test_validator_ok_missing_and_broken(tree):
    import validate_datasets as vd

    tmp_path, data = tree
    register(DatasetSpec("toy_ok", "toy/train.json", "toy/imgs", "ytvis", namespace=None))
    register(DatasetSpec("toy_gone", "toy/none.json", "toy/nowhere", "ytvis"))
    assert vd.check_one("toy_ok", parse=True) == []
    probs = vd.check_one("toy_gone", parse=True)
    assert len(probs) == 2 and all(p.startswith("missing") for p in probs)

    # category id outside the namespace row count -> flagged
    bad = dict(data)
    bad["categories"] = [{"id": 99, "name": "zz"}]
    (tmp_path / "toy" / "bad.json").write_text(json.dumps(bad))
    register(DatasetSpec("toy_badcat", "toy/bad.json", "toy/imgs", "ytvis",
                         namespace="ytvis21"))
    probs = vd.check_one("toy_badcat", parse=True)
    assert any("category ids outside" in p for p in probs)

    # frame file listed in json but absent on disk -> flagged
    gone = dict(data)
    gone["videos"] = [dict(data["videos"][0], file_names=["v0/zzz.jpg", "v0/zzz2.jpg"])]
    (tmp_path / "toy" / "gone_frames.json").write_text(json.dumps(gone))
    register(DatasetSpec("toy_noframes", "toy/gone_frames.json", "toy/imgs", "ytvis"))
    probs = vd.check_one("toy_noframes", parse=True)
    assert any("frames not under" in p for p in probs)
