"""Full-state training resume through the CLI: --resume must restore
params + optimizer + EMA + step from the latest state_* checkpoint and
continue from that iteration (reference: DetectionCheckpointer
resume_or_load, train_net.py:377-393)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from univs_tpu.data.datasets import DatasetSpec, register
from univs_tpu.utils import rle


@pytest.fixture()
def toy_train_tree(tmp_path, monkeypatch):
    monkeypatch.setenv("UNIVS_TPU_DATA_ROOT", str(tmp_path))
    from PIL import Image

    img_dir = tmp_path / "toy" / "imgs" / "v0"
    img_dir.mkdir(parents=True)
    H, W, V = 32, 48, 4
    names = []
    rng = np.random.RandomState(0)
    for i in range(V):
        Image.fromarray((rng.rand(H, W, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{i:05d}.jpg")
        names.append(f"v0/{i:05d}.jpg")
    m = np.zeros((H, W), np.uint8)
    m[4:20, 6:30] = 1
    data = {
        "videos": [{"id": 1, "file_names": names, "height": H, "width": W, "length": V}],
        "categories": [{"id": 1, "name": "a"}],
        "annotations": [{"id": 1, "video_id": 1, "category_id": 1,
                         "segmentations": [rle.encode(m)] * V, "iscrowd": 0}],
    }
    (tmp_path / "toy" / "train.json").write_text(json.dumps(data))
    register(DatasetSpec("ytvis_2021_toyresume", "toy/train.json", "toy/imgs",
                         None, namespace="ytvis21"))
    return tmp_path


def _run(argv):
    import run_net

    old = sys.argv
    sys.argv = ["run_net.py"] + argv
    try:
        run_net.main()
    finally:
        sys.argv = old


def test_train_resume_continues_from_step(toy_train_tree, tmp_path, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    out = str(tmp_path / "out")
    common = ["--train", "--tiny", "--datasets", "ytvis_2021_toyresume:1.0",
              "--batch-size", "8", "--image-size", "64",
              "--ckpt-every", "2", "--output", out]
    _run(common + ["--max-iter", "2"])
    assert os.path.isdir(os.path.join(out, "state_2"))

    _run(common + ["--max-iter", "4", "--resume"])
    out_text = capsys.readouterr().out
    # restored the full state at the recorded step ...
    assert "resumed full train state" in out_text and "(iter 2)" in out_text
    # ... and continued from there: iterations 2-3 ran, writing state_4
    assert os.path.isdir(os.path.join(out, "state_4"))
