"""tools/demo.py smoke: tiny model over a synthetic frame folder must
write an overlay video (guards the demo CLI against API drift — it had
no coverage when build_cfg's signature changed under it)."""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_demo_tiny_smoke(tmp_path):
    pytest.importorskip("cv2")
    from PIL import Image

    frame_dir = tmp_path / "frames"
    frame_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(5):
        arr = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(frame_dir / f"{i:03d}.jpg")

    from tools.demo import run

    out = str(tmp_path / "out.avi")
    args = types.SimpleNamespace(
        input=str(frame_dir), output=out, weights=None, bank=None,
        dataset_ns="ytvis21", backbone="resnet50", score_thres=-1.0,
        tiny=True, max_frames=5,
    )
    run(args)
    assert os.path.isfile(out) and os.path.getsize(out) > 0
