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


def test_demo_parallel_multi_input(tmp_path, capsys):
    """--parallel over two inputs: the AsyncRenderPipeline must write
    both overlay videos (render overlapped with inference) and report
    them in submission order (reference demo/predictor.py AsyncPredictor
    ordered get())."""
    pytest.importorskip("cv2")
    from PIL import Image

    rng = np.random.RandomState(1)
    dirs = []
    for v in range(2):
        d = tmp_path / f"frames{v}"
        d.mkdir()
        for i in range(4):
            arr = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i:03d}.jpg")
        dirs.append(str(d))

    from tools.demo import run

    outdir = tmp_path / "outs"
    args = types.SimpleNamespace(
        input=dirs, output=str(outdir), weights=None, bank=None,
        dataset_ns="ytvis21", backbone="resnet50", score_thres=-1.0,
        tiny=True, max_frames=4, parallel=True, num_render_workers=2,
    )
    run(args)
    outs = [os.path.join(outdir, f"frames{v}_overlay.avi") for v in range(2)]
    for o in outs:
        assert os.path.isfile(o) and os.path.getsize(o) > 0
    text = capsys.readouterr().out
    assert text.index("frames0_overlay") < text.index("frames1_overlay")
