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


def test_demo_text_prompts(tmp_path):
    """--text runs the grounding (RefVOS) driver on a raw video: one
    tracked overlay per expression (the reference CUSTOM_VIDEOS_TEXT
    flow).  No CLIP weights -> the seeded random-prompt smoke path."""
    pytest.importorskip("cv2")
    from PIL import Image

    frame_dir = tmp_path / "frames"
    frame_dir.mkdir()
    rng = np.random.RandomState(3)
    for i in range(4):
        arr = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(frame_dir / f"{i:03d}.jpg")

    from tools.demo import run

    out = str(tmp_path / "out_text.avi")
    args = types.SimpleNamespace(
        input=str(frame_dir), output=out, weights=None, bank=None,
        dataset_ns="ytvis21", backbone="resnet50", score_thres=-1.0,
        tiny=True, max_frames=4, text=["a red thing", "a dog"],
        clip_weights=None,
    )
    run(args)
    assert os.path.isfile(out) and os.path.getsize(out) > 0


def test_demo_batched_serving(tmp_path, capsys):
    """--batch N: lockstep-batched VIS over same-resolution inputs
    (BatchedVISServer), incl. a short final chunk padded by repetition."""
    pytest.importorskip("cv2")
    from PIL import Image

    rng = np.random.RandomState(5)
    dirs = []
    for v in range(3):  # 3 videos, batch 2 -> one full + one padded chunk
        d = tmp_path / f"bframes{v}"
        d.mkdir()
        for i in range(4):
            arr = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i:03d}.jpg")
        dirs.append(str(d))

    from tools.demo import run

    outdir = tmp_path / "bouts"
    args = types.SimpleNamespace(
        input=dirs, output=str(outdir), weights=None, bank=None,
        dataset_ns="ytvis21", backbone="resnet50", score_thres=-1.0,
        tiny=True, max_frames=4, batch=2,
    )
    run(args)
    for v in range(3):
        o = os.path.join(outdir, f"bframes{v}_overlay.avi")
        assert os.path.isfile(o) and os.path.getsize(o) > 0
    assert capsys.readouterr().out.count("wrote") == 3


def test_demo_first_frame_mask_vos(tmp_path, capsys):
    """--mask runs prompt-guided VOS from a DAVIS-style first-frame
    mask PNG: one tracked overlay per object id."""
    pytest.importorskip("cv2")
    from PIL import Image

    frame_dir = tmp_path / "frames"
    frame_dir.mkdir()
    rng = np.random.RandomState(4)
    H, W = 48, 64
    for i in range(4):
        arr = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(frame_dir / f"{i:03d}.jpg")
    lab = np.zeros((H, W), np.uint8)
    lab[8:20, 10:30] = 1
    lab[30:44, 34:60] = 2
    mask_path = tmp_path / "first.png"
    # NOTE: Image.fromarray(lab, mode="P") silently collapses indices;
    # grayscale write preserves the object ids (np.array(Image.open)
    # reads DAVIS palette PNGs as indices either way)
    Image.fromarray(lab).save(mask_path)

    from tools.demo import run

    out = str(tmp_path / "out_vos.avi")
    args = types.SimpleNamespace(
        input=str(frame_dir), output=out, weights=None, bank=None,
        dataset_ns="ytvis21", backbone="resnet50", score_thres=-1.0,
        tiny=True, max_frames=4, mask=str(mask_path),
    )
    run(args)
    assert os.path.isfile(out) and os.path.getsize(out) > 0
    assert "2 entities" in capsys.readouterr().out  # both object ids tracked


def test_show_results_from_json(tmp_path):
    """tools/show_results.py: render saved YTVIS-format predictions over
    the dataset frames (reference demo/show_mask_from_json_video.py)."""
    pytest.importorskip("cv2")
    import json

    from PIL import Image

    from univs_tpu.utils import rle

    H, W, V = 40, 56, 3
    img_dir = tmp_path / "frames" / "v1"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(2)
    names = []
    for i in range(V):
        Image.fromarray((rng.rand(H, W, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{i:02d}.jpg")
        names.append(f"v1/{i:02d}.jpg")
    videos_json = tmp_path / "valid.json"
    videos_json.write_text(json.dumps({
        "videos": [{"id": 7, "file_names": names, "height": H, "width": W}]}))

    m = np.zeros((H, W), np.uint8)
    m[5:20, 8:30] = 1
    results = [
        {"video_id": 7, "score": 0.9, "category_id": 1,
         "segmentations": [rle.encode(m)] * V},
        {"video_id": 7, "score": 0.1, "category_id": 2,  # below conf
         "segmentations": [rle.encode(m)] * V},
        {"video_id": 7, "score": 0.8, "category_id": 1,  # None frame ok
         "segmentations": [rle.encode(m), None, rle.encode(m)]},
    ]
    res_path = tmp_path / "results.json"
    res_path.write_text(json.dumps(results))

    from tools.show_results import show_results

    written = show_results(str(res_path), str(videos_json),
                           str(tmp_path / "frames"), str(tmp_path / "viz"),
                           conf=0.3)
    assert len(written) == 1
    out_path, n_frames, n_kept = written[0]
    assert os.path.getsize(out_path) > 0 and n_frames == V and n_kept == 2


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
