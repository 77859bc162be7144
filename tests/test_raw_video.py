"""Raw-video (.mp4) dataset path: decode inside the mappers
(reference: dataset_mapper_uni_vid.py:330-345)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from univs_tpu.data.mapper import EvalVideoMapper, TrainMapperConfig, TrainVideoMapper
from univs_tpu.data.video import read_video_frames, video_num_frames


@pytest.fixture(scope="module")
def tiny_mp4(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    h, w, n = 48, 64, 8
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5, (w, h))
    assert wr.isOpened(), "cv2 mp4 writer unavailable"
    rng = np.random.RandomState(0)
    for i in range(n):
        frame = np.full((h, w, 3), i * 20, np.uint8)
        frame[10:20, 10:30] = rng.randint(0, 255, (10, 20, 3), np.uint8)
        wr.write(frame)
    wr.release()
    return path, n, (h, w)


def test_read_video_frames(tiny_mp4):
    path, n, (h, w) = tiny_mp4
    assert video_num_frames(path) == n
    frames = read_video_frames(path)
    assert len(frames) == n and frames[0].shape == (h, w, 3)
    some = read_video_frames(path, [1, 4, 100])
    assert len(some) == 3  # out-of-range index repeats the last frame
    np.testing.assert_array_equal(some[2], frames[-1])
    # duplicate indices (short-video replicate-to-T in the train mapper)
    # must be preserved in caller order, one frame per requested index
    dup = read_video_frames(path, [0, 1, 2, 2, 2])
    assert len(dup) == 5
    np.testing.assert_array_equal(dup[3], dup[2])
    np.testing.assert_array_equal(dup[4], dup[2])
    np.testing.assert_array_equal(dup[0], frames[0])
    # unsorted request comes back in caller order
    rev = read_video_frames(path, [3, 0])
    np.testing.assert_array_equal(rev[0], frames[3])
    np.testing.assert_array_equal(rev[1], frames[0])


def test_eval_mapper_raw_video(tiny_mp4):
    path, n, (h, w) = tiny_mp4
    m = EvalVideoMapper(short=32, max_size=64, size_divisibility=16)
    rec = {
        "video_path": path,
        "video_id": 7,
        "dataset_name": "custom_videos",
        "task": "detection",
    }
    out = m(rec)
    assert out["video_len"] == n
    assert out["images"].shape[0] == n
    assert out["out_size"] == (h, w)


def test_train_mapper_raw_video(tiny_mp4):
    path, n, (h, w) = tiny_mp4
    cfg = TrainMapperConfig(num_frames=2, image_size=32, max_instances=4)
    m = TrainVideoMapper(cfg, seed=0)
    rec = {
        "video_path": path,
        "video_len": n,
        "video_id": 7,
        "height": h,
        "width": w,
        "dataset_name": "custom_videos",
        "task": "detection",
        # one full-frame box annotation so targets are non-empty
        "annotations": [
            {
                "id": 1,
                "category_id": 1,
                "segmentations": [
                    {"size": [h, w], "counts": [0, h * w]} for _ in range(n)
                ],
            }
        ],
    }
    out = m(rec)
    assert out is not None
    assert out["images"].shape == (2, 32, 32, 3)
    assert out["valid"][0]
