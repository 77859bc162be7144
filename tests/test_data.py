"""Data pipeline test: synthetic cocovid JSON -> mapper -> TrainBatch."""

import json
import os

import numpy as np
import pytest

from univs_tpu.data.augment import resize_shortest_edge, sample_lsj_transform
from univs_tpu.data.loader import CombinedLoader, collate_train_batch, dataset_iterator
from univs_tpu.data.mapper import EvalVideoMapper, TrainMapperConfig, TrainVideoMapper
from univs_tpu.data.ytvis import load_ytvis_json
from univs_tpu.utils import rle


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    img_dir = root / "imgs"
    img_dir.mkdir()
    from PIL import Image

    H, W, V = 48, 64, 4
    file_names = []
    for i in range(V):
        arr = (np.random.RandomState(i).rand(H, W, 3) * 255).astype(np.uint8)
        name = f"v0/{i:05d}.jpg"
        (img_dir / "v0").mkdir(exist_ok=True)
        Image.fromarray(arr).save(img_dir / name)
        file_names.append(name)

    def seg(y0, y1, x0, x1):
        m = np.zeros((H, W), np.uint8)
        m[y0:y1, x0:x1] = 1
        return rle.encode(m)

    data = {
        "videos": [{"id": 1, "file_names": file_names, "height": H, "width": W, "length": V}],
        "categories": [{"id": 7, "name": "cat"}, {"id": 9, "name": "dog"}],
        "annotations": [
            {"id": 1, "video_id": 1, "category_id": 7,
             "segmentations": [seg(5, 20, 5, 25)] * V, "iscrowd": 0},
            {"id": 2, "video_id": 1, "category_id": 9,
             "segmentations": [None, seg(25, 40, 30, 55), seg(25, 40, 30, 55), None], "iscrowd": 0},
        ],
    }
    jpath = root / "train.json"
    jpath.write_text(json.dumps(data))
    return str(jpath), str(img_dir)


def test_load_and_train_mapper(synthetic_dataset):
    jpath, img_root = synthetic_dataset
    records = load_ytvis_json(jpath, img_root, dataset_name="toy")
    assert len(records) == 1
    rec = records[0]
    assert rec["task"] == "detection"
    assert len(rec["annotations"]) == 2
    assert rec["annotations"][0]["category_id"] == 1  # contiguous 1-based

    mcfg = TrainMapperConfig(num_frames=2, image_size=64, max_instances=4)
    mapper = TrainVideoMapper(mcfg, seed=0)
    sample = mapper(rec)
    assert sample is not None
    assert sample["images"].shape == (2, 64, 64, 3)
    assert sample["masks"].shape == (4, 2, 16, 16)
    assert sample["valid"].any()
    assert ((sample["ids"] >= -1)).all()


def test_collate_and_combined_loader(synthetic_dataset):
    jpath, img_root = synthetic_dataset
    records = load_ytvis_json(jpath, img_root, dataset_name="toy")
    mcfg = TrainMapperConfig(num_frames=2, image_size=64, max_instances=4)
    mapper = TrainVideoMapper(mcfg, seed=1)
    bank = np.random.RandomState(0).randn(5, 16).astype(np.float32)
    bank_valid = np.ones(5, bool)

    collate = lambda b: collate_train_batch(b, bank, bank_valid, prompt_slots=4)
    it = dataset_iterator(records, mapper, batch_size=1, collate=collate, seed=0)
    batch = next(it)
    assert batch.images.shape == (1, 2, 64, 64, 3)
    assert batch.prompt_category_embs.shape == (1, 4, 16)
    assert bool(batch.prompt_category_valid.all())
    # slots bound to valid targets first, negatives get -1
    poi = np.asarray(batch.targets.prompt_obj_ids[0])
    assert (poi >= 0).sum() == int(np.asarray(batch.targets.valid[0]).sum())

    combined = CombinedLoader([it, it], [0.7, 0.3], seed=0)
    b2 = next(iter(combined))
    assert b2.images.shape == (1, 2, 64, 64, 3)


def test_eval_mapper(synthetic_dataset):
    jpath, img_root = synthetic_dataset
    records = load_ytvis_json(jpath, img_root, dataset_name="toy")
    mapper = EvalVideoMapper(short=64, max_size=128, size_divisibility=32)
    s = mapper(records[0])
    assert s["images"].shape[0] == 4
    assert s["images"].shape[1] % 32 == 0 and s["images"].shape[2] % 32 == 0
    assert s["out_size"] == (48, 64)


def test_catalog():
    from univs_tpu.data.datasets import get_spec, list_datasets

    names = list_datasets()
    assert "ytvis_2019_train" in names and "sot_davis17_val" in names
    assert get_spec("rvos-refytb-val").task == "grounding"
    assert get_spec("vipseg_panoptic_val").evaluator_type == "vps"
    assert len(names) >= 30
