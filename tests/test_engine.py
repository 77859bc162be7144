"""Full-pipeline integration: synthetic video dataset -> clip-streaming
drivers -> evaluators, with the tiny model (random weights)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univs_tpu.config import (
    InferenceConfig,
    tiny_test_config,
)
from univs_tpu.data.mapper import EvalVideoMapper
from univs_tpu.engine import _eval_vos, _eval_ytvis
from univs_tpu.models.univs import UniVSModel
from univs_tpu.structures import TextPrompts
from univs_tpu.utils import rle


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_test_config()
    cfg = cfg.replace(
        inference=InferenceConfig(
            num_frames=2, clip_stride=1, num_frames_window=4, min_size_test=64,
            size_divisibility=32, apply_cls_thres=0.0, topk_per_video=5,
            max_num_instances=6,
        )
    )
    model = UniVSModel(cfg)
    K = 5
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 2, 64, 96, 3) * 255, jnp.float32)
    cls_bank = rng.randn(K, cfg.decoder.clip_cls_emb_dim).astype(np.float32)
    tp = TextPrompts(embs=jnp.asarray(cls_bank)[None, :, None, :], valid=jnp.ones((1, K), bool))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, images, jnp.arange(2)[None],
        task="detection", text_prompts=tp, cls_emb=jnp.asarray(cls_bank),
    )["params"]
    return cfg, params, cls_bank


def _toy_records(H=50, W=70, V=4):
    def seg(y0, y1, x0, x1):
        m = np.zeros((H, W), np.uint8)
        m[y0:y1, x0:x1] = 1
        return rle.encode(m)

    return [{
        "video_id": 1,
        "dataset_name": "toy",
        "file_names": [],
        "height": H, "width": W, "length": V,
        "task": "detection",
        "annotations": [
            {"id": 1, "category_id": 1, "iscrowd": 0,
             "segmentations": [seg(5, 25, 5, 30)] * V},
            {"id": 2, "category_id": 2, "iscrowd": 0,
             "segmentations": [seg(30, 45, 40, 65)] * V},
        ],
    }]


class _ArrayMapper(EvalVideoMapper):
    """Eval mapper over synthetic in-memory frames."""

    def __call__(self, record):
        from univs_tpu.data.augment import resize_shortest_edge, transformed_image_size

        H, W, V = record["height"], record["width"], record["length"]
        rng = np.random.RandomState(record["video_id"])
        frames = [(rng.rand(H, W, 3) * 255).astype(np.uint8) for _ in range(V)]
        t = resize_shortest_edge((H, W), self.short, self.max_size, self.div)
        images = np.stack([t.apply_image(f) for f in frames]).astype(np.float32)
        ih, iw = transformed_image_size(t, (H, W))
        return {
            "images": images, "image_size": (ih, iw),
            "out_size": (H, W), "video_id": record["video_id"],
            "video_len": V, "dataset_name": record["dataset_name"],
            "task": record["task"], "record": record, "transform": t,
        }


def test_eval_ytvis_pipeline(tiny_setup, tmp_path):
    cfg, params, cls_bank = tiny_setup
    records = _toy_records()
    mapper = _ArrayMapper(short=64, max_size=128, size_divisibility=32)
    metrics = _eval_ytvis(cfg, params, records, mapper, cls_bank, str(tmp_path))
    assert set(metrics) >= {"AP", "AP50", "fps"}
    assert 0.0 <= metrics["AP"] <= 1.0
    assert (tmp_path / "results.json").exists()
    preds = json.loads((tmp_path / "results.json").read_text())
    if preds:  # random weights may or may not emit entities
        p = preds[0]
        assert len(p["segmentations"]) == 4
        assert {"video_id", "score", "category_id"} <= set(p)


def test_eval_vos_pipeline(tiny_setup):
    cfg, params, cls_bank = tiny_setup
    records = _toy_records()
    records[0]["task"] = "sot"
    mapper = _ArrayMapper(short=64, max_size=128, size_divisibility=32)
    metrics = _eval_vos(cfg, params, records, mapper, cls_bank)
    assert set(metrics) >= {"J", "F", "J&F"}
    assert 0.0 <= metrics["J"] <= 1.0


def test_eval_pvos_pipeline(tiny_setup):
    """VIPOSeg protocol path: four-bucket G with ref-frame exclusion."""
    cfg, params, cls_bank = tiny_setup
    records = _toy_records()
    records[0]["task"] = "sot"
    mapper = _ArrayMapper(short=64, max_size=128, size_divisibility=32)
    metrics = _eval_vos(cfg, params, records, mapper, cls_bank, pvos=True)
    assert "overall_iou" in metrics and "G" in metrics
    import numpy as _np
    vals = [metrics[f"{b}_iou"] for b in
            ("thing_seen", "thing_unseen", "stuff_seen", "stuff_unseen")]
    # toy categories land in at least one bucket; scores are in [0, 1]
    assert any(not _np.isnan(v) for v in vals)
    for v in vals:
        if not _np.isnan(v):
            assert 0.0 <= v <= 1.0


def test_eval_refvos_pipeline(tiny_setup):
    cfg, params, cls_bank = tiny_setup
    records = _toy_records()
    records[0]["task"] = "grounding"
    records[0]["expressions"] = ["the red box", "the blue box"]
    records[0]["exp_obj_ids"] = [1, 2]
    mapper = _ArrayMapper(short=64, max_size=128, size_divisibility=32)
    from univs_tpu.engine import _eval_refvos

    metrics = _eval_refvos(cfg, params, records, mapper, cls_bank)
    assert set(metrics) >= {"J", "F", "J&F"}
    assert 0.0 <= metrics["J"] <= 1.0


def test_eval_refvos_real_text_tower(tiny_setup):
    """RefVOS eval with an actual (tiny random-init) CLIP text tower:
    expressions run through the tokenizer + transformer + grounding
    prompt assembly (the path the CLI's --clip-weights enables),
    not the random-prompt smoke branch."""
    cfg, params, cls_bank = tiny_setup
    records = _toy_records()
    records[0]["task"] = "grounding"
    records[0]["expressions"] = ["the red box"]
    records[0]["exp_obj_ids"] = [1]
    mapper = _ArrayMapper(short=64, max_size=128, size_divisibility=32)

    from univs_tpu.engine import _eval_refvos
    from univs_tpu.models.clip_text import ClipTextEncoder, TextPromptEncoder

    D = cfg.decoder.clip_cls_emb_dim
    tower = ClipTextEncoder(embed_dim=D, width=16, heads=2, num_layers=1)
    tparams = tower.init(jax.random.PRNGKey(3), jnp.zeros((1, 77), jnp.int32))
    enc = TextPromptEncoder(tparams, encoder=tower)
    metrics = _eval_refvos(cfg, params, records, mapper, cls_bank,
                           text_encoder=enc)
    assert set(metrics) >= {"J", "F", "J&F"}
    assert 0.0 <= metrics["J"] <= 1.0


def test_eval_ytvis_two_device_pipeline(tiny_setup, tmp_path):
    """engine eval with pipeline_devices: encode on device 0, decode on
    device 1 (the CLI --pipeline flag) must reproduce the single-device
    metrics exactly on the virtual CPU mesh."""
    cfg, params, cls_bank = tiny_setup
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    records = _toy_records()
    mapper = _ArrayMapper(short=64, max_size=128, size_divisibility=32)
    single = _eval_ytvis(cfg, params, records, mapper, cls_bank, None)
    piped = _eval_ytvis(cfg, params, records, mapper, cls_bank, None,
                        pipeline_devices=(jax.devices()[0], jax.devices()[1]))
    for key in ("AP", "AP50"):
        assert np.isclose(single[key], piped[key], equal_nan=True), (key, single, piped)


def test_predict_only_no_gt(tiny_setup, tmp_path):
    """evaluator_type=None datasets (custom_videos etc.) run prediction
    only: VIS results.json for detection records, per-expression mask
    trees for grounding records, no metric stage (reference
    CUSTOM_VIDEOS flows)."""
    cfg, params, cls_bank = tiny_setup
    det = _toy_records()[0]
    det["annotations"] = []  # no GT
    gnd = _toy_records()[0].copy()
    gnd["video_id"] = 2
    gnd["task"] = "grounding"
    gnd["expressions"] = ["the box"]
    gnd["annotations"] = []
    gnd["video_name"] = "vid2"
    mapper = _ArrayMapper(short=64, max_size=128, size_divisibility=32)

    from univs_tpu.engine import _predict_only

    metrics = _predict_only(cfg, params, [det, gnd], mapper, cls_bank,
                            output_dir=str(tmp_path))
    assert metrics["num_videos"] == 2.0 and metrics["fps"] > 0
    import os as _os

    # rvos tree for the grounding record (one dir per expression)
    assert _os.path.isdir(_os.path.join(tmp_path, "inference", "Annotations", "vid2"))
    if metrics["num_predictions"]:  # random weights may emit none
        assert _os.path.isfile(_os.path.join(tmp_path, "results.json"))


def test_eval_image_pipeline(tiny_setup, tmp_path):
    """Image-task eval path (engine evaluator_type 'coco'): synthetic
    COCO-format 1-frame records through ImageDriver -> instance AP +
    PQ + mIoU (reference: inference_image_generic_seg.py:176-449,
    train_net.py:111-165)."""
    cfg, params, cls_bank = tiny_setup
    records = _toy_records(V=1)
    records[0]["video_id"] = 11
    mapper = _ArrayMapper(short=64, max_size=128, size_divisibility=32)
    from univs_tpu.engine import _eval_image

    # panoptic dataset: category 1 is a thing, category 2 stuff
    m = _eval_image(cfg, params, records, mapper, cls_bank,
                    thing_ids={1}, output_dir=str(tmp_path))
    assert {"AP", "PQ", "SQ", "RQ", "mIoU", "fps"} <= set(m)
    assert np.isfinite(m["PQ"]) and 0.0 <= m["PQ"] <= 1.0
    assert (tmp_path / "image_results.json").exists()

    # pure instance dataset (no stuff): AP only
    m2 = _eval_image(cfg, params, records, mapper, cls_bank, thing_ids=set())
    assert "AP" in m2 and "PQ" not in m2


def test_pq_stat_exact():
    """PQStat on a hand-computable case (panopticapi law)."""
    from univs_tpu.evaluation.panoptic import PQStat

    gt = np.zeros((10, 10), np.int32)
    gt[:5, :5] = 1  # cat 0, area 25
    gt[5:, 5:] = 2  # cat 1, area 25
    pred = np.zeros((10, 10), np.int32)
    pred[:5, :4] = 1  # overlaps gt1 20/25 -> IoU 20/30
    pred[0:2, 6:10] = 2  # cat 1, entirely on VOID -> ignored (not FP)
    stat = PQStat()
    stat.update(
        gt, [{"id": 1, "category_id": 0}, {"id": 2, "category_id": 1}],
        pred, [{"id": 1, "category_id": 0}, {"id": 2, "category_id": 1}],
    )
    r = stat.result()
    # cat 0: TP IoU = 20/(25+20-20) = 0.8 -> PQ = 0.8
    # cat 1: 0 TP, 0 FP (void-ignored), 1 FN -> PQ = 0
    assert abs(r["PQ"] - (0.8 + 0.0) / 2) < 1e-6
    assert r["n"] == 2


def test_eval_vss_and_vps_pipelines(tiny_setup):
    cfg, params, cls_bank = tiny_setup
    records = _toy_records()
    mapper = _ArrayMapper(short=64, max_size=128, size_divisibility=32)
    from univs_tpu.engine import _eval_vps, _eval_vss

    m1 = _eval_vss(cfg, params, records, mapper, cls_bank)
    assert set(m1) >= {"mIoU", "mAcc"}
    assert np.isfinite(m1["mIoU"])

    m2 = _eval_vps(cfg, params, records, mapper, cls_bank, thing_ids={1, 2})
    assert set(m2) >= {"VPQ", "STQ"}
    assert np.isfinite(m2["VPQ"])
