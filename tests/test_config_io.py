"""Reference yacs-YAML ingestion (univs_tpu/config_io.py).

Loads the reference's REAL config files (_BASE_ inheritance chains)
and checks the translated UniVSConfig fields against values read
directly from the YAML tree, plus dotted-override behavior in both
naming schemes (reference: train_net.py:351-369, configs/univs/*.yaml).
"""

import os

import pytest

from univs_tpu.config import UniVSConfig
from univs_tpu.config_io import (
    apply_overrides,
    config_from_yacs,
    load_yacs_yaml,
    set_by_path,
)

REF_CFG = "/root/reference/configs/univs"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_CFG), reason="reference configs not present"
)


@needs_ref
def test_base_yaml_inheritance_merge():
    tree = load_yacs_yaml(os.path.join(REF_CFG, "univs_r50_stage2.yaml"))
    # stage2 overrides stage1 which inherits Base.yaml
    assert tree["MODEL"]["BACKBONE"]["FREEZE_AT"] == 5  # stage2 value
    assert tree["MODEL"]["MASK_FORMER"]["NUM_OBJECT_QUERIES"] == 200  # Base value
    assert tree["INPUT"]["SAMPLING_FRAME_NUM"] == 4  # stage2 value


@needs_ref
def test_reference_r50_stage2_translates():
    cfg, extras, unmapped = config_from_yacs(
        os.path.join(REF_CFG, "univs_r50_stage2.yaml")
    )
    assert cfg.backbone.name == "resnet50"
    assert cfg.decoder.num_queries == 200
    assert cfg.decoder.num_layers == 9  # DEC_LAYERS 10 - 1
    assert cfg.decoder.hidden_dim == 256
    assert cfg.pixel_decoder.num_layers == 6
    assert cfg.num_frames == 4 and cfg.inference.num_frames == 4
    assert cfg.train.lr == pytest.approx(5e-5)
    assert cfg.train.max_iter == 354000
    assert extras["datasets_train"][0] == "lvis_v1_train_video"
    assert len(extras["dataset_ratio"]) == len(extras["datasets_train"])
    # d2 tuple-literal string convention
    assert tuple(extras["datasets_test"]) == ("ytvis_2021_dev",)
    # nothing load-bearing should be silently dropped: spot-check that
    # known-unsupported spaces are what remains
    assert all(
        k.split(".")[0] in ("MODEL", "INPUT", "SOLVER", "DATASETS", "DATALOADER", "TEST", "SEED", "VERSION", "CUDNN_BENCHMARK")
        for k in unmapped
    )


@needs_ref
def test_reference_swinl_selects_swin_large():
    cfg, _, _ = config_from_yacs(os.path.join(REF_CFG, "univs_swinl_stage2.yaml"))
    assert cfg.backbone.name == "swin_large"
    assert cfg.backbone.swin_embed_dim == 192
    assert cfg.backbone.swin_num_heads == (6, 12, 24, 48)


def test_set_by_path_and_coercion():
    cfg = UniVSConfig()
    cfg = set_by_path(cfg, "decoder.num_queries", "100")
    assert cfg.decoder.num_queries == 100
    cfg = set_by_path(cfg, "inference.consistency_thres", "(0.1, 0.9)")
    assert cfg.inference.consistency_thres == (0.1, 0.9)
    cfg = set_by_path(cfg, "train.boxvis_enabled", "true")
    assert cfg.train.boxvis_enabled is True
    with pytest.raises(KeyError):
        set_by_path(cfg, "decoder.nonexistent_field", 1)


def test_apply_overrides_both_schemes():
    cfg = UniVSConfig()
    cfg = apply_overrides(cfg, ["decoder.num_queries=64", "train.lr=0.002"])
    assert cfg.decoder.num_queries == 64 and cfg.train.lr == 0.002
    # yacs key names + d2 pair form
    cfg = apply_overrides(
        cfg, ["MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "128",
              "INPUT.SAMPLING_FRAME_NUM", "3"]
    )
    assert cfg.decoder.num_queries == 128
    assert cfg.num_frames == 3 and cfg.inference.num_frames == 3


def test_solver_lr_schedule_translation():
    """SOLVER.{LR_SCHEDULER_NAME, STEPS, GAMMA, WARMUP_FACTOR} map onto
    the train schedule fields, with d2 class names normalized
    (reference: deeplab build_lr_scheduler dispatch)."""
    cfg, _, _ = config_from_yacs({
        "SOLVER": {"LR_SCHEDULER_NAME": "WarmupPolyLR", "STEPS": (342000,),
                   "GAMMA": 0.2, "WARMUP_FACTOR": 0.001, "POLY_LR_POWER": 0.9},
    })
    assert cfg.train.lr_scheduler == "poly"
    assert cfg.train.lr_steps == (342000,)
    assert cfg.train.lr_gamma == 0.2 and cfg.train.warmup_factor == 0.001

    cfg2, _, _ = config_from_yacs({"SOLVER": {"LR_SCHEDULER_NAME": "WarmupMultiStepLR"}})
    assert cfg2.train.lr_scheduler == "multistep"


def test_lr_schedule_laws():
    """The schedule functions reproduce the reference laws:
    WarmupMultiStepLR lr * wf(it) * gamma^bisect(steps, it) with linear
    warmup wf(it) = f*(1-a)+a, a = it/warmup; WarmupPolyLR
    lr * wf * (1 - it/max)^power (d2 solver/lr_scheduler.py)."""
    import numpy as np

    from univs_tpu.parallel.train_state import _lr_schedule

    c = UniVSConfig().train.__class__(
        lr=0.1, lr_scheduler="multistep", lr_steps=(100, 200), lr_gamma=0.1,
        warmup_iters=10, warmup_factor=0.001, max_iter=1000,
    )
    s = _lr_schedule(c)
    assert np.isclose(float(s(0)), 0.1 * 0.001)
    assert np.isclose(float(s(5)), 0.1 * (0.001 * 0.5 + 0.5))
    assert np.isclose(float(s(50)), 0.1)
    assert np.isclose(float(s(150)), 0.01)
    assert np.isclose(float(s(250)), 0.001)

    cp = c.__class__(lr=0.1, lr_scheduler="poly", warmup_iters=0,
                     poly_power=0.9, max_iter=1000)
    sp = _lr_schedule(cp)
    assert np.isclose(float(sp(0)), 0.1)
    assert np.isclose(float(sp(500)), 0.1 * 0.5 ** 0.9, rtol=1e-5)

    cc = c.__class__(lr=0.1, lr_scheduler="cosine", warmup_iters=10, max_iter=1000)
    assert float(_lr_schedule(cc)(10)) > 0.09  # peak after warmup
