#!/usr/bin/env python
"""Train / evaluate UniVS-TPU — the ``train_net.py`` equivalent.

Examples:
    # evaluate VIS on a dev split (weights: orbax dir or converted .pth)
    python tools/run_net.py --eval-only --dataset ytvis_2021_dev \
        --weights out/ckpt --bank datasets/concept_emb/bank.npy

    # train stage 2 (detection prompts) on a dataset mixture
    python tools/run_net.py --train --datasets ytvis_2021_train:0.6,coco_panoptic_train:0.4 \
        --batch-size 8 --max-iter 10000 --output out/

Reference entry point: train_net.py (argument surface mirrored where it
makes sense; Detectron2 launch/DDP replaced by jax.distributed + the
("data","model") mesh).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--train", action="store_true")
    p.add_argument("--config-file", type=str, default=None,
                   help="reference-style yacs YAML (with _BASE_ inheritance)")
    p.add_argument("--opts", nargs=argparse.REMAINDER, default=[],
                   help="dotted overrides: our paths (decoder.num_queries=100) "
                        "or yacs keys (MODEL.MASK_FORMER.NUM_OBJECT_QUERIES 100)")
    p.add_argument("--dataset", type=str, help="dataset to evaluate")
    p.add_argument("--datasets", type=str, help="train mixture name:ratio,name:ratio")
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--bank", type=str, default=None, help="category embedding bank (.npy/.pth)")
    p.add_argument("--backbone", type=str, default="resnet50")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-iter", type=int, default=1000)
    p.add_argument("--num-frames", type=int, default=2)
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("--max-videos", type=int, default=None)
    p.add_argument("--output", type=str, default="output")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--tiny", action="store_true", help="tiny model for smoke tests")
    p.add_argument("--vos-queries", type=str, default="prompt",
                   choices=["prompt", "learn", "prompt+learn"],
                   help="VOS back-end re-ID variant "
                        "(VIDEO_UNIFIED_INFERENCE_QUERIES)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--clip-weights", default=None,
                   help="CLIP text-tower params: grounding (RefVOS) eval "
                        "encodes expressions with the real tower instead of "
                        "the random-prompt smoke path")
    p.add_argument("--pipeline", action="store_true",
                   help="two-chip pipelined streaming for entity-driver eval "
                        "(encode on device 0, decode + pool on device 1)")
    p.add_argument("--resume", action="store_true",
                   help="resume training from the latest state_* checkpoint "
                        "in --output (full state: params + optimizer + EMA + "
                        "step — the reference's DetectionCheckpointer "
                        "resume_or_load, train_net.py:377-393)")
    p.add_argument("--ckpt-every", type=int, default=1000)
    return p.parse_args()


def latest_state_dir(output: str):
    """Newest full-state checkpoint dir ``state_<iter>`` under output."""
    import glob as _glob

    cands = []
    for d in _glob.glob(os.path.join(output, "state_*")):
        tail = os.path.basename(d).split("_")[-1]
        if os.path.isdir(d) and tail.isdigit():
            cands.append((int(tail), d))
    return max(cands)[1] if cands else None


def build_cfg(args):
    """Config priority: dataclass defaults < --config-file (yacs YAML)
    < --opts dotted overrides; --tiny short-circuits to the smoke cfg."""
    from univs_tpu.config import BackboneConfig, InferenceConfig, UniVSConfig, tiny_test_config

    vq = getattr(args, "vos_queries", "prompt")
    if getattr(args, "tiny", False):
        from univs_tpu.config import TrainConfig

        return tiny_test_config().replace(
            inference=InferenceConfig(num_frames=2, clip_stride=1, num_frames_window=4,
                                      min_size_test=64, apply_cls_thres=0.0, topk_per_video=5,
                                      max_num_instances=6,
                                      video_unified_inference_queries=vq),
            # cheap criterion for smoke runs (full 12544-point sampling
            # makes a single-core CPU train step take tens of minutes)
            train=TrainConfig(num_points=64, oversample_ratio=2.0),
        ), {}
    extras = {}
    if getattr(args, "config_file", None):
        from univs_tpu.config_io import config_from_yacs

        cfg, extras, unmapped = config_from_yacs(args.config_file)
        if unmapped:
            print(f"[config] {len(unmapped)} yacs keys without a univs_tpu "
                  f"equivalent (first 10): {unmapped[:10]}")
        cfg = cfg.replace(dtype="bfloat16" if args.bf16 else cfg.dtype)
    else:
        cfg = UniVSConfig(
            backbone=BackboneConfig(name=args.backbone),
            num_frames=args.num_frames,
            dtype="bfloat16" if args.bf16 else "float32",
        )
    import dataclasses as _dc

    cfg = cfg.replace(
        inference=_dc.replace(cfg.inference, video_unified_inference_queries=vq)
    )
    if getattr(args, "opts", None):
        from univs_tpu.config_io import apply_overrides

        cfg = apply_overrides(cfg, args.opts)
    return cfg, extras


def init_params(cfg, cls_bank, seed=0):
    import jax
    import jax.numpy as jnp

    from univs_tpu.models.univs import UniVSModel
    from univs_tpu.structures import TextPrompts

    model = UniVSModel(cfg)
    images = jnp.zeros((1, cfg.num_frames, 128, 128, 3))
    fi = jnp.zeros((1, cfg.num_frames), jnp.int32)
    K = min(cls_bank.shape[0], 8)
    tp = TextPrompts(embs=jnp.asarray(cls_bank[:K])[None, :, None, :], valid=jnp.ones((1, K), bool))

    @jax.jit
    def init_fn(rng):
        return model.init(
            {"params": rng, "shuffle": rng}, images, fi, task="detection",
            text_prompts=tp, cls_emb=jnp.asarray(cls_bank[:K]), train=True,
        )["params"]

    return model, init_fn(jax.random.PRNGKey(seed))


def main():
    args = parse_args()
    # honor JAX_PLATFORMS even when a preloaded PJRT plugin force-set
    # the platform config (see tests/conftest.py for the same dance)
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    cfg, extras = build_cfg(args)
    # fall back to the YAML's dataset/weights fields when flags are absent
    if not args.dataset and extras.get("datasets_test"):
        args.dataset = list(extras["datasets_test"])[0]
    if not args.datasets and extras.get("datasets_train"):
        ratios = extras.get("dataset_ratio") or [1.0] * len(extras["datasets_train"])
        args.datasets = ",".join(
            f"{n}:{r}" for n, r in zip(extras["datasets_train"], ratios)
        )
    if not args.weights and extras.get("weights"):
        args.weights = extras["weights"]
    if not args.bank and extras.get("class_embed_path"):
        if os.path.exists(extras["class_embed_path"]):
            args.bank = extras["class_embed_path"]

    from univs_tpu.data.category_info import TOTAL_CATEGORY_ROWS
    from univs_tpu.utils.checkpoint import load_category_bank, load_params, save_checkpoint

    bank = load_category_bank(args.bank, TOTAL_CATEGORY_ROWS, cfg.decoder.clip_cls_emb_dim)

    if args.eval_only:
        from univs_tpu.engine import evaluate_dataset
        from univs_tpu.prompts.prepare_targets import PrepareTargets

        model, params = init_params(cfg, bank, args.seed)
        if args.weights:
            params = load_params(args.weights)
        pt = PrepareTargets(bank)
        try:
            cls_slice = pt.category_slice(args.dataset)
        except KeyError:
            # class-agnostic VOS/SOT/MOSE datasets have no category
            # namespace; the drivers only need a nonempty cls_emb
            cls_slice = bank[:1]
        text_encoder = None
        if getattr(args, "clip_weights", None):
            from univs_tpu.models.clip_text import TextPromptEncoder

            text_encoder = TextPromptEncoder(load_params(args.clip_weights))
        metrics = evaluate_dataset(
            cfg, params, args.dataset, cls_slice,
            max_videos=args.max_videos, output_dir=args.output,
            text_encoder=text_encoder, pipeline=getattr(args, "pipeline", False),
        )
        print(json.dumps(metrics))
        return

    if args.train:
        import jax
        import jax.numpy as jnp

        from univs_tpu.data.datasets import load_dataset
        from univs_tpu.data.loader import CombinedLoader, collate_train_batch, dataset_iterator
        from univs_tpu.data.mapper import TrainMapperConfig, TrainVideoMapper
        from univs_tpu.parallel.mesh import make_mesh
        from univs_tpu.parallel.train_state import create_train_state, make_train_step
        from univs_tpu.prompts.prepare_targets import PrepareTargets

        model, params = init_params(cfg, bank, args.seed)
        if args.weights:
            params = load_params(args.weights)

        pt = PrepareTargets(bank)
        items = [d.split(":") for d in args.datasets.split(",")]
        loaders, ratios = [], []
        mcfg = TrainMapperConfig(num_frames=cfg.num_frames, image_size=args.image_size,
                                 max_instances=cfg.prompt.num_max_instances)
        for i, (name, ratio) in enumerate(items):
            records = load_dataset(name)
            sl = pt.category_slice(name)
            collate = lambda b, sl=sl: collate_train_batch(
                b, sl, np.ones(sl.shape[0], bool), cfg.prompt.num_max_instances
            )
            loaders.append(dataset_iterator(records, TrainVideoMapper(mcfg, seed=i),
                                            args.batch_size, collate, seed=i))
            ratios.append(float(ratio))
        loader = CombinedLoader(loaders, ratios, seed=args.seed)

        mesh = make_mesh()
        state = create_train_state(cfg.replace(train=cfg.train), params)
        start_it = 0
        if args.resume:
            from univs_tpu.utils.checkpoint import load_checkpoint

            latest = latest_state_dir(args.output)
            if latest:
                state = load_checkpoint(latest, target=state)
                start_it = int(state.step)
                print(f"resumed full train state from {latest} (iter {start_it})")
        step = make_train_step(cfg, model, mesh, task="detection")
        rng = jax.random.PRNGKey(args.seed)
        from univs_tpu.utils.events import EventWriter

        events = EventWriter(args.output, print_every=20)
        with mesh:
            for it in range(start_it, args.max_iter):
                batch = next(loader)
                state, logged = step(state, batch, rng)
                if it % 20 == 0:  # fetch scalars at the log cadence only
                    events.log(it, {k: float(v) for k, v in logged.items()})
                if (it + 1) % args.ckpt_every == 0:
                    # full state (params + optimizer + EMA + step) so
                    # --resume restarts exactly; eval loads ckpt_final
                    save_checkpoint(os.path.join(args.output, f"state_{it+1}"), state)
        events.close()
        save_checkpoint(os.path.join(args.output, "ckpt_final"), state.params)
        return

    print("specify --eval-only or --train")


if __name__ == "__main__":
    main()
