"""Checkpoint save/load (orbax) + category-bank IO.

Replaces the reference's Detectron2 ``DetectionCheckpointer``
(reference: train_net.py:96-101, --resume flow :377-393) with orbax
pytree checkpoints; torch .pth ingestion goes through
utils/convert.py.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np


def save_checkpoint(path: str, state: Any):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target) if target is not None else ckptr.restore(path)


def load_params(path: str) -> Any:
    """Load model params from orbax dir or torch .pth/.pkl file."""
    if os.path.isdir(path):
        return load_checkpoint(path)
    if path.endswith((".pth", ".pkl", ".pt")):
        import torch

        from univs_tpu.utils.convert import flatten_torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        flat = flatten_torch(sd)
        if any(k.startswith(("sem_seg_head.", "teacher.sem_seg_head."))
               for k in flat):
            # a full reference UniVS checkpoint: run the activation-
            # verified converters (backbone + pixel decoder + decoder)
            from univs_tpu.utils.convert_univs import convert_univs_checkpoint

            return convert_univs_checkpoint(flat)
        return flat
    if path.endswith(".npz"):
        return dict(np.load(path, allow_pickle=True))
    raise ValueError(f"unknown checkpoint format: {path}")


def load_category_bank(path: Optional[str], num_rows: int, dim: int = 640,
                       seed: int = 0) -> np.ndarray:
    """Load the frozen CLIP category-embedding bank
    (reference data: datasets/concept_emb/
    combined_datasets_cls_emb_rn50x4.pth, 3938x640).  When no path is
    given, tries $UNIVS_TPU_CLS_BANK then the in-repo extraction
    artifact (tools/extract_class_embeddings.py output); falls back to
    a seeded random bank (smoke/bench mode)."""
    explicit = bool(path)
    if not path:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for cand in (
            os.environ.get("UNIVS_TPU_CLS_BANK", ""),
            os.path.join(repo, "artifacts", "combined_datasets_cls_emb_rn50x4_randinit.npy"),
        ):
            if cand and os.path.exists(cand):
                path = cand
                break
    if path and not explicit and "randinit" in os.path.basename(path):
        import logging

        logging.getLogger(__name__).warning(
            "load_category_bank: no bank path configured — falling back to the "
            "RANDOM-INIT artifact %s. Class scores will be degraded; set "
            "UNIVS_TPU_CLS_BANK or cfg to a real CLIP-extracted bank for eval.",
            path,
        )
    if path and os.path.exists(path):
        if path.endswith(".npy"):
            bank = np.load(path)
        else:
            import torch

            bank = torch.load(path, map_location="cpu", weights_only=False)
            bank = bank.numpy() if hasattr(bank, "numpy") else np.asarray(bank)
        if bank.shape[-1] == dim:
            return bank.astype(np.float32)
        # auto-discovered artifact with a different text width (e.g.
        # tiny test configs): fall through to the seeded random bank
    import logging

    logging.getLogger(__name__).warning(
        "load_category_bank: using a seeded RANDOM bank (%dx%d) — smoke/bench "
        "mode only; class scores are meaningless.", num_rows, dim,
    )
    rng = np.random.RandomState(seed)
    bank = rng.randn(num_rows, dim).astype(np.float32)
    return bank / np.linalg.norm(bank, axis=-1, keepdims=True)
