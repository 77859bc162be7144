"""Batch building + multi-dataset mixing.

Rebuild of the reference's loader layer (reference:
univs/data/build.py:115-262 — per-dataset train loaders;
univs/data/combined_loader.py:14-106 — CombinedDataLoader sampling
whole batches from one dataset at a time by configured ratios, e.g.
configs/univs/univs_r50_stage2.yaml:12-28).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from univs_tpu.losses.criterion import TrainTargets


def collate_train_batch(samples: List[Dict], category_bank: np.ndarray,
                        category_valid: np.ndarray, prompt_slots: int):
    """Stack mapper outputs into TrainBatch arrays (numpy).

    Detection prompt slots: targets' category embeddings + negative
    categories to fill (reference: prepare_targets.py:324-385)."""
    import jax.numpy as jnp

    from univs_tpu.parallel.train_state import TrainBatch

    images = np.stack([s["images"] for s in samples])
    fi = np.stack([s["frame_indices"] for s in samples])
    labels = np.stack([s["labels"] for s in samples])
    ids = np.stack([s["ids"] for s in samples])
    masks = np.stack([s["masks"] for s in samples])
    valid = np.stack([s["valid"] for s in samples])

    B, N = labels.shape
    Qp = prompt_slots
    rng = np.random.RandomState(int(ids.sum()) % (2 ** 31))
    prompt_embs = np.zeros((B, Qp, category_bank.shape[-1]), np.float32)
    prompt_valid = np.zeros((B, Qp), bool)
    prompt_obj_ids = np.full((B, Qp), -1, np.int32)
    K = category_bank.shape[0]
    for b in range(B):
        pos = np.nonzero(valid[b])[0][:Qp]
        for q, n in enumerate(pos):
            prompt_embs[b, q] = category_bank[labels[b, n] - 1]
            prompt_obj_ids[b, q] = n
            prompt_valid[b, q] = True
        # negative category padding
        neg = rng.permutation(K)[: Qp - len(pos)]
        for q, c in enumerate(neg, start=len(pos)):
            prompt_embs[b, q] = category_bank[c]
            prompt_valid[b, q] = True

    targets = TrainTargets(
        labels=jnp.asarray(labels), ids=jnp.asarray(ids),
        masks=jnp.asarray(masks), valid=jnp.asarray(valid),
        prompt_obj_ids=jnp.asarray(prompt_obj_ids),
    )
    return TrainBatch(
        images=jnp.asarray(images),
        frame_indices=jnp.asarray(fi),
        targets=targets,
        prompt_category_embs=jnp.asarray(prompt_embs),
        prompt_category_valid=jnp.asarray(prompt_valid),
        category_bank=jnp.asarray(category_bank),
        category_bank_valid=jnp.asarray(category_valid),
    )


class CombinedLoader:
    """Samples whole batches from one dataset at a time by ratio
    (reference: combined_loader.py CombinedDataLoader_Mix)."""

    def __init__(self, loaders: Sequence[Iterator], ratios: Sequence[float], seed: int = 0):
        assert len(loaders) == len(ratios)
        self.loaders = list(loaders)
        p = np.asarray(ratios, np.float64)
        self.p = p / p.sum()
        self.rng = np.random.RandomState(seed)

    def __iter__(self):
        return self

    def __next__(self):
        i = self.rng.choice(len(self.loaders), p=self.p)
        return next(self.loaders[i])


def dataset_iterator(records: List[Dict], mapper: Callable, batch_size: int,
                     collate: Callable, seed: int = 0, infinite: bool = True):
    """Shuffled, skip-on-empty iterator over mapped records."""
    rng = np.random.RandomState(seed)
    batch = []  # persists across epochs: a dataset smaller than the
    # batch size (or with many skipped samples) must still fill batches
    while True:
        order = rng.permutation(len(records))
        for i in order:
            s = mapper(records[i])
            if s is None:
                continue
            batch.append(s)
            if len(batch) == batch_size:
                yield collate(batch)
                batch = []
        if not infinite:
            if batch:
                yield collate(batch)
            return
