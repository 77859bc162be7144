"""Device mesh + sharding rules.

The reference's only parallelism is DDP data-parallel over NCCL
(reference: train_net.py:90,400-407 — ``launch`` + ``create_ddp_model``;
gradient all-reduce inside torch DDP).  The TPU-native equivalent is a
("data", "model") mesh: batches shard over the ``data`` axis of the ICI
mesh and XLA inserts the psum for gradients; the ``model`` axis is
available for sharding large-backbone activations/params (unused = size
1 by default, matching the reference's DP-only story for <=220M-param
models — SURVEY §2.7).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``
and the same code spans hosts (DCN between slices, ICI within).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None, model_parallel: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """[B, T, ...] video tensors: batch over data, FRAMES over model.

    The backbone + pixel decoder are per-frame (the clip couples only
    at the UniVS decoder), so sharding T over the model axis splits the
    dominant encoder work across it — the activation-sharding rule that
    makes a (d, m) mesh useful for Swin-L 1024² — and XLA all-gathers
    the per-frame features over ICI at the decoder boundary."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_multihost(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                   process_id: Optional[int] = None):
    """Multi-host initialization (DCN between slices).

    The reference's equivalent is d2 ``launch`` with a TCP rendezvous
    (train_net.py:400-407, tools/run/univs_r50_stage3.sh:3).  On TPU
    pods the standard env-based discovery makes all args optional."""
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_processes, process_id=process_id
    )


def shard_batch_pytree(mesh: Mesh, batch):
    """Constrain every leaf's leading axis to the data axis."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, s), batch)
