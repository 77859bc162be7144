"""univs_tpu — a TPU-native unified video segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of UniVS
(CVPR 2024): one model, six video tasks (VIS, VSS, VPS, VOS, PVOS,
RefVOS) plus image segmentation, built around "prompts as queries",
a ProCA prompt cross-attention layer and an HBM-resident prompt
memory pool that carries targets across clip windows.

Subpackages
-----------
- ``ops``        core tensor ops (deformable attention, PEs, mask ops)
- ``models``     backbones, pixel decoder, UniVS transformer decoder, CLIP text
- ``prompts``    visual/text prompt encoders and target preparation
- ``losses``     Hungarian matcher + unified criterion
- ``inference``  clip-streaming drivers (entity / vos / refvos) + memory pool
- ``data``       cocovid dataset loaders, mappers, augmentation
- ``evaluation`` AP / VPQ / STQ / mIoU / J&F / PVOS-G metric kernels
- ``parallel``   mesh + sharding rules, pjit train/infer steps
- ``utils``      checkpointing, torch->jax weight conversion, logging
"""

__version__ = "0.1.0"
