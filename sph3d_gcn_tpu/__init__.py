"""SPH3D-GCN TPU: a TPU-native JAX framework for spherical graph convolution
on 3D point clouds.

Re-implements the capabilities of the SPH3D-GCN reference (TPAMI 2020,
arXiv:1909.09287) as a JAX / XLA / Pallas stack designed for TPU hardware:
fixed-degree padded neighborhoods (static shapes), MXU-friendly gather +
one-hot-matmul convolution, deterministic segment reductions (no atomics),
and `jax.sharding` data parallelism over device meshes.

Subpackages
-----------
- ``ops``:      the six core point-cloud operators (neighbor query, FPS,
                spherical kernel bins, depthwise graph conv, pool, unpool).
- ``nn``:       Flax layer library (separable/pointwise conv, BN, graph builders).
- ``models``:   SPH3D model families (ModelNet, ShapeNet, ScanNet, S3DIS,
                RueMonge2014).
- ``configs``:  immutable architecture configs mirroring the reference's
                per-dataset config modules.
- ``data``:     augmentations, dataset IO, preprocessing (voxelize, block
                cutter), and block->scene merge metrics.
- ``parallel``: mesh construction and sharded train-step factories.
- ``train``:    training loops, LR schedules, checkpointing, eval protocols.
"""

__version__ = "0.1.0"
