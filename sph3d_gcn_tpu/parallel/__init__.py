"""Mesh construction and sharding helpers (no counterpart in the reference,
which is single-GPU — SURVEY.md §2.7)."""

from sph3d_gcn_tpu.parallel.spatial import (
    all_rows,
    halo_exchange,
    halo_reduce,
    local_neighborhood,
    localize_tiles,
    psum_replicated,
    shardable_rows,
    slice_rows_local,
)
from sph3d_gcn_tpu.parallel.mesh import (
    DATA_AXIS,
    DCN_AXIS,
    MODEL_AXIS,
    batch_sharding,
    local_batch_size,
    make_mesh,
    make_multislice_mesh,
    process_shard_files,
    replicated,
    shard_batch,
)

__all__ = [
    "all_rows",
    "halo_exchange",
    "halo_reduce",
    "local_neighborhood",
    "localize_tiles",
    "psum_replicated",
    "shardable_rows",
    "slice_rows_local",
    "DATA_AXIS",
    "DCN_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "local_batch_size",
    "make_mesh",
    "make_multislice_mesh",
    "process_shard_files",
    "replicated",
    "shard_batch",
]
