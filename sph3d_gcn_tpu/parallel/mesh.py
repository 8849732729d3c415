"""Device mesh construction for SPMD training.

The reference is single-GPU with feed_dict I/O (SURVEY.md §2.7); the
TPU-native replacement is `jax.sharding` over an ICI mesh. Models here are
small (<1M params) so the primary axis is batch data parallelism, but the
mesh carries a (usually size-1) 'model' axis so tensor-parallel shardings
can be introduced without API changes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"


def make_mesh(
    devices: list[jax.Device] | None = None,
    model_parallelism: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallelism != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallelism={model_parallelism}"
        )
    grid = np.array(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_multislice_mesh(
    num_slices: int,
    devices: list[jax.Device] | None = None,
    model_parallelism: int = 1,
) -> Mesh:
    """Build a ('dcn', 'data', 'model') mesh for multi-slice scale-out.

    The 'dcn' axis crosses slice boundaries (data-center network); 'data'
    and 'model' stay within a slice so their collectives ride ICI. Shard the
    batch over ('dcn', 'data') jointly for pure data parallelism across
    slices (SURVEY.md §5 "distributed communication backend").

    On real multi-slice TPU deployments devices are ordered slice-major, so
    the reshape below groups each slice's devices on the ICI axes; for
    emulation any device list works.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    per_slice = n // num_slices
    if num_slices * per_slice != n or per_slice % model_parallelism != 0:
        raise ValueError(
            f"{n} devices cannot form {num_slices} slices with "
            f"model_parallelism={model_parallelism}"
        )
    grid = np.array(devices).reshape(
        num_slices, per_slice // model_parallelism, model_parallelism
    )
    return Mesh(grid, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across all data-parallel axes
    (('dcn', 'data') on multi-slice meshes, 'data' otherwise)."""
    axes = tuple(ax for ax in (DCN_AXIS, DATA_AXIS) if ax in mesh.axis_names)
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded over 'data'.

    Single-process: a plain ``device_put`` of the global batch. Multi-process
    (``jax.process_count() > 1``, i.e. after ``jax.distributed.initialize``):
    each host passes only its LOCAL slice of the global batch — the slice its
    loader produced from its ``process_shard_files`` file shard — and the
    global array is assembled with ``jax.make_array_from_process_local_data``
    (no host ever materializes the full batch; the reference's feed_dict has
    no analogue of this, SURVEY.md §2.7).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def process_shard_files(files, process_index: int | None = None,
                        process_count: int | None = None):
    """Split a file list across hosts: host i takes files[i::P], in order.

    The multi-host data path: each process loads only its shard and feeds
    ``shard_batch`` its local sub-batch. Single-process (the default here —
    no multi-host hardware in this environment) returns the list unchanged.
    Deterministic round-robin keeps every host's shard balanced within one
    file and stable across restarts (checkpoint resume sees the same split).
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if n <= 1:
        return list(files)
    return list(files)[p::n]


def local_batch_size(global_batch_size: int) -> int:
    """Per-process batch size for the multi-host data path."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} does not split over "
            f"{n} processes"
        )
    return global_batch_size // n
