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


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
