"""Layout canonicalization via a trivial Pallas copy kernel.

XLA's TPU sort/top_k inside a ``lax.map`` can leave its output buffers in a
physical layout that makes *downstream gathers ~12x slower* — and the poison
travels with the device buffer across jit boundaries (measured on v5e:
composed neighbor-query + feature-gather at 1.5s vs 125ms with the same
values passed through the host). A Pallas identity copy forces the standard
(8, 128)-tiled layout at HBM-bandwidth cost (~0.1ms for a 40MB index array),
restoring full gather speed.

Applied by the sphere query to its index/bin outputs (ops/neighbor.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 1024


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def canonicalize(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Identity copy through a Pallas kernel to force canonical layout.

    No-op on non-TPU backends (where the pathology doesn't exist).
    """
    if not interpret and jax.default_backend() != "tpu":
        return x
    shape = x.shape
    last = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, last)
    block_rows = min(_ROW_BLOCK, rows)
    if rows % block_rows != 0:
        pad = -(-rows // block_rows) * block_rows - rows
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    grid = (x2.shape[0] // block_rows,)
    out = pl.pallas_call(
        _copy_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_rows, last), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (block_rows, last), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(x2)
    return out[:rows].reshape(shape)
