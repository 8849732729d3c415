"""Farthest-point sampling as a single fused Pallas TPU kernel.

The XLA ``fori_loop`` FPS (ops/sample.py) pays per-iteration kernel dispatch
and HBM round-trips for the min-distance buffer: ~66us/iteration measured on
v5e. This kernel runs the whole greedy loop on-core with coordinates and the
min-distance buffer resident in VMEM.

The batch is processed in ONE grid cell with a pure-2D layout: cloud b is
ROW b of ``(B, N_pad)`` coordinate planes, so every per-iteration step —
distance update, per-cloud max, selected-point coordinate extraction — is a
plain lane (axis=1) reduction or row broadcast, shapes Mosaic handles
natively (multi-axis reductions over a 3D (B, 8, L) layout crash the
Mosaic layout inferencer, and per-cloud grid cells serialize B * npoint
iterations instead of npoint — the round-2 design paid exactly these two
costs).

The selected indices accumulate in a VMEM output via one-hot column
writes (``out += best * [col == j]``): scalar stores are only legal to
SMEM, and extracting per-row scalars from a (B, 1) vector does not lower.

Semantics identical to ops/sample.py (seed index 0, 1e38 init, ties ->
lowest index), which itself mirrors the reference CUDA kernel
(ref tf_ops/sampling/tf_sample_gpu.cu:7-78).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fps_kernel(xyz_ref, out_ref, mind, npoint: int, num_valid: int):
    """xyz_ref: (3, Bp, L) f32 — x/y/z planes, cloud per row.
    out_ref:   (Bp, np_pad) int32 VMEM — selected indices per cloud.
    mind:      (Bp, L) f32 VMEM scratch — running min squared distance.
    """
    bp, lanes = mind.shape
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]

    p_ids = lax.broadcasted_iota(jnp.int32, (bp, lanes), 1)
    valid = p_ids < num_valid
    cols = lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)

    mind[:] = jnp.where(valid, 1e38, -1.0)
    out_ref[:] = jnp.zeros(out_ref.shape, jnp.int32)  # col 0 = seed 0

    big = jnp.int32(num_valid)

    def body(j, old):
        # old: (Bp, 1) int32 — the previously selected point per cloud.
        # Dynamic scalar reads from VMEM are not lowerable; extract the
        # selected points' coordinates with masked row reductions instead.
        sel = (p_ids == old).astype(jnp.float32)
        xo = jnp.sum(x * sel, axis=1, keepdims=True)       # (Bp, 1)
        yo = jnp.sum(y * sel, axis=1, keepdims=True)
        zo = jnp.sum(z * sel, axis=1, keepdims=True)
        d = (x - xo) ** 2 + (y - yo) ** 2 + (z - zo) ** 2
        new_mind = jnp.minimum(mind[:], jnp.where(valid, d, -1.0))
        mind[:] = new_mind
        m = jnp.max(new_mind, axis=1, keepdims=True)       # (Bp, 1)
        # first maximal index per cloud (ties -> lowest, like jnp.argmax)
        best = jnp.min(
            jnp.where(new_mind == m, p_ids, big), axis=1, keepdims=True
        )
        out_ref[:] += best * (cols == j).astype(jnp.int32)
        return best

    lax.fori_loop(1, npoint, body, jnp.zeros((bp, 1), jnp.int32))


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def farthest_point_sample_pallas(
    npoint: int, database: jax.Array, interpret: bool = False
) -> jax.Array:
    """Pallas FPS: (B, N, 3+) -> (B, npoint) int32.

    ``interpret=True`` runs the kernel in the Pallas interpreter (for CPU
    tests).
    """
    xyz = database[..., :3].astype(jnp.float32)
    batch, num, _ = xyz.shape
    b_pad = _round_up(batch, _SUBLANE)
    n_pad = _round_up(num, _LANE)
    np_pad = _round_up(npoint, _LANE)

    planes = jnp.pad(xyz, ((0, b_pad - batch), (0, n_pad - num), (0, 0)))
    planes = planes.transpose(2, 0, 1)                 # (3, Bp, N_pad)

    kernel = functools.partial(
        _fps_kernel, npoint=npoint, num_valid=num
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, np_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b_pad, n_pad), jnp.float32)],
        interpret=interpret,
    )(planes)
    return out[:batch, :npoint]
