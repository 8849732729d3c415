"""Farthest-point sampling as a single fused Pallas TPU kernel.

The XLA ``fori_loop`` FPS (ops/sample.py) pays per-iteration kernel dispatch
and HBM round-trips for the min-distance buffer: ~66us/iteration measured on
v5e. This kernel runs the whole greedy loop on-core with coordinates and the
min-distance buffer resident in VMEM.

Layout: point p lives at (sublane s, lane l) of an (8, L) tile with
``p = s * L + l``, so ``jnp.argmax`` over the row-major tile directly yields
the point index. Padded slots hold min-dist -1 so they are never selected
(real min-dists are >= 0).

Semantics identical to ops/sample.py (seed index 0, 1e38 init, ties -> lowest
index), which itself mirrors the reference CUDA kernel
(ref tf_ops/sampling/tf_sample_gpu.cu:7-78).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANES = 8
_LANES = 128


def _fps_kernel(xyz_ref, out_ref, mind, npoint: int, num_valid: int):
    """One grid cell = one batch item.

    xyz_ref: (1, 3, 8, L) f32 — x/y/z planes in p = s*L + l layout.
    out_ref: (1, 1, npoint) int32 in SMEM — selected indices (scalar stores
             are only legal to SMEM; the singleton middle axis satisfies the
             Mosaic block-shape divisibility rule).
    mind:    (8, L) f32 VMEM scratch — running min squared distance.
    """
    lanes = xyz_ref.shape[-1]
    x = xyz_ref[0, 0]
    y = xyz_ref[0, 1]
    z = xyz_ref[0, 2]

    s_ids = lax.broadcasted_iota(jnp.int32, (_SUBLANES, lanes), 0)
    l_ids = lax.broadcasted_iota(jnp.int32, (_SUBLANES, lanes), 1)
    p_ids = s_ids * lanes + l_ids
    valid = p_ids < num_valid

    mind[:] = jnp.where(valid, 1e38, -1.0)
    out_ref[0, 0, 0] = 0

    def body(j, old):
        # Dynamic scalar reads from VMEM are not lowerable; extract the
        # selected point's coordinates with a masked reduction instead.
        sel = (p_ids == old).astype(jnp.float32)
        xo = jnp.sum(x * sel)
        yo = jnp.sum(y * sel)
        zo = jnp.sum(z * sel)
        d = (x - xo) ** 2 + (y - yo) ** 2 + (z - zo) ** 2
        new_mind = jnp.minimum(mind[:], jnp.where(valid, d, -1.0))
        mind[:] = new_mind
        best = jnp.argmax(new_mind).astype(jnp.int32)
        out_ref[0, 0, j] = best
        return best

    lax.fori_loop(1, npoint, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def farthest_point_sample_pallas(
    npoint: int, database: jax.Array, interpret: bool = False
) -> jax.Array:
    """Pallas FPS: (B, N, 3+) -> (B, npoint) int32.

    9x faster than the XLA fori_loop version on v5e (18ms vs 166ms for
    2500-of-10000 at B=16). ``interpret=True`` runs the kernel in the Pallas
    interpreter (for CPU tests).
    """
    xyz = database[..., :3].astype(jnp.float32)
    batch, num, _ = xyz.shape
    tile = _SUBLANES * _LANES
    num_pad = -(-num // tile) * tile
    lanes = num_pad // _SUBLANES

    planes = jnp.pad(xyz, ((0, 0), (0, num_pad - num), (0, 0)))
    # (B, N_pad, 3) -> (B, 3, 8, L) with p = s * L + l.
    planes = planes.transpose(0, 2, 1).reshape(batch, 3, _SUBLANES, lanes)

    kernel = functools.partial(_fps_kernel, npoint=npoint, num_valid=num)
    out = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, _SUBLANES, lanes),
                lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_SUBLANES, lanes), jnp.float32)],
        interpret=interpret,
    )(planes)
    # Tile-layout flat ids (s * L + l) already coincide with point ids
    # because the reshape used p = s * L + l.
    return out[:, 0, :]
