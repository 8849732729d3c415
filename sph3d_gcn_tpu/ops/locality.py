"""Spatial locality tools: Morton (z-order) sorting of point clouds.

XLA's TPU gather reads a full (8,128) tile per index, making the neighbor
feature gathers index-count-bound (~60ms for 10M edges on v5e regardless of
channel width). The windowed gather in ``ops/windowed.py`` replaces them
with dense one-hot matmuls over small row windows — which only pays off when
each query tile's neighbor indices cluster into a narrow row range. Sorting
both the database and the queries by Morton code provides that locality.

Sorting is an internal compute-layout change only: neighbor search, FPS and
all reference semantics still run in the original point order; layers
re-rank indices into sorted space and un-permute their outputs
(permutation gathers are M-sized, not M*K-sized, and therefore cheap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BITS = 10  # 1024 cells per axis -> 30-bit codes


def morton_codes(xyz: jax.Array) -> jax.Array:
    """Per-cloud z-order codes: quantize each axis to 2^10 cells over the
    cloud's bounding box and interleave bits. (B, N, 3) -> (B, N) int32."""
    mins = jnp.min(xyz, axis=1, keepdims=True)
    maxs = jnp.max(xyz, axis=1, keepdims=True)
    scale = jnp.maximum(maxs - mins, 1e-12)
    q = ((xyz - mins) / scale * (2**_BITS - 1)).astype(jnp.int32)
    q = jnp.clip(q, 0, 2**_BITS - 1)

    def spread(v):
        # Insert two zero bits between each of the 10 bits.
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    x, y, z = q[..., 0], q[..., 1], q[..., 2]
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def spatial_sort(xyz: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Morton argsort per cloud.

    Returns:
      perm: (B, N) int32 — sorted_row j holds original point perm[j].
      rank: (B, N) int32 — original point i lives at sorted row rank[i]
            (the inverse permutation).
    """
    codes = morton_codes(xyz[..., :3])
    perm = jnp.argsort(codes, axis=1).astype(jnp.int32)
    return perm, _invert_permutation(perm)


def _invert_permutation(perm: jax.Array) -> jax.Array:
    n = perm.shape[-1]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), perm.shape)
    rank = jnp.zeros_like(perm)
    return rank.at[
        jnp.arange(perm.shape[0])[:, None], perm
    ].set(iota)
