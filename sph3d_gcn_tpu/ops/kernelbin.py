"""Spherical kernel bin assignment.

TPU-native counterpart of ``SphericalKernel``
(`tf_ops/buildkernel/tf_buildkernel_gpu.cu:20-78`, wrapper
`tf_ops/buildkernel/tf_buildkernel.py:10`). Purely elementwise over the
(B, M, K) edge set — compiles to fused VPU ops, no custom kernel needed.

For each (query, neighbor) edge the displacement is binned into one of
``n*p*q + 1`` spherical bins:

- ``theta = atan2(dy, dx)`` folded into [0, 2*pi);
- ``phi = atan2(dz, dist2D)`` folded into [0, pi];
- radial coordinate uses the *sqrt-space* ``nn_dist`` from the sphere query
  (ref tf_nnquery_gpu.cu:54), so ``gamma = nn_dist * q / (radius + 1e-6)``
  reproduces the reference's radial bin edges exactly;
- bin 0 is reserved for the self-loop: an edge with
  ``nn_dist <= M_EPS = 1.01e-3`` keeps bin 0
  (ref tf_buildkernel_gpu.cu:6,52-54).

Attribute validation mirrors ref tf_buildkernel.cpp:42-49.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from sph3d_gcn_tpu.ops.types import Neighborhood

_M_EPS = 1.01e-3  # ref tf_buildkernel_gpu.cu:6
_EPS = 1e-6       # ref tf_buildkernel_gpu.cu:53


def validate_kernel_size(kernel: tuple[int, int, int]) -> None:
    """Reference attr checks: n>2 even, p>0 even, q>0 (ref tf_buildkernel.cpp:42-49)."""
    n, p, q = kernel
    if not (n > 2 and n % 2 == 0):
        raise ValueError(f"azimuth bins n must be even and > 2, got {n}")
    if not (p > 0 and p % 2 == 0):
        raise ValueError(f"elevation bins p must be even and > 0, got {p}")
    if not q > 0:
        raise ValueError(f"radial bins q must be > 0, got {q}")


@functools.partial(jax.jit, static_argnames=("radius", "kernel"))
def spherical_kernel(
    database: jax.Array,
    query: jax.Array,
    neighborhood: Neighborhood,
    radius: float,
    kernel: tuple[int, int, int] = (8, 2, 3),
) -> jax.Array:
    """Assign each neighbor edge to a spherical filter bin.

    Args:
      database: (B, N, 3+) float32; xyz used.
      query:    (B, M, 3+) float32; xyz used.
      neighborhood: sphere-query result (idx, count, sqrt-space dist).
      radius: the search radius used for the query.
      kernel: (n, p, q) azimuth/elevation/radial bin counts.

    Returns:
      (B, M, K) int32 bin indices in [0, n*p*q]; bin 0 = self-loop. Padding
      entries (k >= count) are set to 0 and must be masked downstream.
    """
    validate_kernel_size(kernel)
    n_bins, p_bins, q_bins = kernel

    db = database[..., :3].astype(jnp.float32)
    q = query[..., :3].astype(jnp.float32)
    idx, count, dist = neighborhood.idx, neighborhood.count, neighborhood.dist
    k = idx.shape[-1]

    # delta = db[nn] - query (ref tf_buildkernel_gpu.cu:40-47)
    gathered = _gather_points(db, idx)
    delta = gathered - q[:, :, None, :]  # (B, M, K, 3)
    dist2d = jnp.sqrt(delta[..., 0] ** 2 + delta[..., 1] ** 2)

    pi = math.pi
    theta = jnp.arctan2(delta[..., 1], delta[..., 0])
    # Fold to [0, 2*pi) exactly as the CUDA clamps (ref tf_buildkernel_gpu.cu:57-60).
    theta = jnp.where(theta < pi, theta, -pi)
    theta = jnp.maximum(theta, -pi)
    theta = theta + pi

    phi = jnp.arctan2(delta[..., 2], dist2d)
    phi = jnp.minimum(phi, pi / 2)
    phi = jnp.maximum(phi, -pi / 2)
    phi = phi + pi / 2

    alpha = theta * n_bins / 2.0 / pi
    beta = phi * p_bins / pi
    gamma = dist * q_bins / (radius + 1e-6)

    n_id = jnp.minimum(n_bins - 1, alpha.astype(jnp.int32))
    p_id = jnp.minimum(p_bins - 1, beta.astype(jnp.int32))
    q_id = jnp.minimum(q_bins - 1, gamma.astype(jnp.int32))

    bins = q_id * p_bins * n_bins + p_id * n_bins + n_id + 1

    # Self-loop rule: keep bin 0 unless dist > M_EPS with the 1e-6 margin
    # (ref tf_buildkernel_gpu.cu:52-54); padding entries also 0.
    is_far = (dist > _M_EPS) & (jnp.abs(dist - _M_EPS) > _EPS)
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2) < count[..., None]
    return jnp.where(is_far & valid, bins, 0).astype(jnp.int32)


def _gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather per-neighbor point coordinates: (B,N,C),(B,M,K) -> (B,M,K,C)."""
    b, m, k = idx.shape
    flat = jnp.take_along_axis(points, idx.reshape(b, m * k, 1), axis=1)
    return flat.reshape(b, m, k, points.shape[-1])
