"""Core data structures for fixed-degree point-cloud graphs.

The reference (SPH3D-GCN) represents neighborhoods as dynamically counted
lists written by CUDA kernels (`tf_ops/nnquery/tf_nnquery_gpu.cu`). On TPU we
use *fixed-degree padded* neighborhoods so every downstream op is a
static-shape gather + masked reduction that XLA tiles onto the MXU/VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax


class Neighborhood(NamedTuple):
    """A padded fixed-degree neighborhood graph.

    Attributes:
      idx:   int32 (B, M, K). ``idx[b, m, k]`` is the database-point index of
             query ``m``'s k-th neighbor. Entries with ``k >= count[b, m]``
             are padding (0) and must be ignored via the count mask.
      count: int32 (B, M). Number of valid neighbors, clamped to K. The sphere
             query guarantees >= 1 (radius growth,
             ref ``tf_ops/nnquery/tf_nnquery_gpu.cu:30-60``).
      dist:  float32 (B, M, K). The reference's quirky *sqrt-space* distance:
             ``sqrt(euclidean_distance)``, i.e. d**0.5 not d
             (ref ``tf_ops/nnquery/tf_nnquery_gpu.cu:54``). Padding entries
             are 0. ``None`` for cube queries (which produce no distances).
    """

    idx: jax.Array
    count: jax.Array
    dist: jax.Array | None = None

    @property
    def degree(self) -> int:
        return self.idx.shape[-1]


class CubeNeighborhood(NamedTuple):
    """Cube-query result: neighbor indices plus direct grid-bin assignment.

    Mirrors ``BuildCubeNeighbor`` (ref ``tf_ops/nnquery/tf_nnquery_gpu.cu:96-108``)
    whose output packs (point_index, bin_index) pairs.
    """

    idx: jax.Array   # int32 (B, M, K)
    bin: jax.Array   # int32 (B, M, K), bin id in [0, gridsize**3)
    count: jax.Array  # int32 (B, M)
