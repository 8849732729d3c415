"""Graph construction for the SPH3D encoder/decoder pyramids.

Functional counterparts of ``build_graph`` / ``build_graph_deconv`` /
``build_global_graph`` (ref utils/sph3gcn_util.py:20-58). The reference
returns TF ``gather_nd`` index pairs (B, S, 2); here subsampling indices are
plain (B, S) int32 arrays consumed with ``take_along_axis`` helpers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sph3d_gcn_tpu.ops.dense import (
    DenseNeighborhood,
    build_dense_graph,
    dense_ids_prob,
)
from sph3d_gcn_tpu.ops.neighbor import (
    build_sphere_neighbor,
    build_sphere_neighbor_and_bins,
)
from sph3d_gcn_tpu.ops.locality import sort_indices_small
from sph3d_gcn_tpu.ops.sample import (
    farthest_point_sample,
    inverse_density_sample,
    random_sample,
)
from sph3d_gcn_tpu.ops.types import Neighborhood

# Default neighbor search method, as the reference fixes it
# (ref utils/sph3gcn_util.py:17).
neighbor_fn = build_sphere_neighbor


def build_graph(
    xyz: jax.Array,
    radius: float,
    nn_uplimit: int,
    num_sample: int | None,
    sample_method: str | None = None,
    key: jax.Array | None = None,
    kernel: tuple[int, int, int] | None = None,
) -> tuple[Neighborhood, jax.Array | None] | tuple[
    Neighborhood, jax.Array, jax.Array | None
]:
    """Intra-level sphere graph plus optional subsampling indices.

    Mirrors ref utils/sph3gcn_util.py:28-49. With ``kernel`` given, the
    spherical filter bins are computed inside the query (fused fast path)
    and the return becomes (Neighborhood, filt_index, sample_index).

    Args:
      xyz: (B, N, 3) float32 point coordinates.
      radius: sphere search radius.
      nn_uplimit: fixed neighbor budget K.
      num_sample: coarse point count S, or None to skip subsampling.
      sample_method: 'FPS' | 'IDS' | 'random' (ref :33-41).
      key: PRNG key, required for 'IDS'/'random'.
      kernel: optional (n, p, q) spherical kernel to fuse bin assignment.

    Returns:
      (Neighborhood, sample_index or None) — or with ``kernel``,
      (Neighborhood, filt_index, sample_index or None).
    """
    if kernel is not None:
        intra, filt = build_sphere_neighbor_and_bins(
            xyz, xyz, radius, nn_uplimit, kernel, self_graph=True
        )
    else:
        intra = neighbor_fn(xyz, xyz, radius=radius, nn_sample=nn_uplimit,
                            self_graph=True)
        filt = None

    if num_sample is None:
        return (intra, filt, None) if kernel is not None else (intra, None)

    if sample_method == "random":
        if key is None:
            raise ValueError("random sampling requires a PRNG key")
        sample_index = random_sample(num_sample, xyz, key)
    elif sample_method == "FPS":
        sample_index = farthest_point_sample(num_sample, xyz)
    elif sample_method == "IDS":
        if key is None:
            raise ValueError("IDS sampling requires a PRNG key")
        prob = jnp.sum(intra.dist, axis=-1) / jnp.maximum(
            intra.count, 1
        ).astype(jnp.float32)
        sample_index = inverse_density_sample(num_sample, prob, key)
    else:
        raise ValueError(f"Unknown sampling method: {sample_method!r}")

    if kernel is not None:
        return intra, filt, sample_index
    return intra, sample_index


def build_graph_dense(
    xyz: jax.Array,
    radius: float,
    nn_uplimit: int,
    num_sample: int | None,
    sample_method: str | None = None,
    key: jax.Array | None = None,
    kernel: tuple[int, int, int] = (8, 2, 2),
    window: int = 1024,
    query_shard: tuple[str, int] | None = None,
) -> tuple[DenseNeighborhood, jax.Array | None]:
    """Dense-map counterpart of :func:`build_graph` (fast mode).

    Same graph semantics (first-K selection, counts, spherical bins, IDS
    probabilities — see ops/dense.py) but no per-edge index lists; the
    subsample indices come back SORTED so coarser levels stay axis-sorted.

    ``query_shard`` (point-axis sharding, inside shard_map) computes only
    this shard's query tiles — see ops/dense.build_dense_graph. The
    SAMPLING stays replicated: FPS is a sequential global greedy over the
    whole cloud (ref tf_sample_gpu.cu:16-67) and its indices are needed by
    every shard; it is O(N·S) on coordinates only.

    Returns:
      (DenseNeighborhood, sample_index (B, S) int32 or None).
    """
    need_dist = sample_method == "IDS" and num_sample is not None
    if query_shard is not None and sample_method == "IDS":
        raise ValueError(
            "IDS sampling needs the full per-point density map and is not "
            "supported with a tile-sharded graph build (use FPS/random)"
        )
    dnbh = build_dense_graph(
        xyz, xyz, radius, nn_uplimit, kernel, window=window,
        self_graph=True, need_dist=need_dist, query_shard=query_shard,
    )
    if num_sample is None:
        return dnbh, None
    if sample_method == "random":
        if key is None:
            raise ValueError("random sampling requires a PRNG key")
        sample_index = random_sample(num_sample, xyz, key)
    elif sample_method == "FPS":
        sample_index = farthest_point_sample(num_sample, xyz)
    elif sample_method == "IDS":
        if key is None:
            raise ValueError("IDS sampling requires a PRNG key")
        sample_index = inverse_density_sample(
            num_sample, dense_ids_prob(dnbh), key
        )
    else:
        raise ValueError(f"Unknown sampling method: {sample_method!r}")
    return dnbh, sort_indices_small(sample_index)


def build_pool_graph_dense(
    xyz: jax.Array,
    xyz_sampled: jax.Array,
    radius: float,
    nn_uplimit: int,
    window: int,
    query_shard: tuple[str, int] | None = None,
) -> DenseNeighborhood:
    """Dense pooling graph: the sampled points re-query the level cloud.

    Row-for-row identical to gathering the intra-level neighborhood at the
    sampled indices (selection is independent per query row), which is how
    the classic path builds the pooling graph (ref sph3gcn_util.py:28-49 +
    the gather_nd coarsening in the models). ``query_shard`` computes only
    this shard's coarse query tiles (point-axis sharding).
    """
    return build_dense_graph(
        xyz, xyz_sampled, radius, nn_uplimit, None, window=window,
        self_graph=False, query_shard=query_shard,
    )


def build_graph_deconv_dense(
    xyz: jax.Array,
    xyz_unpool: jax.Array,
    radius: float,
    nn_uplimit: int,
    kernel: tuple[int, int, int],
    window: int,
    need_dist: bool = False,
    dec_margin: int = 384,
    growth_steps: int = 12,
    intra_shard: tuple[str, int] | None = None,
    inter_shard: tuple[str, int] | None = None,
) -> tuple[DenseNeighborhood, DenseNeighborhood]:
    """Dense counterpart of :func:`build_graph_deconv`: coarse intra maps
    plus fine->coarse inter maps for unpooling.

    The inter graph reproduces the reference's +0.05 radius growth for
    fine points with no coarse neighbor (ref tf_nnquery_gpu.cu:30-60, the
    common case at the finest decoder level) with a window widened by
    ``dec_margin`` rows so the grown slab stays covered; coverage is
    re-certified per tile at each tile's grown radius
    (DenseNeighborhood.ok). ``dec_margin`` and ``growth_steps`` are
    dataset-calibrated (scripts/measure_windows.py).
    """
    intra = build_dense_graph(
        xyz, xyz, radius, nn_uplimit, kernel, window=window,
        self_graph=True, query_shard=intra_shard,
    )
    inter = build_dense_graph(
        xyz, xyz_unpool, radius, nn_uplimit, None,
        window=window + dec_margin,
        self_graph=False, need_dist=need_dist, growth_steps=growth_steps,
        query_shard=inter_shard,
    )
    return intra, inter


def build_graph_deconv(
    xyz: jax.Array,
    xyz_unpool: jax.Array,
    radius: float,
    nn_uplimit: int,
    kernel: tuple[int, int, int] | None = None,
) -> tuple[Neighborhood, Neighborhood] | tuple[
    Neighborhood, jax.Array, Neighborhood
]:
    """Intra edges at the coarse level + inter edges coarse->fine for
    unpooling (ref utils/sph3gcn_util.py:52-58).

    ``inter`` queries are the *fine* points searching the *coarse* database,
    so ``inter.idx`` indexes coarse points per fine point. With ``kernel``
    given the intra bins are fused into the query and the return becomes
    (intra, filt_index, inter).
    """
    inter = neighbor_fn(xyz, xyz_unpool, radius=radius, nn_sample=nn_uplimit)
    if kernel is not None:
        intra, filt = build_sphere_neighbor_and_bins(
            xyz, xyz, radius, nn_uplimit, kernel, self_graph=True
        )
        return intra, filt, inter
    intra = neighbor_fn(xyz, xyz, radius=radius, nn_sample=nn_uplimit,
                        self_graph=True)
    return intra, inter


def build_global_graph(
    xyz: jax.Array, query: jax.Array, radius: float
) -> Neighborhood:
    """All-points-to-centroid edges with nn_sample = N
    (ref utils/sph3gcn_util.py:20-25)."""
    nn_uplimit = xyz.shape[1]
    return neighbor_fn(xyz, query, radius=radius, nn_sample=nn_uplimit)


def gather_points(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Subsample along the point axis: (B, N, ...), (B, S) -> (B, S, ...).

    Replaces the reference's batched ``tf.gather_nd`` coarsening
    (ref models/SPH3D_modelnet.py:73-76).
    """
    expand = (1,) * (x.ndim - 2)
    idx_b = idx.reshape(idx.shape + expand)
    return jnp.take_along_axis(x, idx_b, axis=1)


def gather_neighborhood(nbh: Neighborhood, idx: jax.Array) -> Neighborhood:
    """Gather neighborhood rows at the sampled coarse points."""
    return Neighborhood(
        idx=gather_points(nbh.idx, idx),
        count=gather_points(nbh.count, idx),
        dist=None if nbh.dist is None else gather_points(nbh.dist, idx),
    )
