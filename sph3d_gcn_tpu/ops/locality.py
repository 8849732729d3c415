"""Spatial locality: axis-sorting point clouds for windowed edge compute.

The windowed engine in `ops/windowed.py` replaces per-edge gathers/scatters
with dense one-hot matmuls over contiguous sorted-row windows. Sorting each
cloud along one spatial axis gives a PROVABLE window bound: every neighbor
within ``radius`` of a query lies in the contiguous row slab
``|axis - query_axis| < radius`` (a Morton/z-order sort was tried first and
rejected: its rank jumps across octant boundaries make per-tile spans
routinely cover >1/3 of the cloud).

The sort axis is chosen PER CLOUD to minimize the worst 2*radius slab
occupancy (estimated from a 128-bin histogram) — picking the longest axis
fails on scene blocks where a dominant floor/wall plane concentrates half
the points in one slab of the long axis.

Sorting is a pure input permutation: models apply it once at the input
(``spatial_sort`` config flag), run every level on the sorted cloud, and
un-permute per-point outputs at the end. All reference semantics that
depend on point order (first-K neighbor selection, FPS seed: SURVEY.md §7)
are preserved *relative to the model's input order* — the reference itself
shuffles point order every training step (ref utils/data_util.py:21-31), so
this reordering is exactly as semantics-preserving as the reference's own
input pipeline. Disable ``spatial_sort`` for checkpoint-parity evaluation
against reference logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HIST_BINS = 128


def choose_sort_axis(xyz: jax.Array, radius: float) -> jax.Array:
    """Pick, per cloud, the axis minimizing the worst 2*radius slab count.

    Args:
      xyz: (B, N, 3) float32 coordinates.
      radius: the finest (level-0) search radius.

    Returns:
      (B,) int32 axis ids in {0, 1, 2}.
    """
    xyz = xyz.astype(jnp.float32)
    mins = jnp.min(xyz, axis=1, keepdims=True)         # (B, 1, 3)
    maxs = jnp.max(xyz, axis=1, keepdims=True)
    extent = jnp.maximum(maxs - mins, 1e-12)
    # 128-bin histogram per (cloud, axis): dense one-hot compare-sum.
    bins = ((xyz - mins) / extent * _HIST_BINS).astype(jnp.int32)
    bins = jnp.clip(bins, 0, _HIST_BINS - 1)           # (B, N, 3)
    iota = jnp.arange(_HIST_BINS, dtype=jnp.int32)
    hist = jnp.sum(
        (bins[..., None] == iota).astype(jnp.int32), axis=1
    )  # (B, 3, HIST)
    # Slab width in bins for each axis: ceil(2r / binwidth) + 1.
    width = jnp.ceil(
        2.0 * radius / (extent[:, 0, :] / _HIST_BINS)
    ).astype(jnp.int32) + 1                            # (B, 3)
    width = jnp.clip(width, 1, _HIST_BINS)
    # Max sliding-window sum of `width` consecutive bins, per axis.
    csum = jnp.cumsum(hist, axis=-1)                   # (B, 3, HIST)
    csum = jnp.pad(csum, ((0, 0), (0, 0), (1, 0)))
    starts = jnp.arange(_HIST_BINS)
    ends = jnp.minimum(starts[None, None, :] + width[..., None], _HIST_BINS)
    win = jnp.take_along_axis(csum, ends, axis=-1) - csum[..., :-1]
    occ = jnp.max(win, axis=-1)                        # (B, 3)
    return jnp.argmin(occ, axis=-1).astype(jnp.int32)


def spatial_sort(
    xyz: jax.Array, radius: float
) -> tuple[jax.Array, jax.Array]:
    """Per-cloud axis argsort.

    Args:
      xyz: (B, N, 3+) float coordinates (extra channels ignored).
      radius: finest search radius (drives the sort-axis choice).

    Returns:
      perm: (B, N) int32 — sorted row j holds original point perm[j].
      rank: (B, N) int32 — original point i lands at sorted row rank[i]
            (the inverse permutation; use it to un-permute outputs).
    """
    coords = xyz[..., :3].astype(jnp.float32)
    axis = choose_sort_axis(coords, radius)            # (B,)
    key = jnp.take_along_axis(
        coords, axis[:, None, None].astype(jnp.int32), axis=2
    )[..., 0]                                          # (B, N)
    perm = jnp.argsort(key, axis=1).astype(jnp.int32)
    return perm, invert_permutation(perm)


def sort_indices_small(idx: jax.Array) -> jax.Array:
    """Ascending stable sort of small (B, S) int32 index arrays.

    ``jnp.sort`` lowers to a per-row sort network (a lax.while measured at
    ~5-10ms per call on v5e for S~2k). For the subsample-index arrays
    (S <= a few thousand) an all-pairs compare-rank plus one scatter is a
    single fused compare-reduce (~S^2 ops) and ~10x faster. Stable and
    duplicate-safe: ties rank by original position, exactly like a stable
    sort of the values.
    """
    b, s = idx.shape
    pos = jnp.arange(s, dtype=jnp.int32)
    a_i = idx[:, :, None]
    a_j = idx[:, None, :]
    # rank_i = #{j : idx_j < idx_i or (idx_j == idx_i and j < i)}
    before = (a_j < a_i) | ((a_j == a_i) & (pos[None, :, None] > pos[None, None, :]))
    rank = jnp.sum(before.astype(jnp.int32), axis=-1)      # (B, S)
    return (
        jnp.zeros((b, s), jnp.int32)
        .at[jnp.arange(b)[:, None], rank]
        .set(idx, mode="drop")
    )


def invert_permutation(perm: jax.Array) -> jax.Array:
    """(B, N) permutation -> its inverse."""
    n = perm.shape[-1]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), perm.shape)
    rank = jnp.zeros_like(perm)
    return rank.at[
        jnp.arange(perm.shape[0])[:, None], perm
    ].set(iota)


def permute_points(
    x: jax.Array, perm: jax.Array, inv: jax.Array | None = None
) -> jax.Array:
    """Reorder the point axis: (B, N, ...) x (B, N) -> (B, N, ...).

    With ``inv`` (the inverse permutation) given, the op carries a
    custom VJP whose backward is a GATHER by ``inv`` instead of XLA's
    generic scatter-add cotangent — a permutation's transpose is itself
    a permutation, but XLA cannot know the index map is a bijection.
    On v5e the scatter-add path costs ~2.5x the gather (~17 vs ~7
    ns/index), ~1.5 ms per step on the S3DIS logits unsort alone.
    """
    if inv is None:
        return _take_rows(x, perm)
    return _permute_points_vjp(x, perm, inv)


def _take_rows(x: jax.Array, perm: jax.Array) -> jax.Array:
    expand = (1,) * (x.ndim - 2)
    return jnp.take_along_axis(x, perm.reshape(perm.shape + expand), axis=1)


@jax.custom_vjp
def _permute_points_vjp(x, perm, inv):
    return _take_rows(x, perm)


def _permute_fwd(x, perm, inv):
    return _take_rows(x, perm), (perm, inv)


def _permute_bwd(res, g):
    perm, inv = res
    return _take_rows(g, inv), None, None


_permute_points_vjp.defvjp(_permute_fwd, _permute_bwd)
