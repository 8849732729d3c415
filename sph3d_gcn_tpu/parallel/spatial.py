"""Point-axis (spatial) sharding for the dense windowed engine.

The reference is single-GPU (SURVEY.md §2.7); its whole-scene story is
cutting scenes into independent blocks. The TPU-native scaling story for
the point axis itself is the context-parallelism analogue: contiguous,
axis-sorted row chunks of each cloud live on different devices of an ICI
mesh axis, and every device computes its own query tiles.

This composes with the dense windowed engine (ops/dense.py) because that
engine already proves a locality bound per 128-query tile: all of a
tile's candidate rows lie in one W-row slab starting at ``s_blk``. A
shard therefore needs only a bounded HALO of feature rows from its ring
neighbours — exchanged with ``lax.ppermute`` hops over ICI — instead of
an all-gather, and the dense kernels (conv both orientations, rank pool,
masked means) run UNCHANGED per shard on the haloed feature block with
``s_blk`` rebased into halo-local coordinates.

Safety follows the engine's certificate design: ``local_neighborhood``
emits a ``shard_ok`` flag (the sharding analogue of ``dense_ok``) that
is True iff every rebased window fit inside the halo; windows are
clamped into bounds so out-of-halo steps stay well-defined, and callers
treat ``shard_ok=False`` like ``dense_ok=False`` (fall back / recompute
unsharded). Halos are calibrated the same way windows are
(scripts/measure_windows.py measures worst slabs; the halo bound for
intra-level self-graphs is one window each side).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.dense import TILE, DenseNeighborhood

__all__ = [
    "halo_exchange",
    "halo_reduce",
    "pad_count_for_sharding",
    "local_neighborhood",
    "localize_tiles",
    "slice_rows_local",
    "all_rows",
    "shardable_rows",
]


def _ring_shift(x: jax.Array, hop: int, axis_name: str) -> jax.Array:
    """Non-periodic ring shift: device i receives x from device i - hop
    (zeros where no source exists). hop < 0 receives from i + |hop|."""
    n = lax.axis_size(axis_name)
    if hop > 0:
        perm = [(i, i + hop) for i in range(n - hop)]
    else:
        perm = [(i, i + hop) for i in range(-hop, n)]
    return lax.ppermute(x, axis_name, perm)


def halo_exchange(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """(B, n_local, ...) shard -> (B, halo + n_local + halo, ...).

    Rows [0, halo) come from the left ring neighbours' tails, rows
    [halo + n_local, ...) from the right neighbours' heads; edge devices
    see zeros (matching the zero-padding the dense kernels already mask
    by construction — padded window slots carry ``packed == 0``).

    A halo wider than the shard is exchanged in ``ceil(halo/n_local)``
    ppermute hops (each hop h sends the slab the device at ring distance
    h owns). Differentiable: ppermute/concat/slice transpose cleanly, so
    the VJP is the matching halo *reduction* (cross-shard cotangents ride
    the reverse permutation and sum into the owners) for free.
    """
    if halo == 0:
        return x
    n_local = x.shape[1]
    hops = -(-halo // n_local)
    left = []
    right = []
    for h in range(1, hops + 1):
        take = min(n_local, halo - (h - 1) * n_local)
        # left halo, hop h: rows [r0 - h*n, r0 - (h-1)*n) = that
        # neighbour's TAIL `take` rows; farthest hop is leftmost.
        left.insert(0, _ring_shift(x[:, n_local - take:], h, axis_name))
        # right halo, hop h: that neighbour's HEAD `take` rows.
        right.append(_ring_shift(x[:, :take], -h, axis_name))
    return jnp.concatenate(left + [x] + right, axis=1)


def halo_reduce(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Transpose of :func:`halo_exchange` as an explicit op: fold the halo
    rows of a (B, halo + n_local + halo, ...) block back onto their owning
    shards and return the (B, n_local, ...) reduction.

    ``jax.grad`` through :func:`halo_exchange` produces exactly this; the
    explicit form exists for forward-mode scatter-style flows (e.g.
    accumulating per-window cotangents produced OUTSIDE an autodiff
    context) and for testing the transpose."""
    if halo == 0:
        return x
    n_local = x.shape[1] - 2 * halo
    assert n_local > 0, (x.shape, halo)
    hops = -(-halo // n_local)
    out = x[:, halo:halo + n_local]
    off = halo
    for h in range(1, hops + 1):
        take = min(n_local, halo - (h - 1) * n_local)
        off -= take
        # rows this device holds for the neighbour h to its LEFT: send
        # them right so the owner adds its own tail slab.
        lpart = _ring_shift(x[:, off:off + take], -h, axis_name)
        out = out.at[:, n_local - take:].add(lpart)
        rpart = _ring_shift(
            x[:, halo + n_local + (h - 1) * n_local:
              halo + n_local + (h - 1) * n_local + take],
            h, axis_name,
        )
        out = out.at[:, :take].add(rpart)
    return out


def pad_count_for_sharding(
    dnbh: DenseNeighborhood, num_shards: int
) -> DenseNeighborhood:
    """Pad the per-query count row to the padded tile grid so every
    shard-of-tiles carries an aligned (B, n_t_local * TILE) count slice.

    The dense ops already treat rows past ``num_query`` as padding
    (count 0, packed 0); after this the count axis and the tile axis
    shard with the same spec. The tile count must divide ``num_shards``.
    """
    b, n_t = dnbh.s_blk.shape
    if n_t % num_shards:
        raise ValueError(
            f"{n_t} query tiles not divisible by {num_shards} shards; "
            "pad the cloud (configs round num_input) or change the mesh"
        )
    m_pad = n_t * TILE
    count = jnp.pad(
        dnbh.count, ((0, 0), (0, m_pad - dnbh.count.shape[1]))
    )
    return dataclasses.replace(dnbh, count=count, num_query=m_pad)


def local_neighborhood(
    dnbh: DenseNeighborhood,
    axis_name: str,
    halo_blocks: int,
    n_local_blocks: int,
) -> tuple[DenseNeighborhood, jax.Array]:
    """Rebase a tile-sharded neighborhood into halo-local row coordinates.

    Called INSIDE ``shard_map``: ``dnbh`` fields hold this shard's tile
    chunk (packed/s_blk/count sharded on the tile/query axes, ``ok``
    replicated), ``n_local_blocks`` is the shard's own feature-row extent
    in TILE blocks and ``halo_blocks`` the halo exchanged on each side
    (:func:`halo_exchange` with ``halo = halo_blocks * TILE``).

    Returns the local neighborhood (s_blk rebased and CLAMPED into the
    haloed block) plus ``shard_ok``: True iff no clamping was needed,
    i.e. every window provably lay inside [r0 - halo, r1 + halo). For
    intra-level self-graphs one window of halo always suffices (a tile's
    window starts at or before its own first row and spans W); inter-
    level graphs calibrate the halo like windows are calibrated.
    """
    w_blocks = dnbh.window // TILE
    r0 = lax.axis_index(axis_name).astype(jnp.int32) * n_local_blocks
    s_local = dnbh.s_blk - r0 + halo_blocks
    hi = n_local_blocks + 2 * halo_blocks - w_blocks
    shard_ok = jnp.all((s_local >= 0) & (s_local <= hi))
    s_local = jnp.clip(s_local, 0, hi)
    local = dataclasses.replace(
        dnbh, s_blk=s_local, ok=dnbh.ok & shard_ok
    )
    return local, shard_ok


def shardable_rows(num_rows: int, num_shards: int) -> bool:
    """True when a row axis of ``num_rows`` points splits into equal,
    TILE-aligned, non-empty per-shard tile chunks. Levels that fail (the
    coarse tails of the encoder pyramid, e.g. 384 or 128 points on an
    8-way axis) run replicated — they carry a negligible share of the
    FLOPs, which concentrate at the fine levels this helper admits."""
    n_t = num_rows // TILE
    return (
        num_rows % TILE == 0
        and n_t % num_shards == 0
        and n_t >= num_shards
    )


def slice_rows_local(x: jax.Array, axis_name: str) -> jax.Array:
    """(B, N, ...) replicated -> this shard's contiguous (B, N/d, ...)
    row chunk (inside shard_map)."""
    shards = lax.axis_size(axis_name)
    n_local = x.shape[1] // shards
    i = lax.axis_index(axis_name)
    return lax.dynamic_slice_in_dim(x, i * n_local, n_local, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def psum_replicated(x: jax.Array, axis_name: str) -> jax.Array:
    """psum for summing per-shard contributions into a replicated value,
    with the correct IDENTITY transpose.

    The logical map is y_i = sum_j x_j for every shard i: its transpose
    is dx_j = sum_i ct_i, and when the downstream treats y as ONE
    replicated value (out_specs P()), the logical cotangent is a single
    ct distributed once — each shard's seed must be ct, NOT psum(ct).
    shard_map with check_vma=False transposes its built-in psum as
    another psum (measured: loss seeds came out d x too large, corrupting
    every gradient downstream of a psum'd loss), so replicated-loss
    reductions must use this op."""
    return lax.psum(x, axis_name)


def _psum_replicated_fwd(x, axis_name):
    return lax.psum(x, axis_name), None


def _psum_replicated_bwd(axis_name, _, ct):
    return (ct,)


psum_replicated.defvjp(_psum_replicated_fwd, _psum_replicated_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def all_rows(x: jax.Array, axis_name: str) -> jax.Array:
    """(B, N/d, ...) shard -> replicated (B, N, ...) tiled all-gather.

    Carries an explicit VJP because shard_map with ``check_vma=False``
    transposes ``lax.all_gather`` a factor-of-d too large (measured:
    grads through a gather-then-replicated-loss came out exactly d x the
    true gradient). The true transpose: the gathered value is ONE
    logical array consumed by every shard, so a shard's input-row
    cotangent is the psum of all shards' cotangents at its rows."""
    return lax.all_gather(x, axis_name, axis=1, tiled=True)


def _all_rows_fwd(x, axis_name):
    return lax.all_gather(x, axis_name, axis=1, tiled=True), None


def _all_rows_bwd(axis_name, _, ct):
    return (slice_rows_local(lax.psum(ct, axis_name), axis_name),)


all_rows.defvjp(_all_rows_fwd, _all_rows_bwd)


def localize_tiles(
    dnbh: DenseNeighborhood,
    axis_name: str,
    halo_blocks: int | None,
    db_blocks_local: int | None = None,
) -> tuple[DenseNeighborhood, jax.Array]:
    """Slice this shard's query-tile chunk out of a replicated
    neighborhood and (when the database rows are sharded too) rebase its
    windows into halo-local coordinates.

    Called inside ``shard_map``. ``halo_blocks=None`` means the database
    feature rows stay replicated (no halo exchange, s_blk unchanged) —
    the query tiles alone shard, e.g. unpooling from a replicated coarse
    level onto a sharded fine level. Otherwise the consumer feeds the op
    ``halo_exchange(local_rows, halo_blocks * TILE)`` and
    ``db_blocks_local`` names the shard's own row extent in TILE blocks
    (see :func:`local_neighborhood`).
    """
    shards = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    n_t = dnbh.s_blk.shape[1]
    if n_t % shards:
        raise ValueError(
            f"{n_t} query tiles do not split over {shards} shards"
        )
    ntl = n_t // shards

    def sl(a):
        return lax.dynamic_slice_in_dim(a, i * ntl, ntl, axis=1)

    m_pad = n_t * TILE
    count = jnp.pad(
        dnbh.count, ((0, 0), (0, m_pad - dnbh.count.shape[1]))
    )
    count = lax.dynamic_slice_in_dim(count, i * (ntl * TILE), ntl * TILE, 1)
    local = dataclasses.replace(
        dnbh,
        packed=sl(dnbh.packed),
        s_blk=sl(dnbh.s_blk),
        dist=None if dnbh.dist is None else sl(dnbh.dist),
        count=count,
        num_query=ntl * TILE,
    )
    if halo_blocks is None:
        return local, jnp.bool_(True)
    assert db_blocks_local is not None
    return local_neighborhood(
        local, axis_name, halo_blocks, db_blocks_local
    )
