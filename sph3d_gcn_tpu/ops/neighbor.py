"""Range / nearest-neighbor queries (sphere and cube) — TPU-native.

Reproduces the semantics of the reference CUDA ops ``BuildSphereNeighbor`` /
``BuildCubeNeighbor`` (`tf_ops/nnquery/tf_nnquery_gpu.cu`, wrappers
`tf_ops/nnquery/tf_nnquery.py:9,36`) with a design that maps onto TPU:

- Pairwise distances are computed tile-by-tile with a batched matmul
  (``|q|^2 - 2 q.db^T + |db|^2``) so the O(M*N) scan rides the MXU.
- "Keep the first ``nn_sample`` in point order within radius"
  (ref `tf_nnquery_gpu.cu:49-55`) becomes an integer ``top_k``: score
  in-range point ``n`` as ``N - n`` so the K largest scores are the K
  *smallest indices*, returned in ascending point order.
- The zero-neighbor fallback ("grow radius by +0.05 and rescan",
  ref `tf_nnquery_gpu.cu:30-60`) becomes a bounded ``lax.while_loop`` over a
  per-query radius vector, reusing the already-computed distance tile.

Reproduced quirks (required for checkpoint/metric parity, see SURVEY.md §7):
- strict ``dist < radius`` with an extra ``|dist - radius| > 1e-6`` margin
  (ref `tf_nnquery_gpu.cu:49`);
- the stored distance is ``sqrt(euclidean_dist)`` — sqrt applied twice to the
  squared distance (ref `tf_nnquery_gpu.cu:54`);
- ``count = min(total_in_range, nn_sample)`` where the total keeps counting
  past ``nn_sample`` (ref `tf_nnquery_gpu.cu:56-62`) but is clamped for the
  output (ref `tf_nnquery_gpu.cu:62`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from sph3d_gcn_tpu.ops.types import CubeNeighborhood, Neighborhood

# Byte budget for one (B, T, N) f32 distance tile; keeps HBM transients small.
_TILE_BYTES = 128 * 1024 * 1024
_GROW_STEP = 0.05        # ref tf_nnquery_gpu.cu:59
_BOUNDARY_EPS = 1e-6     # ref tf_nnquery_gpu.cu:49
_MAX_GROW_ITERS = 512    # bounds the data-dependent rescan loop for XLA


def _query_tile_size(batch: int, num_db: int, num_query: int) -> int:
    """Pick a query-tile size T so a (B, T, N) f32 tile fits the byte budget."""
    t = _TILE_BYTES // max(1, 4 * batch * num_db)
    t = max(8, min(num_query, t))
    # Round down to a multiple of 8 (f32 sublane) unless tiny.
    if t > 8:
        t = (t // 8) * 8
    return t


def _pairwise_dist(q_tile: jax.Array, db: jax.Array, db_sq: jax.Array) -> jax.Array:
    """Euclidean distance (B, T, N) between query tile and database, via MXU.

    Matches ``dist3D = sqrt(dx^2 + dy^2 + dz^2)`` (ref tf_nnquery_gpu.cu:44-46)
    up to the usual matmul-form cancellation (~1e-6 relative).
    """
    q_sq = jnp.sum(q_tile * q_tile, axis=-1, keepdims=True)        # (B, T, 1)
    # HIGHEST precision: on TPU the default matmul precision is bf16, which
    # would corrupt the 1e-6 radius boundary test (ref tf_nnquery_gpu.cu:49).
    cross = jnp.einsum(
        "btc,bnc->btn",
        q_tile,
        db,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    d2 = q_sq - 2.0 * cross + db_sq[:, None, :]                    # (B, T, N)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


_SEL_BLOCK = 128  # lane-block size for the two-level selection


def _first_k_in_order(mask: jax.Array, num_db: int, k: int):
    """Select the first `k` True positions of `mask` along the last axis.

    Returns (idx (.., k) int32, valid (.., k) bool, total (..,) int32) with
    selected indices in ascending point order — the order the CUDA scan
    stores them (ref tf_nnquery_gpu.cu:49-55).

    Two-level selection (``lax.top_k`` would be semantically equivalent but
    XLA lowers it to a full per-row sort — ~28ms per (3200 x 10k) tile on
    v5e): (1) count set bits per 128-lane block, prefix-sum the tiny block
    axis, and binary-search it (unrolled, log2(#blocks) cheap steps) to
    locate each target's block; (2) gather the chosen blocks' within-block
    prefix sums (contiguous 128-lane rows) and resolve the exact lane with
    one comparison-reduction.
    """
    lead = mask.shape[:-1]
    num_pad = -(-num_db // _SEL_BLOCK) * _SEL_BLOCK
    num_blocks = num_pad // _SEL_BLOCK
    mask_i = mask.astype(jnp.int32)
    if num_pad != num_db:
        mask_i = jnp.pad(mask_i, [(0, 0)] * len(lead) + [(0, num_pad - num_db)])
    blocks = mask_i.reshape(lead + (num_blocks, _SEL_BLOCK))
    within = jnp.cumsum(blocks, axis=-1)          # (.., nb, 128)
    blk_cnt = within[..., -1]                     # (.., nb)
    blk_end = jnp.cumsum(blk_cnt, axis=-1)        # set bits up to block end
    total = blk_end[..., -1]

    targets = jnp.arange(1, k + 1, dtype=jnp.int32)  # (k,)
    # Level 1: first block with blk_end >= target (unrolled binary search
    # over the tiny block axis).
    lo = jnp.zeros(lead + (k,), jnp.int32)
    hi = jnp.full(lead + (k,), num_blocks - 1, jnp.int32)
    for _ in range(max(1, (num_blocks - 1).bit_length())):
        mid = (lo + hi) >> 1
        reached = jnp.take_along_axis(blk_end, mid, axis=-1) >= targets
        lo = jnp.where(reached, lo, mid + 1)
        hi = jnp.where(reached, mid, hi)
    blk_id = jnp.clip(lo, 0, num_blocks - 1)

    # Level 2: rank within the block, resolved against the block's
    # within-block prefix sums (one contiguous-row gather + a reduction).
    prev_end = jnp.take_along_axis(
        jnp.pad(blk_end[..., :-1], [(0, 0)] * len(lead) + [(1, 0)]),
        blk_id,
        axis=-1,
    )
    rank_in_blk = targets - prev_end               # 1-based within block
    sel_within = jnp.take_along_axis(
        within, blk_id[..., None], axis=-2
    )                                              # (.., k, 128)
    lane = jnp.sum(
        (sel_within < rank_in_blk[..., None]).astype(jnp.int32), axis=-1
    )
    idx = blk_id * _SEL_BLOCK + lane
    valid = targets <= total[..., None]
    idx = jnp.where(valid, jnp.minimum(idx, num_db - 1), 0)
    return idx.astype(jnp.int32), valid, total


def _octant_code(dx: jax.Array, dy: jax.Array, n_bins: int) -> jax.Array:
    """Azimuth bin of ``theta = atan2(dy, dx)`` folded to [0, 2*pi), via sign
    tests only — no atan2, no gather. Matches the reference binning
    (ref tf_buildkernel_gpu.cu:57-66) everywhere except within float
    rounding of the exact sector boundaries (measure-zero on real data).

    Supports n_bins in {4, 8} (every reference config uses 8).
    """
    pos_x = dx > 0
    neg_x = dx < 0
    zero_x = dx == 0
    pos_y = dy > 0
    neg_y = dy < 0
    zero_y = dy == 0
    adx = jnp.abs(dx)
    ady = jnp.abs(dy)

    if n_bins == 4:
        # Quadrants of theta' = theta + pi, boundaries at multiples of pi/2.
        code = jnp.select(
            [
                (neg_x & neg_y) | (zero_y & neg_x),   # theta in [-pi, -pi/2)
                neg_y,                                 # [-pi/2, 0)  (dx >= 0)
                (pos_x & pos_y) | (zero_y & ~neg_x),   # [0, pi/2)
                jnp.full(dx.shape, True),              # [pi/2, pi)
            ],
            [0, 1, 2, 3],
        )
        return code.astype(jnp.int32)

    if n_bins != 8:
        raise ValueError(f"octant fast path supports n in (4, 8), got {n_bins}")

    # Octants of theta' = theta + pi; octant k <=> theta' in [k*pi/4, (k+1)*pi/4).
    lower = jnp.select(  # dy < 0 half: theta in [-pi, 0)
        [
            neg_x & (ady < adx),  # [-pi, -3pi/4)
            neg_x,                # [-3pi/4, -pi/2)  (ady >= adx)
            ady > adx,            # [-pi/2, -pi/4)   (dx >= 0)
            jnp.full(dx.shape, True),  # [-pi/4, 0)
        ],
        [0, 1, 2, 3],
    )
    upper = jnp.select(  # dy >= 0 half: theta in [0, pi]
        [
            pos_x & (ady < adx),  # [0, pi/4)
            pos_x,                # [pi/4, pi/2)   (ady >= adx)
            neg_x & (ady > adx),  # (pi/2, 3pi/4)
            neg_x,                # [3pi/4, pi)    (ady <= adx)
            jnp.full(dx.shape, True),  # dx == 0: theta = pi/2 exactly -> 6
        ],
        [4, 5, 6, 7, 6],
    )
    code = jnp.where(neg_y, lower, upper)
    # Exact-axis cases with dy == 0:
    # atan2(0, dx>0) = 0 -> bin 4; atan2(0, dx<0) = pi -> clamped -pi -> 0;
    # atan2(0, 0) = 0 -> bin 4.
    code = jnp.where(zero_y & neg_x, 0, code)
    code = jnp.where(zero_y & ~neg_x, 4, code)
    return code.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("radius", "nn_sample", "dilation_rate"))
def build_sphere_neighbor(
    database: jax.Array,
    query: jax.Array,
    radius: float = 0.1,
    nn_sample: int = 100,
    dilation_rate: float | None = None,
) -> Neighborhood:
    """Sphere range search keeping the first `nn_sample` in-range points.

    Mirrors ``build_sphere_neighbor`` (ref tf_ops/nnquery/tf_nnquery.py:9-34):
    extra feature channels beyond xyz are ignored, `dilation_rate` scales the
    radius. Output padding entries are 0 (index and dist) — callers must mask
    with ``count``.

    Args:
      database: (B, N, 3+) float32.
      query:    (B, M, 3+) float32.
      radius:   search radius (strict `<` with 1e-6 margin).
      nn_sample: K, the fixed neighbor budget.
      dilation_rate: optional radius multiplier (ref tf_nnquery.py:30-31).

    Returns:
      Neighborhood(idx (B,M,K) int32, count (B,M) int32, dist (B,M,K) f32
      in sqrt-space).
    """
    nbh, _ = _sphere_query(
        database, query, radius, nn_sample, dilation_rate, kernel=None
    )
    return nbh


@functools.partial(
    jax.jit, static_argnames=("radius", "nn_sample", "kernel", "dilation_rate")
)
def build_sphere_neighbor_and_bins(
    database: jax.Array,
    query: jax.Array,
    radius: float,
    nn_sample: int,
    kernel: tuple[int, int, int] = (8, 2, 2),
    dilation_rate: float | None = None,
) -> tuple[Neighborhood, jax.Array]:
    """Sphere query + spherical kernel bins, fused into one pass.

    Produces exactly ``build_sphere_neighbor`` + ``spherical_kernel`` but
    computes the azimuth/elevation bin of every candidate pair with sign
    tests *inside* the distance tile and packs it into the low bits of the
    integer top_k score — so the selected edges' bins come back with the
    indices, eliminating the per-edge xyz gather that dominates the
    standalone kernel-bin op on TPU.

    Supported fast path: kernel = (4|8, 2, q). Other kernels fall back to
    the two-op path.

    Returns:
      (Neighborhood, filt_index (B, M, K) int32 with bin 0 = self-loop).
    """
    n_bins, p_bins, _ = kernel
    if n_bins not in (4, 8) or p_bins != 2:
        from sph3d_gcn_tpu.ops.kernelbin import spherical_kernel

        nbh = build_sphere_neighbor(
            database, query, radius, nn_sample, dilation_rate
        )
        if dilation_rate is not None:
            radius = float(dilation_rate) * float(radius)
        return nbh, spherical_kernel(database, query, nbh, radius, kernel)

    return _sphere_query(
        database, query, radius, nn_sample, dilation_rate, kernel=kernel
    )


_M_EPS = 1.01e-3  # ref tf_buildkernel_gpu.cu:6


def _sphere_query(database, query, radius, nn_sample, dilation_rate, kernel):
    db = database[..., :3].astype(jnp.float32)
    q = query[..., :3].astype(jnp.float32)
    if dilation_rate is not None:
        radius = float(dilation_rate) * float(radius)
    batch, num_db, _ = db.shape
    num_q = q.shape[1]
    k_full = int(nn_sample)
    # The CUDA scan tolerates nn_sample > N (it just finds fewer); top_k
    # cannot, so search with a clamped budget and pad the outputs back.
    k = min(k_full, num_db)

    tile = _query_tile_size(batch, num_db, num_q)
    num_tiles = -(-num_q // tile)
    pad = num_tiles * tile - num_q
    q_padded = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    # (n_tiles, B, T, 3): lax.map iterates the leading axis.
    q_tiles = q_padded.reshape(batch, num_tiles, tile, 3).transpose(1, 0, 2, 3)

    db_sq = jnp.sum(db * db, axis=-1)  # (B, N)

    def process_tile(q_tile):
        d = _pairwise_dist(q_tile, db, db_sq)  # (B, T, N)

        def count_at(r):
            m = (d < r[..., None]) & (jnp.abs(d - r[..., None]) > _BOUNDARY_EPS)
            return m, jnp.sum(m, axis=-1)

        def cond(carry):
            r, it = carry
            _, cnt = count_at(r)
            return jnp.any(cnt == 0) & (it < _MAX_GROW_ITERS)

        def body(carry):
            r, it = carry
            _, cnt = count_at(r)
            r = jnp.where(cnt == 0, r + _GROW_STEP, r)
            return r, it + 1

        r0 = jnp.full(d.shape[:2], radius, dtype=jnp.float32)
        r_final, _ = lax.while_loop(cond, body, (r0, jnp.int32(0)))
        mask, _ = count_at(r_final)

        idx, valid, total_sel = _first_k_in_order(mask, num_db, k)
        d_sel = jnp.take_along_axis(d, idx, axis=-1)
        # Quirk: stored distance is sqrt of the (already Euclidean) distance
        # (ref tf_nnquery_gpu.cu:54).
        nn_dist = jnp.where(valid, jnp.sqrt(d_sel), 0.0)
        count = jnp.minimum(total_sel, k).astype(jnp.int32)

        pay = None
        if kernel is not None:
            # Per-pair azimuth octant + elevation sign, computed on the
            # broadcasted deltas (fused into the mask pass) and selected per
            # edge with a cheap minor-dim gather.
            dx = db[:, None, :, 0] - q_tile[:, :, None, 0]
            dy = db[:, None, :, 1] - q_tile[:, :, None, 1]
            dz = db[:, None, :, 2] - q_tile[:, :, None, 2]
            n_code = _octant_code(dx, dy, kernel[0])
            p_code = (dz >= 0).astype(jnp.int32)
            payload = (p_code << 3) | n_code
            pay = jnp.take_along_axis(payload, idx, axis=-1)

        filt = jnp.zeros_like(idx)
        if kernel is not None:
            n_bins, p_bins, q_bins = kernel
            n_id = pay & 7
            p_id = pay >> 3
            gamma = nn_dist * q_bins / (radius + 1e-6)
            q_id = jnp.minimum(q_bins - 1, gamma.astype(jnp.int32))
            bins = q_id * p_bins * n_bins + p_id * n_bins + n_id + 1
            # Self-loop rule (ref tf_buildkernel_gpu.cu:52-54).
            is_far = (nn_dist > _M_EPS) & (jnp.abs(nn_dist - _M_EPS) > 1e-6)
            filt = jnp.where(is_far & valid, bins, 0).astype(jnp.int32)

        return idx, count, nn_dist, filt

    idx_t, cnt_t, dist_t, filt_t = lax.map(process_tile, q_tiles)
    # (n_tiles, B, T, ...) -> (B, M, ...)
    idx = idx_t.transpose(1, 0, 2, 3).reshape(batch, num_tiles * tile, k)
    cnt = cnt_t.transpose(1, 0, 2).reshape(batch, num_tiles * tile)
    dist = dist_t.transpose(1, 0, 2, 3).reshape(batch, num_tiles * tile, k)
    k_pad = ((0, 0), (0, 0), (0, k_full - k))
    nbh = Neighborhood(
        jnp.pad(idx[:, :num_q], k_pad),
        cnt[:, :num_q],
        jnp.pad(dist[:, :num_q], k_pad),
    )
    if kernel is None:
        return nbh, None
    filt = filt_t.transpose(1, 0, 2, 3).reshape(batch, num_tiles * tile, k)
    return nbh, jnp.pad(filt[:, :num_q], k_pad)


@functools.partial(
    jax.jit, static_argnames=("length", "nn_sample", "gridsize", "dilation_rate")
)
def build_cube_neighbor(
    database: jax.Array,
    query: jax.Array,
    length: float = 0.1,
    nn_sample: int = 100,
    gridsize: int = 3,
    dilation_rate: float | None = None,
) -> CubeNeighborhood:
    """Axis-aligned cube search with direct grid-bin assignment.

    Mirrors ``build_cube_neighbor`` (ref tf_ops/nnquery/tf_nnquery.py:36-60,
    kernel tf_nnquery_gpu.cu:75-108): strict ``|delta| < length/2`` on each
    axis, bin id ``xId*g^2 + yId*g + zId`` with ``Id = (delta + length/2) /
    (length/gridsize)``. No radius growth, no distances; count never exceeds
    ``nn_sample`` (the CUDA scan stops counting at the budget).
    """
    db = database[..., :3].astype(jnp.float32)
    q = query[..., :3].astype(jnp.float32)
    if dilation_rate is not None:
        length = float(dilation_rate) * float(length)
    batch, num_db, _ = db.shape
    num_q = q.shape[1]
    k = int(nn_sample)
    half = float(length) / 2.0
    cell = float(length) / float(gridsize)

    tile = _query_tile_size(batch, num_db, num_q)
    num_tiles = -(-num_q // tile)
    pad = num_tiles * tile - num_q
    q_padded = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    q_tiles = q_padded.reshape(batch, num_tiles, tile, 3).transpose(1, 0, 2, 3)

    def process_tile(q_tile):
        delta = db[:, None, :, :] - q_tile[:, :, None, :]  # (B, T, N, 3)
        inside = jnp.all(jnp.abs(delta) < half, axis=-1)   # (B, T, N)
        idx, valid, _ = _first_k_in_order(inside, num_db, k)
        d_sel = jnp.take_along_axis(
            delta, idx[..., None], axis=2
        )  # (B, T, K, 3)
        cell_ids = jnp.clip(
            ((d_sel + half) / cell).astype(jnp.int32), 0, gridsize - 1
        )
        bins = (
            cell_ids[..., 0] * gridsize * gridsize
            + cell_ids[..., 1] * gridsize
            + cell_ids[..., 2]
        )
        bins = jnp.where(valid, bins, 0)
        count = jnp.minimum(jnp.sum(inside, axis=-1), k).astype(jnp.int32)
        return idx, bins, count

    idx_t, bin_t, cnt_t = lax.map(process_tile, q_tiles)
    idx = idx_t.transpose(1, 0, 2, 3).reshape(batch, num_tiles * tile, k)
    bins = bin_t.transpose(1, 0, 2, 3).reshape(batch, num_tiles * tile, k)
    cnt = cnt_t.transpose(1, 0, 2).reshape(batch, num_tiles * tile)
    return CubeNeighborhood(idx[:, :num_q], bins[:, :num_q], cnt[:, :num_q])
