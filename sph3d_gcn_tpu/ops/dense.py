"""Dense windowed neighborhoods: graphs as (tile x window) masks.

The classic pipeline materializes per-edge index lists — ``nn_index
(B, M, K)`` plus per-edge distances and filter bins — and every consumer
pays a per-edge gather (the CUDA reference's thread-per-edge loops,
tf_nnquery_gpu.cu:15-66, tf_conv3d_gpu.cu:7-29). On TPU the per-edge
index costs dominate. This module removes the edge lists entirely:

For axis-sorted clouds (ops/locality.py) every in-range neighbor of a
128-query tile lies in a contiguous row window of width W. The query then
becomes a DENSE computation per (tile, window-column) candidate pair:

  in_range[t, w]  strict-< radius test with the reference's 1e-6 margin
  rank[t, w]      running count along w — row order IS point order, so
                  `rank <= K` reproduces "first nn_sample in point order"
                  (ref tf_nnquery_gpu.cu:49-55) exactly
  bins[t, w]      the spherical-kernel bin of every candidate, from the
                  same atan2/sqrt-space formulas (ref tf_buildkernel_gpu.cu)

packed into one int8 map ``packed = sel ? bin + 1 : 0``. Consumers never
see an edge index:

  conv    S[t,f,c] = sum_w [packed[t,w] == f+1] * featwin[w,c] / cnt[t]
          — an MXU matmul with T*F rows (Pallas kernel below); its VJP is
          the transposed matmul + a block-granular window scatter.
  maxpool chunked masked running max over w (pure XLA — measured faster
          than every Pallas variant, see _masked_window_max_impl).
  unpool  masked (weighted) mean — a plain XLA batched matmul.

Exactness contract: results equal the classic ops whenever every in-range
candidate falls inside the window. The builder checks the PROVABLE
geometric bound (db sorted along some axis AND the [min_q - r, max_q + r]
slab fits in W) and reports it as ``DenseNeighborhood.ok``; window sizes
in the configs carry measured margins, coarse levels clamp to the full
cloud (always exact), and training surfaces the flag in step metrics.
Dense mode is the opt-in throughput path (``SPH3DConfig.dense_graph``);
the per-edge ops remain the reference-parity path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph3d_gcn_tpu.ops.pallas.query_kernel import (
    blocked_db,
    dense_query_pallas,
)

TILE = 128
_BOUNDARY_EPS = 1e-6     # ref tf_nnquery_gpu.cu:49
_M_EPS = 1.01e-3         # ref tf_buildkernel_gpu.cu:6

# Trace-time cost ledger for the bytes/flops roofline
# (scripts/profile_step.py --roofline). When set to a list, every dense op
# appends one record with its EXACT kernel shapes (tiles g, padded window
# W, channels, bins, multiplier) as it is traced — no config re-derivation
# — and the profiler turns the records into per-resource (MXU / VPU /
# HBM) lower bounds for the step. None (the default) costs nothing.
_COST_LEDGER: list | None = None


def _record_cost(kind: str, **kw) -> None:
    if _COST_LEDGER is not None:
        _COST_LEDGER.append({"kind": kind, **kw})


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseNeighborhood:
    """A level graph as dense per-candidate maps.

    Attributes:
      packed: (B, nT, TILE, W) int8 — 0 where the candidate is not a
        selected neighbor, else ``filter_bin + 1`` (so the self-loop bin 0
        is stored as 1). With ``kernel=None`` selected candidates store
        their RANK (1..k_max, the in-range prefix count in window order;
        see ``k_max``).
      s_blk:  (B, nT) int32 window start in TILE-row blocks.
      count:  (B, M) int32 = min(in-range count, nn_sample), as the
        reference clamps (ref tf_nnquery_gpu.cu:56-62).
      dist:   optional (B, nT, TILE, W) float32 sqrt-space candidate
        distances (only populated on request — IDS / weighted unpooling).
      ok:     () bool — True when the provable window-coverage bound held
        (results then match the classic ops exactly).
      num_query: static M (the nT*TILE rows include padding).
      num_db:    static N.
    """

    packed: jax.Array
    s_blk: jax.Array
    count: jax.Array
    dist: jax.Array | None
    ok: jax.Array
    # (B,) int32 per-cloud sort axis (grouped bin maps only, else None).
    axis: jax.Array | None = None
    num_query: int = dataclasses.field(metadata={"static": True}, default=0)
    num_db: int = dataclasses.field(metadata={"static": True}, default=0)
    # > 0 iff packed holds neighbor ranks 1..k_max (selection-only maps
    # with nn_sample <= 127): the MXU-compacted pool keys on this.
    k_max: int = dataclasses.field(metadata={"static": True}, default=0)
    # True iff packed holds SORT-GROUPED bin ids (an axis-dependent
    # permutation of ref bin order, (8,2,q) kernels only): the conv then
    # contracts per-zone row subsets (zone-split) and permutes its
    # filter rows per cloud with _grouped_perm. Non-conv consumers only
    # ever test ``packed > 0`` and are unaffected.
    grouped: bool = dataclasses.field(metadata={"static": True},
                                      default=False)

    @property
    def window(self) -> int:
        return self.packed.shape[-1]


def _sorted_axis_ok(db: jax.Array):
    """Detect the per-cloud sort axis: (key (B,N), axis (B,), sorted flag).

    The window bound is only provable when the database is sorted along
    some coordinate axis; detection keeps the op safe on arbitrary input
    (unsorted clouds simply report ok=False).
    """
    diffs = db[:, 1:, :] >= db[:, :-1, :]           # (B, N-1, 3)
    axis_sorted = jnp.all(diffs, axis=1)            # (B, 3)
    any_sorted = jnp.any(axis_sorted, axis=-1)      # (B,)
    axis = jnp.argmax(axis_sorted, axis=-1)         # first sorted axis
    key = jnp.take_along_axis(db, axis[:, None, None], axis=2)[..., 0]
    return key, axis, jnp.all(any_sorted)


def build_dense_graph(
    database: jax.Array,
    query: jax.Array,
    radius: float,
    nn_sample: int,
    kernel: tuple[int, int, int] | None,
    window: int,
    self_graph: bool = False,
    need_dist: bool = False,
    growth_steps: int = 0,
    query_shard: tuple[str, int] | None = None,
) -> DenseNeighborhood:
    """Dense windowed counterpart of ``build_sphere_neighbor_and_bins``.

    Args:
      database: (B, N, 3+) float32, axis-sorted (see ops/locality.py).
      query:    (B, M, 3+) float32 (same cloud for the intra-level graphs).
      radius:   search radius (strict ``<`` with the 1e-6 margin).
      nn_sample: K — selection keeps the first K in point order.
      kernel:   (n, p, q) spherical kernel, or None for selection only.
      window:   W, rounded up to 128 and clamped to the padded cloud width
                (W >= N degenerates to always-exact full-width maps).
      self_graph: query is the database (skips the zero-count growth
                check — every query neighbors itself).
      need_dist: also emit the sqrt-space candidate distance map.
      growth_steps: reproduce the reference's +0.05 radius growth for
                zero-neighbor queries (ref tf_nnquery_gpu.cu:30-60) for up
                to this many steps, densely in-window: each row selects at
                the FIRST radius with >= 1 in-range candidate. The
                coverage certificate then checks the slab at each tile's
                grown radius. Only for selection-only graphs
                (``kernel=None``) — intra graphs self-include and never
                grow. Rows needing more growth flip ok=False.
      query_shard: (mesh_axis_name, num_shards) when called INSIDE a
                shard_map over a point-sharded model: only THIS shard's
                query-tile range is computed — the Pallas query grid, the
                slab-bound compare-counts and the packed/dist maps all
                shrink 1/d (round-4 directive #3: the graph build must
                scale with the mesh, not run replicated). The database
                (coordinates) stays replicated — it is the cheap O(N)
                part. Returned fields are tile-LOCAL, with ``s_blk`` still
                in full-database block coordinates (rebase with
                ``parallel.spatial.local_neighborhood`` for haloed
                features) and ``ok`` certifying this shard's tiles only
                (combine across shards with pmin, as the models do).
                Requires the padded query tile count to split evenly.

    Returns:
      DenseNeighborhood (see class docstring).
    """
    db = database[..., :3].astype(jnp.float32)
    q = query[..., :3].astype(jnp.float32)
    batch, num_db, _ = db.shape
    num_q = q.shape[1]
    radius = float(radius)

    n_pad = _round_up(num_db, TILE)
    w = min(_round_up(window, TILE), n_pad)
    m_pad = _round_up(num_q, TILE)
    n_t = m_pad // TILE

    # Pad db with far-away sentinels (never in range), queries with far
    # sentinels too (padded query rows select nothing).
    db_p = jnp.pad(db, ((0, 0), (0, n_pad - num_db), (0, 0)),
                   constant_values=2e9)
    q_p = jnp.pad(q, ((0, 0), (0, m_pad - num_q), (0, 0)),
                  constant_values=1e9)

    # Tile-shard the query: every certificate/map computation below is
    # per-query-tile, so slicing q_p here shrinks ALL of it to this
    # shard's tiles (see the query_shard docstring).
    row0 = 0
    if query_shard is not None:
        from jax import lax as _lax

        ax_name, shards = query_shard
        if n_t % shards:
            raise ValueError(
                f"{n_t} query tiles do not split over {shards} shards"
            )
        if num_q != m_pad:
            raise ValueError(
                f"query_shard needs a TILE-aligned query count, got "
                f"{num_q} (pad to {m_pad})"
            )
        n_t = n_t // shards
        m_pad = n_t * TILE
        row0 = _lax.axis_index(ax_name) * m_pad
        q_p = _lax.dynamic_slice_in_dim(q_p, row0, m_pad, axis=1)

    key, axis, is_sorted = _sorted_axis_ok(db)
    key_p = jnp.pad(key, ((0, 0), (0, n_pad - num_db)),
                    constant_values=2e9)
    # Query positions along the same axis (q == db for self graphs; for
    # inter-level graphs both clouds are sorted along the same axis, but
    # correctness does not require it — only window tightness does).
    q_key = jnp.take_along_axis(q_p, axis[:, None, None], axis=2)[..., 0]
    q_key = jnp.where(
        row0 + jnp.arange(m_pad)[None, :] < num_q, q_key, jnp.nan
    ).reshape(batch, n_t, TILE)
    tile_min = jnp.nanmin(q_key, axis=-1)           # (B, nT); NaN-safe
    tile_max = jnp.nanmax(q_key, axis=-1)
    tile_min = jnp.where(jnp.isnan(tile_min), 2e9, tile_min)
    tile_max = jnp.where(jnp.isnan(tile_max), -2e9, tile_max)

    # Provable slab bounds via compare-counts (gather-free).
    lo = tile_min[..., None] - radius
    hi = tile_max[..., None] + radius
    s_row = jnp.sum(
        (key_p[:, None, :] < lo).astype(jnp.int32), axis=-1
    )  # (B, nT)
    e_row = jnp.sum(
        (key_p[:, None, :] <= hi).astype(jnp.int32), axis=-1
    )
    s_start = s_row // TILE
    if growth_steps:
        # growth widens the slab on BOTH sides: start the window one block
        # below the base-radius slab (the re-certification below checks
        # the grown slab against this start)
        s_start = s_start - 1
    s_blk = jnp.clip(s_start, 0, (n_pad - w) // TILE)
    covered = jnp.all(e_row - s_blk * TILE <= w)
    ok = is_sorted & covered

    if growth_steps and kernel is not None:
        raise ValueError(
            "growth_steps is only supported for selection-only graphs "
            "(kernel=None); intra graphs self-include and never grow"
        )

    # The fused Pallas query kernel builds packed/dist/growth maps in one
    # on-core pass (ops/pallas/query_kernel.py); the certificate math
    # around it (slab bounds, sortedness) stays in XLA. ``count`` equals
    # min(in-range total, K) by construction of the first-K selection, so
    # it is recovered from the packed maps with one int8 reduce.
    k = int(nn_sample)
    # Per-tile slab-END bound (TILE units, relative to s_blk): candidates
    # past it lie beyond tile_max + radius on the sorted axis, so the
    # query kernel provably skips those chunks (at the MAX grown radius
    # for growth graphs). Out-of-range rows clamp inside the kernel
    # wrapper; an uncovered slab flips the certificate anyway.
    if growth_steps:
        hi_m = tile_max[..., None] + (radius + 0.05 * growth_steps)
        e_used = jnp.sum(
            (key_p[:, None, :] <= hi_m).astype(jnp.int32), axis=-1
        )
    else:
        e_used = e_row
    u_end = -(-(e_used - s_blk * TILE) // TILE)
    grouped = (
        _GROUPED_BINS
        and kernel is not None
        and kernel[0] == 8
        and kernel[1] == 2
    )
    packed, dist, gmax = dense_query_pallas(
        blocked_db(db_p),
        q_p,
        s_blk,
        u_end,
        axis if grouped else None,
        radius=radius,
        k=k,
        kernel=kernel,
        window=w,
        need_dist=need_dist,
        growth_steps=growth_steps,
        interpret=jax.default_backend() != "tpu",
    )
    count = jnp.sum(packed > 0, axis=-1, dtype=jnp.int32).reshape(
        batch, m_pad
    )
    if growth_steps:
        # Re-verify the slab at each tile's grown radius: selections at
        # radius r_eff are only exact if the grown slab still lies inside
        # the window that was gathered at the base radius.
        r_eff = radius + 0.05 * gmax.astype(jnp.float32)  # (B, nT)
        lo_g = tile_min[..., None] - r_eff[..., None]
        hi_g = tile_max[..., None] + r_eff[..., None]
        s_row_g = jnp.sum(
            (key_p[:, None, :] < lo_g).astype(jnp.int32), axis=-1
        )
        e_row_g = jnp.sum(
            (key_p[:, None, :] <= hi_g).astype(jnp.int32), axis=-1
        )
        ok = ok & jnp.all(
            (s_row_g >= s_blk * TILE) & (e_row_g - s_blk * TILE <= w)
        )

    if not self_graph:
        # The reference grows the radius for zero-neighbor queries
        # (ref tf_nnquery_gpu.cu:30-60); dense mode reports that (rare)
        # case through ok=False instead — callers fall back.
        real_q = row0 + jnp.arange(m_pad)[None, :] < num_q
        ok = ok & jnp.all(jnp.where(real_q, count, 1) > 0)

    _record_cost(
        "query", g=batch * n_t, w=w, k=k,
        bins=kernel is not None, growth=growth_steps,
    )
    return DenseNeighborhood(
        packed=packed,
        s_blk=s_blk,
        count=count if query_shard is not None else count[:, :num_q],
        dist=dist,
        ok=ok,
        axis=axis.astype(jnp.int32) if grouped else None,
        num_query=m_pad if query_shard is not None else num_q,
        num_db=num_db,
        k_max=k if (kernel is None and k <= 127) else 0,
        grouped=grouped,
    )


def window_features(
    feats: jax.Array, dnbh: DenseNeighborhood, pad_to: int | None = None
) -> jax.Array:
    """Materialize the per-tile feature windows with a block-granular
    gather: (B, N, C) -> (B, nT, W', C) where W' = ``pad_to`` or W.
    Columns beyond W gather an all-zero block (consumers see zero-mask
    padding). Differentiable — autodiff gives the matching block-granular
    scatter-add (gradients landing in the zero block are dropped)."""
    b, n, c = feats.shape
    n_pad = _round_up(n, TILE)
    w = dnbh.window
    wp = pad_to or w
    n_t = dnbh.s_blk.shape[1]
    _record_cost("window_gather", g=b * n_t, w=wp, c=c, n_pad=n_pad)
    # one extra zeroed TILE block at the end serves as the pad target
    feats_p = jnp.pad(feats, ((0, 0), (0, n_pad + TILE - n), (0, 0)))
    blk = dnbh.s_blk[..., None] + jnp.arange(w // TILE)
    if wp > w:
        blk = jnp.concatenate(
            [
                blk,
                jnp.full(
                    (b, n_t, (wp - w) // TILE), n_pad // TILE, jnp.int32
                ),
            ],
            axis=-1,
        )
    fb = feats_p.reshape(b, n_pad // TILE + 1, TILE * c)
    idx = blk.reshape(b, -1)
    if c >= 32:
        # XLA lowers gathers with wide rows (TILE*c >= 64KB) to a
        # sequential while-of-dynamic-slices (~10ms each on the coarse
        # S3DIS levels, round-3 profile), and even where the forward
        # gather is tolerable (C=35-64: gather+select_n ~5-6ms per
        # fine-level conv) its backward SCATTER-add costs ~12 ms per
        # conv (round-3 fusion profile). A one-hot matmul rides the MXU
        # instead, and its transpose (the backward scatter) does too —
        # ~1 ms per direction at C=128, ~0.1ms below. xyz windows (C=3)
        # keep the cheap narrow-row gather.
        # Exact for bf16 features: each output row sums exactly one
        # source row (1.0 x value). f32 features need HIGHEST precision
        # or the MXU truncates the VALUE operand to bf16.
        nb1 = n_pad // TILE + 1
        onehot = (
            idx[..., None] == jnp.arange(nb1, dtype=jnp.int32)
        ).astype(feats.dtype)
        out = jnp.einsum(
            "bik,bkr->bir", onehot, fb,
            preferred_element_type=jnp.float32,
            precision=(
                lax.Precision.DEFAULT
                if feats.dtype == jnp.bfloat16
                else lax.Precision.HIGHEST
            ),
        ).astype(feats.dtype)
        return out.reshape(b, n_t, wp, c)
    return jnp.take_along_axis(
        fb, idx[..., None], axis=1
    ).reshape(b, n_t, wp, c)


# ------------------------- dense depthwise conv -------------------------
#
# One fused Pallas op per direction. The S = A @ fw matmul runs in the
# TRANSPOSED orientation S^T = fw^T A^T via dot_general: the output's
# small dim is then M (C, padded to 8-row sublanes) instead of N (padded
# to 128 lanes) — measured 1.6x faster at C=35 than the row-major form.
# The spherical-bin contraction with the filter and the filter gradient
# are fused in, so S never exists in HBM. W is swept by a grid dimension
# accumulating into a VMEM scratch (in-kernel python loops would allocate
# per-iteration buffers); C > 128 is zero-padded and swept by another
# grid dimension.

# One-hot A-build compare dtype. int32 is the only option that lowers:
# Mosaic rejects vector<i8> arithmetic ("Only vector<i16> and vector<i32>
# are supported") and i16 comparisons ("Target does not support this
# comparison") — both measured on v5e (scripts/conv_ab.py, round 4) — so
# the 2-4x lane-packing win for the A build is not reachable today.
_A_CMP_DTYPE = jnp.int32

# Direct in-kernel window DMA: instead of materializing the (g, W, C)
# feature windows in HBM (window_features) and streaming them in through
# a BlockSpec, the kernels DMA each tile's window slab straight out of
# the TILE-row-blocked feature array with one dynamic ``pl.ds`` on the
# leading dim — the same pattern the query kernel uses for coordinates.
# This kills the gather einsum + its output relayout (~2.5 ms per
# fine-level conv/pool on the round-3 profile) and halves fw HBM
# traffic; the backward still emits per-tile dfw maps, and the window
# scatter (the gather's exact transpose) runs as one XLA one-hot matmul
# in _window_scatter.
#
# Mosaic constraint (measured on v5e): every dimension of a DMA'd
# region must be tile-aligned — the (nbt, TILE, C) slab slice needs
# C % 128 == 0 (lane tiling). 128-multiple channel widths DMA the
# blocked array as-is; NARROWER widths (32 <= C < 128: conv1/pool1 at
# C = 64 — the most expensive level of both headline models — and
# ModelNet's C=35 input conv) lane-pad the blocked feature array to 128
# so the slab region stays tile-aligned, and the kernels slice the
# zero lanes off after the DMA (offset-0 lane slices lower fine; the
# matmuls keep their real-C shapes, so only slab HBM bytes grow). This
# kills the one-hot gather einsum + its Pallas-layout relayout
# (~2.5-3 ms per fine-level conv on the round-4 profile) where it is
# most expensive. C < 32 keeps the cheap narrow-row gather (xyz
# windows). Interpret-mode parity for both feeds is covered by
# tests/test_dense.py::test_dense_conv_pool_both_window_paths;
# on-chip parity + timing by scripts/dma_ab.py (v5e A/B: S3DIS 832.2k
# -> 860.8k pts/s with the DMA feed, ModelNet neutral — default ON).
_DIRECT_WIN_DMA = True
_DMA_MIN_C = 32

# Sort-grouped bins / zone-split conv: (8, 2, q) kernels sort each
# query row's window by hemisphere (see pallas/query_kernel._bins_822)
# so the conv's five zone fori_loops contract only the bin-row subset
# that can appear in that zone — ~0.5x one-hot A MACs at wide levels.
# On-chip value+grad parity of all DMA x grouped combos and the
# bench-level A/B live in scripts/dma_ab.py ({modelnet,s3dis} 1 g0|g1);
# measured round-5 v5e numbers are recorded in BASELINE.md. Default ON;
# flag exists for A/B and as an escape hatch.
_GROUPED_BINS = True

# A/B knob (scripts/conv_ab.py): force the conv W chunk width. Zone
# boundaries are CHUNK-granular, so narrower chunks sharpen the zone
# split (fewer wasted one-hot rows per sweep) at the cost of more loop
# iterations. None = let _w_chunk pick.
_WCH_OVERRIDE: int | None = None

# S-stash policy: the conv VJP forward stashes its bin-contraction
# matrix S (g, C, F*T) to HBM so the backward skips the S recompute dot
# (the round-4 design) when the channel chunk is at most this wide;
# wider chunks RECOMPUTE S in the backward on the A one-hot chunks it
# already builds for the dfw dot (_dense_conv_*_bwd_rc_kernel), trading
# 2*C*F*T bytes of stash HBM per tile for one extra MXU dot per chunk.
# Round-5 v5e A/B (scripts/conv_ab.py {s1,s2} stash{0,4096}): the stash
# WINS at both C=64 (fwd+bwd 18.8 vs 20.6 ms) and C=128 (29.8 vs 32.9)
# — with the zone/wch insensitivity probes this pins the kernels'
# bottleneck on per-chunk dot issue, not HBM or swept elements — so the
# default keeps the stash everywhere; the recompute path stays as a
# measured escape hatch for future HBM-starved parts.
_S_STASH_MAX_CC = 1 << 30


def _dma_ok(c: int) -> bool:
    """True when the blocked-feature slab is legal to DMA (see above)."""
    return _DIRECT_WIN_DMA and (c % 128 == 0 or c >= _DMA_MIN_C)


def _dma_c(c: int) -> int:
    """Lane width of the blocked feature array under the DMA feed."""
    return _round_up(c, 128)


def _blocked_feats(feats: jax.Array, wp: int, w: int) -> tuple[jax.Array, int]:
    """(B, N, C) -> (B * nbt, TILE, C') zero-padded TILE-row blocks,
    C' = ``_dma_c(C)`` (lanes zero-padded to a 128 multiple so the slab
    DMA region stays tile-aligned; the kernels slice the pad lanes off).

    Rows are padded so a window DMA of ``wp`` rows starting at the last
    legal s_blk (= (n_pad - w)/TILE) stays in bounds; padding rows are
    zero, which every consumer masks out by construction (packed == 0
    there). Returns (blocks, nbt = blocks per batch item)."""
    b, n, c = feats.shape
    n_pad = _round_up(n, TILE)
    rows = n_pad + (wp - w)
    fb = jnp.pad(feats, ((0, 0), (0, rows - n), (0, _dma_c(c) - c)))
    return fb.reshape(b * (rows // TILE), TILE, _dma_c(c)), rows // TILE


def _window_scatter(
    dfw: jax.Array, s_blk: jax.Array, nbt: int
) -> jax.Array:
    """Exact transpose of the direct-DMA window gather: per-tile window
    cotangents (B, nT, Wp, C) scatter-added back to the TILE-row-blocked
    feature array (B*nbt, TILE, C) as one batched one-hot matmul (the
    backward of take-a-row is add-to-a-row; rides the MXU like the
    forward would). Output lanes are re-padded to ``_dma_c`` so the
    cotangent matches the blocked array the forward consumed."""
    b, n_t, wp, c = dfw.shape
    nbw = wp // TILE
    ids = s_blk[..., None] + jnp.arange(nbw, dtype=jnp.int32)  # (B,nT,nbw)
    onehot = (
        ids.reshape(b, n_t * nbw, 1)
        == jnp.arange(nbt, dtype=jnp.int32)
    ).astype(dfw.dtype)
    out = jnp.einsum(
        "bik,bir->bkr",
        onehot,
        dfw.reshape(b, n_t * nbw, TILE * c),
        preferred_element_type=jnp.float32,
        precision=(
            lax.Precision.DEFAULT
            if dfw.dtype == jnp.bfloat16
            else lax.Precision.HIGHEST
        ),
    ).astype(dfw.dtype)
    out = out.reshape(b * nbt, TILE, c)
    if _dma_c(c) != c:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, _dma_c(c) - c)))
    return out


def _window_scatter_t(
    dfw_t: jax.Array, s_blk: jax.Array, nbt: int
) -> jax.Array:
    """As :func:`_window_scatter`, but takes the transposed conv kernel's
    NATIVE (C, W) per-tile dfw orientation and folds the W<->C transpose
    into the scatter contraction — the explicit ``swapaxes`` on the
    (g, C, W) map cost ~1.2-1.4 ms per fine-level conv (round-4 profile).
    out[b,k,t,c] = sum_{n,w} [s_blk[b,n] + w == k] dfw_t[b,n,c,w*T+t]."""
    b, n_t, c, wp = dfw_t.shape
    nbw = wp // TILE
    ids = s_blk[..., None] + jnp.arange(nbw, dtype=jnp.int32)  # (B,nT,nbw)
    onehot = (
        ids[..., None] == jnp.arange(nbt, dtype=jnp.int32)
    ).astype(dfw_t.dtype)                                      # (B,nT,nbw,K)
    dfw5 = dfw_t.reshape(b, n_t, c, nbw, TILE)
    out = jnp.einsum(
        "bnwk,bncwt->bktc",
        onehot,
        dfw5,
        preferred_element_type=jnp.float32,
        precision=(
            lax.Precision.DEFAULT
            if dfw_t.dtype == jnp.bfloat16
            else lax.Precision.HIGHEST
        ),
    ).astype(dfw_t.dtype)
    out = out.reshape(b * nbt, TILE, c)
    if _dma_c(c) != c:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, _dma_c(c) - c)))
    return out


def _conv_chunk_a(packed_ref, c, wch, fl, fh, dtype):
    """Chunk c's one-hot bin matrix A ((fh-fl)*T, wch) from the packed
    map, for the static bin-row range [fl, fh) of the current zone."""
    cmp = _A_CMP_DTYPE
    pk = packed_ref[0, :, pl.ds(c * wch, wch)].astype(cmp)  # (T, wch)
    t = pk.shape[0]
    f_iota = lax.broadcasted_iota(cmp, (fh - fl, t, wch), 0)
    return (pk[None, :, :] == f_iota + jnp.asarray(fl + 1, cmp)).reshape(
        (fh - fl) * t, wch
    ).astype(dtype)


def _zone_chunk_ranges(zones_ref, i):
    """The five (start, end) chunk ranges from the prefetched per-tile
    boundaries (see the zone-split comment above _zone_rows)."""
    z = [zones_ref[i, j] for j in range(6)]
    return (
        (z[0], z[1]),
        (z[1], z[2]),
        (z[2], z[3]),
        (jnp.maximum(z[2], z[3]), z[4]),
        (z[4], z[5]),
    )


def _dense_conv_fwd_kernel(
    zones_ref, sblk_ref, packed_ref, fw_ref, filt_ref, inv_ref, out_ref,
    *rest, wch, n_wc, n_t, nbt, zrows, stash=False,
):
    """Grid (k_c, g): one cell = one query tile (for one C chunk). The W
    sweep runs as five ``fori_loop``s — the per-tile ZONES of the
    grouped map (see _zone_rows), each contracting only its zone's
    static bin-row subset of A; ungrouped maps degenerate to one full
    sweep. Dynamic loop bounds are the one skip construct Mosaic
    compiles happily (matmuls under pl.when wedge its lowering), and the
    zone bounds also subsume the old last-nonempty-chunk tail skip. The
    neighbor mean (ref tf_conv3d_gpu.cu:25) is fused in as the per-row
    ``inv_ref`` scale.

    With ``nbt > 0`` (direct window DMA) ``fw_ref`` is the whole
    TILE-row-blocked feature array in ANY memory and the tile's window
    slab is DMA'd into a VMEM scratch here (one dynamic ds on the
    leading dim, as in the query kernel); otherwise it is the
    materialized (1, W, cc) window block.

    ``filt_ref`` is PER-CLOUD (grouped row order, ops._grouped_perm
    applied outside the custom_vjp so autodiff un-permutes dfilt).

    ``stash=True`` (the VJP forward) also emits the bin-contraction
    matrix S (cc, F*T) in the compute dtype so the backward skips the
    most expensive recompute — the per-chunk S dot, which at C >= 64
    rivals the whole forward (round-4 probe) — paying one HBM
    write+read of S instead. The primal-only kernel (eval forwards)
    never materializes it."""
    i = pl.program_id(1)
    _, mult, cc, f_bins = filt_ref.shape
    if stash:
        sout_ref, *rest = rest
    s_scr, *rest = rest
    if nbt:
        fwin_scr, sem = rest
        nbw = fwin_scr.shape[0]
        dma = pltpu.make_async_copy(
            fw_ref.at[pl.ds((i // n_t) * nbt + sblk_ref[i], nbw)],
            fwin_scr, sem,
        )
        dma.start()
    s_scr[...] = jnp.zeros_like(s_scr)
    if nbt:
        dma.wait()

    def _fw_chunk(c):
        if nbt:
            wcb = wch // TILE
            lanes = fwin_scr.shape[-1]
            fwc = fwin_scr[pl.ds(c * wcb, wcb)].reshape(wch, lanes)
            # lane-padded slab (C < 128): drop the zero pad lanes so the
            # matmul keeps its real-C shape (offset-0 lane slice)
            return fwc[:, :cc] if lanes != cc else fwc
        return fw_ref[0, pl.ds(c * wch, wch), :]

    def _zone_body(fl, fh):
        def body(c, carry):
            a = _conv_chunk_a(packed_ref, c, wch, fl, fh, filt_ref.dtype)
            s_scr[:, fl * TILE:fh * TILE] += lax.dot_general(
                _fw_chunk(c), a,
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                       # (cc, (fh-fl)*T)
            return carry

        return body

    for (lo, hi), (fl, fh) in zip(_zone_chunk_ranges(zones_ref, i), zrows):
        lax.fori_loop(lo, hi, _zone_body(fl, fh), jnp.int32(0))
    if stash:
        sout_ref[0] = s_scr[...].astype(sout_ref.dtype)
    s3 = s_scr[...].reshape(cc, f_bins, TILE)
    inv = inv_ref[0]                                # (1, T)
    for r in range(mult):
        f_r = filt_ref[0, r].astype(jnp.float32)    # (cc, F)
        out_ref[0, r] = (
            jnp.sum(s3 * f_r[:, :, None], axis=1) * inv
        ).astype(out_ref.dtype)                     # (cc, T)


def _dense_conv_bwd_kernel(
    zones_ref, packed_ref, filt_ref, inv_ref, dout_ref, sin_ref,
    dfw_ref, dfilt_ref, ds_scr, *, wch, n_wc, n_t, zrows,
):
    """Same grid as forward. The bin-contraction matrix S comes back in
    from the forward's stash (``sin_ref``; see _dense_conv_fwd_kernel
    stash=True) — recomputing it here cost a second full A matmul per
    chunk, which at C >= 64 rivals the whole forward (round-4 probe) —
    and with S stashed the backward never touches the feature windows
    at all (no fw input, no window DMA: dfw = dS @ A needs only the
    packed map). Emits dfw^T[c, w] = sum_(f,t) dS[c,(f,t)] A[(f,t),w]
    per W chunk and dfilt^T[r,c,f] = sum_t S[c,f,t] dout[r,c,t] at the
    end, accumulated per CLOUD (ref tf_conv3d_gpu.cu:33-101 semantics,
    deterministic). The chunk sweep mirrors the forward's five zones
    (each zone's dot reads only its static dS row slice); chunks
    outside [z0, z5) are zero-filled, and zone overlaps only ever land
    on provably-empty chunks, where every zone writes the same zeros.

    The (C, W) output orientation is deliberate: emitting (W, C)
    directly (to skip the HBM swapaxes after) needs a contract-on-dim-0
    dot whose transposed A copy Mosaic materializes through the slow
    shuffle path — measured +6ms per fine-level conv, far more than the
    ~1.2ms swapaxes it saves (round-3 A/B)."""
    i = pl.program_id(1)
    _, mult, cc, f_bins = filt_ref.shape

    @pl.when(i % n_t == 0)
    def _():
        dfilt_ref[...] = jnp.zeros_like(dfilt_ref)

    # only chunks OUTSIDE [z0, z5) need the zero fill: the zone loops
    # below WRITE (not accumulate) everything inside, so blanket zeroing
    # re-wrote ~2/3 of the map for nothing (~0.4 ms on the S3DIS conv1
    # backward)
    def zero_chunk(c, carry):
        dfw_ref[0, :, pl.ds(c * wch, wch)] = jnp.zeros(
            (dfw_ref.shape[1], wch), dfw_ref.dtype
        )
        return carry

    z0 = zones_ref[i, 0]
    z5 = zones_ref[i, 5]
    lax.fori_loop(0, jnp.minimum(z0, z5), zero_chunk, jnp.int32(0))
    lax.fori_loop(z5, n_wc, zero_chunk, jnp.int32(0))
    inv = inv_ref[0]                                       # (1, T)
    ds = jnp.zeros((cc, f_bins, TILE), jnp.float32)
    for r in range(mult):
        f_r = filt_ref[0, r].astype(jnp.float32)           # (cc, F)
        dout_r = dout_ref[0, r].astype(jnp.float32) * inv  # (cc, T)
        ds = ds + f_r[:, :, None] * dout_r[:, None, :]
    # staged in the MATMUL dtype: the dfw dot reads it every W chunk, so
    # the f32->bf16 convert happens once per tile here, not per chunk
    ds_scr[...] = ds.reshape(cc, f_bins * TILE).astype(ds_scr.dtype)

    def _zone_body(fl, fh):
        def body(c, carry):
            a = _conv_chunk_a(packed_ref, c, wch, fl, fh, filt_ref.dtype)
            dfw_ref[0, :, pl.ds(c * wch, wch)] = lax.dot_general(
                ds_scr[:, fl * TILE:fh * TILE], a,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dfw_ref.dtype)                  # (cc, wch)
            return carry

        return body

    for (lo, hi), (fl, fh) in zip(_zone_chunk_ranges(zones_ref, i), zrows):
        lax.fori_loop(lo, hi, _zone_body(fl, fh), jnp.int32(0))
    s3 = sin_ref[0].astype(jnp.float32).reshape(cc, f_bins, TILE)
    for r in range(mult):
        dout_r = dout_ref[0, r].astype(jnp.float32) * inv
        dfilt_ref[0, r] += jnp.sum(
            s3 * dout_r[:, None, :], axis=2
        ).astype(dfilt_ref.dtype)                    # (cc, F)


def _dense_conv_bwd_rc_kernel(
    zones_ref, sblk_ref, packed_ref, fw_ref, filt_ref, inv_ref, dout_ref,
    dfw_ref, dfilt_ref, s_scr, ds_scr, *rest, wch, n_wc, n_t, nbt, zrows,
):
    """No-stash backward (see _S_STASH_MAX_CC): S is RECOMPUTED here from
    the feature windows, reusing the A one-hot chunk already built for
    the dfw dot — each zone chunk runs BOTH dots on the same A. Trades
    the stash's 2*C*F*T bytes of HBM per tile (forward write + backward
    read) for one extra MXU dot per chunk; at C >= 64 the kernels are
    HBM-bound and this wins (round-5 probe). Everything else mirrors
    _dense_conv_bwd_kernel; the window feed (direct DMA or materialized
    block) mirrors the forward's."""
    i = pl.program_id(1)
    _, mult, cc, f_bins = filt_ref.shape
    if nbt:
        fwin_scr, sem = rest
        nbw = fwin_scr.shape[0]
        dma = pltpu.make_async_copy(
            fw_ref.at[pl.ds((i // n_t) * nbt + sblk_ref[i], nbw)],
            fwin_scr, sem,
        )
        dma.start()

    @pl.when(i % n_t == 0)
    def _():
        dfilt_ref[...] = jnp.zeros_like(dfilt_ref)

    def zero_chunk(c, carry):
        dfw_ref[0, :, pl.ds(c * wch, wch)] = jnp.zeros(
            (dfw_ref.shape[1], wch), dfw_ref.dtype
        )
        return carry

    z0 = zones_ref[i, 0]
    z5 = zones_ref[i, 5]
    lax.fori_loop(0, jnp.minimum(z0, z5), zero_chunk, jnp.int32(0))
    lax.fori_loop(z5, n_wc, zero_chunk, jnp.int32(0))
    inv = inv_ref[0]                                       # (1, T)
    ds = jnp.zeros((cc, f_bins, TILE), jnp.float32)
    for r in range(mult):
        f_r = filt_ref[0, r].astype(jnp.float32)           # (cc, F)
        dout_r = dout_ref[0, r].astype(jnp.float32) * inv  # (cc, T)
        ds = ds + f_r[:, :, None] * dout_r[:, None, :]
    ds_scr[...] = ds.reshape(cc, f_bins * TILE).astype(ds_scr.dtype)
    s_scr[...] = jnp.zeros_like(s_scr)
    if nbt:
        dma.wait()

    def _fw_chunk(c):
        if nbt:
            wcb = wch // TILE
            lanes = fwin_scr.shape[-1]
            fwc = fwin_scr[pl.ds(c * wcb, wcb)].reshape(wch, lanes)
            return fwc[:, :cc] if lanes != cc else fwc
        return fw_ref[0, pl.ds(c * wch, wch), :]

    def _zone_body(fl, fh):
        def body(c, carry):
            a = _conv_chunk_a(packed_ref, c, wch, fl, fh, filt_ref.dtype)
            dfw_ref[0, :, pl.ds(c * wch, wch)] = lax.dot_general(
                ds_scr[:, fl * TILE:fh * TILE], a,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dfw_ref.dtype)                  # (cc, wch)
            s_scr[:, fl * TILE:fh * TILE] += lax.dot_general(
                _fw_chunk(c), a,
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                        # (cc, (fh-fl)*T)
            return carry

        return body

    for (lo, hi), (fl, fh) in zip(_zone_chunk_ranges(zones_ref, i), zrows):
        lax.fori_loop(lo, hi, _zone_body(fl, fh), jnp.int32(0))
    s3 = s_scr[...].reshape(cc, f_bins, TILE)
    for r in range(mult):
        dout_r = dout_ref[0, r].astype(jnp.float32) * inv
        dfilt_ref[0, r] += jnp.sum(
            s3 * dout_r[:, None, :], axis=2
        ).astype(dfilt_ref.dtype)                    # (cc, F)


def _w_chunk(
    w: int, f_bins: int = 0, cc: int = 0, itemsize: int = 2
) -> tuple[int, int]:
    """(chunk, padded_w): prefer wide W chunks, zero-padding the window
    (zero packed columns select nothing, so padding is exact).

    When the conv-kernel shape (f_bins, cc) is given, chunks whose
    backward-kernel VMEM footprint would blow the ~16MB scoped stack
    limit are rejected: the dominant transients are the f32 s_scr and
    matmul-dtype ds_scr (cc, F*TILE) scratches, the per-chunk A one-hot
    (F*TILE, wch), and the double-buffered I/O blocks."""
    if _WCH_OVERRIDE is not None:
        return _WCH_OVERRIDE, -(-w // _WCH_OVERRIDE) * _WCH_OVERRIDE
    best = None
    for chunk in (512, 256, 128):
        if w < chunk and chunk != 128:
            continue
        padded = -(-w // chunk) * chunk
        if f_bins:
            vmem = (
                cc * f_bins * TILE * (4 + itemsize)  # s_scr + ds_scr
                + f_bins * TILE * chunk * itemsize   # A one-hot
                + chunk * cc * 4                     # dot product tile
                + 2 * (padded * TILE                 # packed (int8, 2buf)
                       + 2 * padded * cc * itemsize  # fw + dfw
                       + cc * TILE * 4)              # dout/inv
            )
            if vmem >= 13 * 1024 * 1024 and chunk != 128:
                continue
        cost = padded * (1 + 64 / chunk)
        if best is None or cost < best[0]:
            best = (cost, chunk, padded)
    return best[1], best[2]


@functools.lru_cache(maxsize=None)
def _dense_conv_for(w: int, wch: int, f_bins: int, mult: int, c_pad: int,
                    n_cc: int, dtype_name: str, n_t: int, nbt: int = 0,
                    grouped: bool = False, stash: bool = False):
    """w is the PADDED window (a multiple of the chunk width wch).

    With ``nbt > 0`` the returned op takes the TILE-row-blocked feature
    array (B*nbt, TILE, cc) instead of materialized windows and DMAs
    each tile's slab in-kernel (direct window DMA); its cotangent is the
    blocked array too (per-tile dfw maps scattered by _window_scatter).

    ``grouped`` selects the zone-split chunk sweep (sort-grouped maps);
    the filter operand is per-cloud (B, mult, c_pad, F) either way, in
    grouped row order when grouped (callers apply _grouped_perm).

    With ``stash=True`` the differentiated forward stashes its
    bin-contraction matrix S (compute dtype, (g, C, F*T) in HBM) so the
    backward skips the S recompute dot AND the window read entirely;
    with ``stash=False`` (the default policy at C > _S_STASH_MAX_CC) the
    backward recomputes S on the A chunks it already builds for the dfw
    dot (_dense_conv_bwd_rc_kernel) — cheaper where the kernels are
    HBM-bound. The primal-only forward (eval) never materializes S
    either way.
    """
    dtype = jnp.dtype(dtype_name)
    cc = c_pad // n_cc
    assert w % wch == 0
    n_wc = w // wch
    zrows = _zone_rows(f_bins, grouped)
    kparams = dict(wch=wch, n_wc=n_wc, n_t=n_t, nbt=nbt, zrows=zrows)
    scratch = [
        pltpu.VMEM((cc, f_bins * TILE), jnp.float32),
    ]
    if nbt:
        fw_spec = pl.BlockSpec(memory_space=pl.ANY)
        dma_scratch = [
            pltpu.VMEM((w // TILE, TILE, _dma_c(cc)), dtype),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        fw_spec = pl.BlockSpec((1, w, cc), lambda k, i, s, s2: (i, 0, k),
                               memory_space=pltpu.VMEM)
        dma_scratch = []

    def fwd_impl(zones, sblk, packed, fw, filt_bg, inv, stash: bool):
        g_dim = packed.shape[0]
        out_specs = [pl.BlockSpec(
            (1, mult, cc, TILE), lambda k, i, s, s2: (i, 0, k, 0),
            memory_space=pltpu.VMEM,
        )]
        out_shape = [jax.ShapeDtypeStruct((g_dim, mult, c_pad, TILE), dtype)]
        if stash:
            out_specs.append(pl.BlockSpec(
                (1, cc, f_bins * TILE), lambda k, i, s, s2: (i, k, 0),
                memory_space=pltpu.VMEM,
            ))
            out_shape.append(jax.ShapeDtypeStruct(
                (g_dim, c_pad, f_bins * TILE), dtype
            ))
        res = pl.pallas_call(
            functools.partial(_dense_conv_fwd_kernel, stash=stash,
                              **kparams),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_cc, g_dim),
                in_specs=[
                    pl.BlockSpec((1, TILE, w),
                                 lambda k, i, s, s2: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    fw_spec,
                    pl.BlockSpec((1, mult, cc, f_bins),
                                 lambda k, i, s, s2: (i // n_t, 0, k, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, TILE),
                                 lambda k, i, s, s2: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=out_specs if stash else out_specs[0],
                scratch_shapes=scratch + dma_scratch,
            ),
            out_shape=out_shape if stash else out_shape[0],
            interpret=jax.default_backend() != "tpu",
        )(zones, sblk, packed, fw, filt_bg, inv)
        return res if stash else (res, None)

    def bwd(res, dout):
        if stash:
            zones, sblk, packed, filt_bg, inv, s_st = res
        else:
            zones, sblk, packed, fw, filt_bg, inv = res
        g_dim = packed.shape[0]
        batch = g_dim // n_t
        if stash:
            dfw_t, dfilt_t = pl.pallas_call(
                functools.partial(_dense_conv_bwd_kernel, wch=wch,
                                  n_wc=n_wc, n_t=n_t, zrows=zrows),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(n_cc, g_dim),
                    in_specs=[
                        pl.BlockSpec((1, TILE, w),
                                     lambda k, i, s: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, mult, cc, f_bins),
                                     lambda k, i, s: (i // n_t, 0, k, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 1, TILE),
                                     lambda k, i, s: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, mult, cc, TILE),
                                     lambda k, i, s: (i, 0, k, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, cc, f_bins * TILE),
                                     lambda k, i, s: (i, k, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[
                        pl.BlockSpec((1, cc, w),
                                     lambda k, i, s: (i, k, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, mult, cc, f_bins),
                                     lambda k, i, s: (i // n_t, 0, k, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((cc, f_bins * TILE), dtype),
                    ],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((g_dim, c_pad, w), dtype),
                    jax.ShapeDtypeStruct((batch, mult, c_pad, f_bins),
                                         jnp.float32),
                ],
                interpret=jax.default_backend() != "tpu",
            )(zones, packed, filt_bg, inv, dout, s_st)
        else:
            dfw_t, dfilt_t = pl.pallas_call(
                functools.partial(_dense_conv_bwd_rc_kernel, **kparams),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(n_cc, g_dim),
                    in_specs=[
                        pl.BlockSpec((1, TILE, w),
                                     lambda k, i, s, s2: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        fw_spec,
                        pl.BlockSpec((1, mult, cc, f_bins),
                                     lambda k, i, s, s2: (i // n_t, 0, k, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 1, TILE),
                                     lambda k, i, s, s2: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, mult, cc, TILE),
                                     lambda k, i, s, s2: (i, 0, k, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[
                        pl.BlockSpec((1, cc, w),
                                     lambda k, i, s, s2: (i, k, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, mult, cc, f_bins),
                                     lambda k, i, s, s2: (i // n_t, 0, k, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=scratch + [
                        pltpu.VMEM((cc, f_bins * TILE), dtype),
                    ] + dma_scratch,
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((g_dim, c_pad, w), dtype),
                    jax.ShapeDtypeStruct((batch, mult, c_pad, f_bins),
                                         jnp.float32),
                ],
                interpret=jax.default_backend() != "tpu",
            )(zones, sblk, packed, fw, filt_bg, inv, dout)
        if nbt:
            dfw = _window_scatter_t(
                dfw_t.reshape(batch, n_t, c_pad, w),
                sblk.reshape(batch, n_t),
                nbt,
            )
        else:
            dfw = jnp.swapaxes(dfw_t, 1, 2)          # (g, W, C_pad)
        return (
            jnp.zeros(zones.shape, dtype=jax.dtypes.float0),
            jnp.zeros(sblk.shape, dtype=jax.dtypes.float0),
            jnp.zeros(packed.shape, dtype=jax.dtypes.float0),
            dfw,
            dfilt_t.astype(filt_bg.dtype),
            jnp.zeros_like(inv),  # counts are constants (no gradient)
        )

    @jax.custom_vjp
    def f(zones, sblk, packed, fw, filt_bg, inv):
        out, _ = fwd_impl(zones, sblk, packed, fw, filt_bg, inv, False)
        return out

    def fwd_rule(zones, sblk, packed, fw, filt_bg, inv):
        out, s_st = fwd_impl(zones, sblk, packed, fw, filt_bg, inv, stash)
        if stash:
            return out, (zones, sblk, packed, filt_bg, inv, s_st)
        return out, (zones, sblk, packed, fw, filt_bg, inv)

    f.defvjp(fwd_rule, bwd)
    return f


# Row-major variant for WIDE channel counts (C > 128): with full 128
# output lanes the transposed orientation has no padding advantage, and
# its per-C-chunk A rebuilds only add VPU work. Rows of A are F-MAJOR
# (row = f * tc + t) so the in-kernel (F*tc, C) -> (F, tc, C) reshape is
# a pure leading-dim split Mosaic accepts.

def _rm_slab_load(fw_ref, rest, sblk_ref, n_t, nbt):
    """Direct mode: DMA the tile's window slab into the VMEM scratch at
    row-chunk 0 (the scratch persists across the inner grid axis);
    returns the scratch (or None when windows are materialized)."""
    if not nbt:
        return None
    fwin_scr, sem = rest
    i = pl.program_id(0)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dma = pltpu.make_async_copy(
            fw_ref.at[pl.ds((i // n_t) * nbt + sblk_ref[i], fwin_scr.shape[0])],
            fwin_scr, sem,
        )
        dma.start()
        dma.wait()

    return fwin_scr


def _rm_a_chunk(packed_ref, cw, wch, fl, fh, dtype):
    """Chunk cw's F-MAJOR one-hot A ((fh-fl)*tc, wch) for zone rows
    [fl, fh) from the (1, tc, W) packed block ref (ref-sliced: Mosaic
    rejects dynamic slices of values)."""
    pk = packed_ref[0, :, pl.ds(cw * wch, wch)].astype(_A_CMP_DTYPE)
    tc = pk.shape[0]
    f_iota = lax.broadcasted_iota(_A_CMP_DTYPE, (fh - fl, tc, wch), 0)
    return (
        pk[None, :, :] == f_iota + jnp.asarray(fl + 1, _A_CMP_DTYPE)
    ).reshape((fh - fl) * tc, wch).astype(dtype)


def _dense_conv_rm_fwd_kernel(
    zones_ref, sblk_ref, packed_ref, fw_ref, filt_ref, out_ref, *rest,
    n_t, nbt, wch, zrows, stash=False,
):
    """out[t, r*C + c] = (sum_w sum_f [packed==f+1] fw[w,c] filt[r,f,c])
    for one (tile, row-chunk); the neighbor mean is applied outside. The
    W sweep runs as the five zone ``fori_loop``s of the grouped map
    (static bin-row subsets per zone, see _zone_rows), accumulating the
    bin contraction into an f32 VMEM scratch. ``stash=True`` (VJP
    forward) also emits S (F, tc, C) so the backward skips its recompute
    dot AND the window read (see the transposed kernel)."""
    i = pl.program_id(0)
    tc = packed_ref.shape[1]
    _, mult, f_bins, c = filt_ref.shape
    if stash:
        sout_ref, *rest = rest
    s_scr, *rest = rest
    slab = _rm_slab_load(fw_ref, rest, sblk_ref, n_t, nbt)

    def _fw_chunk(cw):
        if nbt:
            wcb = wch // TILE
            lanes = slab.shape[-1]
            fwc = slab[pl.ds(cw * wcb, wcb)].reshape(wch, lanes)
            return fwc[:, :c] if lanes != c else fwc
        return fw_ref[0, pl.ds(cw * wch, wch), :]

    s_scr[...] = jnp.zeros_like(s_scr)

    def _zone_body(fl, fh):
        def body(cw, carry):
            a = _rm_a_chunk(packed_ref, cw, wch, fl, fh, filt_ref.dtype)
            s_scr[fl * tc:fh * tc, :] += jnp.dot(
                a, _fw_chunk(cw), preferred_element_type=jnp.float32
            )
            return carry

        return body

    for (lo, hi), (fl, fh) in zip(_zone_chunk_ranges(zones_ref, i), zrows):
        lax.fori_loop(lo, hi, _zone_body(fl, fh), jnp.int32(0))
    s = s_scr[...].reshape(f_bins, tc, c)          # f32
    if stash:
        sout_ref[0] = s.astype(sout_ref.dtype)
    outs = []
    for r in range(mult):
        f_r = filt_ref[0, r].astype(jnp.float32)   # (F, C)
        outs.append(jnp.sum(s * f_r[:, None, :], axis=0))  # (tc, C)
    out_ref[0] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


def _dense_conv_rm_bwd_kernel(
    zones_ref, packed_ref, filt_ref, dout_ref, sin_ref, dfw_ref, dfilt_ref,
    ds_scr, *, n_t, wch, zrows,
):
    """S comes from the forward's stash (no recompute, no window read):
    dfilt[r,f,c] += sum_t S[f,t,c] dout[t, r*C+c]  (accumulated per cloud)
    dfw[w,c]     += sum_(f,t) A[(f,t),w] dS[(f,t),c],
    with dS[f,t,c] = sum_r filt[r,f,c] dout[t, r*C+c]. The dfw sweep
    mirrors the forward's zones; the whole-tile dfw block is zeroed at
    row-chunk 0 and zone dots ACCUMULATE, so chunks no zone touches
    stay zero."""
    i = pl.program_id(0)
    tc = packed_ref.shape[1]
    _, mult, f_bins, c = filt_ref.shape
    s = sin_ref[0].astype(jnp.float32)             # (F, tc, C)

    @pl.when((pl.program_id(0) % n_t == 0) & (pl.program_id(1) == 0))
    def _():
        dfilt_ref[...] = jnp.zeros_like(dfilt_ref)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dfw_ref[0] = jnp.zeros_like(dfw_ref[0])

    ds = jnp.zeros((f_bins, tc, c), jnp.float32)
    for r in range(mult):
        dout_r = dout_ref[0][:, r * c:(r + 1) * c].astype(jnp.float32)
        f_r = filt_ref[0, r].astype(jnp.float32)
        dfilt_ref[0, r] += jnp.sum(
            s * dout_r[None, :, :], axis=1
        ).astype(dfilt_ref.dtype)
        ds = ds + f_r[:, None, :] * dout_r[None, :, :]
    ds_scr[...] = ds.reshape(f_bins * tc, c).astype(ds_scr.dtype)

    def _zone_body(fl, fh):
        def body(cw, carry):
            a = _rm_a_chunk(packed_ref, cw, wch, fl, fh, ds_scr.dtype)
            dfw_ref[0, pl.ds(cw * wch, wch), :] += lax.dot_general(
                a, ds_scr[fl * tc:fh * tc, :],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dfw_ref.dtype)
            return carry

        return body

    for (lo, hi), (fl, fh) in zip(_zone_chunk_ranges(zones_ref, i), zrows):
        lax.fori_loop(lo, hi, _zone_body(fl, fh), jnp.int32(0))


def _dense_conv_rm_bwd_rc_kernel(
    zones_ref, sblk_ref, packed_ref, fw_ref, filt_ref, dout_ref,
    dfw_ref, dfilt_ref, s_scr, ds_scr, *rest, n_t, nbt, wch, zrows,
):
    """No-stash row-major backward (see _dense_conv_bwd_rc_kernel): S is
    recomputed on the A chunks already built for the dfw dot, so the
    forward never writes its (g, F, T, C) stash and this kernel reads
    the window slab instead (direct DMA or materialized, mirroring the
    forward's feed)."""
    i = pl.program_id(0)
    tc = packed_ref.shape[1]
    _, mult, f_bins, c = filt_ref.shape
    slab = _rm_slab_load(fw_ref, rest, sblk_ref, n_t, nbt)

    def _fw_chunk(cw):
        if nbt:
            wcb = wch // TILE
            lanes = slab.shape[-1]
            fwc = slab[pl.ds(cw * wcb, wcb)].reshape(wch, lanes)
            return fwc[:, :c] if lanes != c else fwc
        return fw_ref[0, pl.ds(cw * wch, wch), :]

    @pl.when((pl.program_id(0) % n_t == 0) & (pl.program_id(1) == 0))
    def _():
        dfilt_ref[...] = jnp.zeros_like(dfilt_ref)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dfw_ref[0] = jnp.zeros_like(dfw_ref[0])

    ds = jnp.zeros((f_bins, tc, c), jnp.float32)
    for r in range(mult):
        dout_r = dout_ref[0][:, r * c:(r + 1) * c].astype(jnp.float32)
        f_r = filt_ref[0, r].astype(jnp.float32)
        ds = ds + f_r[:, None, :] * dout_r[None, :, :]
    ds_scr[...] = ds.reshape(f_bins * tc, c).astype(ds_scr.dtype)
    s_scr[...] = jnp.zeros_like(s_scr)

    def _zone_body(fl, fh):
        def body(cw, carry):
            a = _rm_a_chunk(packed_ref, cw, wch, fl, fh, ds_scr.dtype)
            dfw_ref[0, pl.ds(cw * wch, wch), :] += lax.dot_general(
                a, ds_scr[fl * tc:fh * tc, :],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dfw_ref.dtype)
            s_scr[fl * tc:fh * tc, :] += jnp.dot(
                a, _fw_chunk(cw), preferred_element_type=jnp.float32
            )
            return carry

        return body

    for (lo, hi), (fl, fh) in zip(_zone_chunk_ranges(zones_ref, i), zrows):
        lax.fori_loop(lo, hi, _zone_body(fl, fh), jnp.int32(0))
    s = s_scr[...].reshape(f_bins, tc, c)              # f32
    for r in range(mult):
        dout_r = dout_ref[0][:, r * c:(r + 1) * c].astype(jnp.float32)
        dfilt_ref[0, r] += jnp.sum(
            s * dout_r[None, :, :], axis=1
        ).astype(dfilt_ref.dtype)


def _rm_t_chunk_for(f_bins: int, w: int, wch: int, c: int,
                    itemsize: int) -> int:
    """Rows per kernel step, sized so the per-chunk A block (tc*F, wch),
    the f32 S/dS scratches (tc*F, C) and the packed/dfw blocks fit the
    ~16MB VMEM with headroom (fewer grid steps amortize the per-step
    overhead). Sublane-sliced zone accumulation needs tc % 8 == 0."""
    budget = 8 * 1024 * 1024
    per_row = f_bins * (wch * itemsize + (8 + itemsize) * c) + w * 1
    tc = max(8, budget // max(1, per_row))
    tc = min(TILE, tc)
    while TILE % tc or tc % 8:
        tc -= 1
    return max(tc, 8)


@functools.lru_cache(maxsize=None)
def _dense_conv_rm_for(w: int, wch: int, f_bins: int, mult: int,
                       dtype_name: str, c: int, n_t: int, nbt: int = 0,
                       grouped: bool = False, stash: bool = False):
    """``nbt > 0``: direct window DMA, as in _dense_conv_for. ``w`` is
    the PADDED window (a multiple of ``wch``); ``grouped`` selects the
    zone-split sweep and the filter operand is per-cloud (B, mult, F, C)
    in grouped row order (callers apply _grouped_perm)."""
    dtype = jnp.dtype(dtype_name)
    assert w % wch == 0
    tc = _rm_t_chunk_for(f_bins, w, wch, c, dtype.itemsize)
    zrows = _zone_rows(f_bins, grouped)
    kparams = dict(n_t=n_t, nbt=nbt, wch=wch, zrows=zrows)
    scratch = [pltpu.VMEM((f_bins * tc, c), jnp.float32)]
    if nbt:
        fw_spec = pl.BlockSpec(memory_space=pl.ANY)
        dma_scratch = [
            pltpu.VMEM((w // TILE, TILE, _dma_c(c)), dtype),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        fw_spec = pl.BlockSpec((1, w, c), lambda i, j, s, s2: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        dma_scratch = []

    def fwd_impl(zones, sblk, packed, fw, filt_bg, stash: bool):
        g_dim, t, _ = packed.shape
        out_specs = [pl.BlockSpec(
            (1, tc, mult * c), lambda i, j, s, s2: (i, j, 0),
            memory_space=pltpu.VMEM,
        )]
        out_shape = [jax.ShapeDtypeStruct((g_dim, t, mult * c), dtype)]
        if stash:
            out_specs.append(pl.BlockSpec(
                (1, f_bins, tc, c), lambda i, j, s, s2: (i, 0, j, 0),
                memory_space=pltpu.VMEM,
            ))
            out_shape.append(jax.ShapeDtypeStruct(
                (g_dim, f_bins, t, c), dtype
            ))
        res = pl.pallas_call(
            functools.partial(_dense_conv_rm_fwd_kernel, stash=stash,
                              **kparams),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(g_dim, t // tc),
                in_specs=[
                    pl.BlockSpec((1, tc, w), lambda i, j, s, s2: (i, j, 0),
                                 memory_space=pltpu.VMEM),
                    fw_spec,
                    pl.BlockSpec((1, mult, f_bins, c),
                                 lambda i, j, s, s2: (i // n_t, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=out_specs if stash else out_specs[0],
                scratch_shapes=scratch + dma_scratch,
            ),
            out_shape=out_shape if stash else out_shape[0],
            interpret=jax.default_backend() != "tpu",
        )(zones, sblk, packed, fw, filt_bg)
        return res if stash else (res, None)

    def bwd(res, dout):
        if stash:
            zones, sblk, packed, filt_bg, s_st = res
        else:
            zones, sblk, packed, fw, filt_bg = res
        g_dim, t, _ = packed.shape
        batch = g_dim // n_t
        if stash:
            dfw, dfilt = pl.pallas_call(
                functools.partial(_dense_conv_rm_bwd_kernel, n_t=n_t,
                                  wch=wch, zrows=zrows),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(g_dim, t // tc),
                    in_specs=[
                        pl.BlockSpec((1, tc, w), lambda i, j, s: (i, j, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, mult, f_bins, c),
                                     lambda i, j, s: (i // n_t, 0, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, tc, mult * c),
                                     lambda i, j, s: (i, j, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, f_bins, tc, c),
                                     lambda i, j, s: (i, 0, j, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[
                        pl.BlockSpec((1, w, c), lambda i, j, s: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, mult, f_bins, c),
                                     lambda i, j, s: (i // n_t, 0, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=[pltpu.VMEM((f_bins * tc, c), dtype)],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((g_dim, w, c), dtype),
                    jax.ShapeDtypeStruct((batch, mult, f_bins, c),
                                         jnp.float32),
                ],
                interpret=jax.default_backend() != "tpu",
            )(zones, packed, filt_bg, dout, s_st)
        else:
            dfw, dfilt = pl.pallas_call(
                functools.partial(_dense_conv_rm_bwd_rc_kernel, **kparams),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(g_dim, t // tc),
                    in_specs=[
                        pl.BlockSpec((1, tc, w),
                                     lambda i, j, s, s2: (i, j, 0),
                                     memory_space=pltpu.VMEM),
                        fw_spec,
                        pl.BlockSpec((1, mult, f_bins, c),
                                     lambda i, j, s, s2: (i // n_t, 0, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, tc, mult * c),
                                     lambda i, j, s, s2: (i, j, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[
                        pl.BlockSpec((1, w, c),
                                     lambda i, j, s, s2: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, mult, f_bins, c),
                                     lambda i, j, s, s2: (i // n_t, 0, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=scratch + [
                        pltpu.VMEM((f_bins * tc, c), dtype),
                    ] + dma_scratch,
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((g_dim, w, c), dtype),
                    jax.ShapeDtypeStruct((batch, mult, f_bins, c),
                                         jnp.float32),
                ],
                interpret=jax.default_backend() != "tpu",
            )(zones, sblk, packed, fw, filt_bg, dout)
        if nbt:
            dfw = _window_scatter(
                dfw.reshape(batch, n_t, w, c),
                sblk.reshape(batch, n_t),
                nbt,
            )
        return (
            jnp.zeros(zones.shape, dtype=jax.dtypes.float0),
            jnp.zeros(sblk.shape, dtype=jax.dtypes.float0),
            jnp.zeros(packed.shape, dtype=jax.dtypes.float0),
            dfw,
            dfilt.astype(filt_bg.dtype),
        )

    @jax.custom_vjp
    def f(zones, sblk, packed, fw, filt_bg):
        out, _ = fwd_impl(zones, sblk, packed, fw, filt_bg, False)
        return out

    def fwd_rule(zones, sblk, packed, fw, filt_bg):
        out, s_st = fwd_impl(zones, sblk, packed, fw, filt_bg, stash)
        if stash:
            return out, (zones, sblk, packed, filt_bg, s_st)
        return out, (zones, sblk, packed, fw, filt_bg)

    f.defvjp(fwd_rule, bwd)
    return f


def _used_chunks(packed: jax.Array, wch: int) -> jax.Array:
    """Per tile, 1 + the index of the last window chunk with any selected
    candidate (min 1): chunks past it are all-zero and the conv kernels
    skip their matmuls."""
    g, _t, wp = packed.shape
    n_wc = wp // wch
    any_c = jnp.any(
        (packed != 0).reshape(g, _t, n_wc, wch), axis=(1, 3)
    )                                               # (g, n_wc)
    idx = jnp.arange(1, n_wc + 1, dtype=jnp.int32)
    return jnp.max(jnp.where(any_c, idx, 1), axis=1).astype(jnp.int32)


# --------------------- zone-split conv machinery -----------------------
#
# With SORT-GROUPED bin maps (build_dense_graph on an (8,2,q) kernel;
# see ops/pallas/query_kernel._bins_822) the stored ids are a per-cloud
# permutation of the ref bins into four contiguous groups along the sort
# axis: G0 = left-outer-radial (ids 1..8), G1 = left-inner + self
# (9..8q+1), G2 = right-inner (8q+2..16q-7), G3 = right-outer
# (16q-6..16q+1). Because the window columns are sorted along the same
# axis, each group's entries CLUSTER in a contiguous column range: a
# column strictly left of every tile target can only hold left-group
# bins, a column further left than the inner radial shell reaches can
# only hold G0, etc. The conv kernels exploit that by sweeping five
# chunk ranges, each contracting only a static SUBSET of A's bin rows:
#
#   zone  chunks        A rows            typical share of W
#   1     [z0, z1)      G0        (8)     far left  (~1/4)
#   2     [z1, z2)      G0+G1     (8q+1)  near left
#   3     [z2, z3)      all       (16q+1) ties / middle (~targets only)
#   4     [max(z2,z3), z4)  G2+G3 (8q)    near right
#   5     [z4, z5)      G3        (8)     far right (~1/4)
#
# which cuts the one-hot A matmul's MAC count to ~0.5x at the wide
# levels (17/33 on the near zones, 8/33 far). The boundaries are
# MAP-DERIVED (first/last chunk containing each group), so the split is
# exact for ANY point distribution — degenerate clouds (all ties) just
# widen zone 3 back to the full window. Ungrouped maps pass the
# degenerate boundaries (0, 0, 0, used, used, used): only zone 3 runs,
# reproducing the single full-row sweep.

def _zone_rows(f_bins: int, grouped: bool):
    """Static per-zone A row ranges [fl, fh) (rows = stored id - 1)."""
    if not grouped:
        return ((0, f_bins),) * 5
    q = (f_bins - 1) // 16
    assert f_bins == 16 * q + 1, f_bins
    return (
        (0, 8),
        (0, 8 * q + 1),
        (0, f_bins),
        (8 * q + 1, f_bins),
        (f_bins - 8, f_bins),
    )


@functools.lru_cache(maxsize=None)
def _grouped_perm(f_bins: int):
    """(3, F) int32: [sort_axis, grouped_row] -> ref bin row, mirroring
    the in-kernel renumbering (ops/pallas/query_kernel._bins_822). Ref
    row 0 is the self bin; row 1 + q*16 + p*8 + n the (n, p, q) bin."""
    import numpy as np

    q_bins = (f_bins - 1) // 16
    perm = np.zeros((3, f_bins), np.int32)
    for a in range(3):
        perm[a, 8 * q_bins] = 0                      # self -> G1 tail
        for r in range(1, f_bins):
            e = r - 1
            n_id, p_id, q_id = e % 8, (e // 8) % 2, e // 16
            if a == 2:
                hemi = p_id == 1
                inhemi = n_id
            elif a == 0:
                hemi = 2 <= n_id <= 5
                inhemi = p_id * 4 + (n_id - 2 if hemi else (n_id + 2) % 8)
            else:
                hemi = n_id >= 4
                inhemi = p_id * 4 + (n_id - 4 if hemi else n_id)
            outer = q_id == q_bins - 1
            if not hemi:
                gid = 1 + inhemi if outer else 9 + q_id * 8 + inhemi
            else:
                gid = (
                    (16 * q_bins - 6) + inhemi
                    if outer
                    else (8 * q_bins + 2) + q_id * 8 + inhemi
                )
            perm[a, gid - 1] = r
    return perm


def _zone_bounds(
    packed: jax.Array, f_bins: int, wch: int, grouped: bool
) -> jax.Array:
    """Per-tile zone chunk boundaries (g, 6) int32 (see the module
    comment above). ``packed`` is the (g, T, Wp) padded grouped map,
    ``wch`` the kernel chunk width."""
    g, _t, wp = packed.shape
    n_wc = wp // wch
    if not grouped:
        used = _used_chunks(packed, wch)
        zero = jnp.zeros_like(used)
        return jnp.stack([zero, zero, zero, used, used, used], axis=1)
    q = (f_bins - 1) // 16
    edges = (1, 9, 8 * q + 2, 16 * q - 6, 16 * q + 2)
    pk = packed.reshape(g, _t, n_wc, wch)
    idx = jnp.arange(n_wc, dtype=jnp.int32)
    los, his = [], []
    for lo_id, hi_id in zip(edges[:-1], edges[1:]):
        any_c = jnp.any((pk >= lo_id) & (pk < hi_id), axis=(1, 3))
        los.append(jnp.min(jnp.where(any_c, idx, n_wc), axis=1))
        his.append(jnp.max(jnp.where(any_c, idx + 1, 0), axis=1))
    b2 = jnp.minimum(los[2], los[3])
    b1 = jnp.minimum(los[1], b2)
    b0 = jnp.minimum(los[0], b1)
    b3 = jnp.maximum(his[0], his[1])
    b4 = jnp.maximum(b3, his[2])
    b5 = jnp.maximum(b4, his[3])
    return jnp.stack([b0, b1, b2, b3, b4, b5], axis=1).astype(jnp.int32)


def dense_depthwise_conv3d(
    inputs: jax.Array,
    filt: jax.Array,
    dnbh: DenseNeighborhood,
    pointwise: jax.Array | None = None,
) -> jax.Array:
    """Depthwise spherical conv from dense maps (no edge lists).

    out[b,m,c*r+j] = sum_w [packed==f+1] in[win(w)] filt[f,c*r+j] / cnt —
    semantically identical to ``depthwise_conv3d`` on the same graph
    (ref tf_conv3d_gpu.cu:20-27 incl. the neighbor mean).

    Args:
      inputs: (B, N, C) float features (f32 or bf16).
      filt:   (F, C, r) filter (bin_size, in_channels, multiplier).
      dnbh:   dense neighborhood over the same cloud.
      pointwise: optional (C*r, O) channel-major pointwise kernel. When
        given, the separable conv's 1x1 GEMM is contracted DIRECTLY from
        the Pallas kernels' native output layout ((r, C, T)-transposed
        for C <= 128, r-major rows above) and the result is (B, M, O):
        the (B, M, C*r) intermediate and its HBM layout transpose
        (~1-2ms per conv at the fine levels, round-3 profile) never
        materialize. Numerically identical to transposing then
        matmul-ing — the contraction order per output element is the
        same.

    Returns:
      (B, M, C*r) in the input dtype, or (B, M, O) when ``pointwise``
      is given.
    """
    batch, num_in, c_in = inputs.shape
    f_bins, _, mult = filt.shape
    w = dnbh.window
    n_t = dnbh.s_blk.shape[1]
    m_pad = n_t * TILE
    num_out = dnbh.num_query
    compute_dtype = inputs.dtype
    _record_cost(
        "conv", g=batch * n_t, w=w, c=c_in, f=f_bins, mult=mult,
        dma=_dma_ok(c_in), pointwise=0 if pointwise is None
        else pointwise.shape[-1], grouped=dnbh.grouped,
    )

    # The neighbor mean (ref tf_conv3d_gpu.cu:25) commutes with the linear
    # bin contraction; it is fused into the kernels as a per-row scale.
    cnt_p = jnp.pad(dnbh.count, ((0, 0), (0, m_pad - num_out)))
    inv_cnt = 1.0 / jnp.maximum(cnt_p, 1).astype(jnp.float32)

    if c_in <= TILE:
        # transposed orientation: the matmul's small dim is M (sublane
        # padding only) instead of 128-padded N — ~1.6x at C=35. The
        # window is zero-padded up to the chunk width (_w_chunk) so wide
        # MXU chunks survive non-multiple windows.
        wch, wp = _w_chunk(
            w, f_bins, c_in, jnp.dtype(compute_dtype).itemsize
        )
        packed = jnp.pad(dnbh.packed, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
        packed = packed.reshape(batch * n_t, TILE, wp)
        inv = inv_cnt.reshape(batch * n_t, 1, TILE)
        filt_rcf = jnp.transpose(filt, (2, 1, 0)).astype(compute_dtype)
        if dnbh.grouped:
            perm = jnp.asarray(_grouped_perm(f_bins))
            filt_bg = jnp.moveaxis(
                jnp.take(filt_rcf, perm[dnbh.axis], axis=2), 2, 0
            )                                       # (B, r, C, F) grouped
        else:
            filt_bg = jnp.broadcast_to(
                filt_rcf, (batch,) + filt_rcf.shape
            )
        zones = _zone_bounds(packed, f_bins, wch, dnbh.grouped)
        sblk = dnbh.s_blk.reshape(-1).astype(jnp.int32)
        if _dma_ok(c_in):
            fw, nbt = _blocked_feats(inputs, wp, w)
            nt_k, nbt_k = n_t, nbt
        else:
            fw = window_features(inputs, dnbh, pad_to=wp).reshape(
                batch * n_t, wp, c_in
            )
            nt_k, nbt_k = n_t, 0
        out_t = _dense_conv_for(
            wp, wch, f_bins, mult, c_in, 1, compute_dtype.name,
            nt_k, nbt_k, dnbh.grouped, c_in <= _S_STASH_MAX_CC,
        )(zones, sblk, packed, fw, filt_bg, inv)    # (g, r, C, T)
        out_t = out_t.reshape(batch, n_t, mult, c_in, TILE)
        if pointwise is not None:
            # contract (r, C) straight out of the kernel layout; the T
            # axis stays minor so no HBM transpose precedes the GEMM
            pw = pointwise.reshape(c_in, mult, -1).astype(compute_dtype)
            out = jnp.einsum(
                "bnjct,cjo->bnto", out_t, pw,
                preferred_element_type=jnp.float32,
            ).astype(compute_dtype).reshape(batch, m_pad, -1)
            return out[:, :num_out]
        # (B, nT, r, C, T) -> (B, M, C, r): reference layout is
        # channel-major with the multiplier minor (out[..., c*r + j])
        out = jnp.transpose(out_t, (0, 1, 4, 3, 2)).reshape(
            batch, m_pad, c_in * mult
        )
    else:
        wch, wp = _w_chunk(w)
        packed = jnp.pad(dnbh.packed, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
        packed = packed.reshape(batch * n_t, TILE, wp)
        filt_rfc = jnp.transpose(filt, (2, 0, 1)).astype(compute_dtype)
        if dnbh.grouped:
            perm = jnp.asarray(_grouped_perm(f_bins))
            filt_bg = jnp.moveaxis(
                jnp.take(filt_rfc, perm[dnbh.axis], axis=1), 1, 0
            )                                       # (B, r, F, C) grouped
        else:
            filt_bg = jnp.broadcast_to(
                filt_rfc, (batch,) + filt_rfc.shape
            )
        zones = _zone_bounds(packed, f_bins, wch, dnbh.grouped)
        sblk = dnbh.s_blk.reshape(-1).astype(jnp.int32)
        if _dma_ok(c_in):
            fw, nbt = _blocked_feats(inputs, wp, w)
            nt_k, nbt_k = n_t, nbt
        else:
            fw = window_features(inputs, dnbh, pad_to=wp).reshape(
                batch * n_t, wp, c_in
            )
            nt_k, nbt_k = n_t, 0
        out_r = _dense_conv_rm_for(
            wp, wch, f_bins, mult, compute_dtype.name, c_in, nt_k, nbt_k,
            dnbh.grouped, c_in <= _S_STASH_MAX_CC,
        )(zones, sblk, packed, fw, filt_bg)         # (g, T, r*C) r-major
        if pointwise is not None:
            # permute the (C*r, O) kernel rows to the r-major order the
            # Pallas output uses — a (C*r, O) param-side shuffle instead
            # of the (B, M, r, C) activation transpose
            pw = pointwise.reshape(c_in, mult, -1).transpose(1, 0, 2)
            pw = pw.reshape(mult * c_in, -1).astype(compute_dtype)
            scaled = (
                out_r.reshape(batch, m_pad, mult * c_in)
                * inv_cnt[..., None]
            ).astype(compute_dtype)  # same f32 scale as the unfused path
            out = jnp.einsum(
                "bmk,ko->bmo", scaled, pw,
                preferred_element_type=jnp.float32,
            ).astype(compute_dtype)
            return out[:, :num_out]
        out_r = out_r.reshape(batch, m_pad, mult, c_in)
        out = jnp.transpose(out_r, (0, 1, 3, 2)).reshape(
            batch, m_pad, c_in * mult
        )
        out = (out * inv_cnt[..., None]).astype(compute_dtype)
    return out[:, :num_out].astype(compute_dtype)


# ------------------------------ pooling --------------------------------

_POOL_WCHUNK = 128
_NEG = float(jnp.finfo(jnp.float32).min)

# Pallas masked-max pool. Round 2's attempt lost to XLA because the
# (t, w, c) mask broadcast needs w on SUBLANES for the mask but on
# LANES in the packed map — Mosaic lowered the lane<->sublane transpose
# to scalar shuffles. This version transposes the selection mask ONCE
# per tile on the MXU (an eye-matmul), after which both broadcasts of
# the (wsub, T, C) candidate block are legal cheap forms (lane-broadcast
# of (wsub, T, 1), sublane-broadcast of (wsub, 1, C)) — and the W sweep
# becomes an in-kernel ``fori_loop`` bounded by the tile's last nonempty
# chunk (scalar-prefetched), skipping the all-zero window tail that the
# XLA formulation pays full price for.

_POOL_WSUB = 32
_POOL_BITS = 13                   # column bits: windows up to 8192 rows
_POOL_EMPTY = -(2 ** 29)          # additive penalty for unselected


def _pool_keys(f, j, wsub):
    """Composite int32 sort keys for window rows [j*wsub, (j+1)*wsub):
    monotone-mapped bf16 bits in the high half, ``0x1FFF - w`` in the
    low 13 bits, so ONE running max yields both the max value and its
    FIRST attaining column — the reference's strict-``>`` scan order
    (ref tf_pool3d_gpu.cu:26). 29 bits total: the unselected penalty
    ``-2**29`` then keeps every penalized key strictly below every real
    one (real keys are >= 1) with a single integer ADD — the hot 3D op
    is one add + one max per candidate-channel."""
    v = f + jnp.bfloat16(0.0)                        # -0 -> +0
    b = lax.bitcast_convert_type(v, jnp.uint16).astype(jnp.int32)
    neg = (b & 0x8000) != 0
    key = jnp.where(neg, 0xFFFF - b, b | 0x8000)     # (wsub, cc)
    wcol = j * wsub + lax.broadcasted_iota(jnp.int32, f.shape, 0)
    return (key << _POOL_BITS) | ((1 << _POOL_BITS) - 1 - wcol)


def _dense_pool_fwd_kernel(
    used_ref, packed_ref, fw_ref, best_ref, selt_scr, *, wsub
):
    """Grid (k_c, g): one cell = one query tile for one C chunk. The
    selection mask is transposed ONCE on the MXU — an eye-matmul scaled
    by 2**29 emits the additive penalty directly — after which both
    broadcasts of the (wsub, T, C) candidate block are legal cheap forms
    (lane-broadcast of (wsub, T, 1), sublane-broadcast of (wsub, 1, C));
    round 2's direct mask broadcast needed a lane<->sublane transpose
    that Mosaic lowers to scalar shuffles."""
    used = used_ref[pl.program_id(1)]
    t = packed_ref.shape[1]
    cc = fw_ref.shape[2]
    sel = (packed_ref[0] != 0).astype(jnp.bfloat16)  # (T, W)
    i0 = lax.broadcasted_iota(jnp.int32, (t, t), 0)
    i1 = lax.broadcasted_iota(jnp.int32, (t, t), 1)
    eye = (i0 == i1).astype(jnp.bfloat16) * jnp.bfloat16(2.0 ** 29)
    selt_scr[...] = lax.dot_general(                 # (W, T) {0, 2**29}
        sel, eye, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def body(j, best):
        enc = _pool_keys(fw_ref[0, pl.ds(j * wsub, wsub), :], j, wsub)
        pen = selt_scr[pl.ds(j * wsub, wsub), :].astype(jnp.int32) \
            + jnp.int32(_POOL_EMPTY)                  # {-2**29, 0}
        cand = pen[:, :, None] + enc[:, None, :]      # (wsub, T, cc)
        return jnp.maximum(best, jnp.max(cand, axis=0))

    best_ref[0] = lax.fori_loop(
        0, used, body, jnp.full((t, cc), _POOL_EMPTY, jnp.int32)
    )


def _dense_pool_bwd_kernel(used_ref, arg_ref, dout_ref, dfw_ref, *, wsub):
    """dfw[w, c] = sum_t [argmax[t, c] == w] dout[t, c] — all of dout to
    the FIRST maximal selected candidate, exactly the CUDA scatter
    semantics (ref tf_pool3d_gpu.cu:38-50), deterministic. Window chunks
    past the tile's last nonempty one keep the upfront zero fill."""
    used = used_ref[pl.program_id(1)]
    dfw_ref[...] = jnp.zeros_like(dfw_ref)
    arg = arg_ref[0]                                 # (T, cc) int32
    dout = dout_ref[0].astype(jnp.float32)           # (T, cc)

    def body(j, carry):
        w3 = j * wsub + lax.broadcasted_iota(
            jnp.int32, (wsub,) + arg.shape, 0
        )
        m = arg[None, :, :] == w3                    # (wsub, T, cc)
        d3 = jnp.where(m, dout[None, :, :], 0.0)
        dfw_ref[0, pl.ds(j * wsub, wsub), :] = jnp.sum(
            d3, axis=1
        ).astype(dfw_ref.dtype)
        return carry

    lax.fori_loop(0, used, body, jnp.int32(0))


@functools.lru_cache(maxsize=None)
def _masked_window_max_pallas_for(w: int, c: int, n_cc: int,
                                  dtype_name: str):
    """custom_vjp Pallas masked-max factory (bf16 feature windows)."""
    dtype = jnp.dtype(dtype_name)
    cc = c // n_cc
    wsub = _POOL_WSUB
    assert w % wsub == 0 and c % n_cc == 0

    def fwd_impl(used, packed, fw):
        g = packed.shape[0]
        best = pl.pallas_call(
            functools.partial(_dense_pool_fwd_kernel, wsub=wsub),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_cc, g),
                in_specs=[
                    pl.BlockSpec((1, TILE, w), lambda k, i, s: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, w, cc), lambda k, i, s: (i, 0, k),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, TILE, cc), lambda k, i, s: (i, 0, k),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.VMEM((w, TILE), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((g, TILE, c), jnp.int32),
            interpret=jax.default_backend() != "tpu",
        )(used, packed, fw)
        # decode the composite keys (cheap (G, T, C) elementwise).
        # Real keys are >= 1 (any non-NaN bf16 maps to key16 >= 0x80);
        # penalized candidates are <= -1 and the empty init is -2**29,
        # so empty rows are exactly the non-positive ones.
        empty = best <= 0
        key16 = ((best >> _POOL_BITS) & 0xFFFF).astype(jnp.uint16)
        neg = (key16 & jnp.uint16(0x8000)) == 0
        bits = jnp.where(neg, ~key16, key16 & jnp.uint16(0x7FFF))
        out = lax.bitcast_convert_type(bits, jnp.bfloat16).astype(
            jnp.float32
        )
        out = jnp.where(empty, _NEG, out)
        arg = jnp.where(
            empty, 0,
            (1 << _POOL_BITS) - 1 - (best & ((1 << _POOL_BITS) - 1)),
        ).astype(jnp.int32)
        return out, arg

    def bwd(res, cts):
        used, arg, g = res
        dout, _ = cts                    # int argmax has zero cotangent
        dfw = pl.pallas_call(
            functools.partial(_dense_pool_bwd_kernel, wsub=wsub),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_cc, g),
                in_specs=[
                    pl.BlockSpec((1, TILE, cc), lambda k, i, s: (i, 0, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TILE, cc), lambda k, i, s: (i, 0, k),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, w, cc), lambda k, i, s: (i, 0, k),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((g, w, c), dtype),
            interpret=jax.default_backend() != "tpu",
        )(used, arg, dout.astype(jnp.float32))
        return (
            jnp.zeros(used.shape, dtype=jax.dtypes.float0),
            jnp.zeros((g, TILE, w), dtype=jax.dtypes.float0),
            dfw,
        )

    @jax.custom_vjp
    def f(used, packed, fw):
        return fwd_impl(used, packed, fw)

    def fwd_rule(used, packed, fw):
        out, arg = fwd_impl(used, packed, fw)
        return (out, arg), (used, arg, packed.shape[0])

    f.defvjp(fwd_rule, bwd)
    return f


# Rank-compacted max pool: the structural win over both the XLA masked
# max and the windowed Pallas kernel above. Selection-only maps store
# each neighbor's RANK (1..K, K = nn_sample <= 127; query_kernel.py), so
# the (T, W) window compacts to K <= 64 candidate rows per query via a
# k-major one-hot MATMUL on the MXU — (K*T, W) @ (W, C) — and the max
# runs over K rows instead of W ~ 1792 columns: a ~W/K cut of the VPU
# volume that dominated the window-sweep kernels. Ranks are assigned in
# window order, so first-maximal-k == first-maximal-window-column and
# the reference's strict-> scan-order tie-break is preserved
# (ref tf_pool3d_gpu.cu:26). The backward compacts dout the same way
# (dcomp[k*T+t] = dout[t] iff argmax k matches) and scatters through the
# transposed one-hot, again on the MXU (ref tf_pool3d_gpu.cu:38-50
# semantics, deterministic).

def _rank_pool_fwd_kernel(
    used_ref, kused_ref, sblk_ref, cnt_ref, packed_ref, fw_ref, best_ref,
    s_scr, *rest, wch, kchunk, n_kc, n_t, nbt, cc,
):
    """Grid (k_c, g). Composite int32 keys as in :func:`_pool_keys`:
    monotone bf16 bits << 13 | (8191 - k), one running max for value AND
    first attaining rank; invalid rows (k >= count) get the additive
    ``_POOL_EMPTY`` penalty. Rank chunks past the tile's max neighbor
    count (``kused_ref``) are skipped — their one-hots are all-zero and
    their keys all-penalized, so ``best`` is unchanged by construction
    (S3DIS counts at r=0.1 are often << nn_uplimit, halving the sweep).

    ``nbt > 0`` selects direct window DMA (single-C-chunk pools only):
    ``fw_ref`` is the blocked feature array in ANY memory and the tile's
    window slab is DMA'd into a VMEM scratch here, as in the conv
    kernels."""
    i = pl.program_id(1)
    used = used_ref[i]
    kused = kused_ref[i]
    t = packed_ref.shape[1]
    cnt = cnt_ref[0]                                  # (1, T) int32
    if nbt:
        fwin_scr, sem = rest
        nbw, _, cc_w = fwin_scr.shape
        dma = pltpu.make_async_copy(
            # chunked pools (n_cc > 1) DMA only this cell's 128-lane
            # channel chunk (lane starts/sizes stay tile-aligned)
            fw_ref.at[
                pl.ds((i // n_t) * nbt + sblk_ref[i], nbw), :,
                pl.ds(pl.program_id(0) * cc_w, cc_w),
            ],
            fwin_scr, sem,
        )
        dma.start()
        dma.wait()
        fw_dtype = fwin_scr.dtype
    else:
        fw_dtype = fw_ref.dtype

    def _fw_chunk(c):
        if nbt:
            wcb = wch // TILE
            cc_w = fwin_scr.shape[2]
            fwc = fwin_scr[pl.ds(c * wcb, wcb)].reshape(wch, cc_w)
            # lane-padded slab (C < 128): drop the zero pad lanes
            return fwc[:, :cc] if cc_w != cc else fwc
        return fw_ref[0, pl.ds(c * wch, wch), :]

    def ki_body(ki, best):
        s_scr[...] = jnp.zeros_like(s_scr)

        def body(c, carry):
            pk = packed_ref[0, :, pl.ds(c * wch, wch)].astype(jnp.int32)
            k_iota = lax.broadcasted_iota(jnp.int32, (kchunk, t, wch), 0)
            r = (pk[None, :, :] == k_iota + ki * kchunk + 1).reshape(
                kchunk * t, wch
            ).astype(fw_dtype)
            s_scr[...] += lax.dot_general(
                r, _fw_chunk(c),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                         # (kchunk*T, cc)
            return carry

        lax.fori_loop(0, used, body, jnp.int32(0))
        s3 = s_scr[...].reshape(kchunk, t, cc) + 0.0  # -0 -> +0
        b16 = lax.bitcast_convert_type(
            s3.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.int32)
        neg = (b16 & 0x8000) != 0
        mono = jnp.where(neg, 0xFFFF - b16, b16 | 0x8000)
        kg3 = ki * kchunk + lax.broadcasted_iota(jnp.int32, s3.shape, 0)
        kg2 = ki * kchunk + lax.broadcasted_iota(jnp.int32, (kchunk, t), 0)
        pen2 = jnp.where(kg2 < cnt, 0, jnp.int32(_POOL_EMPTY))
        key = ((mono << _POOL_BITS) | (8191 - kg3)) + pen2[:, :, None]
        return jnp.maximum(best, jnp.max(key, axis=0))

    best_ref[0] = lax.fori_loop(
        0, kused, ki_body, jnp.full((t, cc), _POOL_EMPTY, jnp.int32)
    )


def _rank_pool_bwd_kernel(
    used_ref, kused_ref, packed_ref, arg_ref, dout_ref, dfw_ref, dfw_scr,
    *, wch, kchunk, n_kc,
):
    """dfw = R^T @ dcomp per window chunk, accumulated in f32; arg is the
    K-space argmax (-1 on empty rows, which therefore get nothing).
    Rank chunks past the tile's max count are skipped (arg < count, so
    their dcomp is all-zero)."""
    used = used_ref[pl.program_id(1)]
    kused = kused_ref[pl.program_id(1)]
    t = packed_ref.shape[1]
    cc = dout_ref.shape[2]
    dfw_scr[...] = jnp.zeros_like(dfw_scr)
    arg = arg_ref[0]                                  # (T, cc) int32
    dout32 = dout_ref[0].astype(jnp.float32)          # (T, cc)

    def ki_body(ki, carry):
        kg3 = ki * kchunk + lax.broadcasted_iota(
            jnp.int32, (kchunk, t, cc), 0
        )
        dcomp = jnp.where(arg[None, :, :] == kg3, dout32[None, :, :], 0.0)
        dcomp = dcomp.reshape(kchunk * t, cc).astype(dfw_ref.dtype)

        def body(c, carry2):
            pk = packed_ref[0, :, pl.ds(c * wch, wch)].astype(jnp.int32)
            k_iota = lax.broadcasted_iota(jnp.int32, (kchunk, t, wch), 0)
            r = (pk[None, :, :] == k_iota + ki * kchunk + 1).reshape(
                kchunk * t, wch
            ).astype(dcomp.dtype)
            dfw_scr[pl.ds(c * wch, wch), :] += lax.dot_general(
                r, dcomp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                         # (wch, cc)
            return carry2

        lax.fori_loop(0, used, body, jnp.int32(0))
        return carry

    lax.fori_loop(0, kused, ki_body, jnp.int32(0))
    dfw_ref[0] = dfw_scr[...].astype(dfw_ref.dtype)


@functools.lru_cache(maxsize=None)
def _rank_window_max_for(wp: int, wch: int, c: int, n_cc: int,
                         kchunk: int, n_kc: int, dtype_name: str,
                         n_t: int = 0, nbt: int = 0):
    """custom_vjp factory for the rank-compacted masked max.

    ``nbt > 0``: direct window DMA — the op takes the TILE-row-blocked
    feature array and its cotangent is the blocked array (per-tile dfw
    scattered by _window_scatter). Chunked pools (n_cc > 1) DMA one
    128-lane channel chunk per grid cell."""
    dtype = jnp.dtype(dtype_name)
    cc = c // n_cc
    assert wp % wch == 0 and c % n_cc == 0
    assert not nbt or cc % TILE == 0 or n_cc == 1
    if nbt:
        fw_spec = pl.BlockSpec(memory_space=pl.ANY)
        dma_scratch = [
            pltpu.VMEM((wp // TILE, TILE, _dma_c(cc)), dtype),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        fw_spec = pl.BlockSpec((1, wp, cc),
                               lambda k, i, s, s2, s3: (i, 0, k),
                               memory_space=pltpu.VMEM)
        dma_scratch = []

    def fwd_impl(used, kused, sblk, counts, packed, fw):
        g = packed.shape[0]
        best = pl.pallas_call(
            functools.partial(
                _rank_pool_fwd_kernel, wch=wch, kchunk=kchunk, n_kc=n_kc,
                n_t=n_t, nbt=nbt, cc=cc,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_cc, g),
                in_specs=[
                    pl.BlockSpec((1, 1, TILE),
                                 lambda k, i, s, s2, s3: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TILE, wp),
                                 lambda k, i, s, s2, s3: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    fw_spec,
                ],
                out_specs=pl.BlockSpec(
                    (1, TILE, cc), lambda k, i, s, s2, s3: (i, 0, k),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((kchunk * TILE, cc), jnp.float32)
                ] + dma_scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((g, TILE, c), jnp.int32),
            interpret=jax.default_backend() != "tpu",
        )(used, kused, sblk, counts, packed, fw)
        # real keys are > 0 (mono >= 0x8000 for any non-negative bf16,
        # and 8191 - k > 8000 even at mono == 0), penalized/empty < 0
        empty = best <= 0
        key16 = ((best >> _POOL_BITS) & 0xFFFF).astype(jnp.uint16)
        neg = (key16 & jnp.uint16(0x8000)) == 0
        bits = jnp.where(neg, ~key16, key16 & jnp.uint16(0x7FFF))
        out = lax.bitcast_convert_type(bits, jnp.bfloat16).astype(
            jnp.float32
        )
        out = jnp.where(empty, _NEG, out)
        arg = jnp.where(empty, -1, 8191 - (best & 8191)).astype(jnp.int32)
        return out, arg

    def bwd(res, cts):
        used, kused, sblk, packed, arg, g = res
        dout, _ = cts                    # int argmax has zero cotangent
        dfw = pl.pallas_call(
            functools.partial(
                _rank_pool_bwd_kernel, wch=wch, kchunk=kchunk, n_kc=n_kc
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_cc, g),
                in_specs=[
                    pl.BlockSpec((1, TILE, wp), lambda k, i, s, s2: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TILE, cc), lambda k, i, s, s2: (i, 0, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TILE, cc), lambda k, i, s, s2: (i, 0, k),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, wp, cc), lambda k, i, s, s2: (i, 0, k),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.VMEM((wp, cc), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((g, wp, c), dtype),
            interpret=jax.default_backend() != "tpu",
        )(used, kused, packed, arg, dout.astype(dtype))
        if nbt:
            batch = g // n_t
            dfw = _window_scatter(
                dfw.reshape(batch, n_t, wp, c),
                sblk.reshape(batch, n_t),
                nbt,
            )
        return (
            jnp.zeros(used.shape, dtype=jax.dtypes.float0),
            jnp.zeros(kused.shape, dtype=jax.dtypes.float0),
            jnp.zeros(sblk.shape, dtype=jax.dtypes.float0),
            jnp.zeros((g, 1, TILE), dtype=jax.dtypes.float0),
            jnp.zeros((g, TILE, wp), dtype=jax.dtypes.float0),
            dfw,
        )

    @jax.custom_vjp
    def f(used, kused, sblk, counts, packed, fw):
        return fwd_impl(used, kused, sblk, counts, packed, fw)

    def fwd_rule(used, kused, sblk, counts, packed, fw):
        out, arg = fwd_impl(used, kused, sblk, counts, packed, fw)
        return (out, arg), (
            used, kused, sblk, packed, arg, packed.shape[0]
        )

    f.defvjp(fwd_rule, bwd)
    return f


def _pool_chunks(w: int):
    return [
        (w0, min(_POOL_WCHUNK, w - w0)) for w0 in range(0, w, _POOL_WCHUNK)
    ]


def _masked_window_max_impl(packed, fw):
    """(out, argmax)[g,t,c] = running masked max + FIRST maximal window
    column over the selected candidates ((finfo.min, 0) if none).

    Pure XLA chunked running max (one reduce per chunk). A Pallas version
    is NOT faster here: the (t, w, c) mask broadcast needs a lane<->sublane
    transpose that Mosaic lowers to scalar shuffles, while XLA streams the
    fused compare+reduce at HBM speed.

    bf16 features take a single-reduce path: (value, window-column) pairs
    are packed into one uint32 sort key — monotone-mapped bf16 bits in the
    high half, ``0xFFFF - w`` in the low half — so ONE running ``max``
    yields both the max and its FIRST attaining column (larger low half =
    smaller w), exactly the reference's strict-``>`` scan order
    (ref tf_pool3d_gpu.cu:26).
    """
    g, t, w = packed.shape
    c = fw.shape[-1]
    if fw.dtype == jnp.bfloat16:
        best = jnp.zeros((g, t, c), jnp.uint32)
        for w0, wc in _pool_chunks(w):
            v = fw[:, w0:w0 + wc, :] + jnp.bfloat16(0.0)  # -0 -> +0
            b = lax.bitcast_convert_type(v, jnp.uint16)
            neg = (b & jnp.uint16(0x8000)) != 0
            key = jnp.where(neg, ~b, b | jnp.uint16(0x8000))
            enc = (key.astype(jnp.uint32) << 16) | jnp.uint32(
                0xFFFF - (jnp.arange(w0, w0 + wc, dtype=jnp.uint32)[
                    None, :, None
                ])
            )                                              # (G,wc,C)
            sel = packed[:, :, w0:w0 + wc] > 0             # (G,T,wc)
            cand = jnp.where(
                sel[:, :, :, None], enc[:, None, :, :], 0
            )                                              # (G,T,wc,C)
            best = jnp.maximum(best, jnp.max(cand, axis=2))
        key16 = (best >> 16).astype(jnp.uint16)
        neg = (key16 & jnp.uint16(0x8000)) == 0
        bits = jnp.where(neg, ~key16, key16 & jnp.uint16(0x7FFF))
        out = lax.bitcast_convert_type(bits, jnp.bfloat16).astype(
            jnp.float32
        )
        empty = best == 0
        out = jnp.where(empty, _NEG, out)
        arg = jnp.where(
            empty, 0,
            (0xFFFF - (best & jnp.uint32(0xFFFF))).astype(jnp.int32),
        )
        return out, arg
    # additive -inf penalty for unselected candidates; finfo.min + finite
    # activation rounds back to finfo.min, still fine for max/argmax
    pen = jnp.where(packed > 0, 0.0, _NEG)                 # (G,T,W) f32
    out = jnp.full((g, t, c), _NEG, jnp.float32)
    arg = jnp.zeros((g, t, c), jnp.int32)
    for w0, wc in _pool_chunks(w):
        v = (fw[:, None, w0:w0 + wc, :].astype(jnp.float32)
             + pen[:, :, w0:w0 + wc, None])                # (G,T,wc,C)
        cm = jnp.max(v, axis=2)
        ca = jnp.argmax(v, axis=2).astype(jnp.int32) + w0  # first max
        # strict > keeps the FIRST maximal candidate in point order
        # (ref tf_pool3d_gpu.cu:26)
        take = cm > out
        out = jnp.where(take, cm, out)
        arg = jnp.where(take, ca, arg)
    return out, arg


@functools.lru_cache(maxsize=None)
def _masked_window_max_for(w: int, dtype_name: str):
    """custom_vjp masked-max factory, cached per (window, feature dtype)
    so static config stays out of the residual pytree."""
    fw_dtype = jnp.dtype(dtype_name)

    def bwd(res, cts):
        # dfw[w, c] = sum_t [argmax[t, c] == w] * dout[t, c] — all of dout
        # goes to the FIRST maximal selected candidate, exactly the CUDA
        # scatter semantics (ref tf_pool3d_gpu.cu:38-50), deterministic.
        (arg,) = res
        dout, _ = cts  # the int argmax output has a zero cotangent
        g, t, _c = arg.shape
        dout32 = dout.astype(jnp.float32)
        parts = []
        for w0, wc in _pool_chunks(w):
            iota_w = jnp.arange(w0, w0 + wc, dtype=jnp.int32)
            m = (arg[:, :, None, :] == iota_w[None, None, :, None]).astype(
                jnp.float32
            )                                              # (G,T,wc,C)
            parts.append(jnp.sum(m * dout32[:, :, None, :], axis=1))
        dfw = jnp.concatenate(parts, axis=1).astype(fw_dtype)  # (G,W,C)
        return (jnp.zeros((g, t, w), dtype=jax.dtypes.float0), dfw)

    def fwd(packed, fw):
        out, arg = _masked_window_max_impl(packed, fw)
        return (out, arg), (arg,)

    @jax.custom_vjp
    def f(packed, fw):
        return _masked_window_max_impl(packed, fw)

    f.defvjp(fwd, bwd)
    return f


def dense_max_pool3d(
    inputs: jax.Array,
    dnbh: DenseNeighborhood,
    with_index: bool = True,
) -> tuple[jax.Array, jax.Array | None]:
    """Max pooling from dense maps; returns (out (B,M,C), max_index
    (B,M,C) int32 input-point ids) like ``max_pool3d``. Differentiable in
    ``inputs`` (grad goes to the first maximal window column, then the
    window gather's transpose block-scatters back to the cloud). Pass
    ``with_index=False`` to skip materializing max_index (the models
    discard it — only op-level API parity needs it)."""
    batch, num_in, c = inputs.shape
    w = dnbh.window
    n_t = dnbh.s_blk.shape[1]
    m_pad = n_t * TILE
    num_out = dnbh.num_query
    _record_cost(
        "max_pool", g=batch * n_t, w=w, c=c, k=dnbh.k_max,
        dma=_dma_ok(c),
    )

    if (
        not with_index                    # arg is a K-space rank here
        and inputs.dtype == jnp.bfloat16
        and 0 < dnbh.k_max
        and (c % 128 == 0 or c == 64)
    ):
        # rank-compacted MXU path (see _rank_pool_fwd_kernel)
        wch, wp = _w_chunk(w)
        packed = jnp.pad(dnbh.packed, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
        packed = packed.reshape(batch * n_t, TILE, wp)
        counts = jnp.pad(
            dnbh.count, ((0, 0), (0, m_pad - num_out))
        ).reshape(batch * n_t, 1, TILE).astype(jnp.int32)
        used = _used_chunks(packed, wch)
        kchunk = min(32, _round_up(dnbh.k_max, 8))
        n_kc = -(-dnbh.k_max // kchunk)
        n_cc = max(c // 128, 1)
        # rank chunks past the tile's max count are provably dead work
        kused = jnp.clip(
            -(-jnp.max(counts.reshape(batch * n_t, TILE), axis=1)
              // kchunk),
            1, n_kc,
        ).astype(jnp.int32)
        sblk = dnbh.s_blk.reshape(-1).astype(jnp.int32)
        if _dma_ok(c):
            fw, nbt = _blocked_feats(inputs, wp, w)
            nt_k, nbt_k = n_t, nbt
        else:
            fw = window_features(inputs, dnbh, pad_to=wp).reshape(
                batch * n_t, wp, c
            )
            nt_k, nbt_k = 0, 0
        out, arg = _rank_window_max_for(
            wp, wch, c, n_cc, kchunk, n_kc, inputs.dtype.name,
            nt_k, nbt_k,
        )(used, kused, sblk, counts, packed, fw)
    elif (
        inputs.dtype == jnp.bfloat16
        and w % _POOL_WSUB == 0
        and w <= (1 << _POOL_BITS)
        and (c % 128 == 0 or c == 64)
    ):
        fw = window_features(inputs, dnbh).reshape(batch * n_t, w, c)
        packed = dnbh.packed.reshape(batch * n_t, TILE, w)
        n_cc = max(c // 128, 1)
        used = _used_chunks(packed, _POOL_WSUB)
        out, arg = _masked_window_max_pallas_for(
            w, c, n_cc, inputs.dtype.name
        )(used, packed, fw)
    else:
        fw = window_features(inputs, dnbh).reshape(batch * n_t, w, c)
        packed = dnbh.packed.reshape(batch * n_t, TILE, w)
        out, arg = _masked_window_max_for(w, inputs.dtype.name)(packed, fw)
    # empty rows (padding) hold finfo.min; the ref leaves 0 there
    out = jnp.where(out <= _NEG / 2, 0.0, out)
    out = out.reshape(batch, m_pad, c)[:, :num_out].astype(inputs.dtype)
    if not with_index:
        return out, None
    arg = arg.reshape(batch, n_t, TILE, c)
    max_index = jnp.minimum(
        dnbh.s_blk.reshape(batch, n_t, 1, 1) * TILE + arg,
        num_in - 1,
    ).reshape(batch, m_pad, c)[:, :num_out]
    return out, max_index


def _masked_mean_matmul(inputs, dnbh, weights=None):
    """sum_w mask[t,w] * featwin[w,c] as a batched XLA matmul."""
    batch = inputs.shape[0]
    w = dnbh.window
    n_t = dnbh.s_blk.shape[1]
    m_pad = n_t * TILE
    num_out = dnbh.num_query
    compute_dtype = inputs.dtype
    _record_cost(
        "masked_mean", g=batch * n_t, w=w, c=inputs.shape[-1],
        weighted=weights is not None,
    )
    precision = (
        lax.Precision.DEFAULT
        if compute_dtype == jnp.bfloat16
        else lax.Precision.HIGHEST
    )
    fw = window_features(inputs, dnbh)                 # (B, nT, W, C)
    mask = (dnbh.packed > 0).astype(compute_dtype)     # (B, nT, T, W)
    if weights is not None:
        mask = mask * weights.astype(compute_dtype)
    out = jnp.einsum(
        "gtw,gwc->gtc",
        mask.reshape(batch * n_t, TILE, w),
        fw.reshape(batch * n_t, w, -1),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).reshape(batch, m_pad, -1)
    return out, num_out


def dense_avg_pool3d(
    inputs: jax.Array, dnbh: DenseNeighborhood
) -> jax.Array:
    """Masked mean over selected candidates (ref tf_pool3d_gpu.cu:53-70)."""
    out, num_out = _masked_mean_matmul(inputs, dnbh)
    cnt_p = jnp.pad(dnbh.count, ((0, 0), (0, out.shape[1] - num_out)))
    inv = 1.0 / jnp.maximum(cnt_p, 1).astype(inputs.dtype)
    return (out.astype(inputs.dtype) * inv[..., None])[:, :num_out]


dense_mean_interpolate = dense_avg_pool3d  # same masked mean
# (ref tf_unpool3d_gpu.cu:5-22 — fine-point mean of coarse neighbors)


def dense_weighted_interpolate(
    inputs: jax.Array, dnbh: DenseNeighborhood
) -> jax.Array:
    """Distance-proportional weighted sum (the reference quirk:
    weight = (dist + eps) / (sum dist + eps) over SQRT-space distances,
    ref utils/sph3gcn_util.py:317-321). Requires need_dist=True maps."""
    if dnbh.dist is None:
        raise ValueError(
            "dense_weighted_interpolate needs dist maps: build the graph "
            "with need_dist=True"
        )
    eps = 1e-7
    sel = dnbh.packed > 0
    dist = jnp.where(sel, dnbh.dist, 0.0)
    sum_dist = jnp.sum(dist, axis=-1, keepdims=True)
    weights = jnp.where(sel, (dist + eps) / (sum_dist + eps), 0.0)
    out, num_out = _masked_mean_matmul(inputs, dnbh, weights=weights)
    return out.astype(inputs.dtype)[:, :num_out]


def dense_ids_prob(dnbh: DenseNeighborhood) -> jax.Array:
    """IDS sampling probability: sum of selected sqrt-space distances over
    count (ref utils/sph3gcn_util.py:37-39). Requires need_dist=True."""
    if dnbh.dist is None:
        raise ValueError("dense_ids_prob needs dist maps (need_dist=True)")
    batch = dnbh.packed.shape[0]
    num_out = dnbh.num_query
    sel = dnbh.packed > 0
    dist_sum = jnp.sum(
        jnp.where(sel, dnbh.dist, 0.0), axis=-1
    ).reshape(batch, -1)[:, :num_out]
    return dist_sum / jnp.maximum(dnbh.count, 1).astype(jnp.float32)
