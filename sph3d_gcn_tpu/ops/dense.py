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
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
_BOUNDARY_EPS = 1e-6     # ref tf_nnquery_gpu.cu:49
_M_EPS = 1.01e-3         # ref tf_buildkernel_gpu.cu:6
# tile-group chunk for the query's dense candidate math (bounds the
# (B, G, T, W) f32 transients XLA materializes between fusions)
_QUERY_CHUNK_TILES = 16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseNeighborhood:
    """A level graph as dense per-candidate maps.

    Attributes:
      packed: (B, nT, TILE, W) int8 — 0 where the candidate is not a
        selected neighbor, else ``filter_bin + 1`` (so the self-loop bin 0
        is stored as 1). With ``kernel=None`` selected candidates store 1.
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
    num_query: int = dataclasses.field(metadata={"static": True}, default=0)
    num_db: int = dataclasses.field(metadata={"static": True}, default=0)

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

    key, axis, is_sorted = _sorted_axis_ok(db)
    key_p = jnp.pad(key, ((0, 0), (0, n_pad - num_db)),
                    constant_values=2e9)
    # Query positions along the same axis (q == db for self graphs; for
    # inter-level graphs both clouds are sorted along the same axis, but
    # correctness does not require it — only window tightness does).
    q_key = jnp.take_along_axis(q_p, axis[:, None, None], axis=2)[..., 0]
    q_key = jnp.where(
        jnp.arange(m_pad)[None, :] < num_q, q_key, jnp.nan
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
    s_blk = jnp.clip(s_row // TILE, 0, (n_pad - w) // TILE)
    covered = jnp.all(e_row - s_blk * TILE <= w)
    ok = is_sorted & covered

    # Window coordinates: block-granular gather (B*nT*W/TILE indices).
    blk = s_blk[..., None] + jnp.arange(w // TILE)
    db_blocks = db_p.reshape(batch, n_pad // TILE, TILE * 3)
    win = jnp.take_along_axis(
        db_blocks, blk.reshape(batch, -1, 1), axis=1
    ).reshape(batch, n_t, w, 3)

    q_tiles = q_p.reshape(batch, n_t, TILE, 3)
    k = int(nn_sample)

    if kernel is not None:
        n_bins, p_bins, q_bins = kernel
        pi = math.pi

    def process(win_c, q_c):
        """One tile-group chunk: (B, G, W, 3), (B, G, T, 3) -> maps."""
        delta = win_c[:, :, None, :, :] - q_c[:, :, :, None, :]
        d3 = jnp.sqrt(jnp.sum(delta * delta, axis=-1))   # (B, G, T, W)
        in_range = (d3 < radius) & (jnp.abs(d3 - radius) > _BOUNDARY_EPS)
        rank = jnp.cumsum(in_range.astype(jnp.int32), axis=-1)
        sel = in_range & (rank <= k)
        total = rank[..., -1]
        count = jnp.minimum(total, k)
        if kernel is None:
            packed = sel.astype(jnp.int8)
        else:
            # sqrt-space distance quirk (ref tf_nnquery_gpu.cu:54) feeds
            # the radial bin (ref tf_buildkernel_gpu.cu:52-74).
            nn_dist = jnp.sqrt(d3)
            dist2d = jnp.sqrt(delta[..., 0] ** 2 + delta[..., 1] ** 2)
            theta = jnp.arctan2(delta[..., 1], delta[..., 0])
            theta = jnp.where(theta < pi, theta, -pi)
            theta = jnp.maximum(theta, -pi) + pi
            phi = jnp.clip(
                jnp.arctan2(delta[..., 2], dist2d), -pi / 2, pi / 2
            ) + pi / 2
            n_id = jnp.minimum(
                n_bins - 1, (theta * n_bins / 2.0 / pi).astype(jnp.int32)
            )
            p_id = jnp.minimum(
                p_bins - 1, (phi * p_bins / pi).astype(jnp.int32)
            )
            gamma = nn_dist * q_bins / (radius + 1e-6)
            q_id = jnp.minimum(q_bins - 1, gamma.astype(jnp.int32))
            bins = q_id * p_bins * n_bins + p_id * n_bins + n_id + 1
            is_far = (nn_dist > _M_EPS) & (
                jnp.abs(nn_dist - _M_EPS) > 1e-6
            )
            bins = jnp.where(is_far, bins, 0)
            packed = jnp.where(sel, bins + 1, 0).astype(jnp.int8)
        dist_out = None
        if need_dist:
            dist_out = jnp.where(sel, jnp.sqrt(d3), 0.0)
        return packed, count, total, dist_out

    packed_chunks, count_chunks, total_chunks, dist_chunks = [], [], [], []
    g = _QUERY_CHUNK_TILES
    for t0 in range(0, n_t, g):
        sl = slice(t0, min(t0 + g, n_t))
        p_c, c_c, tot_c, d_c = process(win[:, sl], q_tiles[:, sl])
        packed_chunks.append(p_c)
        count_chunks.append(c_c)
        total_chunks.append(tot_c)
        dist_chunks.append(d_c)

    packed = jnp.concatenate(packed_chunks, axis=1)
    count = jnp.concatenate(count_chunks, axis=1).reshape(batch, m_pad)
    total = jnp.concatenate(total_chunks, axis=1).reshape(batch, m_pad)
    dist = (
        jnp.concatenate(dist_chunks, axis=1) if need_dist else None
    )

    if not self_graph:
        # The reference grows the radius for zero-neighbor queries
        # (ref tf_nnquery_gpu.cu:30-60); dense mode reports that (rare)
        # case through ok=False instead — callers fall back.
        real_q = jnp.arange(m_pad)[None, :] < num_q
        ok = ok & jnp.all(jnp.where(real_q, total, 1) > 0)

    return DenseNeighborhood(
        packed=packed,
        s_blk=s_blk,
        count=count[:, :num_q],
        dist=dist,
        ok=ok,
        num_query=num_q,
        num_db=num_db,
    )


def window_features(feats: jax.Array, dnbh: DenseNeighborhood) -> jax.Array:
    """Materialize the per-tile feature windows with a block-granular
    gather: (B, N, C) -> (B, nT, W, C). Differentiable — autodiff gives the
    matching block-granular scatter-add."""
    b, n, c = feats.shape
    n_pad = _round_up(n, TILE)
    w = dnbh.window
    n_t = dnbh.s_blk.shape[1]
    feats_p = jnp.pad(feats, ((0, 0), (0, n_pad - n), (0, 0)))
    blk = dnbh.s_blk[..., None] + jnp.arange(w // TILE)
    fb = feats_p.reshape(b, n_pad // TILE, TILE * c)
    return jnp.take_along_axis(
        fb, blk.reshape(b, -1, 1), axis=1
    ).reshape(b, n_t, w, c)


# ------------------------- dense depthwise conv -------------------------

def _dense_s_kernel(packed_ref, fw_ref, s_ref):
    """One (tile, row-chunk): S[(t,f), c] = sum_w A[(t,f), w] fw[w, c]
    with A[(t,f), w] = [packed[t, w] == f + 1]."""
    packed = packed_ref[0].astype(jnp.int32)      # (tc, W)
    tc, w = packed.shape
    f_bins = s_ref.shape[1] // tc
    # t-major row replication: row r -> (t = r // F, f = r % F)
    rows = jnp.broadcast_to(
        packed[:, None, :], (tc, f_bins, w)
    ).reshape(tc * f_bins, w)
    f_row = lax.broadcasted_iota(jnp.int32, (tc * f_bins, w), 0) % f_bins
    a = (rows == f_row + 1).astype(fw_ref.dtype)
    s_ref[0] = jnp.dot(
        a, fw_ref[0], preferred_element_type=jnp.float32
    ).astype(s_ref.dtype)


def _dense_s_t_kernel(packed_ref, ds_ref, dfw_ref):
    """Accumulate dfw[w, c] = sum_(t,f) A[(t,f), w] dS[(t,f), c]."""
    packed = packed_ref[0].astype(jnp.int32)
    tc, w = packed.shape
    f_bins = ds_ref.shape[1] // tc
    rows = jnp.broadcast_to(
        packed[:, None, :], (tc, f_bins, w)
    ).reshape(tc * f_bins, w)
    f_row = lax.broadcasted_iota(jnp.int32, (tc * f_bins, w), 0) % f_bins
    a = (rows == f_row + 1).astype(ds_ref.dtype)
    contrib = lax.dot_general(
        a, ds_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(1) == 0)
    def _():
        dfw_ref[0] = jnp.zeros_like(dfw_ref[0])

    dfw_ref[0] += contrib.astype(dfw_ref.dtype)


def _t_chunk_for(f_bins: int, w: int, c: int, itemsize: int) -> int:
    """Rows per kernel step: keep the A block near ~4MB (fewer grid steps
    amortize the per-step overhead; A + fw + out still fit VMEM)."""
    budget = 4 * 1024 * 1024
    tc = max(1, budget // max(1, w * f_bins * itemsize))
    tc = min(TILE, tc)
    while TILE % tc:
        tc -= 1
    return tc


def _dense_s_matmul_impl(packed, featwins, f_bins):
    g_dim, t, w = packed.shape
    c = featwins.shape[-1]
    tc = _t_chunk_for(f_bins, w, c, featwins.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_dense_s_kernel),
        grid=(g_dim, t // tc),
        in_specs=[
            pl.BlockSpec((1, tc, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tc * f_bins, c), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (g_dim, t * f_bins, c), featwins.dtype
        ),
        interpret=jax.default_backend() != "tpu",
    )(packed, featwins)


@functools.lru_cache(maxsize=None)
def _dense_s_matmul_for(w: int, f_bins: int):
    def bwd(res, ds):
        (packed,) = res
        g_dim, t, _ = packed.shape
        c = ds.shape[-1]
        tc = _t_chunk_for(f_bins, w, c, ds.dtype.itemsize)
        dfw = pl.pallas_call(
            _dense_s_t_kernel,
            grid=(g_dim, t // tc),
            in_specs=[
                pl.BlockSpec((1, tc, w), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tc * f_bins, c), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, w, c), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((g_dim, w, c), ds.dtype),
            interpret=jax.default_backend() != "tpu",
        )(packed, ds)
        return (jnp.zeros(packed.shape, dtype=jax.dtypes.float0), dfw)

    @jax.custom_vjp
    def f(packed, featwins):
        return _dense_s_matmul_impl(packed, featwins, f_bins)

    f.defvjp(
        lambda packed, fw: (
            _dense_s_matmul_impl(packed, fw, f_bins), (packed,)
        ),
        bwd,
    )
    return f


def dense_depthwise_conv3d(
    inputs: jax.Array,
    filt: jax.Array,
    dnbh: DenseNeighborhood,
) -> jax.Array:
    """Depthwise spherical conv from dense maps (no edge lists).

    out[b,m,c*r+j] = sum_w [packed==f+1] in[win(w)] filt[f,c*r+j] / cnt —
    semantically identical to ``depthwise_conv3d`` on the same graph
    (ref tf_conv3d_gpu.cu:20-27 incl. the neighbor mean).

    Args:
      inputs: (B, N, C) float features (f32 or bf16).
      filt:   (F, C, r) filter (bin_size, in_channels, multiplier).
      dnbh:   dense neighborhood over the same cloud.

    Returns:
      (B, M, C*r) in the input dtype.
    """
    batch, num_in, c_in = inputs.shape
    f_bins, _, mult = filt.shape
    w = dnbh.window
    n_t = dnbh.s_blk.shape[1]
    m_pad = n_t * TILE
    num_out = dnbh.num_query
    compute_dtype = inputs.dtype
    precision = (
        lax.Precision.DEFAULT
        if compute_dtype == jnp.bfloat16
        else lax.Precision.HIGHEST
    )

    fw = window_features(inputs, dnbh).reshape(batch * n_t, w, c_in)
    packed = dnbh.packed.reshape(batch * n_t, TILE, w)
    s = _dense_s_matmul_for(w, f_bins)(packed, fw)
    s = s.reshape(batch, m_pad, f_bins, c_in)
    out = jnp.einsum(
        "bmfc,fcr->bmcr", s, filt.astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=precision,
    )
    # The neighbor mean (ref tf_conv3d_gpu.cu:25) commutes with the linear
    # bin contraction: scale the (33x smaller) output, not S — avoids
    # materializing an f32 copy of S between fusions.
    cnt_p = jnp.pad(dnbh.count, ((0, 0), (0, m_pad - num_out)))
    inv_cnt = 1.0 / jnp.maximum(cnt_p, 1).astype(jnp.float32)
    out = out * inv_cnt[..., None, None]
    out = out.reshape(batch, m_pad, c_in * mult).astype(compute_dtype)
    return out[:, :num_out]


# ------------------------------ pooling --------------------------------

_POOL_WCHUNK = 128
_NEG = float(jnp.finfo(jnp.float32).min)


def _pool_chunks(w: int):
    return [
        (w0, min(_POOL_WCHUNK, w - w0)) for w0 in range(0, w, _POOL_WCHUNK)
    ]


def _masked_window_max_impl(packed, fw):
    """(out, argmax)[g,t,c] = running masked max + FIRST maximal window
    column over the selected candidates ((finfo.min, 0) if none).

    Pure XLA chunked running max. Measured on v5e this beats every Pallas
    formulation by 40x+: the (t, w, c) mask broadcast needs a lane<->sublane
    transpose that Mosaic lowers to scalar shuffles, while XLA streams the
    fused compare+add+reduce at HBM speed.
    """
    g, t, w = packed.shape
    c = fw.shape[-1]
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
