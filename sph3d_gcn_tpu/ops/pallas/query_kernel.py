"""Fused dense sphere-query kernel: packed neighbor/bin maps in one pass.

The XLA formulation of the dense windowed query (ops/dense.py) streams
``(B, nT, T, W)`` float transients through HBM between fusions — the
distance map, the in-range mask, its int32 cast feeding the rank cumsum,
the rank itself, the bins — ~1.5 GB of materialized intermediates per
S3DIS step (measured round 3). This kernel fuses the whole per-candidate
pipeline on-core:

  distance -> strict-< radius test (1e-6 margin, ref tf_nnquery_gpu.cu:49)
  -> first-K-in-point-order rank (inclusive prefix count over the window)
  -> spherical bins (sqrt-space radial quirk, ref tf_buildkernel_gpu.cu)
  -> packed int8 map  /  optional f32 distance map

touching HBM only for the coordinates in and the int8/f32 maps out.

Key layout choices (see CLAUDE.md "Platform gotchas"):
- database coords arrive as a flat sequence of 128-point COLUMN blocks
  ``(B * NB, 8, 128)`` (x/y/z in sublane rows 0-2): the data-dependent
  window slab [s_blk, s_blk + W/128) is then ONE dynamic ``pl.ds`` on the
  leading dim — the only dynamic-slice form the Mosaic DMA engine
  accepts (dynamic offsets on two dims fail to lower).
- a window chunk is a lane-vector (1, 128) broadcast against the query
  tile's sublane-vector (T, 1): no lane<->sublane transposes anywhere.
- the prefix count runs on the MXU as a (T, 128) x (128, 128)
  upper-triangular ones matmul per chunk plus a (T, 1) f32 running
  offset — exact (counts <= 128 are exact in bf16, offsets < 2^24 in f32).
- chunks advance in a ``lax.fori_loop`` (an unrolled Python loop would
  allocate fresh VMEM per iteration).
- Mosaic has no atan2 primitive: the spherical bins use a Cephes-style
  atanf (range reduction + minimax polynomial, ~1 ulp) — the same
  accuracy class as libm/XLA lowerings, so bin boundaries agree with the
  XLA path except within ~1 ulp of a boundary.

The radius-growth variant (ref tf_nnquery_gpu.cu:30-60: +0.05 rescans for
zero-neighbor queries) runs two chunk passes: pass 1 stores each
candidate's first including growth step (monotone in the radius, so it is
a sum of out-of-range masks) in an int8 scratch and reduces the row
minimum; pass 2 selects at each row's first non-empty radius. Identical
selection to ops/dense.py's single-cumsum formulation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
_BOUNDARY_EPS = 1e-6     # ref tf_nnquery_gpu.cu:49
_M_EPS = 1.01e-3         # ref tf_buildkernel_gpu.cu:6


def _triu_ones():
    """(128, 128) inclusive prefix-sum matrix: U[i, j] = 1 iff i <= j."""
    i = lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    j = lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    return (i <= j).astype(jnp.bfloat16)


def _chunk_candidates(win_scr, qx, qy, qz, c):
    """Window chunk c vs the query tile: (T, 128) deltas and distance."""
    wx = win_scr[c, 0:1, :]
    wy = win_scr[c, 1:2, :]
    wz = win_scr[c, 2:3, :]
    dx = wx - qx
    dy = wy - qy
    dz = wz - qz
    d3 = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return dx, dy, dz, d3


def _in_range(d3, r):
    """The reference's strict-< test with the 1e-6 boundary margin."""
    return (d3 < r) & (jnp.abs(d3 - r) > _BOUNDARY_EPS)


def _atan(x):
    """Cephes-style single-precision arctan on [0, inf) (x >= 0): the
    classic tan(pi/8)/tan(3pi/8) range reduction + 4-term minimax
    polynomial, ~1 ulp over the full range."""
    t3p8 = 2.414213562373095      # tan(3*pi/8)
    tp8 = 0.4142135623730950      # tan(pi/8)
    big = x > t3p8
    mid = (x > tp8) & ~big
    xr = jnp.where(big, -1.0 / jnp.maximum(x, 1e-30), x)
    xr = jnp.where(mid, (x - 1.0) / (x + 1.0), xr)
    bias = jnp.where(big, math.pi / 2, jnp.where(mid, math.pi / 4, 0.0))
    z = xr * xr
    p = 8.05374449538e-2
    p = p * z - 1.38776856032e-1
    p = p * z + 1.99777106478e-1
    p = p * z - 3.33329491539e-1
    return bias + xr * (p * z) + xr


def _atan2(y, x):
    """atan2(y, x) from :func:`_atan` with the usual quadrant fixup."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    a = _atan(ay / jnp.maximum(ax, 1e-30))
    a = jnp.where(ax == 0.0, math.pi / 2, a)
    a = jnp.where(x < 0.0, math.pi - a, a)
    a = jnp.where((ay == 0.0) & (x > 0.0), 0.0, a)
    a = jnp.where((ay == 0.0) & (ax == 0.0), 0.0, a)
    return jnp.where(y < 0.0, -a, a)


def _bins_822(dx, dy, dz, d3, radius, kernel, group_axis=None):
    """Compare-only spherical bins for the (n=8, p=2, q) kernel family —
    every shipped config uses kernel=(8,2,2). Replaces the two atan2
    evaluations, two sqrts and a divide per candidate with ~20 VPU
    compare/selects (the query kernel is bin-bound: round-3 profile put
    it at 13.7ms/step on ModelNet):

    - azimuth: theta' = atan2(dy,dx)+pi is the [0,2pi) angle of
      u = (-dx,-dy), and with n=8 the bin boundaries are exactly the
      45-degree rays |ux|==|uy| / ux==0 / uy==0 — an octant
      classification by sign/magnitude compares, floor-convention
      matched at every boundary (boundary angles land in the HIGHER
      bin, like floor; the u==(-,0) ray is bin 4, fixed up explicitly).
    - elevation (p=2): phi >= pi/2 iff dz >= 0 (atan2(dz, dist2d>=0)
      is sign-symmetric) — exact, including dz == +-0.
    - radial: floor(nn_dist*q/(radius+1e-6)) >= j iff
      d3 >= (j*(radius+1e-6)/q)^2 (nn_dist = sqrt(d3), monotone), so
      q-1 compares against precomputed squared thresholds.
    - self test: nn_dist > M_EPS + 1e-6 iff d3 > (M_EPS+1e-6)^2.

    Agreement with the atan2 form (and the CUDA reference,
    tf_buildkernel_gpu.cu:52-74) is exact except within ~1 ulp of a bin
    boundary — the same tolerance class as the Cephes atan the general
    path uses, and the reference's margins make boundaries dead zones.
    """
    n_bins, p_bins, q_bins = kernel
    assert n_bins == 8 and p_bins == 2
    ux = -dx
    uy = -dy
    ax = jnp.abs(ux)
    ay = jnp.abs(uy)
    zero = jnp.zeros_like(d3, jnp.int32)

    def sel(c, a, b):
        return jnp.where(c, zero + a, zero + b)

    o_pos = jnp.where(ux > 0, sel(ay < ax, 0, 1), sel(ay > ax, 2, 3))
    o_pos = jnp.where((uy == 0.0) & (ux < 0), zero + 4, o_pos)
    o_neg = jnp.where(ux < 0, sel(ay < ax, 4, 5), sel(ay > ax, 6, 7))
    n_id = jnp.where(uy >= 0, o_pos, o_neg)
    # dx == dy == +-0 (vertically aligned candidate): atan2's signed-zero
    # convention decides the bin — atan2(+-0, +0) = +-0 -> theta' = pi ->
    # bin 4; atan2(+-0, -0) = +-pi -> theta' = 0 -> bin 0.
    n_id = jnp.where(
        (ax == 0.0) & (ay == 0.0),
        jnp.where(jnp.signbit(dx), zero, zero + 4),
        n_id,
    )
    p_id = (dz >= 0).astype(jnp.int32)
    scale = float(radius) + 1e-6
    q_id = zero
    for j in range(1, q_bins):
        thr = np.float32(j * scale / q_bins) ** 2
        q_id = q_id + (d3 >= float(thr)).astype(jnp.int32)
    far_thr = float(np.float32(_M_EPS + 1e-6)) ** 2
    if group_axis is None:
        bins = q_id * (p_bins * n_bins) + p_id * n_bins + n_id + 1
        return jnp.where(d3 > far_thr, bins, 0)
    # SORT-GROUPED renumbering (see ops/dense.py "zone-split conv"): a
    # permutation of the 33 ref bins into contiguous groups by which side
    # of the sort axis the candidate's BIN lies on — G0 = left-outer
    # (stored 1..8), G1 = left-inner (9..8q) + self (8q+1), G2 =
    # right-inner (8q+2..16q-7), G3 = right-outer (16q-6..16q+1).
    # "left/right" is a function of the bin alone: along z the polar
    # half (dz >= 0 <=> p_id == 1, exact); along x/y the azimuth
    # half-plane, with dx == 0 / dy == 0 boundary candidates falling in
    # whichever half their octant belongs to — the conv's zone bounds
    # are map-derived, so boundary assignment only affects zone width,
    # never correctness. Grouped filter rows are matched outside by
    # ops.dense._grouped_perm (same formula on the host).
    # Mosaic can't legalize arith.select on i1 *values* (only i1
    # conditions), so the axis dispatch selects int32 0/1 masks.
    hemi_x = ((n_id >= 2) & (n_id <= 5)).astype(jnp.int32)  # dx > 0 => here
    hemi_y = (n_id >= 4).astype(jnp.int32)                  # dy > 0 => here
    hemi_z = p_id                                           # dz >= 0 exactly
    hemi = (
        jnp.where(
            group_axis == 2,
            hemi_z,
            jnp.where(group_axis == 0, hemi_x, hemi_y),
        )
        == 1
    )
    i4x = jnp.where(hemi, n_id - 2, (n_id + 2) & 7)
    i4y = jnp.where(hemi, n_id - 4, n_id)
    inhemi = jnp.where(
        group_axis == 2,
        n_id,
        p_id * 4 + jnp.where(group_axis == 0, i4x, i4y),
    )
    outer = q_id == (q_bins - 1)
    gid_l = jnp.where(outer, 1 + inhemi, 9 + q_id * 8 + inhemi)
    gid_r = jnp.where(
        outer,
        (16 * q_bins - 6) + inhemi,
        (8 * q_bins + 2) + q_id * 8 + inhemi,
    )
    gid = jnp.where(hemi, gid_r, gid_l)
    # returned value is stored_id - 1 (the caller adds 1): far -> gid,
    # self -> 8q + 1 (the G1 tail slot)
    return jnp.where(d3 > far_thr, gid - 1, 8 * q_bins)


def _bins(dx, dy, dz, d3, radius, kernel, group_axis=None):
    """Spherical filter bins (ref tf_buildkernel_gpu.cu:52-74): azimuth n,
    elevation p, radial q over the SQRT-space distance quirk. With
    ``group_axis`` (a traced per-cloud scalar, (8,2,q) kernels only) the
    returned ids are sort-grouped — see :func:`_bins_822`."""
    n_bins, p_bins, q_bins = kernel
    if n_bins == 8 and p_bins == 2:
        return _bins_822(dx, dy, dz, d3, radius, kernel, group_axis)
    assert group_axis is None, "grouped bins need the (8,2,q) family"
    pi = math.pi
    nn_dist = jnp.sqrt(d3)
    dist2d = jnp.sqrt(dx * dx + dy * dy)
    theta = _atan2(dy, dx)
    theta = jnp.where(theta < pi, theta, -pi)
    theta = jnp.maximum(theta, -pi) + pi
    phi = jnp.clip(_atan2(dz, dist2d), -pi / 2, pi / 2) + pi / 2
    n_id = jnp.minimum(
        n_bins - 1, (theta * n_bins / 2.0 / pi).astype(jnp.int32)
    )
    p_id = jnp.minimum(p_bins - 1, (phi * p_bins / pi).astype(jnp.int32))
    gamma = nn_dist * q_bins / (radius + 1e-6)
    q_id = jnp.minimum(q_bins - 1, gamma.astype(jnp.int32))
    bins = q_id * p_bins * n_bins + p_id * n_bins + n_id + 1
    is_far = (nn_dist > _M_EPS) & (jnp.abs(nn_dist - _M_EPS) > 1e-6)
    return jnp.where(is_far, bins, 0)


def _query_kernel(
    sblk_ref, uend_ref, axis_ref, q_ref, db_ref, *rest,
    radius, k, kernel, n_chunks, n_tiles, n_blocks, need_dist, grouped,
):
    if need_dist:
        packed_ref, dist_ref, win_scr, sem = rest
    else:
        (packed_ref, win_scr, sem), dist_ref = rest, None
    g = pl.program_id(0)
    b = g // n_tiles
    s = sblk_ref[g]
    # chunks past the tile's provable slab end (sorted-axis compare
    # count, ops/dense.py) contain no in-range candidate: skip them and
    # zero-fill the maps upfront. The prefix-count rank is unaffected
    # (skipped chunks contribute zero in-range candidates by proof).
    ue = uend_ref[g]
    dma = pltpu.make_async_copy(
        db_ref.at[pl.ds(b * n_blocks + s, n_chunks)], win_scr, sem
    )
    dma.start()
    packed_ref[...] = jnp.zeros_like(packed_ref)
    if need_dist:
        dist_ref[...] = jnp.zeros_like(dist_ref)
    q = q_ref[0]
    qx = q[:, 0:1]
    qy = q[:, 1:2]
    qz = q[:, 2:3]
    u = _triu_ones()
    group_axis = axis_ref[b] if grouped else None
    dma.wait()

    def body(c, off):
        dx, dy, dz, d3 = _chunk_candidates(win_scr, qx, qy, qz, c)
        in_r = _in_range(d3, radius)
        inner = jnp.dot(
            in_r.astype(jnp.bfloat16), u, preferred_element_type=jnp.float32
        )
        rank = inner + off
        sel = in_r & (rank <= k)
        if kernel is None:
            # selection-only maps store the neighbor RANK (1..k, the
            # in-range prefix count in window order) instead of a bare
            # 1: rank-valued maps are what the MXU-compacted pool kernel
            # keys its one-hot matmuls on (ops/dense.py), and every
            # other consumer only tests ``packed > 0``. k > 127 would
            # overflow int8; no config comes close (nn_uplimit = 64).
            pk = jnp.where(sel, rank, 0.0) if k <= 127 else sel
        else:
            bins = _bins(dx, dy, dz, d3, radius, kernel, group_axis)
            pk = jnp.where(sel, bins + 1, 0)
        packed_ref[0, :, pl.ds(c * TILE, TILE)] = pk.astype(jnp.int8)
        if need_dist:
            dist_ref[0, :, pl.ds(c * TILE, TILE)] = jnp.where(
                sel, jnp.sqrt(d3), 0.0
            )
        return off + inner[:, TILE - 1:TILE]

    lax.fori_loop(
        0, ue, body, jnp.zeros((TILE, 1), jnp.float32)
    )


def _growth_kernel(
    sblk_ref, uend_ref, axis_ref, q_ref, db_ref, *rest,
    growth_radii, k, n_chunks, n_tiles, n_blocks, need_dist,
):
    del axis_ref  # growth graphs are selection-only (no bins to group)
    if need_dist:
        packed_ref, gstar_ref, dist_ref, win_scr, gcand_scr, sem = rest
    else:
        (packed_ref, gstar_ref, win_scr, gcand_scr, sem), dist_ref = (
            rest, None,
        )
    g = pl.program_id(0)
    b = g // n_tiles
    s = sblk_ref[g]
    # slab-end bound at the MAX grown radius: skipped chunks are out of
    # range at every growth step (g_cand == never), so the row minimum
    # and the rank prefix are both unaffected.
    ue = uend_ref[g]
    dma = pltpu.make_async_copy(
        db_ref.at[pl.ds(b * n_blocks + s, n_chunks)], win_scr, sem
    )
    dma.start()
    packed_ref[...] = jnp.zeros_like(packed_ref)
    if need_dist:
        dist_ref[...] = jnp.zeros_like(dist_ref)
    q = q_ref[0]
    qx = q[:, 0:1]
    qy = q[:, 1:2]
    qz = q[:, 2:3]
    u = _triu_ones()
    never = float(len(growth_radii))  # growth_steps + 1
    dma.wait()

    def pass1(c, gstar):
        _, _, _, d3 = _chunk_candidates(win_scr, qx, qy, qz, c)
        g_cand = jnp.zeros(d3.shape, jnp.float32)
        for r_g in growth_radii:
            g_cand = g_cand + (~_in_range(d3, r_g)).astype(jnp.float32)
        gcand_scr[:, pl.ds(c * TILE, TILE)] = g_cand.astype(jnp.int8)
        return jnp.minimum(gstar, jnp.min(g_cand, axis=1, keepdims=True))

    gstar = lax.fori_loop(
        0, ue, pass1, jnp.full((TILE, 1), never, jnp.float32)
    )
    gstar = jnp.minimum(gstar, never)
    alive = gstar < never

    def pass2(c, off):
        g_cand = gcand_scr[:, pl.ds(c * TILE, TILE)].astype(jnp.float32)
        in_r = (g_cand <= gstar) & alive
        inner = jnp.dot(
            in_r.astype(jnp.bfloat16), u, preferred_element_type=jnp.float32
        )
        rank = inner + off
        sel = in_r & (rank <= k)
        # rank-valued map, as in _query_kernel's kernel=None branch
        pk = jnp.where(sel, rank, 0.0) if k <= 127 else sel
        packed_ref[0, :, pl.ds(c * TILE, TILE)] = pk.astype(jnp.int8)
        if need_dist:
            _, _, _, d3 = _chunk_candidates(win_scr, qx, qy, qz, c)
            dist_ref[0, :, pl.ds(c * TILE, TILE)] = jnp.where(
                sel, jnp.sqrt(d3), 0.0
            )
        return off + inner[:, TILE - 1:TILE]

    lax.fori_loop(0, ue, pass2, jnp.zeros((TILE, 1), jnp.float32))
    # per-row growth step actually used, broadcast over lanes (writing the
    # (T, 1) sublane vector as a lane vector would need a transpose)
    g_row = jnp.where(alive, gstar, 0.0)
    gstar_ref[0] = jnp.broadcast_to(g_row, (TILE, TILE)).astype(jnp.int8)


def blocked_db(db_pad: jax.Array) -> jax.Array:
    """(B, N_pad, 3) f32 -> (B * N_pad/128, 8, 128) column-block layout
    (x/y/z in sublane rows 0-2, rows 3-7 zero padding)."""
    batch, n_pad, _ = db_pad.shape
    nb = n_pad // TILE
    blk = db_pad.reshape(batch, nb, TILE, 3).transpose(0, 1, 3, 2)
    blk = jnp.pad(blk, ((0, 0), (0, 0), (0, 5), (0, 0)))
    return blk.reshape(batch * nb, 8, TILE)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "k", "kernel", "window", "need_dist", "growth_steps",
        "interpret",
    ),
)
def dense_query_pallas(
    db_blk: jax.Array,
    q_pad: jax.Array,
    s_blk: jax.Array,
    u_end: jax.Array,
    axis: jax.Array | None = None,
    *,
    radius: float,
    k: int,
    kernel: tuple[int, int, int] | None,
    window: int,
    need_dist: bool = False,
    growth_steps: int = 0,
    interpret: bool = False,
):
    """Build packed candidate maps for one level graph.

    Args:
      db_blk: (B * NB, 8, 128) f32 column-blocked database coords
        (:func:`blocked_db`; pad value 2e9).
      q_pad: (B, M_pad, 3) f32 query coords (pad 1e9).
      s_blk: (B, nT) int32 per-tile window start in TILE-row blocks.
      u_end: (B, nT) int32 per-tile count of window chunks that can
        contain in-range candidates (provable slab-end bound, in TILE
        units relative to ``s_blk``); chunks past it are skipped and
        zero-filled.
      axis: optional (B,) int32 per-cloud sort axis; with an (8,2,q)
        kernel the packed ids are then SORT-GROUPED (see :func:`_bins_822`
        and ops.dense's zone-split conv).
      radius, k, kernel, window, need_dist, growth_steps: as
        ops.dense.build_dense_graph.

    Returns:
      (packed (B, nT, T, W) int8, dist (B, nT, T, W) f32 | None,
       gmax (B, nT) int32 | None — per-tile max growth step used).
    """
    batch, m_pad, _ = q_pad.shape
    n_t = m_pad // TILE
    n_chunks = window // TILE
    n_blocks = db_blk.shape[0] // batch
    grid = batch * n_t
    sblk_flat = s_blk.reshape(grid).astype(jnp.int32)
    uend_flat = jnp.clip(
        u_end.reshape(grid).astype(jnp.int32), 1, n_chunks
    )
    grouped = (
        axis is not None
        and kernel is not None
        and kernel[0] == 8
        and kernel[1] == 2
    )
    axis_flat = (
        axis.astype(jnp.int32)
        if axis is not None
        else jnp.zeros((batch,), jnp.int32)
    )

    if growth_steps and kernel is not None:
        raise ValueError("growth is selection-only (kernel=None)")

    common = dict(
        k=float(k), n_chunks=n_chunks, n_tiles=n_t, n_blocks=n_blocks,
        need_dist=need_dist,
    )
    out_shape = [
        jax.ShapeDtypeStruct((grid, TILE, window), jnp.int8),
    ]
    out_specs = [
        pl.BlockSpec((1, TILE, window), lambda g, s, u, a: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((n_chunks, 8, TILE), jnp.float32),
    ]
    if growth_steps:
        growth_radii = [np.float32(radius)]
        for _ in range(growth_steps):
            growth_radii.append(
                np.float32(growth_radii[-1] + np.float32(0.05))
            )
        out_shape.append(
            jax.ShapeDtypeStruct((grid, TILE, TILE), jnp.int8)
        )
        out_specs.append(
            pl.BlockSpec((1, TILE, TILE), lambda g, s, u, a: (g, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        kern = functools.partial(
            _growth_kernel,
            growth_radii=[float(r) for r in growth_radii],
            **common,
        )
        scratch.append(pltpu.VMEM((TILE, window), jnp.int8))
    else:
        kern = functools.partial(
            _query_kernel, radius=float(radius), kernel=kernel,
            grouped=grouped, **common,
        )
    if need_dist:
        out_shape.append(
            jax.ShapeDtypeStruct((grid, TILE, window), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, TILE, window), lambda g, s, u, a: (g, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    scratch.append(pltpu.SemaphoreType.DMA)

    outs = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(
                    (1, TILE, 3),
                    lambda g, s, u, a: (g // n_t, g % n_t, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(sblk_flat, uend_flat, axis_flat, q_pad, db_blk)

    packed = outs[0].reshape(batch, n_t, TILE, window)
    pos = 1
    gmax = None
    if growth_steps:
        gs = outs[pos].reshape(batch, n_t, TILE, TILE)
        # column 0 holds each row's growth step (broadcast over lanes)
        gmax = jnp.max(gs[..., 0].astype(jnp.int32), axis=-1)  # (B, nT)
        pos += 1
    dist = None
    if need_dist:
        dist = outs[pos].reshape(batch, n_t, TILE, window)
    return packed, dist, gmax
