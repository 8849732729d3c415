"""Locality-windowed neighbor gather: one-hot MXU matmuls over row windows.

XLA's TPU gather/scatter pay a per-index cost (~6-7ns gather, ~15-20ns
scatter-add on v5e) that makes the per-edge feature gathers — and their
scatter-add VJPs — the dominant cost of every SPH3D op (the moral
equivalent of the reference's per-edge CUDA loops, tf_conv3d_gpu.cu:20-27,
tf_pool3d_gpu.cu:5-34). This module replaces them with dense compute:

  1. Queries are processed in tiles of ``TILE`` rows. For each tile, a
     window start ``s`` is derived from the smallest valid neighbor index
     (quantized down to a multiple of ``TILE``).
  2. The window rows ``feats[s : s+W]`` are materialized for all tiles with
     ONE block-granular gather — (B * n_tiles * W/TILE) block indices
     instead of (B * M * K) edge indices, ~1000x fewer.
  3. Per tile, the edge gather becomes a one-hot matmul on the MXU
     (Pallas kernel): ``g = onehot(idx - s) @ feats[s:s+W]``. Its VJP is
     the transposed matmul plus the block-granular scatter-add that XLA
     autodiff derives for step 2 — no per-edge scatter anywhere.

Exactness: the result equals the plain gather on all VALID lanes (k <
count); invalid lanes are 0 (callers mask — same contract as the padded
outputs of `ops/neighbor.py`). If any valid neighbor index falls outside
its tile's window, the whole call falls back to the plain gather via
``lax.cond`` — windowing is a layout optimization, never a semantics
change. Windows stay narrow when clouds are sorted along a spatial axis
(see `ops/locality.py`): every neighbor within ``radius`` of a query lies
in the contiguous sorted-row slab ``|axis - query_axis| < radius``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph3d_gcn_tpu.ops.gather import gather_features

TILE = 128     # query-tile rows; also the window-start quantum
_CHUNK = 512   # edge rows per kernel grid step (one-hot block height)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _edge_chunk(edges: int) -> int:
    """Largest divisor of ``edges`` that is <= _CHUNK (edges is always a
    multiple of TILE, so a multiple-of-8 chunk always exists)."""
    r = min(edges, _CHUNK)
    while edges % r:
        r -= 1
    return r


def _onehot_matmul_kernel(rel_ref, fw_ref, out_ref):
    """One edge chunk: out = onehot(rel) @ featwin."""
    rel = rel_ref[0]                          # (R, 1) int32
    r = rel.shape[0]
    w = fw_ref.shape[1]
    iota_w = lax.broadcasted_iota(jnp.int32, (r, w), 1)
    onehot = (rel == iota_w).astype(fw_ref.dtype)
    out_ref[0] = jnp.dot(
        onehot, fw_ref[0], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _onehot_matmul_t_kernel(rel_ref, dg_ref, dfw_ref):
    """Accumulate dfw = sum over edge chunks of onehot(rel)^T @ dg."""
    rel = rel_ref[0]                          # (R, 1)
    r = rel.shape[0]
    w = dfw_ref.shape[1]
    iota_w = lax.broadcasted_iota(jnp.int32, (r, w), 1)
    onehot = (rel == iota_w).astype(dg_ref.dtype)
    contrib = lax.dot_general(
        onehot, dg_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(1) == 0)
    def _():
        dfw_ref[0] = jnp.zeros_like(dfw_ref[0])

    dfw_ref[0] += contrib.astype(dfw_ref.dtype)


def _window_matmul_impl(rel: jax.Array, featwins: jax.Array) -> jax.Array:
    """(G, E, 1) rel x (G, W, C) windows -> (G, E, C); G = B * n_tiles,
    E = TILE * K edges per tile.

    ``rel`` entries outside [0, W) (e.g. the invalid-lane sentinel -1)
    produce exact zeros.
    """
    g_dim, e = rel.shape[:2]
    w, c = featwins.shape[1:]
    r = _edge_chunk(e)
    return pl.pallas_call(
        _onehot_matmul_kernel,
        grid=(g_dim, e // r),
        in_specs=[
            pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, r, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g_dim, e, c), featwins.dtype),
        interpret=jax.default_backend() != "tpu",
    )(rel, featwins)


# The bwd rule needs the window width W, which is absent from the
# cotangent's shape — close over it with one custom_vjp wrapper per W.
@functools.lru_cache(maxsize=None)
def _window_matmul_for(w: int):
    def bwd(res, dg):
        (rel,) = res
        g_dim, e = rel.shape[:2]
        c = dg.shape[-1]
        r = _edge_chunk(e)
        dfw = pl.pallas_call(
            _onehot_matmul_t_kernel,
            grid=(g_dim, e // r),
            in_specs=[
                pl.BlockSpec((1, r, 1), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r, c), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, w, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((g_dim, w, c), dg.dtype),
            interpret=jax.default_backend() != "tpu",
        )(rel, dg)
        d_rel = jnp.zeros(rel.shape, dtype=jax.dtypes.float0)
        return (d_rel, dfw)

    @jax.custom_vjp
    def f(rel, featwins):
        return _window_matmul_impl(rel, featwins)

    f.defvjp(lambda rel, fw: (_window_matmul_impl(rel, fw), (rel,)), bwd)
    return f


def windowed_gather_padded(
    feats: jax.Array,
    idx: jax.Array,
    count: jax.Array,
    *,
    window: int,
) -> tuple[jax.Array, jax.Array]:
    """Windowed gather returning tile-PADDED outputs (no slice copies).

    Args:
      feats:  (B, N, C) float features (f32 or bf16).
      idx:    (B, M, K) int32 neighbor indices into N.
      count:  (B, M) int32 valid-lane counts.
      window: W, the per-tile row-window width (rounded up to 128; clamped
              to N — at W >= N this degenerates to a full dense one-hot
              matmul, always exact).

    Returns:
      (g, valid): g (B, M_pad, K, C) in ``feats.dtype`` with M_pad = M
      rounded up to the 128-row tile; INVALID lanes (``k >= count`` or row
      padding) are exactly 0. valid is the (B, M_pad, K) bool lane mask.
      Callers slice ``[:, :M]`` on their (much smaller) final outputs.
    """
    b, n, c = feats.shape
    m, k = idx.shape[1:]
    w = min(_round_up(window, TILE), _round_up(n, TILE))

    n_pad = _round_up(max(n, w), TILE)
    m_pad = _round_up(m, TILE)
    n_t = m_pad // TILE
    idx_p = jnp.pad(idx, ((0, 0), (0, m_pad - m), (0, 0)))
    cnt_p = jnp.pad(count, ((0, 0), (0, m_pad - m)))

    k_ids = lax.broadcasted_iota(jnp.int32, idx_p.shape, 2)
    valid = k_ids < cnt_p[..., None]
    idx_for_min = jnp.where(valid, idx_p, n_pad)
    min_idx = jnp.min(idx_for_min.reshape(b, n_t, TILE * k), axis=-1)
    s_blk = jnp.clip(min_idx // TILE, 0, (n_pad - w) // TILE)  # (B, nT)
    s = s_blk * TILE
    rel = idx_p.reshape(b, n_t, TILE * k) - s[:, :, None]
    rel = jnp.where(valid.reshape(rel.shape), rel, -1)
    ok = jnp.all(rel < w)

    def fast(feats):
        feats_p = jnp.pad(feats, ((0, 0), (0, n_pad - n), (0, 0)))
        blk = s_blk[..., None] + jnp.arange(w // TILE)       # (B, nT, W/T)
        fb = feats_p.reshape(b, n_pad // TILE, TILE * c)
        fw = jnp.take_along_axis(
            fb, blk.reshape(b, -1, 1), axis=1
        ).reshape(b * n_t, w, c)
        g = _window_matmul_for(w)(
            rel.reshape(b * n_t, TILE * k, 1), fw
        )
        return g.reshape(b, m_pad, k, c)

    def slow(feats):
        g = gather_features(feats, idx_p)
        return jnp.where(valid[..., None], g, 0).astype(feats.dtype)

    return lax.cond(ok, fast, slow, feats), valid


def windowed_gather(
    feats: jax.Array,
    idx: jax.Array,
    count: jax.Array,
    *,
    window: int,
) -> jax.Array:
    """Gather ``(B, N, C) x (B, M, K) -> (B, M, K, C)`` via window matmuls.

    Drop-in for :func:`sph3d_gcn_tpu.ops.gather.gather_features` wherever a
    validity ``count`` exists, with the contract that INVALID lanes
    (``k >= count``) are 0 rather than ``feats[idx]``. Falls back to the
    plain gather (via ``lax.cond``) whenever a valid index lands outside
    its tile's ``window`` — exact for arbitrary inputs, fast for
    axis-sorted ones. See :func:`windowed_gather_padded` for the
    copy-free variant used inside the conv/pool/unpool ops.
    """
    g, _ = windowed_gather_padded(feats, idx, count, window=window)
    return g[:, : idx.shape[1]]
