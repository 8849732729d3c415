"""Depthwise spherical graph convolution — TPU-native.

Counterpart of ``DepthwiseConv3d`` (`tf_ops/convolution/tf_conv3d_gpu.cu`,
wrapper `tf_ops/convolution/tf_conv3d.py:10`). The reference computes

    out[b, m, c*r + j] = sum_k in[b, nn[m,k], c] * filt[bin[m,k], c*r+j] / cnt[m]

(ref tf_conv3d_gpu.cu:20-27, including the mean over neighbors at :25).

TPU formulation: instead of gathering filter rows per edge (a huge gather),
aggregate neighbor features *per bin* first with a one-hot batched matmul —
an MXU-friendly segment-sum with static shapes —

    S[b, m, f, c] = sum_{k < cnt : bin_k = f} in[b, nn_k, c] / cnt[m]
    out[b, m, c, j] = sum_f S[b, m, f, c] * filt[f, c, j]

and let JAX autodiff produce the backward pass: the VJP of the gather is a
deterministic scatter-add (XLA segment reduction — bitwise reproducible,
unlike the reference's ``atomicAdd`` at tf_conv3d_gpu.cu:51,90,99) and the
VJPs of the einsums are einsums, matching the analytic gradients the
reference registers in `tf_conv3d.py:23-32`.

The op is internally chunked over the output-point axis (``lax.map``) to
bound the (B, T, K, F) one-hot / (B, T, K, C) gather transients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from sph3d_gcn_tpu.ops.gather import gather_features
from sph3d_gcn_tpu.ops.windowed import windowed_gather_padded

# Byte budget for the (B, T, K, max(C, F)) f32 transients of one chunk.
_CHUNK_BYTES = 64 * 1024 * 1024


def _chunk_size(batch: int, k: int, width: int, num_out: int) -> int:
    t = _CHUNK_BYTES // max(1, 4 * batch * k * width)
    t = max(8, min(num_out, t))
    if t > 8:
        t = (t // 8) * 8
    return t


@functools.partial(jax.jit, static_argnames=("bin_size", "window"))
def depthwise_conv3d(
    inputs: jax.Array,
    filt: jax.Array,
    nn_index: jax.Array,
    nn_count: jax.Array,
    bin_index: jax.Array,
    *,
    bin_size: int | None = None,
    window: int | None = None,
) -> jax.Array:
    """Depthwise graph convolution with per-bin filters and neighbor mean.

    Args:
      inputs:    (B, N, C) float32 input point features.
      filt:      (F, C, r) float32 filter (bin_size, in_channels, multiplier),
                 shape per ref tf_conv3d.py:15.
      nn_index:  (B, M, K) int32 neighbor indices.
      nn_count:  (B, M) int32 valid-neighbor counts (>= 1 from sphere query).
      bin_index: (B, M, K) int32 filter-bin ids in [0, F).
      bin_size:  optional override of F (defaults to filt.shape[0]).
      window:    optional row-window width enabling the locality-windowed
                 engine (`ops/windowed.py`): the edge gather becomes a
                 one-hot MXU matmul over sorted-row windows and the VJP a
                 block-granular scatter — exact (falls back to the plain
                 gather on window overflow), fast on axis-sorted clouds.

    Returns:
      (B, M, C*r) float32 output features.
    """
    del bin_size  # F always taken from the filter shape; kept for API parity.
    batch, num_in, c_in = inputs.shape
    num_out, k = nn_index.shape[1], nn_index.shape[2]
    f_bins, _, mult = filt.shape
    # Mixed precision: bfloat16 inputs use the MXU's native bf16 path; f32
    # inputs keep HIGHEST precision for parity with the reference
    # accumulation. Accumulation is always f32.
    compute_dtype = inputs.dtype
    precision = (
        lax.Precision.DEFAULT
        if compute_dtype == jnp.bfloat16
        else lax.Precision.HIGHEST
    )
    filt = filt.astype(compute_dtype)

    if window is not None:
        # Locality-windowed path: one pass over tile-padded arrays; the
        # only per-edge index op left is inside windowed_gather_padded
        # (block-granular). Everything else is dense MXU/VPU work.
        g, valid = windowed_gather_padded(
            inputs, nn_index, nn_count, window=window
        )  # (B, M_pad, K, C), zeros on invalid lanes
        m_pad = g.shape[1]
        bins_p = jnp.pad(bin_index, ((0, 0), (0, m_pad - num_out), (0, 0)))
        cnt_p = jnp.pad(nn_count, ((0, 0), (0, m_pad - num_out)))
        inv_cnt = 1.0 / jnp.maximum(cnt_p, 1).astype(jnp.float32)
        onehot = bins_p[..., None] == jnp.arange(f_bins)[None, None, None, :]
        onehot = jnp.where(
            valid[..., None], onehot, False
        ).astype(compute_dtype)
        s = jnp.einsum(
            "btkf,btkc->btfc", onehot, g,
            preferred_element_type=jnp.float32, precision=precision,
        )
        s = s * inv_cnt[..., None, None]
        out = jnp.einsum(
            "btfc,fcr->btcr", s.astype(compute_dtype), filt,
            preferred_element_type=jnp.float32, precision=precision,
        )
        out = out.reshape(batch, m_pad, c_in * mult).astype(compute_dtype)
        return out[:, :num_out]

    # Chunk over the output-point axis with a PYTHON loop, not lax.map:
    # gathers inside XLA TPU loop bodies fall back to a ~600ns/element
    # scalar path, while top-level gathers (and their scatter VJPs) run
    # vectorized. A handful of unrolled chunks keeps the (B,T,K,F) one-hot
    # transient bounded at negligible compile cost.
    t = _chunk_size(batch, k, max(c_in, f_bins), num_out)
    num_chunks = -(-num_out // t)
    pad = num_chunks * t - num_out
    idx_p = jnp.pad(nn_index, ((0, 0), (0, pad), (0, 0)))
    bin_p = jnp.pad(bin_index, ((0, 0), (0, pad), (0, 0)))
    cnt_p = jnp.pad(nn_count, ((0, 0), (0, pad)))

    outs = []
    for c0 in range(num_chunks):
        sl = slice(c0 * t, (c0 + 1) * t)
        idx = idx_p[:, sl]
        bins = bin_p[:, sl]
        cnt = cnt_p[:, sl]
        g = gather_features(inputs, idx)  # (B, T, K, C)
        k_ids = lax.broadcasted_iota(jnp.int32, idx.shape, 2)
        valid = k_ids < cnt[..., None]  # (B, T, K)
        inv_cnt = 1.0 / jnp.maximum(cnt, 1).astype(jnp.float32)
        # One-hot segment matrix over bins; invalid edges contribute nothing.
        onehot = (bins[..., None] == jnp.arange(f_bins)[None, None, None, :])
        onehot = jnp.where(valid[..., None], onehot, False).astype(compute_dtype)
        # S[b,t,f,c] = sum_k onehot[b,t,k,f] * g[b,t,k,c]  (MXU batched matmul)
        s = jnp.einsum(
            "btkf,btkc->btfc",
            onehot,
            g,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        s = s * inv_cnt[..., None, None]
        # Depthwise contraction over bins (tiny).
        out = jnp.einsum(
            "btfc,fcr->btcr",
            s.astype(compute_dtype),
            filt,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        outs.append(out.reshape(batch, t, c_in * mult).astype(compute_dtype))

    out = outs[0] if num_chunks == 1 else jnp.concatenate(outs, axis=1)
    return out[:, :num_out]


