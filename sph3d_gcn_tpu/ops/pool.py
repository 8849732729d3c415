"""Graph pooling (max / average) over padded neighborhoods.

Counterpart of ``MaxPool3d`` / ``AvgPool3d``
(`tf_ops/pooling/tf_pool3d_gpu.cu`, wrappers `tf_ops/pooling/tf_pool3d.py:9,20`).

Max pool takes, per output point and channel, the max over the gathered
neighbor features, breaking ties toward the first neighbor in k-order
(the CUDA scan uses strict ``>`` at tf_pool3d_gpu.cu:26, so the earliest max
wins). We materialize the argmax and read through it so autodiff routes the
gradient to exactly that input element — matching the reference backward
(tf_pool3d_gpu.cu:38-50) but deterministically (no atomicAdd).

Avg pool is the masked mean over valid neighbors (tf_pool3d_gpu.cu:53-70);
its autodiff backward is the same uniform scatter as tf_pool3d_gpu.cu:73-90.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from sph3d_gcn_tpu.ops.chunking import chunk_size, map_output_chunks
from sph3d_gcn_tpu.ops.gather import gather_features as _gather_features
from sph3d_gcn_tpu.ops.windowed import windowed_gather_padded


def _valid_mask(idx: jax.Array, count: jax.Array) -> jax.Array:
    k_ids = lax.broadcasted_iota(jnp.int32, idx.shape, 2)
    return k_ids < count[..., None]


def _max_pool_windowed(inputs, nn_index, nn_count, window):
    """Windowed max pool: masked max over the window matmul gather; the
    argmax *point* index is recovered arithmetically (min-encoded k*N+idx
    over the max lanes — first max in k-order, ref tf_pool3d_gpu.cu:26)
    with no per-element gather."""
    batch, num_in, c = inputs.shape
    num_out = nn_index.shape[1]
    g, valid = windowed_gather_padded(
        inputs, nn_index, nn_count, window=window
    )  # (B, M_pad, K, C)
    m_pad = g.shape[1]
    idx_p = jnp.pad(nn_index, ((0, 0), (0, m_pad - num_out), (0, 0)))
    neg_inf = jnp.finfo(g.dtype).min
    gm = jnp.where(valid[..., None], g, neg_inf)
    out = jnp.max(gm, axis=2)                        # (B, M_pad, C)
    k_ids = lax.broadcasted_iota(jnp.int32, idx_p.shape, 2)
    is_max = (gm == out[:, :, None, :]) & valid[..., None]
    enc = jnp.where(
        is_max,
        (k_ids * num_in + idx_p)[..., None],
        jnp.iinfo(jnp.int32).max,
    )
    enc_min = jnp.min(enc, axis=2)
    max_index = (enc_min % num_in).astype(jnp.int32)
    # Re-read the max THROUGH its first-max k slot: jnp.max's autodiff
    # splits ties evenly, but the reference routes ALL of dout to the
    # first maximal neighbor (strict > at tf_pool3d_gpu.cu:26, scatter
    # at :73-90). Ties are common in bf16; the gather VJP restores the
    # exact semantics. Values are identical to the plain max.
    k_star = jnp.clip(
        (enc_min // jnp.int32(num_in)).astype(jnp.int32), 0, idx_p.shape[2] - 1
    )
    out = jnp.take_along_axis(gm, k_star[:, :, None, :], axis=2).squeeze(2)
    return out[:, :num_out], max_index[:, :num_out]


@functools.partial(jax.jit, static_argnames=("window",))
def max_pool3d(
    inputs: jax.Array,
    nn_index: jax.Array,
    nn_count: jax.Array,
    window: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Max pooling over neighborhoods.

    The max is a masked reduction whose result is re-read through the
    first-max k slot, so autodiff routes ALL of dout to the first max in
    k-order — the reference's semantics exactly (strict ``>`` at
    tf_pool3d_gpu.cu:26, backward scatter at :38-50). Value ties are
    common in bfloat16, so tie ROUTING is load-bearing, not measure-zero
    (a jnp.max backward splits ties evenly and diverges from the CUDA
    grads on clustered clouds).

    Args:
      inputs:   (B, N, C) float32.
      nn_index: (B, M, K) int32 neighbor indices (M <= N coarse points).
      nn_count: (B, M) int32 valid counts (>= 1).

    Returns:
      (output (B, M, C) float32,
       max_index (B, M, C) int32 — the *input point* index of the max, as the
       reference returns (ref tf_pool3d.cpp / tf_pool3d_gpu.cu:5-34)).
    """
    if window is not None:
        return _max_pool_windowed(inputs, nn_index, nn_count, window)
    batch, num_out, k = nn_index.shape

    def one_chunk(idx, cnt):
        g = _gather_features(inputs, idx)  # (B, T, K, C)
        valid = _valid_mask(idx, cnt)
        neg_inf = jnp.finfo(g.dtype).min
        gm = jnp.where(valid[..., None], g, neg_inf)
        arg_k = jnp.argmax(gm, axis=2)  # (B, T, C); first max in k-order
        # read the value THROUGH the first-max slot: routes all of dout
        # there under autodiff (jnp.max would split bf16 ties evenly,
        # deviating from the reference's tf_pool3d_gpu.cu:73-90 scatter)
        out = jnp.take_along_axis(
            gm, arg_k[:, :, None, :], axis=2
        ).squeeze(2)
        max_index = jnp.take_along_axis(
            idx[..., None], arg_k[:, :, None, :], axis=2
        ).squeeze(2)
        # pack through f32: indices are exact up to 2^24 (bf16 would
        # round point ids above 256)
        return jnp.concatenate(
            [out.astype(jnp.float32), max_index.astype(jnp.float32)],
            axis=-1,
        )

    t = chunk_size(batch, k, inputs.shape[-1], num_out)
    packed = map_output_chunks(one_chunk, num_out, t, nn_index, nn_count)
    c = inputs.shape[-1]
    return (
        packed[..., :c].astype(inputs.dtype),
        packed[..., c:].astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("window",))
def avg_pool3d(
    inputs: jax.Array,
    nn_index: jax.Array,
    nn_count: jax.Array,
    window: int | None = None,
) -> jax.Array:
    """Average pooling: masked mean over valid neighbors
    (ref tf_pool3d_gpu.cu:53-70)."""
    if window is not None:
        num_out = nn_index.shape[1]
        g, _ = windowed_gather_padded(
            inputs, nn_index, nn_count, window=window
        )
        cnt_p = jnp.pad(
            nn_count, ((0, 0), (0, g.shape[1] - num_out))
        )
        summed = jnp.sum(g, axis=2)  # invalid lanes are exact zeros
        inv = 1.0 / jnp.maximum(cnt_p, 1).astype(inputs.dtype)
        return (summed * inv[..., None])[:, :num_out]
    batch, num_out, k = nn_index.shape

    def one_chunk(idx, cnt):
        g = _gather_features(inputs, idx)
        valid = _valid_mask(idx, cnt)
        summed = jnp.sum(jnp.where(valid[..., None], g, 0.0), axis=2)
        inv = 1.0 / jnp.maximum(cnt, 1).astype(inputs.dtype)
        return summed * inv[..., None]

    t = chunk_size(batch, k, inputs.shape[-1], num_out)
    return map_output_chunks(one_chunk, num_out, t, nn_index, nn_count)
