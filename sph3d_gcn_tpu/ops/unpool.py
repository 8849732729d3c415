"""Graph unpooling / interpolation (mean and weighted).

Counterpart of ``MeanInterpolate`` / ``WeightedInterpolate``
(`tf_ops/unpooling/tf_unpool3d_gpu.cu`, wrappers
`tf_ops/unpooling/tf_unpool3d.py:9,19`). Each *fine* point's feature is
reconstructed from its *coarse* neighbors (the inter-level query of
``build_graph_deconv``, ref utils/sph3gcn_util.py:52-58):

- mean:     masked mean over valid coarse neighbors
            (ref tf_unpool3d_gpu.cu:5-22);
- weighted: sum of externally supplied weights times neighbor features
            (ref tf_unpool3d_gpu.cu:45-63). NB the reference layer computes
            weights *proportional* to (sqrt-space) distance, not inverse —
            see ``sph3d_gcn_tpu.nn.layers.unpool3d`` and
            ref utils/sph3gcn_util.py:317-321.

Autodiff backward is the deterministic scatter matching
tf_unpool3d_gpu.cu:25-42,66-84 without atomics.
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


@functools.partial(jax.jit, static_argnames=("window",))
def mean_interpolate(
    inputs: jax.Array,
    nn_index: jax.Array,
    nn_count: jax.Array,
    window: int | None = None,
) -> jax.Array:
    """Fine-point feature = mean of its coarse neighbors.

    Args:
      inputs:   (B, M, C) float32 coarse features.
      nn_index: (B, N, K) int32 coarse-neighbor indices per fine point (N > M).
      nn_count: (B, N) int32 valid counts.

    Returns:
      (B, N, C) float32 interpolated fine features.
    """
    if window is not None:
        num_out = nn_index.shape[1]
        g, _ = windowed_gather_padded(
            inputs, nn_index, nn_count, window=window
        )
        cnt_p = jnp.pad(nn_count, ((0, 0), (0, g.shape[1] - num_out)))
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


@functools.partial(jax.jit, static_argnames=("window",))
def weighted_interpolate(
    inputs: jax.Array,
    weight: jax.Array,
    nn_index: jax.Array,
    nn_count: jax.Array,
    window: int | None = None,
) -> jax.Array:
    """Fine-point feature = weighted sum of coarse neighbors
    (ref tf_unpool3d_gpu.cu:45-63).

    Args:
      inputs:   (B, M, C) float32 coarse features.
      weight:   (B, N, K) float32 per-edge weights.
      nn_index: (B, N, K) int32 coarse-neighbor indices per fine point.
      nn_count: (B, N) int32 valid counts.

    Returns:
      (B, N, C) float32.
    """
    if window is not None:
        num_out, k = nn_index.shape[1:]
        g, valid = windowed_gather_padded(
            inputs, nn_index, nn_count, window=window
        )
        w_p = jnp.pad(weight, ((0, 0), (0, g.shape[1] - num_out), (0, 0)))
        w_p = jnp.where(valid, w_p, 0.0).astype(inputs.dtype)
        return jnp.sum(g * w_p[..., None], axis=2)[:, :num_out]
    batch, num_out, k = nn_index.shape

    def one_chunk(idx, cnt, wgt):
        g = _gather_features(inputs, idx)
        valid = _valid_mask(idx, cnt)
        w = jnp.where(valid, wgt, 0.0)
        return jnp.sum(g * w[..., None], axis=2)

    t = chunk_size(batch, k, inputs.shape[-1], num_out)
    return map_output_chunks(
        one_chunk, num_out, t, nn_index, nn_count, weight
    )
