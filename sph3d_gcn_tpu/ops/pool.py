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

import jax
import jax.numpy as jnp
from jax import lax

from sph3d_gcn_tpu.ops.chunking import chunk_size, map_output_chunks
from sph3d_gcn_tpu.ops.gather import gather_features as _gather_features


def _valid_mask(idx: jax.Array, count: jax.Array) -> jax.Array:
    k_ids = lax.broadcasted_iota(jnp.int32, idx.shape, 2)
    return k_ids < count[..., None]


@jax.jit
def max_pool3d(
    inputs: jax.Array, nn_index: jax.Array, nn_count: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Max pooling over neighborhoods.

    The max is a direct masked reduction (fast on the VPU). Gradient-wise,
    ``jnp.max`` splits ties evenly where the reference routes everything to
    the first max in k-order (strict ``>`` at tf_pool3d_gpu.cu:26) — exact
    float ties are measure-zero on real data, and the forward values and
    reported ``max_index`` match the reference exactly.

    Args:
      inputs:   (B, N, C) float32.
      nn_index: (B, M, K) int32 neighbor indices (M <= N coarse points).
      nn_count: (B, M) int32 valid counts (>= 1).

    Returns:
      (output (B, M, C) float32,
       max_index (B, M, C) int32 — the *input point* index of the max, as the
       reference returns (ref tf_pool3d.cpp / tf_pool3d_gpu.cu:5-34)).
    """
    batch, num_out, k = nn_index.shape

    def one_chunk(idx, cnt):
        g = _gather_features(inputs, idx)  # (B, T, K, C)
        valid = _valid_mask(idx, cnt)
        neg_inf = jnp.finfo(g.dtype).min
        gm = jnp.where(valid[..., None], g, neg_inf)
        out = jnp.max(gm, axis=2)
        arg_k = jnp.argmax(gm, axis=2)  # (B, T, C); first max in k-order
        max_index = jnp.take_along_axis(
            idx[..., None], arg_k[:, :, None, :], axis=2
        ).squeeze(2)
        return jnp.concatenate(
            [out, max_index.astype(out.dtype)], axis=-1
        )

    t = chunk_size(batch, k, inputs.shape[-1], num_out)
    packed = map_output_chunks(one_chunk, num_out, t, nn_index, nn_count)
    c = inputs.shape[-1]
    return packed[..., :c], packed[..., c:].astype(jnp.int32)


@jax.jit
def avg_pool3d(
    inputs: jax.Array, nn_index: jax.Array, nn_count: jax.Array
) -> jax.Array:
    """Average pooling: masked mean over valid neighbors
    (ref tf_pool3d_gpu.cu:53-70)."""
    batch, num_out, k = nn_index.shape

    def one_chunk(idx, cnt):
        g = _gather_features(inputs, idx)
        valid = _valid_mask(idx, cnt)
        summed = jnp.sum(jnp.where(valid[..., None], g, 0.0), axis=2)
        inv = 1.0 / jnp.maximum(cnt, 1).astype(inputs.dtype)
        return summed * inv[..., None]

    t = chunk_size(batch, k, inputs.shape[-1], num_out)
    return map_output_chunks(one_chunk, num_out, t, nn_index, nn_count)
