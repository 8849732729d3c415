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
    g = _gather_features(inputs, nn_index)  # (B, M, K, C)
    valid = _valid_mask(nn_index, nn_count)
    neg_inf = jnp.finfo(g.dtype).min
    gm = jnp.where(valid[..., None], g, neg_inf)
    out = jnp.max(gm, axis=2)
    arg_k = jnp.argmax(gm, axis=2)  # (B, M, C); first max in k-order
    max_index = jnp.take_along_axis(
        nn_index[..., None], arg_k[:, :, None, :], axis=2
    ).squeeze(2)
    return out, max_index


@jax.jit
def avg_pool3d(
    inputs: jax.Array, nn_index: jax.Array, nn_count: jax.Array
) -> jax.Array:
    """Average pooling: masked mean over valid neighbors
    (ref tf_pool3d_gpu.cu:53-70)."""
    g = _gather_features(inputs, nn_index)
    valid = _valid_mask(nn_index, nn_count)
    summed = jnp.sum(jnp.where(valid[..., None], g, 0.0), axis=2)
    inv = 1.0 / jnp.maximum(nn_count, 1).astype(inputs.dtype)
    return summed * inv[..., None]
