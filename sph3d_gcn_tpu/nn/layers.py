"""Flax layer library mirroring the reference's `utils/sph3gcn_util.py`.

Reproduced behavioral details (all load-bearing for checkpoint parity):

- default activation is **ELU** (ref utils/sph3gcn_util.py:102,176);
- batch norm runs **after** the activation (ref :157-161) with momentum 0.99
  and TF's default epsilon 1e-3 (ref :328-332);
- weights use Xavier/Glorot **uniform** init
  (tf.contrib.layers.xavier_initializer default, ref :77-80);
- the pointwise convolution is a plain matmul over flattened points
  (ref :146-150) — on TPU this is exactly the MXU-shaped GEMM we want;
- 'weighted' unpooling weights are **proportional to (sqrt-space) distance**,
  not inverse (ref :317-321) — a reference quirk, reproduced as-is;
- L2 weight decay applies to conv/fc kernels and BN beta/gamma; collected
  from the param tree by :func:`l2_regularization` to mirror the reference's
  losses collection (ref :81-84, :330-331; train_modelnet.py:156-160).
"""

from __future__ import annotations

import functools

from collections.abc import Callable
from typing import Any

import flax.linen as fnn
import jax
import jax.numpy as jnp
from jax import lax

from sph3d_gcn_tpu.ops.conv import depthwise_conv3d
from sph3d_gcn_tpu.ops.dense import (
    DenseNeighborhood,
    dense_avg_pool3d,
    dense_depthwise_conv3d,
    dense_max_pool3d,
    dense_mean_interpolate,
    dense_weighted_interpolate,
)
from sph3d_gcn_tpu.ops.pool import avg_pool3d, max_pool3d
from sph3d_gcn_tpu.ops.types import Neighborhood
from sph3d_gcn_tpu.ops.unpool import mean_interpolate, weighted_interpolate

Activation = Callable[[jax.Array], jax.Array] | None

_glorot = fnn.initializers.glorot_uniform()


class BatchNorm(fnn.Module):
    """TF-flavored batch norm: momentum 0.99, epsilon 1e-3
    (ref utils/sph3gcn_util.py:328-332).

    Statistics, running averages and scale/bias stay float32 (flax
    computes reductions in f32 even for half-precision inputs); the
    normalization arithmetic runs in the activation dtype — casting the
    whole activation tensor to f32 and back materialized two full copies
    of every BN input per layer (~25 ms/step of convert_element_type on
    the S3DIS profile, round 3)."""

    momentum: float = 0.99
    epsilon: float = 1e-3
    # mesh axes to pmean batch statistics over — the point axis under
    # point sharding and/or the data axis under shard_map'ed batch
    # sharding (equal rows/items per shard make the pmean exact)
    axis_name: str | tuple[str, ...] | None = None

    @fnn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.axis_name is not None:
            # the child is named like flax's auto-scoped BatchNorm so the
            # parameter/stat tree is identical either way (checkpoints
            # and the TF1 converter never see the difference)
            return _SyncBatchNorm(
                momentum=self.momentum,
                epsilon=self.epsilon,
                axis_name=self.axis_name,
                name="BatchNorm_0",
            )(x, train)
        return fnn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=None,
            dtype=x.dtype,
            param_dtype=jnp.float32,
        )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pmean_sync(x: jax.Array, axis_name: str) -> jax.Array:
    """pmean whose TRANSPOSE is pmean (its true linear transpose: the
    forward averages d shard values into one logical statistic used by
    all shards, so each shard's input cotangent is the psum of every
    user's cotangent divided by d). shard_map with check_vma=False does
    NOT transpose its built-in psum/pmean correctly — flax BatchNorm's
    internal axis_name sync produced structurally wrong gradients for
    everything upstream (measured: bn bias grads off by >100x) — so the
    sync BN below routes its one collective through this custom rule."""
    return lax.pmean(x, axis_name)


def _pmean_sync_fwd(x, axis_name):
    return lax.pmean(x, axis_name), None


def _pmean_sync_bwd(axis_name, _, ct):
    return (lax.pmean(ct, axis_name),)


_pmean_sync.defvjp(_pmean_sync_fwd, _pmean_sync_bwd)


class _SyncBatchNorm(fnn.Module):
    """Cross-shard BatchNorm for point-axis sharding: flax BatchNorm
    semantics (fast variance, f32 statistics/params, normalization in the
    activation dtype, running averages ``m*old + (1-m)*batch``) with the
    shard sync done through :func:`_pmean_sync`. Parameter names (scale,
    bias) and stat names (mean, var) match flax's exactly."""

    momentum: float
    epsilon: float
    axis_name: str | tuple[str, ...]

    @fnn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c = x.shape[-1]
        scale = self.param(
            "scale", fnn.initializers.ones_init(), (c,), jnp.float32
        )
        bias = self.param(
            "bias", fnn.initializers.zeros_init(), (c,), jnp.float32
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if train:
            red = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            # one collective for both moments, as flax does
            mom = jnp.concatenate(
                [jnp.mean(xf, red), jnp.mean(xf * xf, red)]
            )
            mom = _pmean_sync(mom, self.axis_name)
            mean, mean2 = mom[:c], mom[c:]
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1.0 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = lax.rsqrt(var + self.epsilon) * scale    # f32
        dt = x.dtype
        return (x - mean.astype(dt)) * mul.astype(dt) + bias.astype(dt)


class SeparableConv3d(fnn.Module):
    """Depthwise spherical graph conv -> pointwise GEMM -> act -> BN.

    Mirrors ``separable_conv3d`` (ref utils/sph3gcn_util.py:88-163).
    Parameter names keep the reference's variable scoping
    (``depthwise_weights``, ``weights``, ``biases``) so the TF1 checkpoint
    converter is a pure name map.

    ``dtype`` selects the compute/activation precision (params stay f32);
    bfloat16 rides the MXU's native path for training throughput.
    """

    num_out_channels: int
    bin_size: int
    depth_multiplier: int
    activation: Activation = fnn.elu
    with_bn: bool = False
    with_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    window: int | None = None
    # point-axis sharding (parallel/spatial.py): inputs arrive as this
    # shard's row chunk, ``nbh`` arrives tile-localized with its windows
    # rebased for a halo of ``halo_blocks`` TILE-blocks each side; the
    # conv halo-exchanges its own input so stacked convs in a block keep
    # handing each other local rows. BN statistics pmean over the axis.
    point_axis: str | None = None
    halo_blocks: int = 0
    # batch shard axis on a composed ('data', 'points') mesh — BN stats
    # sync over it (no row logic attached)
    data_axis: str | None = None

    @fnn.compact
    def __call__(
        self,
        inputs: jax.Array,
        nbh: Neighborhood,
        filt_index: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        inputs = inputs.astype(self.dtype)
        c_in = inputs.shape[-1]
        depthwise = self.param(
            "depthwise_weights",
            _glorot,
            (self.bin_size, c_in, self.depth_multiplier),
        )
        kernel = self.param(
            "weights", _glorot, (c_in * self.depth_multiplier, self.num_out_channels)
        )
        if isinstance(nbh, DenseNeighborhood):
            # Dense windowed engine: bins live inside the packed maps
            # (filt_index unused); the pointwise GEMM is folded into the
            # depthwise op so the (B, M, C*r) intermediate and its HBM
            # layout transpose never materialize.
            if self.point_axis is not None:
                from sph3d_gcn_tpu.parallel.spatial import halo_exchange

                inputs = halo_exchange(
                    inputs, self.halo_blocks * 128, self.point_axis
                )
            out = dense_depthwise_conv3d(
                inputs, depthwise, nbh, pointwise=kernel
            )
        else:
            out = depthwise_conv3d(
                inputs, depthwise, nbh.idx, nbh.count, filt_index,
                window=self.window,
            )
            out = jnp.einsum(
                "bmc,co->bmo",
                out,
                kernel.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)

        if self.with_bias:
            bias = self.param(
                "biases", fnn.initializers.zeros_init(), (self.num_out_channels,)
            )
            out = out + bias.astype(out.dtype)
        if self.activation is not None:
            out = self.activation(out)
        if self.with_bn:
            out = BatchNorm(
                name="bn", axis_name=_bn_axes(self.point_axis, self.data_axis)
            )(out, train)
        return out


class PointwiseConv3d(fnn.Module):
    """1x1 conv as a flattened matmul (ref utils/sph3gcn_util.py:166-222)."""

    num_out_channels: int
    activation: Activation = fnn.elu
    with_bn: bool = False
    with_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    # BN-stat pmean axes under point/batch sharding (rows/items arrive
    # pre-sliced)
    point_axis: str | None = None
    data_axis: str | None = None

    @fnn.compact
    def __call__(self, inputs: jax.Array, train: bool = False) -> jax.Array:
        inputs = inputs.astype(self.dtype)
        c_in = inputs.shape[-1]
        kernel = self.param("weights", _glorot, (c_in, self.num_out_channels))
        out = jnp.einsum(
            "bmc,co->bmo",
            inputs,
            kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        if self.with_bias:
            bias = self.param(
                "biases", fnn.initializers.zeros_init(), (self.num_out_channels,)
            )
            out = out + bias.astype(out.dtype)
        if self.activation is not None:
            out = self.activation(out)
        if self.with_bn:
            out = BatchNorm(
                name="bn", axis_name=_bn_axes(self.point_axis, self.data_axis)
            )(out, train)
        return out


def _bn_axes(*axes: str | None) -> str | tuple[str, ...] | None:
    """Collapse the active shard axes into BatchNorm's axis_name."""
    present = tuple(a for a in axes if a is not None)
    if not present:
        return None
    return present[0] if len(present) == 1 else present


class FullyConnected(fnn.Module):
    """Dense layer on (B, C) (ref utils/sph3gcn_util.py:225-273)."""

    num_out_channels: int
    activation: Activation = fnn.elu
    with_bn: bool = False
    with_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    point_axis: str | None = None
    data_axis: str | None = None

    @fnn.compact
    def __call__(self, inputs: jax.Array, train: bool = False) -> jax.Array:
        inputs = inputs.astype(self.dtype)
        c_in = inputs.shape[-1]
        kernel = self.param("weights", _glorot, (c_in, self.num_out_channels))
        out = (inputs @ kernel.astype(self.dtype)).astype(self.dtype)
        if self.with_bias:
            bias = self.param(
                "biases", fnn.initializers.zeros_init(), (self.num_out_channels,)
            )
            out = out + bias.astype(out.dtype)
        if self.activation is not None:
            out = self.activation(out)
        if self.with_bn:
            out = BatchNorm(
                name="bn", axis_name=_bn_axes(self.point_axis, self.data_axis)
            )(out, train)
        return out


def pool3d(
    inputs: jax.Array,
    nbh: Neighborhood,
    method: str = "max",
    window: int | None = None,
) -> jax.Array:
    """Pooling dispatch (ref utils/sph3gcn_util.py:276-297)."""
    if isinstance(nbh, DenseNeighborhood):
        if method == "max":
            out, _ = dense_max_pool3d(inputs, nbh, with_index=False)
            return out
        if method == "avg":
            return dense_avg_pool3d(inputs, nbh)
        raise ValueError(f"Unknown pooling method {method!r}")
    if method == "max":
        out, _ = max_pool3d(inputs, nbh.idx, nbh.count, window=window)
        return out
    if method == "avg":
        return avg_pool3d(inputs, nbh.idx, nbh.count, window=window)
    raise ValueError(f"Unknown pooling method {method!r}")


def unpool3d(
    inputs: jax.Array,
    nbh: Neighborhood,
    method: str = "mean",
    window: int | None = None,
) -> jax.Array:
    """Unpooling dispatch (ref utils/sph3gcn_util.py:300-325).

    The 'weighted' branch reproduces the reference's distance-*proportional*
    weights ``(nn_dist + eps) / (sum nn_dist + eps)`` over the sqrt-space
    distances (ref :317-321).
    """
    if isinstance(nbh, DenseNeighborhood):
        if method == "mean":
            return dense_mean_interpolate(inputs, nbh)
        if method == "weighted":
            return dense_weighted_interpolate(inputs, nbh)
        raise ValueError(f"Unknown unpooling method {method!r}")
    if method == "mean":
        return mean_interpolate(inputs, nbh.idx, nbh.count, window=window)
    if method == "weighted":
        eps = 1e-7
        sum_dist = jnp.sum(nbh.dist, axis=-1, keepdims=True)
        weight = (nbh.dist + eps) / (sum_dist + eps)
        return weighted_interpolate(
            inputs, weight, nbh.idx, nbh.count, window=window
        )
    raise ValueError(f"Unknown unpooling method {method!r}")


def l2_regularization(params: Any) -> jax.Array:
    """Sum of TF-style ``l2_loss`` (= sum(x^2)/2) over regularized params.

    The reference regularizes conv/fc kernels (ref utils/sph3gcn_util.py:81-84)
    and BN beta/gamma (ref :330-331 + train_modelnet.py:156-160), all scaled
    by the same config weight_decay. Biases are excluded.
    """
    total = jnp.float32(0.0)
    flat = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in flat:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("weights", "depthwise_weights", "scale", "bias"):
            total = total + 0.5 * jnp.sum(jnp.square(leaf))
    return total
