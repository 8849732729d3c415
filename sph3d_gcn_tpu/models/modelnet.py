"""ModelNet40 classification network.

Counterpart of `models/SPH3D_modelnet.py`: input MLP -> 3 levels of
{sphere graph -> spherical bins -> separable conv block -> FPS gather ->
max pool} -> per-level global max-pool features -> global centroid conv
(radius 100, kernel (8,2,1), binSize 17) -> FC 512 -> dropout -> FC 256 ->
dropout -> logits (ref SPH3D_modelnet.py:33-108).
"""

from __future__ import annotations

import flax.linen as fnn
import jax
import jax.numpy as jnp

from sph3d_gcn_tpu.configs.base import SPH3DConfig
from sph3d_gcn_tpu.models.common import SeparableConvBlock, normalize_unit_sphere
from sph3d_gcn_tpu.nn.graph import (
    build_global_graph,
    build_graph,
    build_graph_dense,
    build_pool_graph_dense,
    gather_neighborhood,
    gather_points,
)
from sph3d_gcn_tpu.nn.layers import (
    FullyConnected,
    PointwiseConv3d,
    SeparableConv3d,
    pool3d,
)
from sph3d_gcn_tpu.ops.kernelbin import spherical_kernel
from sph3d_gcn_tpu.ops.locality import (
    permute_points,
    sort_indices_small,
    spatial_sort,
)

_GLOBAL_RADIUS = 100.0  # ref SPH3D_modelnet.py:86 (connects all points)
_GLOBAL_KERNEL = (8, 2, 1)  # ref SPH3D_modelnet.py:89-90, binSize 17


class SPH3DModelNet(fnn.Module):
    """Classification network: (B, N, 3) -> (B, num_cls) logits."""

    config: SPH3DConfig

    @fnn.compact
    def __call__(self, points: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        assert points.shape[1] == cfg.num_input, (
            f"expected {cfg.num_input} input points, got {points.shape[1]}"
        )

        if cfg.spatial_sort:
            # Axis-sort each cloud so neighbor indices cluster into narrow
            # windows (ops/locality.py); classification outputs are
            # permutation-independent, nothing to un-permute.
            perm, _ = spatial_sort(points, cfg.radius[0])
            points = permute_points(points, perm)

        if cfg.normalize:
            points = normalize_unit_sphere(points)

        xyz = points
        # The global viewing point (ref SPH3D_modelnet.py:47).
        query = jnp.mean(xyz, axis=1, keepdims=True)

        # Point-axis sharding (parallel/spatial.py; see SegEncoderDecoder
        # for the scheme): graphs/coords replicated, shardable levels'
        # feature rows local with window halos, per-level global maxima
        # gathered across shards; the FC head runs replicated so the
        # external contract ((B, num_cls) logits) is unchanged.
        axis = cfg.point_axis
        if axis is not None:
            from jax import lax
            from sph3d_gcn_tpu.ops.dense import TILE
            from sph3d_gcn_tpu.parallel.spatial import (
                all_rows,
                local_neighborhood,
                shardable_rows,
                slice_rows_local,
            )

            shards = lax.axis_size(axis)

        def _sh(nrows: int) -> bool:
            return axis is not None and shardable_rows(nrows, shards)

        cur_sh = _sh(xyz.shape[1])
        net = PointwiseConv3d(
            cfg.mlp, with_bn=cfg.with_bn, with_bias=cfg.with_bias,
            dtype=cfg.dtype, point_axis=axis, data_axis=cfg.data_axis,
            name="mlp1"
        )(slice_rows_local(xyz, axis) if cur_sh else xyz, train)

        sample_key = None
        if cfg.sample in ("IDS", "random"):
            sample_key = self.make_rng("sample")

        global_feat = []
        dense_ok = jnp.bool_(True)
        halo_ok = jnp.bool_(True)  # see SegEncoderDecoder: halo certificate
        for level in range(len(cfg.radius)):
            if cfg.use_raw:
                xyz_rows = slice_rows_local(xyz, axis) if cur_sh else xyz
                net = jnp.concatenate([net, xyz_rows], axis=-1)

            key = None
            if sample_key is not None:
                key = jax.random.fold_in(sample_key, level)
            if cfg.dense_graph:
                # sharded query build: only this shard's tiles (see
                # SegEncoderDecoder; FPS stays replicated)
                nbh, sample_idx = build_graph_dense(
                    xyz,
                    cfg.radius[level],
                    cfg.nn_uplimit[level],
                    cfg.num_sample[level],
                    sample_method=cfg.sample,
                    key=key,
                    kernel=cfg.kernel,
                    window=cfg.enc_window(level),
                    query_shard=(axis, shards) if cur_sh else None,
                )
                halo_b = 0
                if cur_sh:
                    halo_b = nbh.window // TILE
                    nbh, h_ok = local_neighborhood(
                        nbh, axis, halo_b,
                        (xyz.shape[1] // TILE) // shards,
                    )
                    halo_ok &= h_ok
                dense_ok &= nbh.ok
                filt_idx = None
            else:
                halo_b = 0
                nbh, filt_idx, sample_idx = build_graph(
                    xyz,
                    cfg.radius[level],
                    cfg.nn_uplimit[level],
                    cfg.num_sample[level],
                    sample_method=cfg.sample,
                    key=key,
                    kernel=cfg.kernel,
                )
            net = SeparableConvBlock(
                list_channels=cfg.channels[level],
                bin_size=cfg.bin_size,
                depth_multiplier=cfg.multiplier[level],
                config=cfg,
                window=cfg.enc_window(level),
                point_axis=axis if cur_sh else None,
                halo_blocks=halo_b,
                data_axis=cfg.data_axis,
                name=f"conv{level + 1}",
            )(net, nbh, filt_idx, train)

            if cfg.num_sample[level] > 1:
                if cfg.dense_graph:
                    # build_graph_dense returns sorted indices: the coarse
                    # cloud stays axis-sorted for the next dense level.
                    xyz_coarse = gather_points(xyz, sample_idx)
                    nxt_sh = _sh(xyz_coarse.shape[1])
                    inter = build_pool_graph_dense(
                        xyz, xyz_coarse, cfg.radius[level],
                        cfg.nn_uplimit[level],
                        window=cfg.pool_window(level),
                        query_shard=(axis, shards) if nxt_sh else None,
                    )
                    if cur_sh and nxt_sh:
                        from sph3d_gcn_tpu.parallel.spatial import (
                            halo_exchange,
                        )

                        # inter-level halos scale with cfg.halo_scale
                        # (skewed clouds can breach 1x; see halo_ok)
                        halo_b = (inter.window // TILE) * cfg.halo_scale
                        inter, h_ok = local_neighborhood(
                            inter, axis, halo_b,
                            (xyz.shape[1] // TILE) // shards,
                        )
                        halo_ok &= h_ok
                        dense_ok &= inter.ok
                        net = pool3d(
                            halo_exchange(net, halo_b * TILE, axis),
                            inter, method=cfg.pool_method,
                        )
                    elif cur_sh:
                        dense_ok &= inter.ok
                        net = pool3d(
                            all_rows(net, axis), inter,
                            method=cfg.pool_method,
                        )
                    else:
                        # nxt_sh: shard-local tiles, full-coordinate
                        # windows straight from the sharded build
                        dense_ok &= inter.ok
                        net = pool3d(net, inter, method=cfg.pool_method)
                    xyz = xyz_coarse
                    cur_sh = nxt_sh
                else:
                    if cfg.spatial_sort and sample_idx is not None:
                        # Ascending order keeps the coarse cloud axis-sorted
                        # (a subsequence of a sorted sequence).
                        sample_idx = sort_indices_small(sample_idx)
                    xyz = gather_points(xyz, sample_idx)
                    inter = gather_neighborhood(nbh, sample_idx)
                    net = pool3d(
                        net, inter, method=cfg.pool_method,
                        window=cfg.pool_window(level),
                    )

            # Multi-scale global max-pool feature (ref SPH3D_modelnet.py:82-83).
            local_max = jnp.max(net, axis=1, keepdims=True)
            if cur_sh:
                # (B, 1, C) per shard -> (B, d, C) gathered -> global max;
                # grads route to the owning shard through all_rows' VJP
                local_max = jnp.max(
                    all_rows(local_max, axis), axis=1, keepdims=True
                )
            global_feat.append(local_max)

        if axis is not None and cur_sh:
            # the remaining cloud feeds the replicated global conv + head
            net = all_rows(net, axis)
            cur_sh = False

        if cfg.dense_graph:
            # Window-coverage certificate: True iff every dense graph this
            # forward built provably covered all in-range neighbors (then
            # outputs equal the classic per-edge path exactly). Read via
            # mutable=["intermediates"]; a no-op otherwise. Under point
            # sharding it also certifies the halos; shards must agree.
            if axis is not None:
                dense_ok = lax.pmin(
                    dense_ok.astype(jnp.int32), axis
                ).astype(bool)
                halo_ok = lax.pmin(
                    halo_ok.astype(jnp.int32), axis
                ).astype(bool)
                self.sow("intermediates", "halo_ok", halo_ok)
            self.sow("intermediates", "dense_ok", dense_ok)

        # Global feature: all remaining points -> centroid query
        # (ref SPH3D_modelnet.py:85-94).
        gnbh = build_global_graph(xyz, query, _GLOBAL_RADIUS)
        gfilt = spherical_kernel(xyz, query, gnbh, _GLOBAL_RADIUS, _GLOBAL_KERNEL)
        net = SeparableConv3d(
            num_out_channels=cfg.global_channels,
            bin_size=17,
            depth_multiplier=cfg.global_multiplier,
            with_bn=cfg.with_bn,
            with_bias=cfg.with_bias,
            dtype=cfg.dtype,
            data_axis=cfg.data_axis,
            name="global_conv",
        )(net, gnbh, gfilt, train)
        global_feat.append(net)
        net = jnp.concatenate(global_feat, axis=2)

        net = net.reshape(net.shape[0], -1)
        net = FullyConnected(
            512, with_bn=cfg.with_bn, with_bias=cfg.with_bias, dtype=cfg.dtype,
            data_axis=cfg.data_axis, name="fc1"
        )(net, train)
        net = fnn.Dropout(0.5, deterministic=not train, name="fc1_dp")(net)
        net = FullyConnected(
            256, with_bn=cfg.with_bn, with_bias=cfg.with_bias, dtype=cfg.dtype,
            data_axis=cfg.data_axis, name="fc2"
        )(net, train)
        net = fnn.Dropout(0.5, deterministic=not train, name="fc2_dp")(net)
        net = FullyConnected(
            cfg.num_cls,
            with_bn=False,
            with_bias=cfg.with_bias,
            activation=None,
            name="logits",
        )(net, train)
        return net


def classification_item_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-item softmax cross entropy, (B,)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def classification_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross entropy (ref SPH3D_modelnet.py:112-119)."""
    return jnp.mean(classification_item_loss(logits, labels))
