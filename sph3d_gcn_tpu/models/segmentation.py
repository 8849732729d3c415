"""Shared encoder/decoder backbone and dataset wrappers for segmentation.

Mirrors the common structure of `models/SPH3D_{shapenet,scannet,s3dis,
ruemonge2014}.py`: input MLP -> encoder {graph, bins, conv block, FPS
gather, max pool} x L -> mirrored decoder {deconv graph, conv block at the
coarse level, unpool to the finer level, skip concat} -> optional mlp2 ->
pointwise classifier.

The reference reverses its config lists *in place* between encoder and
decoder (ref SPH3D_s3dis.py:79-84) — here the decoder indexes reversed
copies, so configs stay immutable.
"""

from __future__ import annotations

import flax.linen as fnn
import jax
import jax.numpy as jnp
from jax import lax

from sph3d_gcn_tpu.configs.base import SPH3DConfig
from sph3d_gcn_tpu.models.common import (
    SeparableConvBlock,
    normalize_mean_center,
    normalize_unit_sphere,
    normalize_xy_center_z_floor,
)
from sph3d_gcn_tpu.nn.graph import (
    build_graph,
    build_graph_deconv,
    build_graph_deconv_dense,
    build_graph_dense,
    build_pool_graph_dense,
    gather_neighborhood,
    gather_points,
)
from sph3d_gcn_tpu.nn.layers import PointwiseConv3d, pool3d, unpool3d
from sph3d_gcn_tpu.ops.locality import (
    permute_points,
    sort_indices_small,
    spatial_sort,
)

NUM_SHAPENET_CATEGORIES = 16  # ref models/SPH3D_shapenet_onehot.py:10


def _maybe_sort(cfg: SPH3DConfig, points: jax.Array):
    """Axis-sort the cloud for the windowed engine (cfg.spatial_sort).

    Returns (sorted_points, (perm, rank)) where ``rank`` un-permutes
    per-point outputs back to the caller's input order (None when sorting
    is off) — the model's external contract is order-preserving either
    way. ``perm`` rides along as the unsort's inverse so its VJP is a
    gather, not a scatter-add (see ops/locality.py permute_points).
    """
    if not cfg.spatial_sort:
        return points, None
    perm, rank = spatial_sort(points, cfg.radius[0])
    return permute_points(points, perm), (perm, rank)


def _maybe_unsort(logits: jax.Array, sort):
    if sort is None:
        return logits
    perm, rank = sort
    return permute_points(logits, rank, inv=perm)


def _maybe_gather_rows(cfg: SPH3DConfig, logits: jax.Array, num_points: int):
    """Under point sharding the backbone hands back this shard's rows;
    gather them so the model's external contract (full (B, N, ncls)
    logits in input point order) is unchanged."""
    if cfg.point_axis is not None and logits.shape[1] != num_points:
        from sph3d_gcn_tpu.parallel.spatial import all_rows

        logits = all_rows(logits, cfg.point_axis)
    return logits


class SegEncoderDecoder(fnn.Module):
    """mlp1 -> encoder pyramid -> decoder with skip concats [-> mlp2].

    Args (module fields):
      config: architecture config.
      include_input_skip: append the mlp1 output to the skip list and run
        mlp2 + concat at the end (the ShapeNet variant,
        ref SPH3D_shapenet.py:46,106-108). Scene models skip both.
    """

    config: SPH3DConfig
    include_input_skip: bool = False

    @fnn.compact
    def __call__(
        self, net: jax.Array, xyz: jax.Array, train: bool = False
    ) -> jax.Array:
        cfg = self.config
        num_levels = len(cfg.radius)

        # Point-axis sharding (parallel/spatial.py): coordinates / graph
        # construction stay replicated (they are the cheap, coords-only
        # part); every shardable level's FEATURE rows live sharded over
        # ``axis`` with window-halo exchanges, and the caller gathers
        # logits at the end. ``cur_sh`` tracks whether ``net`` currently
        # holds this shard's rows or the full (replicated) cloud —
        # non-shardable coarse levels (few tiles) run replicated.
        axis = cfg.point_axis
        if axis is not None:
            from sph3d_gcn_tpu.ops.dense import TILE
            from sph3d_gcn_tpu.parallel.spatial import (
                all_rows,
                halo_exchange,
                local_neighborhood,
                shardable_rows,
                slice_rows_local,
            )

            shards = lax.axis_size(axis)

        def _sh(nrows: int) -> bool:
            return axis is not None and shardable_rows(nrows, shards)

        cur_sh = _sh(net.shape[1])
        if cur_sh:
            net = slice_rows_local(net, axis)
        net = PointwiseConv3d(
            cfg.mlp, with_bn=cfg.with_bn, with_bias=cfg.with_bias,
            dtype=cfg.dtype, point_axis=axis, data_axis=cfg.data_axis,
            name="mlp1"
        )(net, train)

        sample_key = None
        if cfg.sample in ("IDS", "random"):
            sample_key = self.make_rng("sample")

        xyz_layers = [xyz]
        encoder = [net] if self.include_input_skip else []

        # ---------------- Encoder (ref SPH3D_s3dis.py:53-77) ----------------
        dense_ok = jnp.bool_(True)
        # halo certificate (point sharding only): True iff every rebased
        # window fit inside its halo (localize_tiles' shard_ok). A False
        # here with window coverage intact is recoverable by widening the
        # inter-level halos (cfg.halo_scale); fit() retries before falling
        # back to the unsharded classic engine.
        halo_ok = jnp.bool_(True)
        for level in range(num_levels):
            key = None
            if sample_key is not None:
                key = jax.random.fold_in(sample_key, level)
            if cfg.dense_graph:
                # Under point sharding the query build itself shards:
                # only THIS shard's tiles are computed (query_shard), so
                # query device time scales 1/d instead of running
                # replicated (FPS stays replicated — a sequential global
                # greedy on coordinates, see build_graph_dense).
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
                    # intra-level self-graph: one window of halo provably
                    # covers every tile's slab (windows start at or
                    # before the tile's own rows)
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

            encoder.append(net)
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
                        # coarse tiles and fine rows both sharded: the
                        # fine halo covers the pool windows (certified
                        # through DenseNeighborhood.ok; inter-level halos
                        # scale with cfg.halo_scale — skewed distributions
                        # can breach 1x, see halo_ok)
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
                        # pooling onto a non-shardable coarse level:
                        # gather the fine rows, run replicated
                        dense_ok &= inter.ok
                        net = pool3d(
                            all_rows(net, axis), inter,
                            method=cfg.pool_method,
                        )
                    else:
                        # nxt_sh: tiles came back shard-local from the
                        # build with s_blk in full (replicated-db) coords
                        dense_ok &= inter.ok
                        net = pool3d(net, inter, method=cfg.pool_method)
                    xyz = xyz_coarse
                    xyz_layers.append(xyz)
                    cur_sh = nxt_sh
                else:
                    if cfg.spatial_sort and sample_idx is not None:
                        # Ascending order keeps the coarse cloud axis-sorted.
                        sample_idx = sort_indices_small(sample_idx)
                    xyz = gather_points(xyz, sample_idx)
                    xyz_layers.append(xyz)
                    inter = gather_neighborhood(nbh, sample_idx)
                    net = pool3d(
                        net, inter, method=cfg.pool_method,
                        window=cfg.pool_window(level),
                    )

        # Decoder indexes reversed *copies* (the reference reverses the
        # config lists in place, ref SPH3D_s3dis.py:79-84).
        radius_r = cfg.radius[::-1]
        nn_uplimit_r = cfg.nn_uplimit[::-1]
        channels_r = cfg.channels[::-1]
        multiplier_r = cfg.multiplier[::-1]
        xyz_layers = xyz_layers[::-1]
        encoder = encoder[::-1]

        # ---------------- Decoder (ref SPH3D_s3dis.py:87-105) ----------------
        for level in range(num_levels):
            xyz_coarse = xyz_layers[level]
            xyz_fine = xyz_layers[level + 1]
            fine_sh = _sh(xyz_fine.shape[1])
            # Decoder edges search the SAMPLED cloud of the mirrored
            # encoder level — its proportionally smaller window applies.
            dec_win = cfg.dec_window(num_levels - 1 - level)
            if cfg.dense_graph:
                intra, inter = build_graph_deconv_dense(
                    xyz_coarse, xyz_fine, radius_r[level],
                    nn_uplimit_r[level], kernel=cfg.kernel, window=dec_win,
                    need_dist=cfg.unpool_method == "weighted",
                    dec_margin=cfg.dec_margin,
                    growth_steps=cfg.growth_steps,
                    intra_shard=(axis, shards) if cur_sh else None,
                    inter_shard=(axis, shards) if fine_sh else None,
                )
                halo_b = 0
                if cur_sh:
                    halo_b = intra.window // TILE
                    intra, h_ok = local_neighborhood(
                        intra, axis, halo_b,
                        (xyz_coarse.shape[1] // TILE) // shards,
                    )
                    halo_ok &= h_ok
                dense_ok &= intra.ok
                filt_idx = None
            else:
                halo_b = 0
                intra, filt_idx, inter = build_graph_deconv(
                    xyz_coarse, xyz_fine, radius_r[level],
                    nn_uplimit_r[level], kernel=cfg.kernel,
                )
            net = SeparableConvBlock(
                list_channels=channels_r[level],
                bin_size=cfg.bin_size,
                depth_multiplier=multiplier_r[level],
                config=cfg,
                window=dec_win,
                point_axis=axis if cur_sh else None,
                halo_blocks=halo_b,
                data_axis=cfg.data_axis,
                name=f"deconv{level + 1}",
            )(net, intra, filt_idx, train)
            if not cfg.dense_graph:
                net = unpool3d(
                    net, inter, method=cfg.unpool_method, window=dec_win
                )
            elif cur_sh and fine_sh:
                # fine query tiles and coarse rows both sharded: the
                # coarse halo covers the unpool windows (scaled by
                # cfg.halo_scale, see halo_ok above)
                halo_b = (inter.window // TILE) * cfg.halo_scale
                inter, h_ok = local_neighborhood(
                    inter, axis, halo_b,
                    (xyz_coarse.shape[1] // TILE) // shards,
                )
                halo_ok &= h_ok
                dense_ok &= inter.ok
                net = unpool3d(
                    halo_exchange(net, halo_b * TILE, axis), inter,
                    method=cfg.unpool_method,
                )
            elif fine_sh:
                # replicated coarse rows feed sharded fine tiles: the
                # build returned this shard's tiles with windows in full
                # (replicated-db) coordinates — nothing to rebase
                dense_ok &= inter.ok
                net = unpool3d(net, inter, method=cfg.unpool_method)
            elif cur_sh:
                dense_ok &= inter.ok
                net = unpool3d(
                    all_rows(net, axis), inter, method=cfg.unpool_method
                )
            else:
                dense_ok &= inter.ok
                net = unpool3d(net, inter, method=cfg.unpool_method)
            net = jnp.concatenate((net, encoder[level]), axis=2)
            cur_sh = fine_sh

        if cfg.dense_graph:
            # Window-coverage certificate (see SPH3DModelNet): True iff all
            # dense graphs provably covered their in-range neighbors. Under
            # point sharding it also certifies every halo (localize_tiles
            # folds shard_ok in); shards must agree for the metric.
            if axis is not None:
                dense_ok = lax.pmin(
                    dense_ok.astype(jnp.int32), axis
                ).astype(bool)
                halo_ok = lax.pmin(
                    halo_ok.astype(jnp.int32), axis
                ).astype(bool)
                self.sow("intermediates", "halo_ok", halo_ok)
            self.sow("intermediates", "dense_ok", dense_ok)

        if self.include_input_skip:
            # mlp2 + concat of the mlp1 features (ref SPH3D_shapenet.py:106-108).
            net = PointwiseConv3d(
                cfg.mlp, with_bn=cfg.with_bn, with_bias=cfg.with_bias,
                dtype=cfg.dtype, point_axis=axis, data_axis=cfg.data_axis,
                name="mlp2"
            )(net, train)
            net = jnp.concatenate((net, encoder[-1]), axis=2)

        return net


class SPH3DShapeNet(fnn.Module):
    """Per-category part segmentation (ref models/SPH3D_shapenet.py:33-113).

    Input is raw (B, N, 3) xyz (already unit-sphere normalized offline);
    ``num_cls`` is the per-category part count.
    """

    config: SPH3DConfig
    num_cls: int

    @fnn.compact
    def __call__(self, points: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        points, sort = _maybe_sort(cfg, points)
        xyz = points[:, :, 0:3]
        net = points
        if cfg.normalize:
            net = normalize_unit_sphere(net)
        net = SegEncoderDecoder(cfg, include_input_skip=True, name="backbone")(
            net, xyz, train
        )
        net = PointwiseConv3d(
            self.num_cls,
            with_bn=False,
            with_bias=cfg.with_bias,
            activation=None,
            name="logits",
        )(net, train)
        net = _maybe_gather_rows(cfg, net, points.shape[1])
        return _maybe_unsort(net, sort)


class SPH3DShapeNetOnehot(fnn.Module):
    """All-category part segmentation with a one-hot category input tiled
    over points before the classifier (ref SPH3D_shapenet_onehot.py:110-114).
    """

    config: SPH3DConfig
    num_cls: int = 50

    @fnn.compact
    def __call__(
        self, points: jax.Array, cls_label: jax.Array, train: bool = False
    ) -> jax.Array:
        cfg = self.config
        points, sort = _maybe_sort(cfg, points)
        xyz = points[:, :, 0:3]
        net = SegEncoderDecoder(cfg, include_input_skip=True, name="backbone")(
            points, xyz, train
        )
        onehot = jax.nn.one_hot(cls_label, NUM_SHAPENET_CATEGORIES, dtype=net.dtype)
        onehot = jnp.tile(onehot[:, None, :], (1, net.shape[1], 1))
        net = jnp.concatenate((net, onehot), axis=2)
        net = PointwiseConv3d(
            self.num_cls,
            with_bn=False,
            with_bias=cfg.with_bias,
            activation=None,
            name="logits",
        )(net, train)
        net = _maybe_gather_rows(cfg, net, points.shape[1])
        return _maybe_unsort(net, sort)


class SPH3DSceneSeg(fnn.Module):
    """Scene segmentation (S3DIS / ScanNet): xy-bbox-center normalize, input
    features = norm_xyz ++ columns 6: (ref SPH3D_s3dis.py:35-49, identical
    model in SPH3D_scannet.py)."""

    config: SPH3DConfig

    @fnn.compact
    def __call__(self, points: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        points, sort = _maybe_sort(cfg, points)
        xyz = points[:, :, 0:3]
        norm_xyz = normalize_xy_center_z_floor(xyz) if cfg.normalize else xyz
        net = jnp.concatenate((norm_xyz, points[:, :, 6:]), axis=2)
        net = SegEncoderDecoder(cfg, include_input_skip=False, name="backbone")(
            net, xyz, train
        )
        net = PointwiseConv3d(
            cfg.num_cls,
            with_bn=False,
            with_bias=cfg.with_bias,
            activation=None,
            name="logits",
        )(net, train)
        net = _maybe_gather_rows(cfg, net, points.shape[1])
        return _maybe_unsort(net, sort)


class SPH3DRueMonge(fnn.Module):
    """Facade segmentation: mean-center normalize, features = norm_xyz ++
    columns 3: (normal + rgb) (ref SPH3D_ruemonge2014.py:35-47)."""

    config: SPH3DConfig

    @fnn.compact
    def __call__(self, points: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        points, sort = _maybe_sort(cfg, points)
        xyz = points[:, :, 0:3]
        norm_xyz = normalize_mean_center(xyz) if cfg.normalize else xyz
        net = jnp.concatenate((norm_xyz, points[:, :, 3:]), axis=2)
        net = SegEncoderDecoder(cfg, include_input_skip=False, name="backbone")(
            net, xyz, train
        )
        net = PointwiseConv3d(
            cfg.num_cls,
            with_bn=False,
            with_bias=cfg.with_bias,
            activation=None,
            name="logits",
        )(net, train)
        net = _maybe_gather_rows(cfg, net, points.shape[1])
        return _maybe_unsort(net, sort)


def _nll_points(logp: jax.Array, labels: jax.Array) -> jax.Array:
    """-logp[..., label] per point via a one-hot contraction: ncls is
    small (7-50), so the masked sum fuses on the VPU and its VJP is the
    same one-hot multiply — a per-point gather here costs a scatter-add
    cotangent into (B, N, ncls) instead (~2 ms at S3DIS batch shapes)."""
    onehot = jax.nn.one_hot(labels, logp.shape[-1], dtype=logp.dtype)
    return -jnp.sum(logp * onehot, axis=-1)


def segmentation_item_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-item mean CE over the item's points, (B,)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(_nll_points(logp, labels), axis=1)


def segmentation_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Plain mean CE over all points (ref SPH3D_ruemonge2014.py:116-123,
    SPH3D_shapenet.py:116-123). Point counts are fixed per item, so this
    equals the mean of the per-item losses."""
    return jnp.mean(segmentation_item_loss(logits, labels))


def inner_masked_item_loss(
    logits: jax.Array, labels: jax.Array, inner_label: jax.Array
) -> jax.Array:
    """Per-item mean CE over *inner* (non-context) points, (B,); items with
    no inner points contribute 0 (ref SPH3D_s3dis.py:116-133)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = _nll_points(logp, labels)
    inner = (inner_label > 0).astype(nll.dtype)
    per_item_sum = jnp.sum(nll * inner, axis=1)
    per_item_cnt = jnp.sum(inner, axis=1)
    return jnp.where(
        per_item_cnt > 0, per_item_sum / jnp.maximum(per_item_cnt, 1.0), 0.0
    )


def inner_masked_segmentation_loss(
    logits: jax.Array, labels: jax.Array, inner_label: jax.Array
) -> jax.Array:
    """Per-item mean CE over *inner* (non-context) points, summed over the
    batch (ref SPH3D_s3dis.py:116-133: per-item ``reduce_mean`` guarded by a
    zero-size cond, accumulated with ``+=`` — i.e. a sum, not a mean, over
    batch items)."""
    return jnp.sum(inner_masked_item_loss(logits, labels, inner_label))
