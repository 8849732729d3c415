"""Shared model components: input normalizations and the separable-conv
block used by every SPH3D family."""

from __future__ import annotations

import flax.linen as fnn
import jax
import jax.numpy as jnp

from sph3d_gcn_tpu.configs.base import SPH3DConfig
from sph3d_gcn_tpu.nn.layers import SeparableConv3d
from sph3d_gcn_tpu.ops.types import Neighborhood


def normalize_unit_sphere(points: jax.Array) -> jax.Array:
    """Center and scale each cloud into the unit sphere
    (ref models/SPH3D_modelnet.py:11-17, SPH3D_shapenet.py:11-17).

    Guards against degenerate all-identical clouds (e.g. padding), whose
    zero scale would otherwise inject NaNs into batch statistics."""
    points = points - jnp.mean(points, axis=1, keepdims=True)
    scale = jnp.max(
        jnp.sum(jnp.square(points), axis=-1, keepdims=True), axis=1, keepdims=True
    )
    return points / jnp.sqrt(jnp.maximum(scale, 1e-12))


def normalize_xy_center_z_floor(points: jax.Array) -> jax.Array:
    """Center xy at the bbox center, keep z as-is
    (ref models/SPH3D_s3dis.py:11-19, identical in SPH3D_scannet.py)."""
    min_xyz = jnp.min(points, axis=1, keepdims=True)
    max_xyz = jnp.max(points, axis=1, keepdims=True)
    center = (max_xyz + min_xyz) / 2
    xy = points[:, :, 0:2] - center[:, :, 0:2]
    return jnp.concatenate((xy, points[:, :, 2:]), axis=2)


def normalize_mean_center(points: jax.Array) -> jax.Array:
    """Subtract the per-cloud mean (ref models/SPH3D_ruemonge2014.py:11-17)."""
    return points - jnp.mean(points, axis=1, keepdims=True)


class SeparableConvBlock(fnn.Module):
    """A stack of separable convs sharing one neighborhood, named
    ``{name}_1, {name}_2, ...`` from 1 as the reference scopes them
    (ref models/SPH3D_modelnet.py:20-30)."""

    list_channels: tuple[int, ...]
    bin_size: int
    depth_multiplier: tuple[int, ...]
    config: SPH3DConfig
    window: int | None = None
    # point-axis sharding: set when ``nbh`` arrives tile-localized (see
    # SeparableConv3d — every conv in the stack halo-exchanges its input)
    point_axis: str | None = None
    halo_blocks: int = 0
    data_axis: str | None = None

    @fnn.compact
    def __call__(
        self,
        net: jax.Array,
        nbh: Neighborhood,
        filt_index: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        cfg = self.config
        conv_cls = SeparableConv3d
        if cfg.remat_blocks:
            # rematerialize activations in backward (train flag is static)
            conv_cls = fnn.remat(SeparableConv3d, static_argnums=(4,))
        for i, num_out in enumerate(self.list_channels):
            net = conv_cls(
                num_out_channels=num_out,
                bin_size=self.bin_size,
                depth_multiplier=self.depth_multiplier[i],
                with_bn=cfg.with_bn,
                with_bias=cfg.with_bias,
                dtype=cfg.dtype,
                window=self.window,
                point_axis=self.point_axis,
                halo_blocks=self.halo_blocks,
                data_axis=self.data_axis,
                name=f"_{i + 1}",
            )(net, nbh, filt_index, train)
        return net
