"""Core point-cloud operators (TPU-native equivalents of the reference's
six CUDA ops, SURVEY.md §2.1)."""

from sph3d_gcn_tpu.ops.conv import depthwise_conv3d
from sph3d_gcn_tpu.ops.kernelbin import spherical_kernel
from sph3d_gcn_tpu.ops.neighbor import build_cube_neighbor, build_sphere_neighbor
from sph3d_gcn_tpu.ops.pool import avg_pool3d, max_pool3d
from sph3d_gcn_tpu.ops.sample import (
    farthest_point_sample,
    inverse_density_sample,
    random_sample,
)
from sph3d_gcn_tpu.ops.types import CubeNeighborhood, Neighborhood
from sph3d_gcn_tpu.ops.unpool import mean_interpolate, weighted_interpolate
from sph3d_gcn_tpu.ops.windowed import windowed_gather

__all__ = [
    "CubeNeighborhood",
    "Neighborhood",
    "avg_pool3d",
    "build_cube_neighbor",
    "build_sphere_neighbor",
    "depthwise_conv3d",
    "farthest_point_sample",
    "inverse_density_sample",
    "max_pool3d",
    "mean_interpolate",
    "random_sample",
    "spherical_kernel",
    "weighted_interpolate",
    "windowed_gather",
]
