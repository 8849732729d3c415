"""Layer library and graph builders (counterpart of the reference's
`utils/sph3gcn_util.py`)."""

from sph3d_gcn_tpu.nn.graph import (
    build_global_graph,
    build_graph,
    build_graph_deconv,
    gather_neighborhood,
    gather_points,
)
from sph3d_gcn_tpu.nn.layers import (
    BatchNorm,
    FullyConnected,
    PointwiseConv3d,
    SeparableConv3d,
    l2_regularization,
    pool3d,
    unpool3d,
)

__all__ = [
    "BatchNorm",
    "FullyConnected",
    "PointwiseConv3d",
    "SeparableConv3d",
    "build_global_graph",
    "build_graph",
    "build_graph_deconv",
    "gather_neighborhood",
    "gather_points",
    "l2_regularization",
    "pool3d",
    "unpool3d",
]
