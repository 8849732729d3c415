"""SPH3D model families (counterparts of the reference's `models/`)."""

from sph3d_gcn_tpu.models.modelnet import SPH3DModelNet, classification_loss
from sph3d_gcn_tpu.models.segmentation import (
    SPH3DRueMonge,
    SPH3DSceneSeg,
    SPH3DShapeNet,
    SPH3DShapeNetOnehot,
    inner_masked_segmentation_loss,
    segmentation_loss,
)

__all__ = [
    "SPH3DModelNet",
    "SPH3DRueMonge",
    "SPH3DSceneSeg",
    "SPH3DShapeNet",
    "SPH3DShapeNetOnehot",
    "classification_loss",
    "inner_masked_segmentation_loss",
    "segmentation_loss",
]
