"""Training loops, schedules, and step factories."""

from sph3d_gcn_tpu.train.schedule import (
    MIN_LEARNING_RATE,
    exponential_decay_lr,
    make_optimizer,
)
from sph3d_gcn_tpu.train.steps import (
    StepFactory,
    TrainState,
    classification_step_factory,
    segmentation_step_factory,
)

__all__ = [
    "MIN_LEARNING_RATE",
    "StepFactory",
    "TrainState",
    "classification_step_factory",
    "exponential_decay_lr",
    "make_optimizer",
    "segmentation_step_factory",
]
