"""Learning-rate schedule and optimizers matching the reference drivers.

ref modelnet40_cls/train_modelnet.py:74-82 (exponential decay with staircase
on *samples seen*, clipped at 1e-6) and :179-182 (Adam eps 1e-8 or Nesterov
momentum). S3DIS uses Adam eps 1e-4 (ref s3dis_seg/train_s3dis.py:226).
"""

from __future__ import annotations

import optax

MIN_LEARNING_RATE = 1e-6  # ref train_modelnet.py:81


def exponential_decay_lr(
    base_lr: float = 0.001,
    batch_size: int = 32,
    decay_step: int = 250000,
    decay_rate: float = 0.7,
) -> optax.Schedule:
    """Staircase exponential decay on samples seen, floored at 1e-6.

    The reference decays on ``global_step * BATCH_SIZE`` against DECAY_STEP
    samples (ref train_modelnet.py:76-81); expressed per-step that is a
    transition every ``decay_step / batch_size`` steps.
    """

    inner = optax.exponential_decay(
        init_value=base_lr,
        transition_steps=max(1, decay_step // batch_size),
        decay_rate=decay_rate,
        staircase=True,
    )

    def schedule(count):
        return inner(count).clip(MIN_LEARNING_RATE)

    return schedule


def make_optimizer(
    optimizer: str = "adam",
    learning_rate: float | optax.Schedule = 0.001,
    momentum: float = 0.9,
    adam_epsilon: float = 1e-8,
    flatten: bool = True,
) -> optax.GradientTransformation:
    """'adam' (eps configurable) or Nesterov 'momentum'
    (ref train_modelnet.py:179-182).

    ``flatten`` wraps the (elementwise) transformation in
    ``optax.flatten``: the update runs on one raveled parameter vector
    instead of ~10^2 per-leaf tensors, collapsing the long tail of tiny
    XLA fusions the per-leaf update schedules on TPU. Semantically
    identical for Adam/SGD; only the optimizer-state layout changes
    (mu/nu are stored raveled), so checkpoints written either way only
    restore with the same setting.
    """
    if optimizer == "adam":
        tx = optax.adam(learning_rate, eps=adam_epsilon)
    elif optimizer == "momentum":
        tx = optax.sgd(learning_rate, momentum=momentum, nesterov=True)
    else:
        raise ValueError(f"Unknown optimizer {optimizer!r}")
    return optax.flatten(tx) if flatten else tx
