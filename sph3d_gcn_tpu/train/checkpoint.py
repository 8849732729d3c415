"""Orbax checkpointing with the reference's save/resume behavior.

Mirrors the reference's ``tf.train.Saver(max_to_keep=500)`` per-epoch
checkpoints with auto-resume from the latest one
(ref train_modelnet.py:188,214-224,236-239,254). The log-dir also gets a
config snapshot (the reference copies the model/config .py files,
ref train_modelnet.py:53-55) so an eval run always matches the graph that
produced the checkpoint.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import orbax.checkpoint as ocp


class Checkpointer:
    """Per-epoch checkpoint save/restore over a TrainState pytree."""

    def __init__(self, log_dir: str | os.PathLike, max_to_keep: int = 500):
        self._dir = os.path.abspath(log_dir)
        os.makedirs(self._dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            os.path.join(self._dir, "ckpt"),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, epoch: int, state: Any) -> None:
        """Blocking per-epoch save (ref train_modelnet.py:254)."""
        self._mngr.save(epoch, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()

    def latest_epoch(self) -> int | None:
        """Latest saved epoch, or None (ref tf.train.latest_checkpoint use)."""
        return self._mngr.latest_step()

    def restore(self, state_template: Any, epoch: int | None = None) -> Any:
        """Restore into the structure of ``state_template``."""
        if epoch is None:
            epoch = self._mngr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        return self._mngr.restore(
            epoch, args=ocp.args.StandardRestore(state_template)
        )

    def restore_variables(self, state_template: Any, epoch: int | None = None):
        """Restore only params/batch_stats into ``state_template`` — for
        evaluation, where the optimizer need not match the one used in
        training (the reference likewise restores variables only,
        ref evaluate_modelnet.py:135)."""
        if epoch is None:
            epoch = self._mngr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        raw = self._mngr.restore(epoch)  # stored tree as plain dicts
        return state_template.replace(
            params=raw["params"], batch_stats=raw["batch_stats"]
        )

    def close(self) -> None:
        self._mngr.close()


def snapshot_config(log_dir: str | os.PathLike, config: Any) -> None:
    """Write the architecture config as JSON into the log dir (the
    reference's .py-copy trick, ref train_modelnet.py:53-55)."""
    os.makedirs(log_dir, exist_ok=True)
    payload = dataclasses.asdict(config)
    with open(os.path.join(log_dir, "config.json"), "w") as f:
        json.dump(payload, f, indent=2)


def load_config_snapshot(log_dir: str | os.PathLike):
    """Rebuild the SPH3DConfig saved by ``snapshot_config`` (the eval-time
    architecture reload, ref evaluate_modelnet.py:35-46)."""
    from sph3d_gcn_tpu.configs.base import SPH3DConfig

    with open(os.path.join(log_dir, "config.json")) as f:
        payload = json.load(f)
    # JSON turns tuples into lists; restore tuples for the frozen dataclass.
    for key, value in payload.items():
        if isinstance(value, list):
            payload[key] = tuple(
                tuple(v) if isinstance(v, list) else v for v in value
            )
    return SPH3DConfig(**payload)
