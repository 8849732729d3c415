"""TF1 checkpoint -> Flax variables converter.

The reference saves TF1 checkpoints with variable names following the
scoping in `utils/sph3gcn_util.py` (e.g. ``conv1_1/depthwise_weights``,
``conv1_1/weights``, ``conv1_2/bn/gamma``, ``fc1/weights``,
``logits/weights``; see :125-161,328-332) — SURVEY.md §5 requires these to
be convertible into the new parameter tree.

Shape conventions transfer directly: pointwise/fc kernels are (in, out),
depthwise filters are (bin_size, in, multiplier), BN gamma/beta/moving_mean/
moving_variance are (channels,).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _tf_name_for_path(path: tuple[str, ...]) -> tuple[str, str] | None:
    """Map a Flax variable path to (tf_variable_name, collection).

    Returns None for paths with no TF counterpart. ``collection`` is
    'params' or 'batch_stats' (informational).
    """
    parts = [p for p in path if p not in ("backbone", "params", "batch_stats")]
    leaf = parts[-1]
    scope = parts[:-1]

    # Collapse the conv-block nesting: conv1/_2 -> conv1_2.
    flat: list[str] = []
    for p in scope:
        if p.startswith("_") and flat:
            flat[-1] = flat[-1] + p
        else:
            flat.append(p)

    # BatchNorm: ours nests bn/BatchNorm_0/{scale,bias,mean,var}.
    if "bn" in flat:
        bn_i = flat.index("bn")
        prefix = "/".join(flat[:bn_i])
        name_map = {
            "scale": "gamma",
            "bias": "beta",
            "mean": "moving_mean",
            "var": "moving_variance",
        }
        if leaf not in name_map:
            return None
        coll = "params" if leaf in ("scale", "bias") else "batch_stats"
        return f"{prefix}/bn/{name_map[leaf]}", coll

    if leaf in ("weights", "depthwise_weights", "biases"):
        return "/".join(flat + [leaf]), "params"
    return None


def convert_tf_variables(
    variables_template: Any, tf_vars: dict[str, np.ndarray]
) -> Any:
    """Fill a Flax variables pytree (as produced by ``model.init``) from a
    {tf_name: array} mapping.

    Raises KeyError listing any model variable missing from the checkpoint
    and ValueError on shape mismatches.
    """
    missing: list[str] = []

    def fill(path, leaf):
        names = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        mapped = _tf_name_for_path(names)
        if mapped is None:
            return leaf
        tf_name, _ = mapped
        if tf_name not in tf_vars:
            missing.append(tf_name)
            return leaf
        value = np.asarray(tf_vars[tf_name])
        if value.shape != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {tf_name}: checkpoint "
                f"{value.shape} vs model {tuple(leaf.shape)}"
            )
        return value.astype(np.asarray(leaf).dtype)

    out = jax.tree_util.tree_map_with_path(fill, variables_template)
    if missing:
        raise KeyError(
            "checkpoint is missing variables: " + ", ".join(sorted(missing))
        )
    return out


def load_tf_checkpoint(ckpt_path: str) -> dict[str, np.ndarray]:
    """Read all variables of a TF1 checkpoint into {name: array}.

    Pure Python — parses the TF1 tensor-bundle format directly
    (utils/tf1_bundle.py), so conversion runs without TensorFlow the
    moment a reference ``model.ckpt-*`` appears.
    """
    from sph3d_gcn_tpu.utils.tf1_bundle import read_bundle

    out = {}
    for name, value in read_bundle(ckpt_path).items():
        # strip optimizer slots (Adam/Momentum accumulators)
        if any(s in name for s in ("/Adam", "/Momentum", "beta1_power",
                                   "beta2_power", "global_step")):
            continue
        out[name] = value
    return out


def convert_checkpoint(variables_template: Any, ckpt_path: str) -> Any:
    """One-call conversion: TF1 checkpoint file -> Flax variables."""
    return convert_tf_variables(variables_template, load_tf_checkpoint(ckpt_path))
