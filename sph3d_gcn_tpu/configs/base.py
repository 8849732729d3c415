"""Immutable model configuration.

The reference configures each dataset with a free-standing module of
constants (e.g. `modelnet40_cls/modelnet_config.py`) and some models mutate
the lists in place (``config.radius.reverse()``,
ref models/SPH3D_s3dis.py:79-84) — a trap for re-runs. Here configs are
frozen dataclasses with tuples; decoders index reversed *copies*.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Literal


@dataclasses.dataclass(frozen=True)
class SPH3DConfig:
    """Architecture config shared by all SPH3D model families.

    Field names match the reference config modules (SURVEY.md §2.4).
    """

    num_input: int
    num_cls: int
    mlp: int
    num_sample: tuple[int, ...]
    radius: tuple[float, ...]
    nn_uplimit: tuple[int, ...]
    channels: tuple[tuple[int, ...], ...]
    multiplier: tuple[tuple[int, ...], ...]
    weight_decay: float | None
    kernel: tuple[int, int, int] = (8, 2, 2)
    normalize: bool = True
    pool_method: Literal["max", "avg"] = "max"
    unpool_method: Literal["mean", "weighted"] = "mean"
    nnsearch: Literal["sphere", "cube"] = "sphere"
    sample: Literal["FPS", "IDS", "random"] = "FPS"
    use_raw: bool = False
    with_bn: bool = True
    with_bias: bool = False
    # classification-only global-layer settings (ref modelnet_config.py:21-23)
    global_channels: int | None = None
    global_multiplier: int | None = None
    # segmentation-only classifier MLP (ref shapenet_config.py mlp2)
    mlp2: int | None = None
    num_parts: int | None = None  # ShapeNet per-category part count
    # 'float32' (reference parity) or 'bfloat16' (MXU-native training mode;
    # graph construction and BN statistics stay f32 either way)
    compute_dtype: str = "float32"
    # rematerialize conv blocks in backward (trades ~30% conv FLOPs for
    # activation memory; needed for the 8192-point seg models at batch 16)
    remat_blocks: bool = False

    @property
    def dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def bin_size(self) -> int:
        """n*p*q + 1, bin 0 reserved for the self-loop
        (ref modelnet_config.py:27-28)."""
        return int(math.prod(self.kernel)) + 1

    def __post_init__(self) -> None:
        num_levels = len(self.num_sample)
        for field in ("radius", "nn_uplimit", "channels", "multiplier"):
            if len(getattr(self, field)) != num_levels:
                raise ValueError(
                    f"{field} must have {num_levels} entries (one per level), "
                    f"got {len(getattr(self, field))}"
                )
