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
    # Sort each input cloud along a per-cloud spatial axis so neighbor
    # indices cluster into narrow row windows (ops/locality.py). Pure input
    # permutation — per-point outputs are un-permuted back. Order-dependent
    # reference semantics (first-K selection, FPS seed) then apply to the
    # sorted order; disable for checkpoint-parity evaluation.
    spatial_sort: bool = False
    # Per-encoder-level row-window widths for the windowed edge engine
    # (ops/windowed.py); None disables it. Windows are a layout hint only:
    # an undersized window falls back to the exact plain-gather path.
    windows: tuple[int, ...] | None = None
    # rematerialize conv blocks in backward (trades ~30% conv FLOPs for
    # activation memory; needed for the 8192-point seg models at batch 16)
    remat_blocks: bool = False
    # Calibrated per-level decoder-graph windows (rows over the SAMPLED
    # cloud of each level); None falls back to scaling `windows` by the
    # subsampling ratio. Derived by scripts/measure_windows.py.
    dec_windows: tuple[int, ...] | None = None
    # Decoder-inter window headroom (rows beyond dec_window) for the
    # +0.05-grown radii, and the max dense growth steps reproduced
    # in-window (ref tf_nnquery_gpu.cu:30-60; rows needing more flip the
    # dense_ok certificate). Derived per dataset by
    # scripts/measure_windows.py.
    dec_margin: int = 384
    growth_steps: int = 12
    # Dense windowed engine (ops/dense.py): the level graphs are built as
    # (tile x window) mask/bin maps with NO per-edge index lists; conv,
    # pool and unpool consume the maps directly as MXU matmuls / masked
    # reductions. Requires spatial_sort and windows. Exactness is checked
    # per graph (DenseNeighborhood.ok, sown as 'dense_ok') — the windows
    # in the shipped configs carry measured margins.
    dense_graph: bool = False
    # Point-axis (spatial) sharding: the name of a mesh axis the model is
    # being shard_map'ed over (parallel/spatial.py). Sorting + graph
    # construction run replicated (coordinates are tiny); the feature
    # path shards each shardable level's rows with halo exchanges over
    # ICI and gathers logits at the end, so the model's external contract
    # is unchanged. Requires dense_graph; segmentation backbones only.
    point_axis: str | None = None
    # Batch ('data') mesh axis name when the step is shard_map'ed over a
    # composed ('data', 'points') mesh: the models need it only to sync
    # BatchNorm statistics across batch shards (row logic is untouched —
    # each shard simply sees fewer batch items). Set together with
    # point_axis by the step factories; GSPMD data parallelism (mesh=
    # without point_axis) does NOT use this.
    data_axis: str | None = None
    # Halo width multiplier for the INTER-level (pool/unpool) halo
    # exchanges under point-axis sharding. Intra-level halos are provably
    # sufficient at 1x (a self-graph window always contains the tile's own
    # rows); inter-level windows live in the OTHER cloud's row coordinates,
    # where a skewed point distribution can push a window past the 1x halo
    # (reported per step as halo_ok=False). fit() retries such batches
    # with a 2x-halo clone of the step before dropping to the unsharded
    # classic engine (StepFactory.halo_widened).
    halo_scale: int = 1

    @property
    def dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def enc_window(self, level: int) -> int | None:
        """Row window for encoder level ``level`` (cloud size N_level)."""
        return None if self.windows is None else self.windows[level]

    def pool_window(self, level: int) -> int | None:
        """Row window for the pooling edges of ``level``.

        Pool queries are the SAMPLED points: a 128-row query tile of
        coarse points spans ~128 * N/S rows of the fine cloud, so the
        window needs that much extra room beyond the conv window.
        """
        w = self.enc_window(level)
        if w is None:
            return None
        n_l = self.num_input if level == 0 else self.num_sample[level - 1]
        s_l = self.num_sample[level]
        extra = 128 * (-(-n_l // s_l) - 1)
        return w + (-(-extra // 128) * 128 if extra else 0)

    def dec_window(self, level: int) -> int | None:
        """Row window for the decoder pass of original level ``level``.

        Prefers the calibrated ``dec_windows`` table
        (scripts/measure_windows.py). The fallback formula scales the
        encoder window by the subsampling ratio — decoder edges search
        the SAMPLED cloud — but under-counts the constant 128-row tile
        span, so calibrated tables are both tighter AND safer.
        """
        if self.windows is None:
            return None
        if self.dec_windows is not None:
            return self.dec_windows[level]
        n_l = self.num_input if level == 0 else self.num_sample[level - 1]
        s_l = self.num_sample[level]
        w = -(-self.windows[level] * s_l // n_l)
        return -(-w // 128) * 128

    @property
    def bin_size(self) -> int:
        """n*p*q + 1, bin 0 reserved for the self-loop
        (ref modelnet_config.py:27-28)."""
        return int(math.prod(self.kernel)) + 1

    def __post_init__(self) -> None:
        num_levels = len(self.num_sample)
        if self.dense_graph and (self.windows is None or not self.spatial_sort):
            raise ValueError(
                "dense_graph requires spatial_sort=True and per-level windows"
            )
        if self.point_axis is not None and not self.dense_graph:
            raise ValueError(
                "point_axis sharding requires the dense windowed engine "
                "(dense_graph=True)"
            )
        if self.windows is not None and len(self.windows) != num_levels:
            raise ValueError(
                f"windows must have {num_levels} entries, got "
                f"{len(self.windows)}"
            )
        if (
            self.dec_windows is not None
            and len(self.dec_windows) != num_levels
        ):
            raise ValueError(
                f"dec_windows must have {num_levels} entries, got "
                f"{len(self.dec_windows)}"
            )
        for field in ("radius", "nn_uplimit", "channels", "multiplier"):
            if len(getattr(self, field)) != num_levels:
                raise ValueError(
                    f"{field} must have {num_levels} entries (one per level), "
                    f"got {len(getattr(self, field))}"
                )
        if len(self.kernel) != 3 or any(k < 1 for k in self.kernel):
            raise ValueError(
                f"kernel must be three positive ints (n, p, q), got "
                f"{self.kernel!r}"
            )
        if self.sample not in ("FPS", "IDS", "random"):
            raise ValueError(
                f"Unknown sampling method: {self.sample!r} "
                "(expected 'FPS', 'IDS' or 'random')"
            )
