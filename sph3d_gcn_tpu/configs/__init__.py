"""Per-dataset architecture configs (counterparts of the reference's
`*_config.py` modules, SURVEY.md §2.4).

Each factory takes ``fast=True`` to enable the TPU throughput mode:
bfloat16 activations, per-cloud spatial sorting and the locality-windowed
edge engine (see ops/windowed.py — numerically a layout change plus bf16,
never a semantics change beyond the input reordering). The default
(``fast=False``) is the float32 reference-parity mode.
"""

import dataclasses

from sph3d_gcn_tpu.configs.base import SPH3DConfig


def _fast_mode(
    cfg: SPH3DConfig, windows: tuple[int, ...], dense: bool = False
) -> SPH3DConfig:
    kw = {}
    if dense:
        # the dense engine's bf16 activations + mask maps fit the 8192-pt
        # seg models in 16GB HBM without conv-block rematerialization —
        # skipping the backward recompute is worth ~17% on the seg step
        kw["remat_blocks"] = False
    return dataclasses.replace(
        cfg,
        compute_dtype="bfloat16",
        spatial_sort=True,
        windows=windows[: len(cfg.num_sample)],
        dense_graph=dense,
        **kw,
    )


def modelnet_config(
    num_input: int = 10000, fast: bool = False, dense: bool = False
) -> SPH3DConfig:
    """ref modelnet40_cls/modelnet_config.py:1-37."""
    num_sample = tuple(
        num_input // 4 ** (i + 1)
        for i in range(10)
        if num_input // 4 ** (i + 1) > 100
    )
    num_levels = len(num_sample)
    cfg = SPH3DConfig(
        num_input=num_input,
        num_cls=40,
        mlp=32,
        num_sample=num_sample,
        radius=(0.1, 0.2, 0.4)[:num_levels],
        nn_uplimit=(64,) * num_levels,
        channels=((64, 64), (64, 128), (128, 128))[:num_levels],
        multiplier=((2, 1), (1, 2), (1, 1))[:num_levels],
        weight_decay=1e-5,
        kernel=(8, 2, 2),
        normalize=True,
        pool_method="max",
        sample="FPS",
        use_raw=True,
        with_bn=True,
        with_bias=False,
        global_channels=512,
        global_multiplier=2,
    )
    if fast:
        # Per-level row windows measured on axis-sorted unit-sphere
        # surfaces incl. bump-modulated ellipsoids (worst measured slabs
        # 1792 / 1152 / 640 incl. the 128-row tile quantum) plus margin;
        # pool windows derive from these (SPH3DConfig.pool_window). The
        # dense engine certifies coverage per step (dense_ok), so an
        # exotic shape that exceeds these windows is reported, not
        # silently wrong.
        cfg = _fast_mode(cfg, (1920, 1280, 768), dense=dense)
    return cfg


def shapenet_config(
    num_input: int = 2048, fast: bool = False, dense: bool = False
) -> SPH3DConfig:
    """ref shapenet_seg/shapenet_config.py:1-24 (num_cls is per-category and
    passed to the model separately)."""
    cfg = SPH3DConfig(
        num_input=num_input,
        num_cls=50,  # onehot variant; per-category nets pass their own
        mlp=64,
        num_sample=(1024, 768, 384, 128),
        radius=(0.08, 0.16, 0.32, 0.64),
        nn_uplimit=(64, 64, 64, 64),
        channels=((128, 128), (256, 256), (256, 256), (512, 512)),
        multiplier=((2, 2), (2, 2), (2, 2), (2, 2)),
        weight_decay=None,
        kernel=(8, 2, 2),
        normalize=False,
        pool_method="max",
        unpool_method="mean",
        sample="FPS",
        with_bn=True,
        with_bias=False,
    )
    if fast:
        cfg = _fast_mode(cfg, (512, 512, 512, 384), dense=dense)
    return cfg


def _scene_seg_config(
    num_cls: int, num_input: int = 8192, fast: bool = False,
    dense: bool = False,
) -> SPH3DConfig:
    # Reference pyramid at 8192 points; scaled proportionally for smaller
    # inputs (test/debug sizes only — 8192 is the reference setting).
    base = (2048, 768, 384, 128)
    if num_input != 8192:
        base = tuple(max(2, s * num_input // 8192) for s in base)
    cfg = SPH3DConfig(
        num_input=num_input,
        num_cls=num_cls,
        mlp=64,
        num_sample=base,
        radius=(0.1, 0.2, 0.4, 0.8),
        nn_uplimit=(64, 64, 64, 64),
        channels=((128, 128), (256, 256), (256, 256), (512, 512)),
        multiplier=((2, 2), (2, 2), (2, 2), (2, 2)),
        weight_decay=None,
        kernel=(8, 2, 2),
        normalize=True,
        pool_method="max",
        unpool_method="mean",
        sample="FPS",
        with_bn=True,
        with_bias=False,
        # full-size seg models need activation remat to fit 16GB HBM at B=16
        remat_blocks=(num_input >= 4096),
    )
    if fast:
        # 1.5m scene blocks with dominant floor/wall planes: the sort axis
        # is occupancy-chosen (ops/locality.py), worst measured slab ~1100
        # rows at N=8192, r=0.1, plus margin; scaled by num_input.
        win = tuple(
            min(-(-w * num_input // 8192 // 128) * 128, 8192)
            for w in (1792, 896, 768, 384)
        )
        cfg = _fast_mode(cfg, win, dense=dense)
    return cfg


def scannet_config(
    num_input: int = 8192, fast: bool = False, dense: bool = False
) -> SPH3DConfig:
    """ref scannet_seg/scannet_config.py:1-26."""
    return _scene_seg_config(
        num_cls=21, num_input=num_input, fast=fast, dense=dense
    )


def s3dis_config(
    num_input: int = 8192, fast: bool = False, dense: bool = False
) -> SPH3DConfig:
    """ref s3dis_seg/s3dis_config.py:1-26."""
    return _scene_seg_config(
        num_cls=13, num_input=num_input, fast=fast, dense=dense
    )


def ruemonge2014_config(
    num_input: int = 8192, fast: bool = False, dense: bool = False
) -> SPH3DConfig:
    """ref ruemonge2014_seg/ruemonge2014_config.py:1-26."""
    return _scene_seg_config(
        num_cls=7, num_input=num_input, fast=fast, dense=dense
    )


__all__ = [
    "SPH3DConfig",
    "modelnet_config",
    "ruemonge2014_config",
    "s3dis_config",
    "scannet_config",
    "shapenet_config",
]
