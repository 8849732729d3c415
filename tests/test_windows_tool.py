"""Window calibration tool: derived windows must certify on their own
sample (VERDICT r2 directive #5)."""

import dataclasses

import numpy as np

import jax

from sph3d_gcn_tpu.configs import SPH3DConfig
from sph3d_gcn_tpu.models import SPH3DSceneSeg
from sph3d_gcn_tpu.utils.windows import (
    derive_config_windows,
    measure_requirements,
    slab_requirement,
)


def _cfg():
    return SPH3DConfig(
        num_input=256, num_cls=4, mlp=8, num_sample=(64, 16),
        radius=(0.6, 1.2), nn_uplimit=(8, 8),
        channels=((8, 8), (8, 8)), multiplier=((1, 1), (1, 1)),
        weight_decay=None,
    )


def test_slab_requirement_exact():
    # a uniform line cloud: every 128-row tile at radius r needs exactly
    # the rows within [tile_min - r, tile_max + r]
    key = np.linspace(0.0, 10.0, 256)
    need = slab_requirement(key, key, 1.0)
    # tile spans 5.0 units (127 gaps * 10/255); radius 1 adds ~25.5 rows
    # per side; start rounds down to the tile block
    assert 128 + 26 <= need <= 256


def test_derived_windows_certify_on_sample():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    clouds = rng.standard_normal((4, cfg.num_input, 3)).astype(np.float32)

    reqs = measure_requirements(cfg, clouds)
    windows, dec_windows, dec_margin, growth = derive_config_windows(
        cfg, reqs, margin=0.05
    )
    dense_cfg = dataclasses.replace(
        cfg,
        spatial_sort=True,
        windows=windows,
        dec_windows=dec_windows,
        dec_margin=dec_margin,
        growth_steps=growth,
        dense_graph=True,
    )
    pts = np.concatenate(
        [clouds, rng.random((4, cfg.num_input, 6), np.float32)], axis=-1
    ).astype(np.float32)
    model = SPH3DSceneSeg(dense_cfg)
    variables = model.init(jax.random.key(0), pts[:2])
    _, inter = model.apply(variables, pts[:2], mutable=["intermediates"])
    (ok,) = inter["intermediates"]["backbone"]["dense_ok"]
    assert bool(ok), "tool-derived windows failed their own sample"


def test_derived_windows_respect_caps():
    cfg = _cfg()
    # absurd radii: requirements exceed the cloud — windows must clamp to
    # the padded cloud width, never beyond
    reqs = measure_requirements(
        cfg,
        np.random.default_rng(1)
        .standard_normal((2, cfg.num_input, 3))
        .astype(np.float32),
    )
    windows, dec_windows, _, _ = derive_config_windows(cfg, reqs, margin=5.0)
    assert windows[0] <= 256 and windows[1] <= 128
    assert dec_windows[0] <= 128 and dec_windows[1] <= 128
