#!/usr/bin/env python
"""Calibrate dense-engine windows for a dataset (VERDICT r2 directive #5).

Measures, on sample clouds (synthetic families or real data files), the
exact per-level slab widths every graph of the model pyramid needs for
the dense engine's coverage certificate to hold — encoder intra, pooling,
decoder intra, decoder inter including +0.05 radius growth — and derives
the smallest ``SPH3DConfig.windows`` / ``dec_margin`` / ``growth_steps``
that cover them with a safety margin. Replaces the round-2 hand-measured
constants (configs/__init__.py).

Usage:
  python scripts/measure_windows.py --dataset modelnet [--samples 64]
  python scripts/measure_windows.py --dataset s3dis --data blocks.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bumpy_ellipsoids(rng, batch, n, amplitude=0.1):
    """Ellipsoid surfaces with sinusoidal bump modulation (CAD scans have
    surface detail that concentrates sorted-row slabs; plain ellipsoids
    under-estimate). ``amplitude`` sets how deep the folds go — the
    shipped config windows are calibrated at 0.1 (the synthetic-learning
    family); raise it (or pass --data with real clouds) to trade
    throughput for more coverage headroom. An undersized window is SAFE
    either way: the per-step certificate flags it and training/eval
    transparently re-run the batch through the exact classic engine
    (train/loop.py, train/eval.py)."""
    v = rng.standard_normal((batch, n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    freq = rng.uniform(2.0, 6.0, (batch, 1, 3)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, (batch, 1, 3)).astype(np.float32)
    bump = 1.0 + amplitude * np.sin(freq * v + phase).sum(-1, keepdims=True)
    axes = rng.uniform(0.3, 1.0, (batch, 1, 3)).astype(np.float32)
    pts = v * bump * axes
    # unit-sphere normalize like the ModelNet loader (SPH3D_modelnet.py:11)
    pts /= np.abs(pts).max(axis=(1, 2), keepdims=True)
    return pts


def scene_blocks_worst(rng, batch, n):
    """Scene worst case: 1.5m blocks with a dominant floor/wall plane
    (concentrates half the cloud in one thin slab of two of the axes)."""
    pts = np.empty((batch, n, 3), np.float32)
    for b in range(batch):
        n_plane = int(n * rng.uniform(0.3, 0.6))
        plane = rng.uniform(0, 1.5, (n_plane, 3)).astype(np.float32)
        axis = rng.integers(0, 3)
        plane[:, axis] = rng.normal(0.02, 0.01, n_plane)
        rest = rng.uniform(0, 1.5, (n - n_plane, 3)).astype(np.float32)
        rest[:, 2] *= 2.0
        pts[b] = np.concatenate([plane, rest])
    return pts


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True,
                        choices=["modelnet", "shapenet", "s3dis", "scannet",
                                 "ruemonge2014"])
    parser.add_argument("--samples", type=int, default=32,
                        help="number of synthetic clouds to measure")
    parser.add_argument("--data", default=None,
                        help="npz with a (B, N, 3+) 'points' array of real "
                             "clouds (overrides the synthetic family)")
    parser.add_argument("--margin", type=float, default=0.10,
                        help="headroom multiplier on measured worst slabs")
    parser.add_argument("--family", default="union",
                        choices=["plain", "hard", "union"],
                        help="synthetic cloud family: 'plain' = the bench "
                             "generators, 'hard' = bump-modulated / "
                             "plane-heavy worst cases, 'union' = both")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from sph3d_gcn_tpu import configs
    from sph3d_gcn_tpu.utils.windows import (
        derive_config_windows,
        measure_requirements,
    )

    cfg = getattr(configs, f"{args.dataset}_config")()
    rng = np.random.default_rng(args.seed)
    if args.data:
        clouds = np.load(args.data)["points"][..., :3]
        clouds = clouds[:, : cfg.num_input]
    elif args.dataset in ("modelnet", "shapenet"):
        from bench import surface_clouds

        fams = []
        if args.family in ("hard", "union"):
            fams.append(bumpy_ellipsoids(rng, args.samples, cfg.num_input))
        if args.family in ("plain", "union"):
            fams.append(surface_clouds(rng, args.samples, cfg.num_input))
        clouds = np.concatenate(fams)
    else:
        from bench import scene_blocks

        fams = []
        if args.family in ("hard", "union"):
            fams.append(
                scene_blocks_worst(rng, args.samples, cfg.num_input)
            )
        if args.family in ("plain", "union"):
            fams.append(
                scene_blocks(rng, args.samples, cfg.num_input)[..., :3]
            )
        clouds = np.concatenate(fams)

    if args.dataset in ("modelnet", "shapenet"):
        # these models build graphs on unit-sphere-normalized coords
        # (models/modelnet.py:62; ShapeNet data is normalized offline) —
        # measuring raw clouds overstates slabs for small shapes
        import jax.numpy as jnp

        from sph3d_gcn_tpu.models.common import normalize_unit_sphere

        clouds = np.asarray(normalize_unit_sphere(jnp.asarray(clouds)))

    reqs = measure_requirements(cfg, clouds)
    print(f"measured over {len(clouds)} clouds of {clouds.shape[1]} points:")
    for level, r in enumerate(reqs):
        print(
            f"  level {level}: enc {r.enc:5d}  pool {r.pool:5d}  "
            f"dec {r.dec:5d}  dec_inter {r.dec_inter:5d}  "
            f"growth {r.growth}"
        )
    windows, dec_windows, dec_margin, growth = derive_config_windows(
        cfg, reqs, margin=args.margin
    )
    print(f"\nderived (margin {args.margin:.0%}):")
    print(f"  windows      = {windows}")
    print(f"  dec_windows  = {dec_windows}")
    print(f"  dec_margin   = {dec_margin}")
    print(f"  growth_steps = {growth}")
    import dataclasses

    probe = dataclasses.replace(
        cfg, windows=windows, dec_windows=dec_windows, spatial_sort=True
    )
    print("  derived graph windows per level:")
    for level in range(len(windows)):
        print(
            f"    level {level}: enc {probe.enc_window(level):5d}  "
            f"pool {probe.pool_window(level):5d}  "
            f"dec {probe.dec_window(level):5d}  "
            f"dec_inter {probe.dec_window(level) + dec_margin:5d}"
        )


if __name__ == "__main__":
    main()
