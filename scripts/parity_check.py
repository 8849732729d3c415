#!/usr/bin/env python
"""Logit-parity harness vs the TF reference (SURVEY.md §7 step 7).

Two modes:

1. Checkpoint mode: given a converted TF1 checkpoint and a fixed input
   batch, runs our model in eval mode and compares logits against reference
   outputs captured from the TF1 codebase (saved as npz:
   {'points': (B,N,D), 'logits': (B,...)} — produce them with a one-off
   script in the reference environment feeding the same batch through
   `MODEL.get_model` with `is_training=False`).

2. ``--oracle`` mode (no TF needed): initializes the model, then runs the
   SAME parameters through (a) the JAX model and (b) the pure-NumPy
   reference forward built from the CUDA-semantics oracle ops
   (scripts/numpy_reference.py, validated against ops/_ref.py) on a fixed
   synthetic batch at the real full-scale config. This proves the full
   forward stack — query quirks, bins, conv/pool/unpool, BN-after-ELU
   ordering — end-to-end against an independent implementation.

Usage:
  python scripts/parity_check.py --model modelnet \
      --ckpt path/to/model.ckpt-198 --batch batch.npz [--rtol 1e-4]
  python scripts/parity_check.py --model modelnet --oracle \
      [--num_input 10000] [--batch_size 2] [--platform cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def oracle_mode(args):
    """Full-scale logit parity: JAX model vs the NumPy oracle forward."""
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import time

    import jax

    import numpy_reference as npref
    from sph3d_gcn_tpu.configs import modelnet_config, s3dis_config
    from sph3d_gcn_tpu.models import SPH3DModelNet, SPH3DSceneSeg

    rng = np.random.default_rng(0)
    b = args.batch_size
    if args.model == "modelnet":
        n = args.num_input or 10000
        cfg = modelnet_config(num_input=n)
        model = SPH3DModelNet(cfg)
        # ellipsoid surface clouds: ModelNet-like geometry
        v = rng.standard_normal((b, n, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        points = v * rng.uniform(0.3, 1.0, (b, 1, 3)).astype(np.float32)
        np_forward = npref.forward_modelnet
    elif args.model == "s3dis":
        n = args.num_input or 8192
        cfg = s3dis_config(num_input=n)
        model = SPH3DSceneSeg(cfg)
        # 1.5m scene blocks: xyz + rel_xyz + rgb
        xyz = rng.uniform(0.0, 1.5, (b, n, 3)).astype(np.float32)
        xyz[..., 2] *= 2.0  # rooms are taller than wide
        rel = rng.uniform(-1.0, 1.0, (b, n, 3)).astype(np.float32)
        rgb = rng.uniform(-1.0, 1.0, (b, n, 3)).astype(np.float32)
        points = np.concatenate([xyz, rel, rgb], axis=-1)
        np_forward = npref.forward_scene_seg
    else:
        raise SystemExit(f"--oracle supports modelnet/s3dis, not {args.model}")

    print(f"[{args.model}] init at B={b} N={n} ...", flush=True)
    t0 = time.perf_counter()
    # jit the init: eager per-op compiles at 10k points cost ~8 min over
    # the relay vs ~20s jitted (CLAUDE.md gotcha)
    variables = jax.jit(
        lambda key, pts: model.init(key, pts, train=False)
    )(jax.random.key(0), points)
    logits = np.asarray(
        jax.jit(lambda v, pts: model.apply(v, pts, train=False))(
            variables, points
        )
    )
    print(f"[{args.model}] jax forward done ({time.perf_counter()-t0:.0f}s)",
          flush=True)
    t0 = time.perf_counter()
    ref_logits = np_forward(jax.tree.map(np.asarray, variables), cfg, points)
    print(f"[{args.model}] numpy oracle forward done "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    diff = np.abs(logits - ref_logits)
    denom = np.maximum(np.abs(ref_logits), 1e-6)
    print(f"max abs diff:  {diff.max():.3e}")
    print(f"max rel diff:  {(diff / denom).max():.3e}")
    print(f"argmax agreement: "
          f"{(logits.argmax(-1) == ref_logits.argmax(-1)).mean():.4f}")
    ok = np.allclose(logits, ref_logits, rtol=args.rtol, atol=args.atol)
    print(f"PARITY[{args.model}, oracle, N={n}]:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        choices=["modelnet", "s3dis", "scannet",
                                 "ruemonge2014", "shapenet_onehot"])
    parser.add_argument("--ckpt", default=None,
                        help="TF1 checkpoint prefix (model.ckpt-N)")
    parser.add_argument("--batch", default=None,
                        help="npz with 'points', 'logits' (+'cls_label')")
    parser.add_argument("--oracle", action="store_true",
                        help="compare vs the NumPy oracle forward instead "
                             "of a TF checkpoint")
    parser.add_argument("--num_input", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--num_cls", type=int, default=None)
    parser.add_argument("--rtol", type=float, default=1e-4)
    parser.add_argument("--atol", type=float, default=1e-4)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()
    if args.oracle:
        return oracle_mode(args)
    if not args.ckpt or not args.batch:
        parser.error("--ckpt and --batch are required without --oracle")
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from sph3d_gcn_tpu.configs import (
        modelnet_config,
        ruemonge2014_config,
        s3dis_config,
        scannet_config,
        shapenet_config,
    )
    from sph3d_gcn_tpu.models import (
        SPH3DModelNet,
        SPH3DRueMonge,
        SPH3DSceneSeg,
        SPH3DShapeNetOnehot,
    )
    from sph3d_gcn_tpu.utils.checkpoint_convert import convert_checkpoint

    data = np.load(args.batch)
    points = data["points"].astype(np.float32)
    ref_logits = data["logits"]

    if args.model == "modelnet":
        cfg = modelnet_config(num_input=points.shape[1])
        model = SPH3DModelNet(cfg)
        extra = ()
    elif args.model == "s3dis":
        cfg = s3dis_config(num_input=points.shape[1])
        model = SPH3DSceneSeg(cfg)
        extra = ()
    elif args.model == "scannet":
        cfg = scannet_config(num_input=points.shape[1])
        model = SPH3DSceneSeg(cfg)
        extra = ()
    elif args.model == "ruemonge2014":
        cfg = ruemonge2014_config(num_input=points.shape[1])
        model = SPH3DRueMonge(cfg)
        extra = ()
    else:
        cfg = shapenet_config(num_input=points.shape[1])
        model = SPH3DShapeNetOnehot(cfg, num_cls=50)
        extra = (data["cls_label"].astype(np.int32),)

    variables = model.init(jax.random.key(0), points, *extra, train=False)
    variables = convert_checkpoint(variables, args.ckpt)
    logits = np.asarray(model.apply(variables, points, *extra, train=False))

    diff = np.abs(logits - ref_logits)
    denom = np.maximum(np.abs(ref_logits), 1e-6)
    print(f"max abs diff:  {diff.max():.3e}")
    print(f"max rel diff:  {(diff / denom).max():.3e}")
    print(f"argmax agreement: "
          f"{(logits.argmax(-1) == ref_logits.argmax(-1)).mean():.4f}")
    ok = np.allclose(logits, ref_logits, rtol=args.rtol, atol=args.atol)
    print("PARITY:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
