#!/usr/bin/env python
"""Logit-parity harness vs the TF reference (SURVEY.md §7 step 7).

Given a converted TF1 checkpoint and a fixed input batch, runs our model in
eval mode and compares logits against reference outputs captured from the
TF1 codebase (saved as npz: {'points': (B,N,D), 'logits': (B,...)} —
produce them with a one-off script in the reference environment feeding the
same batch through `MODEL.get_model` with `is_training=False`).

Usage:
  python scripts/parity_check.py --model modelnet \
      --ckpt path/to/model.ckpt-198 --batch batch.npz [--rtol 1e-4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        choices=["modelnet", "s3dis", "scannet",
                                 "ruemonge2014", "shapenet_onehot"])
    parser.add_argument("--ckpt", required=True,
                        help="TF1 checkpoint prefix (model.ckpt-N)")
    parser.add_argument("--batch", required=True,
                        help="npz with 'points', 'logits' (+'cls_label')")
    parser.add_argument("--num_cls", type=int, default=None)
    parser.add_argument("--rtol", type=float, default=1e-4)
    parser.add_argument("--atol", type=float, default=1e-4)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()
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
