#!/usr/bin/env python
"""ShapeNet part-segmentation training (counterpart of
`shapenet_seg/train_shapenet.py` and `train_shapenet_onehot.py`).

``--category`` trains a per-category net on that category's shapes with the
reference's class-rebalancing (file list repeated ``640/class_size + 1``
times, ref train_shapenet.py:33-35,83-90, DECAY_STEP = class_size*36);
``--onehot`` trains the 16-category/50-part variant with the category
one-hot input and fixed decay 320000 (ref train_shapenet_onehot.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPENET_CATEGORIES = [
    "airplane", "bag", "cap", "car", "chair", "earphone", "guitar", "knife",
    "lamp", "laptop", "motorbike", "mug", "pistol", "rocket", "skateboard",
    "table",
]
# per-category part counts (50 global parts over 16 categories)
NUM_PARTS = [4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--category", default=None,
                        help="per-category net (omit with --onehot)")
    parser.add_argument("--onehot", action="store_true")
    parser.add_argument("--log_dir", default=None)
    parser.add_argument("--max_epoch", type=int, default=201)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--learning_rate", type=float, default=0.001)
    parser.add_argument("--optimizer", default="adam")
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--decay_rate", type=float, default=0.7)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--mode", default="parity",
                        choices=["parity", "fast", "dense"],
                        help="engine: 'parity' = f32 reference-parity, "
                             "'fast' = bf16 + locality-windowed edges, "
                             "'dense' = bf16 + dense windowed engine "
                             "(fastest; exactness certified per step)")
    parser.add_argument("--point_devices", type=int, default=None,
                        help="point-axis (spatial) sharding device count "
                             "(dense mode; shards each cloud's rows over "
                             "a ('points',) mesh with ICI halo exchanges)")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="data-parallel device count (default: all "
                             "available when >1); with --platform cpu, "
                             "forces a virtual CPU pool of this size")
    parser.add_argument("--platform", default=None,
                        help="force a jax backend (e.g. cpu); the environment's "
                             "sitecustomize may pre-register a TPU platform, so "
                             "env vars alone cannot override it")
    parser.add_argument("--multihost", action="store_true",
                        help="jax.distributed.initialize() before mesh "
                             "construction (multi-host slices)")
    parser.add_argument("--coordinator_address", default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--bn_prime_steps", type=int, default=0,
                        help="average BN stats over this many fresh train "
                             "batches before each eval pass (cures the "
                             "momentum-0.99 eval lag on short runs)")
    args = parser.parse_args()

    from sph3d_gcn_tpu.train.cli import (
        POINT_AXIS,
        configure_backend,
        data_mesh,
        points_mesh,
    )

    configure_backend(
        args.platform, args.num_devices, multihost=args.multihost,
        point_devices=args.point_devices,
        coordinator_address=args.coordinator_address,
        process_id=args.process_id, num_processes=args.num_processes,
    )
    if not args.onehot and args.category is None:
        parser.error("--category is required unless --onehot")

    from sph3d_gcn_tpu.configs import shapenet_config
    from sph3d_gcn_tpu.data.datasets import resample_indices
    from sph3d_gcn_tpu.data.prep.shapenet import load_shapenet_records
    from sph3d_gcn_tpu.models import SPH3DShapeNet, SPH3DShapeNetOnehot
    from sph3d_gcn_tpu.train import (
        exponential_decay_lr,
        make_optimizer,
        segmentation_step_factory,
    )
    from sph3d_gcn_tpu.train.augment_policies import shapenet_train_augment
    from sph3d_gcn_tpu.train.checkpoint import snapshot_config
    from sph3d_gcn_tpu.train.loop import fit

    mode_kw = {
        "fast": args.mode in ("fast", "dense"),
        "dense": args.mode == "dense",
    }
    cfg = shapenet_config(**mode_kw)
    if args.onehot:
        model = SPH3DShapeNetOnehot(cfg, num_cls=50)
        train_files = [
            line.rstrip()
            for line in open(os.path.join(args.data_dir, "train_files.txt"))
        ]
        decay_step = 320000
        label_key = "seg_label"
        log_dir = args.log_dir or "log_shapenet_onehot"
    else:
        cat_id = SHAPENET_CATEGORIES.index(args.category)
        model = SPH3DShapeNet(cfg, num_cls=NUM_PARTS[cat_id])
        train_files = [
            line.rstrip()
            for line in open(
                os.path.join(args.data_dir, f"{args.category}_train_files.txt")
            )
        ]
        label_key = "part_label"
        log_dir = args.log_dir or f"log_shapenet_{args.category}"

    records = load_shapenet_records(train_files)
    if not args.onehot:
        records = [r for r in records if r["cls_label"] == cat_id]
        # class rebalancing (ref train_shapenet.py:33-35,83-90)
        factor = np.int32(640 / max(1, len(records))) + 1
        decay_step = factor * len(records) * 36
        records = records * int(factor)
    print(f"{len(records)} training shapes, decay_step={decay_step}")
    snapshot_config(log_dir, cfg)

    schedule = exponential_decay_lr(
        args.learning_rate, args.batch_size, decay_step, args.decay_rate
    )
    tx = make_optimizer(args.optimizer, schedule, momentum=args.momentum)
    mesh, point_axis, data_axis = points_mesh(
        args.point_devices, args.num_devices
    )
    if mesh is not None:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, point_axis=point_axis, data_axis=data_axis)
        model = model.clone(config=cfg)
        if data_axis is not None:
            print(
                f"composed mesh: {mesh.devices.shape[0]} data x "
                f"{mesh.devices.shape[1]} points devices"
            )
        else:
            print(f"point-axis mesh: {mesh.devices.shape[0]} devices")
    else:
        mesh = data_mesh(args.num_devices, args.batch_size)
        if mesh is not None:
            print(f"data-parallel mesh: {mesh.devices.shape[0]} devices")
    factory = segmentation_step_factory(
        model, tx, weight_decay=cfg.weight_decay,
        model_kwargs_keys=("cls_label",) if args.onehot else (),
        mesh=mesh, point_axis=point_axis, data_axis=data_axis,
    )

    from sph3d_gcn_tpu.parallel import local_batch_size, process_shard_files

    # multi-host: shard the (rebalanced) record list per process
    records = process_shard_files(records)
    local_bs = local_batch_size(args.batch_size)

    def train_batches(epoch):
        rng = np.random.default_rng((args.seed, epoch))
        order = rng.permutation(len(records))
        for start in range(0, len(order), local_bs):
            sel = order[start : start + local_bs]
            pts = np.zeros((len(sel), cfg.num_input, 3), np.float32)
            lbl = np.zeros((len(sel), cfg.num_input), np.int32)
            cls = np.zeros((len(sel),), np.int32)
            for j, i in enumerate(sel):
                rec = records[i]
                ridx = resample_indices(
                    len(rec[label_key]), cfg.num_input, rng
                )
                pts[j] = rec["xyz"][ridx]
                lbl[j] = rec[label_key][ridx]  # stored 0-based in the records
                cls[j] = rec["cls_label"]
            pts, lbl = shapenet_train_augment(pts, lbl, rng)
            batch = {"points": pts, "label": lbl}
            if args.onehot:
                batch["cls_label"] = cls
            yield batch

    fit(
        factory,
        train_batches,
        None,
        batch_size=args.batch_size,
        num_epochs=args.max_epoch,
        log_dir=log_dir,
        seed=args.seed,
        bn_prime_steps=args.bn_prime_steps,
    )


if __name__ == "__main__":
    main()
