#!/usr/bin/env python
"""Scene segmentation training: S3DIS / ScanNet / RueMonge2014
(counterpart of `s3dis_seg/train_s3dis.py`, `scannet_seg/train_scannet.py`,
`ruemonge2014_seg/train_ruemonge2014.py`).

``--dataset`` selects config + model + augmentation policy. S3DIS uses
6-fold splits via ``--test_area`` (ref train_s3dis.py:22,60-61); RueMonge
tiles its train list 100x per epoch (ref train_ruemonge2014.py:63).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True,
                        choices=["s3dis", "scannet", "ruemonge2014"])
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--log_dir", default=None)
    parser.add_argument("--test_area", type=int, default=5,
                        help="s3dis fold (1-6)")
    parser.add_argument("--max_epoch", type=int, default=51)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--learning_rate", type=float, default=0.001)
    parser.add_argument("--optimizer", default="adam")
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--decay_step", type=int, default=500000)
    parser.add_argument("--decay_rate", type=float, default=0.7)
    parser.add_argument("--adam_eps", type=float, default=1e-4,
                        help="ref train_s3dis.py:226 uses 1e-4")
    parser.add_argument("--num_input", type=int, default=8192)
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

    from sph3d_gcn_tpu.configs import (
        ruemonge2014_config,
        s3dis_config,
        scannet_config,
    )
    from sph3d_gcn_tpu.data.datasets import load_scene_blocks, scene_batches
    from sph3d_gcn_tpu.models import SPH3DRueMonge, SPH3DSceneSeg
    from sph3d_gcn_tpu.train import (
        exponential_decay_lr,
        make_optimizer,
        segmentation_step_factory,
    )
    from sph3d_gcn_tpu.train.augment_policies import (
        s3dis_train_augment,
        scannet_train_augment,
    )
    from sph3d_gcn_tpu.train.checkpoint import snapshot_config
    from sph3d_gcn_tpu.train.loop import fit

    mode_kw = {
        "fast": args.mode in ("fast", "dense"),
        "dense": args.mode == "dense",
    }
    if args.dataset == "s3dis":
        cfg = s3dis_config(num_input=args.num_input, **mode_kw)
        model = SPH3DSceneSeg(cfg)
        augment = s3dis_train_augment
        train_list = os.path.join(
            args.data_dir, f"train_files_fold{args.test_area}.txt"
        )
        test_list = os.path.join(
            args.data_dir, f"test_files_fold{args.test_area}.txt"
        )
        inner_masked = True
    elif args.dataset == "scannet":
        cfg = scannet_config(num_input=args.num_input, **mode_kw)
        model = SPH3DSceneSeg(cfg)
        augment = scannet_train_augment
        train_list = os.path.join(args.data_dir, "train_files.txt")
        test_list = os.path.join(args.data_dir, "test_files.txt")
        inner_masked = True
    else:
        cfg = ruemonge2014_config(num_input=args.num_input, **mode_kw)
        model = SPH3DRueMonge(cfg)
        augment = s3dis_train_augment
        train_list = os.path.join(args.data_dir, "train_files.txt")
        test_list = os.path.join(args.data_dir, "test_files.txt")
        inner_masked = False

    log_dir = args.log_dir or f"log_{args.dataset}"
    snapshot_config(log_dir, cfg)

    schedule = exponential_decay_lr(
        args.learning_rate, args.batch_size, args.decay_step, args.decay_rate
    )
    tx = make_optimizer(
        args.optimizer, schedule, momentum=args.momentum,
        adam_epsilon=args.adam_eps,
    )
    mesh, point_axis, data_axis = points_mesh(
        args.point_devices, args.num_devices
    )
    if mesh is not None:
        # point-axis sharding: the model shards rows over the mesh
        # (requires the dense engine; see parallel/spatial.py). With
        # --num_devices too, the composed dp x sp ('data', 'points') mesh
        # also shards batch items.
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
        model, tx, weight_decay=cfg.weight_decay, inner_masked=inner_masked,
        mesh=mesh, point_axis=point_axis, data_axis=data_axis,
    )

    from sph3d_gcn_tpu.parallel import local_batch_size, process_shard_files

    train_files = [line.rstrip() for line in open(train_list)]
    if args.dataset == "ruemonge2014":
        train_files = list(np.tile(train_files, 100))  # ref :63
    test_files = [line.rstrip() for line in open(test_list)]
    # multi-host: each process loads only its file shard and feeds local
    # sub-batches; fit()/shard_batch assemble the global batch
    train_files = process_shard_files(train_files)
    test_files = process_shard_files(test_files)
    local_bs = local_batch_size(args.batch_size)
    train_blocks = load_scene_blocks(train_files)
    test_blocks = load_scene_blocks(test_files)
    print(f"train blocks: {len(train_blocks)}, test blocks: {len(test_blocks)}")

    def train_batches(epoch):
        rng = np.random.default_rng((args.seed, epoch))
        for batch in scene_batches(
            train_blocks, local_bs, cfg.num_input, rng, shuffle=True
        ):
            pts, lbl, inner = augment(
                batch["points"], batch["label"], batch["inner_label"], rng
            )
            out = {"points": pts, "label": lbl}
            if inner_masked:
                out["inner_label"] = inner
            yield out

    def eval_batches():
        rng = np.random.default_rng(12345)
        for batch in scene_batches(
            test_blocks, local_bs, cfg.num_input, rng, shuffle=False
        ):
            if not inner_masked:
                batch.pop("inner_label", None)
            yield batch

    fit(
        factory,
        train_batches,
        eval_batches,
        batch_size=args.batch_size,
        num_epochs=args.max_epoch,
        log_dir=log_dir,
        seed=args.seed,
        bn_prime_steps=args.bn_prime_steps,
    )


if __name__ == "__main__":
    main()
