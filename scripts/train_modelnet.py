#!/usr/bin/env python
"""ModelNet40 classification training (counterpart of
`modelnet40_cls/train_modelnet.py`).

Reads the reference-format tfrecords ({xyz_raw, label}) listed in
``<data_dir>/train_files.txt`` / ``test_files.txt``, trains the SPH3D
classifier with the reference schedule, checkpoints per epoch, auto-resumes.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--log_dir", default="log_modelnet")
    parser.add_argument("--max_epoch", type=int, default=251)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--learning_rate", type=float, default=0.001)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--optimizer", default="adam", choices=["adam", "momentum"])
    parser.add_argument("--decay_step", type=int, default=250000)
    parser.add_argument("--decay_rate", type=float, default=0.7)
    parser.add_argument("--num_input", type=int, default=10000)
    parser.add_argument("--mode", default="parity",
                        choices=["parity", "fast", "dense"],
                        help="engine: 'parity' = f32 reference-parity, "
                             "'fast' = bf16 + locality-windowed edges, "
                             "'dense' = bf16 + dense windowed engine "
                             "(fastest; exactness certified per step)")
    parser.add_argument("--seed", type=int, default=0)
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

    from sph3d_gcn_tpu.configs import modelnet_config
    from sph3d_gcn_tpu.data.datasets import (
        load_modelnet_records,
        modelnet_batches,
    )
    from sph3d_gcn_tpu.models import SPH3DModelNet
    from sph3d_gcn_tpu.train import (
        classification_step_factory,
        exponential_decay_lr,
        make_optimizer,
    )
    from sph3d_gcn_tpu.train.augment_policies import modelnet_train_augment
    from sph3d_gcn_tpu.train.checkpoint import snapshot_config
    from sph3d_gcn_tpu.train.loop import fit

    mode_kw = {
        "fast": args.mode in ("fast", "dense"),
        "dense": args.mode == "dense",
    }
    cfg = modelnet_config(num_input=args.num_input, **mode_kw)
    snapshot_config(args.log_dir, cfg)
    model = SPH3DModelNet(cfg)
    schedule = exponential_decay_lr(
        args.learning_rate, args.batch_size, args.decay_step, args.decay_rate
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
    factory = classification_step_factory(
        model, tx, weight_decay=cfg.weight_decay, mesh=mesh,
        point_axis=point_axis, data_axis=data_axis,
    )

    from sph3d_gcn_tpu.parallel import local_batch_size, process_shard_files

    train_files = [
        line.rstrip()
        for line in open(os.path.join(args.data_dir, "train_files.txt"))
    ]
    test_files = [
        line.rstrip()
        for line in open(os.path.join(args.data_dir, "test_files.txt"))
    ]
    # multi-host: per-process file shards feed local sub-batches
    train_records = load_modelnet_records(process_shard_files(train_files))
    test_records = load_modelnet_records(process_shard_files(test_files))
    local_bs = local_batch_size(args.batch_size)
    print(f"train: {len(train_records)} shapes, test: {len(test_records)}")

    def train_batches(epoch):
        rng = np.random.default_rng((args.seed, epoch))
        for batch in modelnet_batches(
            train_records, local_bs, rng=rng, shuffle=True
        ):
            pts, label = modelnet_train_augment(
                batch["points"], batch["label"], rng
            )
            yield {"points": pts, "label": label}

    def eval_batches():
        return modelnet_batches(test_records, local_bs, shuffle=False)

    fit(
        factory,
        train_batches,
        eval_batches,
        batch_size=args.batch_size,
        num_epochs=args.max_epoch,
        log_dir=args.log_dir,
        seed=args.seed,
        bn_prime_steps=args.bn_prime_steps,
    )


if __name__ == "__main__":
    main()
