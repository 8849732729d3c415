#!/usr/bin/env python
"""ModelNet40 multi-vote evaluation (counterpart of
`modelnet40_cls/evaluate_modelnet.py`): vote 0 raw + augmented votes,
summed logits, overall + per-class accuracy, logits dump."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--log_dir", default="log_modelnet")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--num_votes", type=int, default=12)
    parser.add_argument("--epoch", type=int, default=None,
                        help="checkpoint epoch (default: latest)")
    parser.add_argument("--platform", default=None,
                        help="force a jax backend (e.g. cpu); the environment's "
                             "sitecustomize may pre-register a TPU platform, so "
                             "env vars alone cannot override it")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="shard eval batches over this many devices "
                             "(the 12-vote forwards are embarrassingly "
                             "parallel); default 1")
    args = parser.parse_args()

    from sph3d_gcn_tpu.train.cli import configure_backend, data_mesh

    configure_backend(args.platform, args.num_devices)

    import jax

    from sph3d_gcn_tpu.data.datasets import (
        load_modelnet_records,
        modelnet_batches,
        pad_batch,
    )
    from sph3d_gcn_tpu.models import SPH3DModelNet
    from sph3d_gcn_tpu.train import classification_step_factory, make_optimizer
    from sph3d_gcn_tpu.train.checkpoint import (
        Checkpointer,
        load_config_snapshot,
    )
    from sph3d_gcn_tpu.train.eval import checked_eval_step, vote_classify
    from sph3d_gcn_tpu.train.metrics import (
        confusion_matrix,
        mean_class_accuracy,
        overall_accuracy,
        per_class_accuracy,
    )

    # Rebuild the exact trained architecture from the log-dir snapshot
    # (the reference re-imports the copied model/config .py,
    # ref evaluate_modelnet.py:35-46).
    cfg = load_config_snapshot(args.log_dir)
    model = SPH3DModelNet(cfg)
    mesh = data_mesh(args.num_devices, args.batch_size)
    if mesh is not None:
        print(f"eval data-parallel mesh: {mesh.devices.shape[0]} devices")
    factory = classification_step_factory(
        model, make_optimizer("adam", 1e-3), weight_decay=cfg.weight_decay,
        mesh=mesh,
    )

    test_files = [
        line.rstrip()
        for line in open(os.path.join(args.data_dir, "test_files.txt"))
    ]
    records = load_modelnet_records(test_files)

    sample = next(iter(modelnet_batches(records, args.batch_size, shuffle=False)))
    sample, _ = pad_batch(sample, args.batch_size)
    state = factory.init_state(jax.random.key(0), sample)
    ckpt = Checkpointer(args.log_dir)
    state = ckpt.restore_variables(state, args.epoch)
    eval_step = checked_eval_step(factory)

    def forward(points):
        batch = {
            "points": points.astype(np.float32),
            "label": np.zeros(len(points), np.int32),
        }
        batch, bsize = pad_batch(batch, args.batch_size)
        return np.asarray(eval_step(state, batch)["logits"])[:bsize]

    rng = np.random.default_rng(0)
    all_pred, all_label, all_votes = [], [], []
    for batch in modelnet_batches(records, args.batch_size, shuffle=False):
        votes = vote_classify(forward, batch["points"], args.num_votes, rng)
        all_votes.append(votes)
        all_pred.append(votes.argmax(-1))
        all_label.append(batch["label"])
    pred = np.concatenate(all_pred)
    label = np.concatenate(all_label)

    cm = confusion_matrix(pred, label, cfg.num_cls)
    print(f"eval accuracy: {overall_accuracy(cm):f}")
    print(f"eval avg class acc: {mean_class_accuracy(cm):f}")
    for i, acc in enumerate(per_class_accuracy(cm)):
        print(f"class {i:02d}: {acc:.3f}")
    np.savez(
        os.path.join(args.log_dir, "pred_votes.npz"),
        votes=np.concatenate(all_votes),
        label=label,
    )


if __name__ == "__main__":
    main()
