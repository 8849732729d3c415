#!/usr/bin/env python
"""ShapeNet part-segmentation evaluation (counterpart of
`shapenet_seg/evaluate_shapenet.py` / `evaluate_shapenet_onehot.py` +
`post-merging/shapenet_mIoU.m`).

Per shape: coverage-voted logit accumulation over resamples (with and
without augmentation doubling the passes, ref evaluate_shapenet.py:228-247),
then per-shape mIoU with the union==0 -> 1 rule and instance/class mIoU
aggregation.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--category", default=None)
    parser.add_argument("--onehot", action="store_true")
    parser.add_argument("--log_dir", required=True)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--epoch", type=int, default=None)
    parser.add_argument("--platform", default=None,
                        help="force a jax backend (e.g. cpu); the environment's "
                             "sitecustomize may pre-register a TPU platform, so "
                             "env vars alone cannot override it")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="shard eval batches over this many devices "
                             "(coverage-vote forwards are embarrassingly "
                             "parallel); default 1")
    args = parser.parse_args()

    from sph3d_gcn_tpu.train.cli import configure_backend, data_mesh

    configure_backend(args.platform, args.num_devices)

    import jax

    from scripts.train_shapenet import NUM_PARTS, SHAPENET_CATEGORIES
    from sph3d_gcn_tpu.data.prep.shapenet import load_shapenet_records
    from sph3d_gcn_tpu.models import SPH3DShapeNet, SPH3DShapeNetOnehot
    from sph3d_gcn_tpu.train import make_optimizer, segmentation_step_factory
    from sph3d_gcn_tpu.train.checkpoint import Checkpointer, load_config_snapshot
    from sph3d_gcn_tpu.train.eval import (
        checked_eval_step,
        coverage_eval_blocks,
        shapenet_eval_augment,
    )
    from sph3d_gcn_tpu.train.metrics import shape_iou

    cfg = load_config_snapshot(args.log_dir)
    if args.onehot:
        model = SPH3DShapeNetOnehot(cfg, num_cls=50)
        test_files = [
            line.rstrip()
            for line in open(os.path.join(args.data_dir, "test_files.txt"))
        ]
        label_key = "seg_label"
        kwargs_keys = ("cls_label",)
    else:
        cat_id = SHAPENET_CATEGORIES.index(args.category)
        model = SPH3DShapeNet(cfg, num_cls=NUM_PARTS[cat_id])
        test_files = [
            line.rstrip()
            for line in open(
                os.path.join(args.data_dir, f"{args.category}_test_files.txt")
            )
        ]
        label_key = "part_label"
        kwargs_keys = ()

    records = load_shapenet_records(test_files)
    if not args.onehot:
        records = [r for r in records if r["cls_label"] == cat_id]
    print(f"evaluating {len(records)} shapes")

    mesh = data_mesh(args.num_devices, args.batch_size)
    if mesh is not None:
        print(f"eval data-parallel mesh: {mesh.devices.shape[0]} devices")
    factory = segmentation_step_factory(
        model, make_optimizer("adam", 1e-3), model_kwargs_keys=kwargs_keys,
        mesh=mesh,
    )
    dummy = {
        "points": np.zeros((args.batch_size, cfg.num_input, 3), np.float32),
        "label": np.zeros((args.batch_size, cfg.num_input), np.int32),
        "cls_label": np.zeros((args.batch_size,), np.int32),
    }
    state = factory.init_state(jax.random.key(0), dummy)
    state = Checkpointer(args.log_dir).restore_variables(state, args.epoch)
    eval_step = checked_eval_step(factory)

    rng = np.random.default_rng(0)
    instance_ious = []
    per_class: dict[int, list[float]] = {}
    out_dir = os.path.join(args.log_dir, "pred")
    os.makedirs(out_dir, exist_ok=True)

    def forward(points, ids):
        batch = {
            "points": points.astype(np.float32),
            "label": np.zeros(points.shape[:2], np.int32),
            "cls_label": np.array(
                [records[i]["cls_label"] for i in ids], np.int32
            ),
        }
        return np.asarray(eval_step(state, batch)["logits"])

    # >10-sample coverage with paired raw+augmented passes
    # (ref evaluate_shapenet.py:228-247), batched ACROSS shapes so every
    # forward runs a full batch.
    all_logits = coverage_eval_blocks(
        forward,
        [(rec["xyz"], np.ones(len(rec[label_key]), np.int32))
         for rec in records],
        cfg.num_input,
        args.batch_size,
        rng,
        min_count=11,
        augment_fn=shapenet_eval_augment,
    )
    for i, (rec, logits) in enumerate(zip(records, all_logits)):
        cls = rec["cls_label"]
        label = rec[label_key]
        pred = logits.argmax(-1)
        if args.onehot:
            part_ids = np.unique(rec["seg_label"])
        else:
            part_ids = np.arange(NUM_PARTS[cls])
        iou = shape_iou(pred, label, part_ids)
        instance_ious.append(iou)
        per_class.setdefault(cls, []).append(iou)
        np.savetxt(
            os.path.join(out_dir, f"shape_{i}.txt"),
            np.stack([pred, label], axis=1),
            fmt="%d",
        )

    print(f"instance mIoU: {np.mean(instance_ious):.4f}")
    class_means = [np.mean(v) for v in per_class.values()]
    print(f"class mIoU: {np.mean(class_means):.4f}")


if __name__ == "__main__":
    main()
