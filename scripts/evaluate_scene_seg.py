#!/usr/bin/env python
"""Scene segmentation evaluation with overlap + scene re-merge.

Collapses the reference's three-process pipeline — TF eval with coverage
voting (`evaluate_s3dis_with_overlap.py`), the block->scene index export
(`s3dis_block2scene_index.py`) and the MATLAB merge (`s3dis_merge.m`) —
into one script: per-block coverage-voted logits -> scene scatter-merge ->
optional knn projection onto the full-resolution cloud -> OA/mAcc/mIoU.

Scene ground truth: ``--scene_dir`` holds per-scene npz files
({xyz, label} voxelized clouds; optionally {full_xyz, full_label} for the
full-resolution metric like `data/s3dis_full` in the reference).
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
    parser.add_argument("--data_dir", required=True,
                        help="tfrecord block directory")
    parser.add_argument("--scene_dir", default=None,
                        help="per-scene npz ground-truth directory")
    parser.add_argument("--log_dir", required=True)
    parser.add_argument("--test_area", type=int, default=5)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--epoch", type=int, default=None)
    parser.add_argument("--save_blocks", action="store_true",
                        help="dump per-block logits npz like the reference .mat files")
    parser.add_argument("--submission_dir", default=None,
                        help="ScanNet only: write per-scene NYU-40 label txt "
                             "files for benchmark submission "
                             "(ref post-merging/scannet_merge.m:53-66)")
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

    from sph3d_gcn_tpu.data.datasets import load_scene_blocks
    from sph3d_gcn_tpu.data.merge import (
        SceneAccumulator,
        merge_scene_predictions,
        project_labels_to_full_cloud,
    )
    from sph3d_gcn_tpu.models import SPH3DRueMonge, SPH3DSceneSeg
    from sph3d_gcn_tpu.train import make_optimizer, segmentation_step_factory
    from sph3d_gcn_tpu.train.checkpoint import Checkpointer, load_config_snapshot
    from sph3d_gcn_tpu.train.eval import (
        checked_eval_step,
        coverage_eval_blocks,
    )

    cfg = load_config_snapshot(args.log_dir)
    model = (
        SPH3DRueMonge(cfg) if args.dataset == "ruemonge2014" else SPH3DSceneSeg(cfg)
    )
    mesh = data_mesh(args.num_devices, args.batch_size)
    if mesh is not None:
        print(f"eval data-parallel mesh: {mesh.devices.shape[0]} devices")
    factory = segmentation_step_factory(
        model, make_optimizer("adam", 1e-3),
        inner_masked=args.dataset != "ruemonge2014",
        mesh=mesh,
    )

    if args.dataset == "s3dis":
        test_list = os.path.join(
            args.data_dir, f"test_files_fold{args.test_area}.txt"
        )
    else:
        test_list = os.path.join(args.data_dir, "test_files.txt")
    test_files = [line.rstrip() for line in open(test_list)]
    blocks = load_scene_blocks(test_files, with_index=True)
    print(f"evaluating {len(blocks)} blocks from {len(test_files)} scenes")

    dummy = {
        "points": np.zeros(
            (args.batch_size, cfg.num_input, blocks[0].points.shape[1]),
            np.float32,
        ),
        "label": np.zeros((args.batch_size, cfg.num_input), np.int32),
        "inner_label": np.ones((args.batch_size, cfg.num_input), np.int32),
    }
    state = factory.init_state(jax.random.key(0), dummy)
    state = Checkpointer(args.log_dir).restore_variables(state, args.epoch)
    eval_step = checked_eval_step(factory)

    def forward(points, _ids):
        batch = {
            "points": points.astype(np.float32),
            "label": np.zeros(points.shape[:2], np.int32),
            "inner_label": np.ones(points.shape[:2], np.int32),
        }
        return np.asarray(eval_step(state, batch)["logits"])

    # ---- coverage voting, batched ACROSS blocks (each forward mixes
    # resamples of batch_size different blocks; the reference pads one
    # block per run, ref evaluate_s3dis_with_overlap.py:270-302) ----
    rng = np.random.default_rng(0)
    per_scene: dict[str, list] = {}
    block_acc = SceneAccumulator(num_cls=cfg.num_cls)
    out_dir = os.path.join(args.log_dir, "block_results")
    if args.save_blocks:
        os.makedirs(out_dir, exist_ok=True)
    all_logits = coverage_eval_blocks(
        forward,
        [(blk.points, blk.inner) for blk in blocks],
        cfg.num_input,
        args.batch_size,
        rng,
    )
    for i, (blk, logits) in enumerate(zip(blocks, all_logits)):
        inner = blk.inner == 1
        pred = logits.argmax(-1)
        block_acc.add_scene(pred[inner], blk.label[inner])
        per_scene.setdefault(blk.scene, []).append(
            (blk.index, blk.inner, logits)
        )
        if args.save_blocks:
            np.savez(
                os.path.join(out_dir, f"{blk.scene}_{i}.npz"),
                data=blk.points, logits=logits, index=blk.index,
                inner=blk.inner, label=blk.label,
            )
    print(
        f"block-level OA: {block_acc.overall_accuracy:.4f} "
        f"mIoU: {block_acc.mean_iou:.4f}"
    )

    # ---- scene re-merge (ref post-merging/s3dis_merge.m) ----
    if args.scene_dir:
        acc = SceneAccumulator(num_cls=cfg.num_cls)
        for scene, blks in sorted(per_scene.items()):
            path = os.path.join(args.scene_dir, scene + ".npz")
            if not os.path.exists(path):
                print(f"missing scene ground truth: {path}")
                continue
            gt = np.load(path)
            labels = merge_scene_predictions(len(gt["label"]), blks, cfg.num_cls)
            if args.submission_dir and args.dataset == "scannet":
                from sph3d_gcn_tpu.data.prep.scannet import (
                    benchmark21_to_nyu40,
                )

                os.makedirs(args.submission_dir, exist_ok=True)
                out_labels = benchmark21_to_nyu40(labels)
                if "full_xyz" in gt:
                    out_labels = project_labels_to_full_cloud(
                        gt["xyz"], out_labels, gt["full_xyz"]
                    )
                np.savetxt(
                    os.path.join(args.submission_dir, scene + ".txt"),
                    out_labels, fmt="%d",
                )
            if "full_xyz" in gt:
                pred_full = project_labels_to_full_cloud(
                    gt["xyz"], labels, gt["full_xyz"]
                )
                acc.add_scene(pred_full, gt["full_label"])
            else:
                acc.add_scene(labels, gt["label"])
            print(f"{scene}: running OA {acc.overall_accuracy:.4f}")
        print("================== merged scene metrics ==================")
        print(f"OA:   {acc.overall_accuracy:.4f}")
        print(f"mAcc: {acc.mean_acc:.4f}")
        print(f"mIoU: {acc.mean_iou:.4f}")
        for c, iou in enumerate(acc.class_iou):
            print(f"class {c:02d} IoU: {iou:.4f}")
        # Raw counts for cross-fold aggregation (scripts/aggregate_folds.py;
        # ref post-merging/s3dis_merge.m:96-99 + s3dis_merge_6Areas.m).
        metric_path = os.path.join(
            args.log_dir, f"Area_{args.test_area}_metric.npz"
        )
        acc.save(metric_path)
        print(f"saved fold counts to {metric_path}")


if __name__ == "__main__":
    main()
