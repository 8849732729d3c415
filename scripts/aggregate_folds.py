#!/usr/bin/env python
"""Aggregate per-fold scene-seg metric counts into overall OA/mAcc/mIoU.

Counterpart of `post-merging/s3dis_merge_6Areas.m:15-45`: each fold's
evaluation (scripts/evaluate_scene_seg.py with --scene_dir) saves its raw
intersect/union/seen counts to ``<log_dir>/Area_<k>_metric.npz``; this
script sums them and prints the 6-fold table. Works for any fold count and
any scene dataset.

Usage:
  python scripts/aggregate_folds.py log_area1/Area_1_metric.npz ... \
      log_area6/Area_6_metric.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def aggregate(paths):
    from sph3d_gcn_tpu.data.merge import SceneAccumulator

    folds = [SceneAccumulator.load(p) for p in paths]
    total = SceneAccumulator(num_cls=folds[0].num_cls)
    for path, fold in zip(paths, folds):
        total.merge(fold)
        print(
            f"{os.path.basename(path)}: OA {fold.overall_accuracy * 100:.2f}% "
            f"mAcc {fold.mean_acc * 100:.2f}% mIoU {fold.mean_iou * 100:.2f}%"
        )
    return total


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("metric_files", nargs="+",
                        help="per-fold *_metric.npz files")
    args = parser.parse_args()

    total = aggregate(args.metric_files)
    print("================== all-fold aggregate ==================")
    print(
        f"OA: {total.overall_accuracy * 100:.2f}%, "
        f"mAcc: {total.mean_acc * 100:.2f}%, "
        f"mIoU: {total.mean_iou * 100:.2f}%"
    )
    print("class_iou:", np.array2string(total.class_iou, precision=4))
    print("class_acc:", np.array2string(total.class_acc, precision=4))


if __name__ == "__main__":
    main()
