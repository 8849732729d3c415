#!/usr/bin/env python
"""RueMonge2014 facade preparation CLI (counterpart of
`preprocesing/ruemonge2014_prepare_data.m` + `io/make_tfrecord_ruemonge2014.py`).

Inputs: pcl.txt (x y z nx ny nz r g b rows), pcl_gt_train.ply /
pcl_gt_test.ply (label colors), and a split-label txt (facade id per point).
Outputs: per-facade-block tfrecords with xyz+normal+rgb features, scene npz
ground truth, and train/test file lists.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--store_folder", required=True)
    parser.add_argument("--min_points", type=int, default=2000)
    args = parser.parse_args()

    from sph3d_gcn_tpu.data.prep.ply import read_ply_xyz_rgb
    from sph3d_gcn_tpu.data.prep.ruemonge import (
        rgb2label,
        split_facade_blocks,
        swap_axes_z_up,
    )
    from sph3d_gcn_tpu.data.tfrecord import TFRecordWriter

    data = np.loadtxt(os.path.join(args.data_path, "pcl.txt"), dtype=np.float32)
    xyz = swap_axes_z_up(data[:, 0:3])
    normal = swap_axes_z_up(data[:, 3:6])
    rgb = data[:, 6:9].astype(np.float32)
    split_labels = np.loadtxt(
        os.path.join(args.data_path, "pcl_split.txt"), dtype=np.int64
    )

    os.makedirs(args.store_folder, exist_ok=True)
    scene_dir = os.path.join(args.store_folder, "scenes")
    os.makedirs(scene_dir, exist_ok=True)

    for phase in ("train", "test"):
        _, gt_rgb, _ = read_ply_xyz_rgb(
            os.path.join(args.data_path, f"pcl_gt_{phase}.ply")
        )
        labeled = gt_rgb.sum(axis=1) > 0  # unlabeled points are black
        written = []
        blocks = split_facade_blocks(
            xyz[labeled],
            split_labels[labeled],
            min_points=args.min_points,
        )
        labeled_idx = np.where(labeled)[0]
        for bi, members in enumerate(blocks):
            sel = labeled_idx[members]
            label = rgb2label(gt_rgb[sel].astype(np.uint8))
            scene = f"{phase}_facade_{bi}"
            out = os.path.join(args.store_folder, scene + ".tfrecord")
            with TFRecordWriter(out) as w:
                w.write_example({
                    "xyz_raw": xyz[sel].astype(np.float32).tobytes(),
                    "normal_raw": normal[sel].astype(np.float32).tobytes(),
                    "rgb_raw": (2 * rgb[sel] / 255.0 - 1)
                    .astype(np.float32)
                    .tobytes(),
                    "seg_label": label.astype(np.int32).tobytes(),
                    "inner_label": np.ones(len(sel), np.int32).tobytes(),
                    "index_label": np.arange(len(sel), np.int32).tobytes(),
                    "scene_label": np.int64(0),
                    "scene_idx": np.int64(bi),
                })
            np.savez(
                os.path.join(scene_dir, scene + ".npz"),
                xyz=xyz[sel], label=label,
            )
            written.append(out)
            print(f"{scene}: {len(sel)} points")
        with open(
            os.path.join(args.store_folder, f"{phase}_files.txt"), "w"
        ) as f:
            for p in written:
                f.write(p + "\n")


if __name__ == "__main__":
    main()
