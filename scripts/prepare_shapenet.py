#!/usr/bin/env python
"""ShapeNet part-segmentation preparation CLI (counterpart of
`preprocesing/shapenet_prepare_data.m` + `io/make_tfrecord_shapenet.py`).

Reads the shapenetcore partanno layout (synsetoffset2category.txt +
<synset>/points/*.pts + points_label/*.seg), normalizes each shape to the
unit sphere, removes singular points, assigns global part ids, and writes
per-category train/test tfrecords + file lists.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--store_folder", required=True)
    parser.add_argument("--split_dir", default="train_test_split",
                        help="json split lists inside data_path")
    args = parser.parse_args()

    from sph3d_gcn_tpu.data.prep.shapenet import (
        make_shapenet_records,
        normalize_shape,
        remove_singular_points,
    )

    cats = []
    with open(os.path.join(args.data_path, "synsetoffset2category.txt")) as f:
        for line in f:
            name, synset = line.split()
            cats.append((name, synset))
    os.makedirs(args.store_folder, exist_ok=True)

    # Split membership from the official json lists if present.
    split_of = {}
    for phase in ("train", "val", "test"):
        path = os.path.join(
            args.data_path, args.split_dir, f"shuffled_{phase}_file_list.json"
        )
        if os.path.exists(path):
            for item in json.load(open(path)):
                split_of[os.path.basename(item)] = (
                    "train" if phase in ("train", "val") else "test"
                )

    part_offset = {}
    total_parts = 0
    for cls_id, (name, synset) in enumerate(cats):
        part_offset[cls_id] = total_parts
        shapes = {"train": [], "test": []}
        max_part = 0
        for pts_path in sorted(
            glob.glob(os.path.join(args.data_path, synset, "points", "*.pts"))
        ):
            stem = os.path.splitext(os.path.basename(pts_path))[0]
            seg_path = os.path.join(
                args.data_path, synset, "points_label", stem + ".seg"
            )
            xyz = np.loadtxt(pts_path, dtype=np.float32)
            label = np.loadtxt(seg_path, dtype=np.int32)
            xyz = normalize_shape(xyz)
            xyz, label, _ = remove_singular_points(xyz, label)
            max_part = max(max_part, int(label.max()))
            phase = split_of.get(stem, "train")
            shapes[phase].append((xyz, label, cls_id))
        total_parts += max_part
        for phase in ("train", "test"):
            out = os.path.join(
                args.store_folder, f"{name}_{phase}0.tfrecord"
            )
            make_shapenet_records(shapes[phase], part_offset, out)
            with open(
                os.path.join(args.store_folder, f"{name}_{phase}_files.txt"),
                "w",
            ) as f:
                f.write(out + "\n")
        print(f"{name}: {len(shapes['train'])} train / {len(shapes['test'])} "
              f"test shapes, {max_part} parts")

    # combined lists for the onehot variant
    for phase in ("train", "test"):
        with open(os.path.join(args.store_folder, f"{phase}_files.txt"), "w") as f:
            for name, _ in cats:
                f.write(
                    os.path.join(args.store_folder, f"{name}_{phase}0.tfrecord")
                    + "\n"
                )


if __name__ == "__main__":
    main()
