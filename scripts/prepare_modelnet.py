#!/usr/bin/env python
"""ModelNet40 record preparation CLI (counterpart of
`io/make_tfrecord_modelnet.py`): FPS to 10k points + unit-sphere normalize,
1024-shape tfrecord chunks, train/test file lists."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", required=True,
                        help="modelnet40_normal_resampled-style directory")
    parser.add_argument("--store_folder", required=True)
    parser.add_argument("--num_point", type=int, default=10000)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from sph3d_gcn_tpu.data.prep.modelnet import make_modelnet_records

    for filelist in ("modelnet40_train", "modelnet40_test"):
        make_modelnet_records(
            args.data_path,
            filelist,
            "modelnet40_shape_names",
            args.store_folder,
            num_point=args.num_point,
        )


if __name__ == "__main__":
    main()
