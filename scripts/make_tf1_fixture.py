"""Write a GENUINE TensorFlow-written V2 checkpoint bundle for converter tests.

The repo's ``utils/tf1_bundle.py`` is a pure-Python reader/writer for the
TF tensor-bundle format; its roundtrip tests necessarily read bundles the
repo itself wrote. This script produces a bundle written by TensorFlow's
own C++ BundleWriter (``tf.compat.v1.train.Saver``, the exact writer the
reference's training sessions use — ref modelnet40_cls/train_modelnet.py
saver.save), so ``read_bundle``/``convert_checkpoint`` are exercised
against an independently-produced file.

Runs TF in its own process (graph mode mutates global TF state; the test
suite shells out to this script). Variable names follow the reference's
scoping (ref utils/sph3gcn_util.py:125-161, e.g. ``conv1_1/weights``,
``conv1_1/bn/gamma``) — the caller passes the exact {name: shape} spec.

Usage:
    python scripts/make_tf1_fixture.py spec.json /out/dir/model.ckpt-200000
Values are deterministic: variable i (in spec order) is filled from
``np.random.default_rng(seed + i)``.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("spec", help="JSON file: {tf_variable_name: shape}")
    parser.add_argument("out", help="checkpoint path prefix (model.ckpt-N)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import tensorflow as tf

    tf1 = tf.compat.v1
    tf1.disable_eager_execution()

    with open(args.spec) as f:
        spec: dict[str, list[int]] = json.load(f)

    graph = tf1.Graph()
    with graph.as_default():
        for i, (name, shape) in enumerate(spec.items()):
            rng = np.random.default_rng(args.seed + i)
            tf1.get_variable(
                name,
                initializer=rng.standard_normal(shape).astype(np.float32),
            )
        # a real reference checkpoint also carries optimizer slots and the
        # int64 global step — include them so converter stripping is tested
        first = next(iter(spec))
        for slot in (f"{first}/Adam", f"{first}/Adam_1"):
            rng = np.random.default_rng(1234)
            tf1.get_variable(
                slot,
                initializer=rng.standard_normal(spec[first]).astype(
                    np.float32
                ),
            )
        tf1.get_variable(
            "global_step",
            initializer=np.int64(200000),
            dtype=tf.int64,
        )
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, args.out, write_meta_graph=False,
                       write_state=False)
    print(f"wrote {args.out} ({len(spec)} variables + 3 slot/step)")


if __name__ == "__main__":
    main()
