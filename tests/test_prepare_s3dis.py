"""End-to-end S3DIS preparation pipeline on a synthetic room."""

import os
import subprocess
import sys

import numpy as np

from sph3d_gcn_tpu.data.datasets import load_scene_blocks

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_room(root, area="Area_5", room="office_1", n_per_obj=3000):
    rng = np.random.default_rng(0)
    ann = os.path.join(root, area, room, "Annotations")
    os.makedirs(ann, exist_ok=True)
    for name, cls in [("floor_1", 1), ("wall_1", 2), ("chair_1", 8)]:
        xyz = rng.uniform([0, 0, 0], [3, 3, 2.5], (n_per_obj, 3))
        rgb = rng.uniform(0, 255, (n_per_obj, 3))
        np.savetxt(
            os.path.join(ann, f"{name}.txt"),
            np.concatenate([xyz, rgb], axis=1),
            fmt="%.4f",
        )


def test_prepare_s3dis_pipeline(tmp_path):
    data = tmp_path / "raw"
    store = tmp_path / "records"
    _make_room(str(data))
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "prepare_s3dis.py"),
            "--data_path", str(data),
            "--store_folder", str(store),
            "--voxel", "0.06",
            "--min_points", "500",
        ],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, PYTHONPATH=REPO),
    )
    assert proc.returncode == 0, proc.stderr

    # blocks written and readable through the training loader
    blocks = load_scene_blocks(
        [str(store / "Area_5_office_1.tfrecord")], with_index=True
    )
    assert len(blocks) >= 1
    b = blocks[0]
    assert b.points.shape[1] == 6  # xyz + rgb
    assert set(np.unique(b.label)).issubset({1, 2, 8})
    assert b.inner.max() == 1
    # rgb normalized to [-1, 1]
    assert b.points[:, 3:].min() >= -1.001 and b.points[:, 3:].max() <= 1.001

    # scene ground truth for the merge
    gt = np.load(store / "scenes" / "Area_5_office_1.npz")
    assert {"xyz", "label", "full_xyz", "full_label"} <= set(gt.keys())
    assert len(gt["full_label"]) == 9000
    # block indices address the voxelized scene cloud
    assert b.index.max() < len(gt["label"])

    # manifest + fold lists
    log = (store / "log_block.txt").read_text()
    assert "Area_5, office_1" in log
    fold5_test = (store / "test_files_fold5.txt").read_text()
    assert "Area_5_office_1.tfrecord" in fold5_test
    fold1_train = (store / "train_files_fold1.txt").read_text()
    assert "Area_5_office_1.tfrecord" in fold1_train
