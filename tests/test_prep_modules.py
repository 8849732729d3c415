"""ShapeNet / RueMonge / ScanNet / ModelNet prep module tests."""

import numpy as np

from sph3d_gcn_tpu.data.prep.modelnet import prepare_shape
from sph3d_gcn_tpu.data.prep.ply import read_ply, read_ply_xyz_rgb
from sph3d_gcn_tpu.data.prep.ruemonge import (
    label2rgb,
    rgb2label,
    split_facade_blocks,
    swap_axes_z_up,
)
from sph3d_gcn_tpu.data.prep.scannet import (
    benchmark21_to_nyu40,
    nyu40_to_benchmark21,
    prepare_scene,
)
from sph3d_gcn_tpu.data.prep.shapenet import (
    load_shapenet_records,
    make_shapenet_records,
    normalize_shape,
    remove_singular_points,
)


def test_shapenet_normalize_and_singular_removal():
    rng = np.random.default_rng(0)
    xyz = rng.standard_normal((200, 3)).astype(np.float32) * 3
    xyz = normalize_shape(xyz)
    assert np.linalg.norm(xyz, axis=1).max() <= 1.0 + 1e-5
    # 3 isolated, mutually-distant points of a rare label: each has no
    # same-label neighbor within the radius -> removed (the reference also
    # sweeps away any other singular point once a small part triggers the
    # pass, ref shapenet_prepare_data.m:44-59)
    label = np.ones(203, np.int32)
    far = np.array([[5, 5, 5], [7, 7, 7], [9, 9, 9]], np.float32)
    xyz2 = np.concatenate([xyz, far])
    label[200:] = 7
    out_xyz, out_label, removed = remove_singular_points(xyz2, label, radius=0.3)
    assert removed >= 3
    assert (out_label == 1).all()
    # no small parts -> untouched
    _, _, removed2 = remove_singular_points(xyz, np.ones(200, np.int32))
    assert removed2 == 0


def test_shapenet_records_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    shapes = [
        (rng.standard_normal((50, 3)).astype(np.float32),
         rng.integers(1, 4, 50).astype(np.int32), 2)
    ]
    path = str(tmp_path / "cat.tfrecord")
    make_shapenet_records(shapes, {2: 10}, path)
    (rec,) = load_shapenet_records([path])
    assert rec["cls_label"] == 2
    # stored 0-based; global offset applied to seg_label
    np.testing.assert_array_equal(rec["part_label"], shapes[0][1] - 1)
    np.testing.assert_array_equal(rec["seg_label"], shapes[0][1] + 10 - 1)
    # xzy -> xyz swap applied
    np.testing.assert_allclose(rec["xyz"], shapes[0][0][:, [0, 2, 1]], rtol=1e-6)


def test_ruemonge_label_maps_and_axes():
    labels = np.arange(7)
    np.testing.assert_array_equal(rgb2label(label2rgb(labels)), labels)
    xyz = np.array([[1.0, 2.0, 3.0]], np.float32)
    out = swap_axes_z_up(xyz)
    np.testing.assert_allclose(out, [[1.0, 3.0, -2.0]])


def test_ruemonge_facade_split():
    rng = np.random.default_rng(2)
    xyz = rng.standard_normal((500, 3)).astype(np.float32)
    split = np.zeros(500, np.int64)
    split[:50] = 0        # unlabeled -> dropped
    split[50:300] = 1     # large
    split[300:490] = 2    # large
    split[490:] = 3       # tiny -> merged into nearest large
    blocks = split_facade_blocks(xyz, split, min_points=100)
    assert len(blocks) == 2
    assert sum(len(b) for b in blocks) == 450  # 250 + 190 + 10 merged
    all_idx = np.concatenate(blocks)
    assert not np.isin(np.arange(50), all_idx).any()  # unlabeled dropped
    # the tiny split's members all landed in exactly one block
    tiny = np.arange(490, 500)
    homes = [np.isin(tiny, b).all() for b in blocks]
    assert sum(homes) == 1


def test_scannet_label_maps():
    nyu = np.array([0, 1, 12, 13, 14, 39, 40])
    b21 = nyu40_to_benchmark21(nyu)
    # 1 -> 1, 12 -> 12, 13 -> 0 (dropped), 14 -> 13, 39 -> 20, 40 -> 0
    np.testing.assert_array_equal(b21, [0, 1, 12, 0, 13, 20, 0])
    back = benchmark21_to_nyu40(np.array([0, 1, 13, 20]))
    np.testing.assert_array_equal(back, [0, 1, 14, 39])


def test_scannet_prepare_scene():
    rng = np.random.default_rng(3)
    xyz = rng.uniform(0, 2, (5000, 3)).astype(np.float32)
    rgb = rng.uniform(0, 255, (5000, 3)).astype(np.float32)
    label = rng.integers(0, 45, 5000)  # includes out-of-range
    v_xyz, v_rgb, v_label = prepare_scene(xyz, rgb, label, voxel=0.1)
    assert len(v_xyz) < 5000
    assert v_label.min() >= 0 and v_label.max() <= 20
    # test scene: no labels
    v_xyz2, _, v_label2 = prepare_scene(xyz, rgb, None, voxel=0.1)
    assert v_label2 is None


def test_modelnet_prepare_shape():
    rng = np.random.default_rng(4)
    xyz = rng.standard_normal((600, 3)).astype(np.float32) * 5
    normal = rng.standard_normal((600, 3)).astype(np.float32)
    out_xyz, out_normal = prepare_shape(xyz, normal, num_point=256)
    assert out_xyz.shape == (256, 3)
    assert out_normal.shape == (256, 3)
    np.testing.assert_allclose(out_xyz.mean(0), 0, atol=1e-5)
    assert abs(np.linalg.norm(out_xyz, axis=1).max() - 1.0) < 1e-5


def test_ply_roundtrip_ascii_and_binary(tmp_path):
    xyz = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]], np.float32)
    rgb = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
    # ascii
    p1 = tmp_path / "a.ply"
    with open(p1, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 2\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for i in range(2):
            f.write(f"{xyz[i,0]} {xyz[i,1]} {xyz[i,2]} {rgb[i,0]} {rgb[i,1]} {rgb[i,2]}\n")
    got_xyz, got_rgb, _ = read_ply_xyz_rgb(str(p1))
    np.testing.assert_allclose(got_xyz, xyz)
    np.testing.assert_allclose(got_rgb, rgb)
    # binary little endian
    p2 = tmp_path / "b.ply"
    import struct
    with open(p2, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\nelement vertex 2\n")
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(b"end_header\n")
        for i in range(2):
            f.write(struct.pack("<fffBBB", *xyz[i], *rgb[i]))
    got_xyz2, got_rgb2, _ = read_ply_xyz_rgb(str(p2))
    np.testing.assert_allclose(got_xyz2, xyz)
    np.testing.assert_allclose(got_rgb2, rgb)
