"""Augmentation ports: rotation conventions, clip bounds, shapes."""

import numpy as np

from sph3d_gcn_tpu.data import augment


def test_rot_z_matches_reference_convention():
    # ref data_util.py:225-232: R = [[c,-s,0],[s,c,0],[0,0,1]], applied as x @ R
    r = augment.rot_z(np.pi / 2)
    v = np.array([[1.0, 0.0, 0.0]], np.float32) @ r
    np.testing.assert_allclose(v, [[0, -1, 0]], atol=1e-6)


def test_rotate_point_cloud_preserves_norms_and_z_axis():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((2, 64, 3)).astype(np.float32)
    out = augment.rotate_point_cloud(pts, np.random.default_rng(1))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(pts, axis=-1), rtol=1e-4
    )
    np.testing.assert_allclose(out[..., 2], pts[..., 2], rtol=1e-5)  # z-rotation


def test_jitter_clip():
    pts = np.zeros((1, 1000, 3), np.float32)
    out = augment.jitter_point_cloud(pts, np.random.default_rng(2), sigma=0.5, clip=0.02)
    assert np.abs(out).max() <= 0.02 + 1e-7


def test_shift_per_cloud():
    pts = np.zeros((3, 10, 3), np.float32)
    out = augment.shift_point_cloud(pts.copy(), np.random.default_rng(3))
    for k in range(3):
        # every point in a cloud shares the same shift
        assert np.ptp(out[k], axis=0).max() < 1e-7
    assert np.abs(out).max() <= 0.1


def test_scale_per_cloud():
    pts = np.ones((3, 10, 3), np.float32)
    out = augment.random_scale_point_cloud(pts.copy(), np.random.default_rng(4))
    scales = out[:, 0, 0]
    assert ((scales >= 0.8) & (scales <= 1.25)).all()
    for k in range(3):
        np.testing.assert_allclose(out[k], scales[k], rtol=1e-6)


def test_shuffle_points_same_perm_across_batch():
    pts = np.tile(np.arange(16, dtype=np.float32)[None, :, None], (4, 1, 3))
    out = augment.shuffle_points(pts, np.random.default_rng(5))
    for k in range(1, 4):
        np.testing.assert_array_equal(out[k], out[0])
    assert sorted(out[0, :, 0].tolist()) == list(range(16))


def test_perturbation_clip():
    pts = np.eye(3, dtype=np.float32)[None]
    out = augment.rotate_perturbation_point_cloud(
        pts, np.random.default_rng(6), angle_sigma=10.0, angle_clip=0.01
    )
    # tiny clipped angles -> near identity
    np.testing.assert_allclose(out[0], np.eye(3), atol=0.05)


def test_rotate_by_angle_deterministic():
    pts = np.random.default_rng(7).standard_normal((2, 8, 3)).astype(np.float32)
    a = augment.rotate_point_cloud_by_angle(pts, 0.7)
    b = augment.rotate_point_cloud_by_angle(pts, 0.7)
    np.testing.assert_array_equal(a, b)
