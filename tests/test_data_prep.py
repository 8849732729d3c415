"""Voxelization, block cutting, and scene-merge tests."""

import numpy as np

from sph3d_gcn_tpu.data.merge import (
    SceneAccumulator,
    merge_scene_predictions,
    normalized_confidence,
    project_labels_to_full_cloud,
)
from sph3d_gcn_tpu.data.prep.blocks import Block, cut_blocks, normalize_room
from sph3d_gcn_tpu.data.prep.voxelize import (
    grid_average_downsample,
    knn_transfer,
    majority_label,
)


def test_grid_average_downsample():
    # two clusters of 2 points each in separate 3cm voxels
    xyz = np.array(
        [[0.0, 0, 0], [0.01, 0, 0], [0.10, 0, 0], [0.11, 0, 0]], np.float32
    )
    rgb = np.array([[0, 0, 0], [2, 2, 2], [4, 4, 4], [6, 6, 6]], np.float32)
    vx, vrgb, inverse = grid_average_downsample(xyz, rgb, voxel=0.03)
    assert vx.shape[0] == 2
    np.testing.assert_allclose(sorted(vx[:, 0]), [0.005, 0.105], atol=1e-6)
    np.testing.assert_allclose(sorted(vrgb[:, 0]), [1.0, 5.0])
    assert inverse.shape == (4,)
    assert inverse[0] == inverse[1] and inverse[2] == inverse[3]


def test_majority_label():
    inverse = np.array([0, 0, 0, 1, 1])
    labels = np.array([2, 2, 5, 7, 7])
    out = majority_label(labels, inverse, 2)
    assert out.tolist() == [2, 7]


def test_knn_transfer():
    src = np.array([[0.0, 0, 0], [1, 0, 0]], np.float32)
    vals = np.array([10, 20])
    dst = np.array([[0.1, 0, 0], [0.9, 0, 0]], np.float32)
    np.testing.assert_array_equal(knn_transfer(src, vals, dst), [10, 20])


def _uniform_room(n=60000, w=4.0, h=3.0, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform([0, 0, 0], [w, w, h], (n, 3)).astype(np.float32)
    return xyz


def test_cut_blocks_coverage_and_masks():
    xyz = _uniform_room()
    centered, rel = normalize_room(xyz)
    blocks = cut_blocks(centered, block_size=1.5, interval=0.75, context=0.3,
                        min_points=1000)
    assert len(blocks) > 4
    covered = np.zeros(len(xyz), bool)
    for b in blocks:
        assert b.index.dtype == np.int32
        assert len(b.index) == len(b.inner)
        pts = centered[b.index]
        # context ring: stored extent exceeds inner extent by <= context
        inner_pts = pts[b.inner > 0]
        assert inner_pts.shape[0] >= 1000
        span = inner_pts[:, :2].max(0) - inner_pts[:, :2].min(0)
        assert (span <= 2 * 1.5 + 1e-5).all()  # merged blocks can reach 2x
        covered[b.index[b.inner > 0]] = True
    assert covered.all()  # every point is inner in at least one block


def test_cut_blocks_small_block_merges_or_drops():
    # A tiny cloud below the threshold everywhere -> no blocks at all.
    xyz = _uniform_room(n=100)
    blocks = cut_blocks(xyz, block_size=1.5, interval=0.75, min_points=1000)
    assert blocks == []


def test_normalize_room():
    xyz = _uniform_room()
    centered, rel = normalize_room(xyz)
    # bottom-center aligned: z min ~ 0, xy centered
    assert abs(centered[:, 2].min()) < 1e-5
    np.testing.assert_allclose(
        centered[:, 0].max() + centered[:, 0].min(), 0, atol=1e-4
    )
    assert rel.min() >= -1.001 and rel.max() <= 1.001


def test_normalized_confidence():
    logits = np.array([[3.0, 4.0], [0.0, 0.0]])
    conf = normalized_confidence(logits)
    np.testing.assert_allclose(conf.sum(axis=1), 1.0)
    # first row normalized to (0.6, 0.8) before softmax
    np.testing.assert_allclose(
        conf[0], np.exp([0.6, 0.8]) / np.exp([0.6, 0.8]).sum()
    )


def test_merge_scene_predictions_overlap_voting():
    # two blocks over 3 scene points; overlapping point 1 gets votes from both
    blocks = [
        (np.array([0, 1]), np.array([1, 1]), np.array([[5.0, 0], [5.0, 0]])),
        (np.array([1, 2]), np.array([1, 1]), np.array([[0, 5.0], [0, 5.0]])),
    ]
    labels = merge_scene_predictions(3, blocks, 2)
    assert labels[0] == 0 and labels[2] == 1
    # point 1: equal votes -> argmax takes class 0 (first)
    assert labels[1] == 0


def test_merge_context_points_excluded():
    blocks = [
        (np.array([0, 1]), np.array([1, 0]), np.array([[5.0, 0], [0, 5.0]])),
    ]
    labels = merge_scene_predictions(2, blocks, 2)
    assert labels[0] == 0
    assert labels[1] == 0  # context vote ignored; zero-row argmax -> 0


def test_scene_accumulator_metrics():
    acc = SceneAccumulator(num_cls=2)
    acc.add_scene(np.array([0, 0, 1, 1]), np.array([0, 1, 1, 1]))
    np.testing.assert_allclose(acc.overall_accuracy, 3 / 4, rtol=1e-9)
    np.testing.assert_allclose(acc.class_iou, [1 / 2, 2 / 3], rtol=1e-9)
    np.testing.assert_allclose(acc.mean_iou, (1 / 2 + 2 / 3) / 2, rtol=1e-9)


def test_project_labels_to_full_cloud():
    voxel = np.array([[0.0, 0, 0], [1, 1, 1]], np.float32)
    labels = np.array([3, 9])
    full = np.array([[0.05, 0, 0], [0.95, 1, 1], [1.02, 1, 1]], np.float32)
    out = project_labels_to_full_cloud(voxel, labels, full)
    np.testing.assert_array_equal(out, [3, 9, 9])
