"""Metric implementations."""

import numpy as np

from sph3d_gcn_tpu.train.metrics import (
    confusion_matrix,
    mean_class_accuracy,
    mean_iou,
    overall_accuracy,
    per_class_accuracy,
    per_class_iou,
    shape_iou,
)


def test_confusion_and_oa():
    pred = np.array([0, 0, 1, 2, 2, 2])
    label = np.array([0, 1, 1, 2, 2, 0])
    cm = confusion_matrix(pred, label, 3)
    assert cm.sum() == 6
    assert cm[1, 0] == 1 and cm[1, 1] == 1 and cm[0, 2] == 1
    np.testing.assert_allclose(overall_accuracy(cm), 4 / 6)


def test_per_class_accuracy_ignores_unseen():
    pred = np.array([0, 1])
    label = np.array([0, 0])
    cm = confusion_matrix(pred, label, 3)
    acc = per_class_accuracy(cm)
    np.testing.assert_allclose(acc[0], 0.5)
    assert np.isnan(acc[1]) and np.isnan(acc[2])
    np.testing.assert_allclose(mean_class_accuracy(cm), 0.5)


def test_iou():
    pred = np.array([0, 0, 1, 1])
    label = np.array([0, 1, 1, 1])
    cm = confusion_matrix(pred, label, 2)
    iou = per_class_iou(cm)
    np.testing.assert_allclose(iou, [1 / 2, 2 / 3])
    np.testing.assert_allclose(mean_iou(cm), (1 / 2 + 2 / 3) / 2)


def test_shape_iou_union_zero_is_one():
    # ref evaluate_shapenet.py:276-289: parts absent from both pred and gt
    # count as IoU 1.
    pred = np.array([0, 0, 1])
    label = np.array([0, 0, 1])
    v = shape_iou(pred, label, np.array([0, 1, 2]))
    np.testing.assert_allclose(v, 1.0)
    pred2 = np.array([0, 1, 1])
    v2 = shape_iou(pred2, label, np.array([0, 1, 2]))
    # part 0: 1/2; part 1: 1/2; part 2 absent from both: 1.0
    np.testing.assert_allclose(v2, (0.5 + 0.5 + 1.0) / 3)


def test_scene_accumulator_save_load_merge(tmp_path):
    from sph3d_gcn_tpu.data.merge import SceneAccumulator

    rng = np.random.default_rng(0)
    folds = []
    for i in range(3):
        acc = SceneAccumulator(num_cls=5)
        acc.add_scene(rng.integers(0, 5, 200), rng.integers(0, 5, 200))
        acc.save(str(tmp_path / f"fold{i}.npz"))
        folds.append(acc)

    total = SceneAccumulator(num_cls=5)
    for i in range(3):
        total.merge(SceneAccumulator.load(str(tmp_path / f"fold{i}.npz")))
    expect_intersect = sum(f.total_intersect for f in folds)
    np.testing.assert_array_equal(total.total_intersect, expect_intersect)
    assert total.merged_seen == sum(f.merged_seen for f in folds)
    # aggregate matches a single accumulator fed everything
    assert 0.0 <= total.overall_accuracy <= 1.0


def test_aggregate_folds_script(tmp_path):
    import sys

    sys.path.insert(0, "scripts")
    from aggregate_folds import aggregate

    from sph3d_gcn_tpu.data.merge import SceneAccumulator

    rng = np.random.default_rng(1)
    paths = []
    ref = SceneAccumulator(num_cls=4)
    for i in range(2):
        acc = SceneAccumulator(num_cls=4)
        pred, gt = rng.integers(0, 4, 100), rng.integers(0, 4, 100)
        acc.add_scene(pred, gt)
        ref.add_scene(pred, gt)
        p = str(tmp_path / f"Area_{i}_metric.npz")
        acc.save(p)
        paths.append(p)
    total = aggregate(paths)
    assert total.overall_accuracy == ref.overall_accuracy
    assert total.mean_iou == ref.mean_iou


def test_coverage_eval_blocks_covers_and_predicts():
    from sph3d_gcn_tpu.train.eval import coverage_eval_blocks

    rng = np.random.default_rng(2)
    # label is encoded in the 4th column; forward one-hots it
    blocks = []
    labels = []
    for size in (37, 61, 150):  # below and above the model size
        lab = rng.integers(0, 3, size)
        pts = np.concatenate(
            [rng.standard_normal((size, 3)), lab[:, None]], axis=1
        ).astype(np.float32)
        blocks.append((pts, np.ones(size, np.int32)))
        labels.append(lab)

    calls = []

    def forward(points, ids):
        calls.append(list(ids))
        return np.eye(3, dtype=np.float32)[points[..., 3].astype(int)]

    out = coverage_eval_blocks(forward, blocks, 64, batch_size=4, rng=rng,
                               min_count=2)
    for logits, lab, (pts, _inner) in zip(out, labels, blocks):
        assert logits.shape == (len(lab), 3)
        # every point covered at least min_count times
        assert (logits.sum(axis=1) >= 2).all()
        np.testing.assert_array_equal(logits.argmax(1), lab)
    # batching really mixed blocks in one forward
    assert any(len(set(ids)) > 1 for ids in calls)
