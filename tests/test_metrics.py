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
