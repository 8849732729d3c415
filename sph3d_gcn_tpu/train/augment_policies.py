"""Per-dataset train-time augmentation policies (ports of each reference
driver's ``augment_fn``)."""

from __future__ import annotations

import numpy as np

from sph3d_gcn_tpu.data import augment as aug


def modelnet_train_augment(
    batch_xyz: np.ndarray,
    batch_label: np.ndarray,
    rng: np.random.Generator,
    augment_ratio: float = 0.5,
):
    """ref modelnet40_cls/train_modelnet.py:92-115: shuffle batch + point
    order, then rotate/perturb/scale/shift the first half."""
    batch_xyz, batch_label, _ = aug.shuffle_data(batch_xyz, batch_label, rng)
    batch_xyz = aug.shuffle_points(batch_xyz, rng)
    aug_size = np.int32(augment_ratio * batch_xyz.shape[0])
    part = batch_xyz[:aug_size]
    part = aug.rotate_point_cloud(part, rng)
    part = aug.rotate_perturbation_point_cloud(part, rng)
    part = aug.random_scale_point_cloud(part, rng)
    part = aug.shift_point_cloud(part, rng)
    batch_xyz[:aug_size] = part
    return batch_xyz, batch_label


def s3dis_train_augment(
    batch_input: np.ndarray,
    batch_label: np.ndarray,
    batch_inner: np.ndarray,
    rng: np.random.Generator,
):
    """ref s3dis_seg/train_s3dis.py:114-142: shuffle batch + point order,
    rotate+perturb the first third, jitter the second third."""
    order = rng.permutation(batch_input.shape[0])
    batch_input = batch_input[order]
    batch_label = batch_label[order]
    batch_inner = batch_inner[order]
    pidx = rng.permutation(batch_input.shape[1])
    batch_input = batch_input[:, pidx]
    batch_label = batch_label[:, pidx]
    batch_inner = batch_inner[:, pidx]

    third = np.int32(batch_input.shape[0] / 3.0)
    part = batch_input[:third, :, 0:3]
    part = aug.rotate_point_cloud(part, rng)
    part = aug.rotate_perturbation_point_cloud(part, rng)
    batch_input[:third, :, 0:3] = part
    part = aug.jitter_point_cloud(batch_input[third : 2 * third, :, 0:3], rng)
    batch_input[third : 2 * third, :, 0:3] = part
    return batch_input, batch_label, batch_inner


def scannet_train_augment(
    batch_input: np.ndarray,
    batch_label: np.ndarray,
    batch_inner: np.ndarray,
    rng: np.random.Generator,
):
    """ref scannet_seg/train_scannet.py:95-129 (heavier than S3DIS):
    first third rotate+perturb+scale+shift+jitter, second third the same
    minus the full rotation."""
    order = rng.permutation(batch_input.shape[0])
    batch_input = batch_input[order]
    batch_label = batch_label[order]
    batch_inner = batch_inner[order]
    pidx = rng.permutation(batch_input.shape[1])
    batch_input = batch_input[:, pidx]
    batch_label = batch_label[:, pidx]
    batch_inner = batch_inner[:, pidx]

    third = np.int32(batch_input.shape[0] / 3.0)
    part = batch_input[:third, :, 0:3]
    part = aug.rotate_point_cloud(part, rng)
    part = aug.rotate_perturbation_point_cloud(part, rng)
    part = aug.random_scale_point_cloud(part, rng)
    part = aug.shift_point_cloud(part, rng)
    part = aug.jitter_point_cloud(part, rng)
    batch_input[:third, :, 0:3] = part
    part = batch_input[third : 2 * third, :, 0:3]
    part = aug.rotate_perturbation_point_cloud(part, rng)
    part = aug.random_scale_point_cloud(part, rng)
    part = aug.shift_point_cloud(part, rng)
    part = aug.jitter_point_cloud(part, rng)
    batch_input[third : 2 * third, :, 0:3] = part
    return batch_input, batch_label, batch_inner


def shapenet_train_augment(
    batch_xyz: np.ndarray, batch_label: np.ndarray, rng: np.random.Generator
):
    """ref shapenet_seg/train_shapenet.py:121-150: shuffle batch + point
    order (with labels), first third rotate+perturb+scale+shift+jitter,
    second third scale+shift+jitter."""
    order = rng.permutation(batch_xyz.shape[0])
    batch_xyz = batch_xyz[order]
    batch_label = batch_label[order]
    pidx = rng.permutation(batch_xyz.shape[1])
    batch_xyz = batch_xyz[:, pidx]
    batch_label = batch_label[:, pidx]

    third = np.int32(batch_xyz.shape[0] / 3.0)
    part = batch_xyz[:third]
    part = aug.rotate_point_cloud(part, rng)
    part = aug.rotate_perturbation_point_cloud(part, rng)
    part = aug.random_scale_point_cloud(part, rng)
    part = aug.shift_point_cloud(part, rng)
    part = aug.jitter_point_cloud(part, rng)
    batch_xyz[:third] = part
    part = batch_xyz[third : 2 * third]
    part = aug.random_scale_point_cloud(part, rng)
    part = aug.shift_point_cloud(part, rng)
    part = aug.jitter_point_cloud(part, rng)
    batch_xyz[third : 2 * third] = part
    return batch_xyz, batch_label
