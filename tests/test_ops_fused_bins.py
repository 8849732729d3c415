"""Fused neighbor+bins query vs. the two-op (gather + atan2) path."""

import numpy as np
import pytest

from sph3d_gcn_tpu.ops import _ref
from sph3d_gcn_tpu.ops.neighbor import (
    build_sphere_neighbor,
    build_sphere_neighbor_and_bins,
)
from sph3d_gcn_tpu.ops.kernelbin import spherical_kernel


@pytest.mark.parametrize("kernel", [(8, 2, 2), (8, 2, 3), (8, 2, 1), (4, 2, 2)])
def test_fused_matches_two_op_path(kernel):
    rng = np.random.default_rng(0)
    db = rng.standard_normal((2, 96, 3)).astype(np.float32)
    radius = 0.8
    nbh, filt = build_sphere_neighbor_and_bins(db, db, radius, 16, kernel)
    nbh2 = build_sphere_neighbor(db, db, radius, 16)
    filt2 = spherical_kernel(db, db, nbh2, radius, kernel)
    np.testing.assert_array_equal(np.asarray(nbh.idx), np.asarray(nbh2.idx))
    np.testing.assert_array_equal(np.asarray(nbh.count), np.asarray(nbh2.count))
    np.testing.assert_allclose(np.asarray(nbh.dist), np.asarray(nbh2.dist))
    np.testing.assert_array_equal(np.asarray(filt), np.asarray(filt2))


@pytest.mark.parametrize("kernel", [(8, 2, 2), (4, 2, 2)])
def test_fused_matches_oracle(kernel):
    rng = np.random.default_rng(1)
    db = rng.standard_normal((2, 64, 3)).astype(np.float32)
    radius = 0.7
    nbh, filt = build_sphere_neighbor_and_bins(db, db, radius, 12, kernel)
    idx, cnt, dist = (np.asarray(x) for x in nbh)
    ref = _ref.spherical_kernel(db, db, idx, cnt, dist, radius, kernel)
    mask = np.arange(12)[None, None] < cnt[..., None]
    np.testing.assert_array_equal(np.asarray(filt)[mask], ref[mask])


def test_fused_axis_aligned_boundaries():
    # Points exactly on the axes / diagonals of the azimuth bins.
    db = np.array(
        [
            [
                [0.0, 0.0, 0.0],     # query/self
                [0.5, 0.0, 0.0],     # theta=0
                [-0.5, 0.0, 0.0],    # theta=pi -> clamped -pi
                [0.0, 0.5, 0.0],     # theta=pi/2
                [0.0, -0.5, 0.0],    # theta=-pi/2
                [0.5, 0.5, 0.0],     # theta=pi/4
                [-0.5, -0.5, 0.0],   # theta=-3pi/4
                [0.0, 0.0, 0.5],     # straight up: theta=atan2(0,0)=0
                [0.0, 0.0, -0.5],    # straight down
            ]
        ],
        np.float32,
    )
    q = db[:, :1]
    radius = 1.0
    nbh, filt = build_sphere_neighbor_and_bins(db, q, radius, 9, (8, 2, 2))
    nbh2 = build_sphere_neighbor(db, q, radius, 9)
    filt2 = spherical_kernel(db, q, nbh2, radius, (8, 2, 2))
    np.testing.assert_array_equal(np.asarray(filt), np.asarray(filt2))
    ref = _ref.spherical_kernel(
        db, q, np.asarray(nbh.idx), np.asarray(nbh.count),
        np.asarray(nbh.dist), radius, (8, 2, 2),
    )
    np.testing.assert_array_equal(np.asarray(filt)[0, 0], ref[0, 0])


def test_fused_fallback_for_general_kernel():
    rng = np.random.default_rng(2)
    db = rng.standard_normal((1, 48, 3)).astype(np.float32)
    nbh, filt = build_sphere_neighbor_and_bins(db, db, 0.8, 8, (6, 2, 2))
    nbh2 = build_sphere_neighbor(db, db, 0.8, 8)
    filt2 = spherical_kernel(db, db, nbh2, 0.8, (6, 2, 2))
    np.testing.assert_array_equal(np.asarray(filt), np.asarray(filt2))


def test_fused_cross_set_with_radius_growth():
    db = np.zeros((1, 8, 3), np.float32)
    db[0, :, 0] = np.linspace(0, 0.05, 8)
    q = np.zeros((1, 1, 3), np.float32)
    q[0, 0, 0] = 3.0
    nbh, filt = build_sphere_neighbor_and_bins(db, q, 0.1, 4, (8, 2, 2))
    assert int(nbh.count[0, 0]) >= 1
    nbh2 = build_sphere_neighbor(db, q, 0.1, 4)
    filt2 = spherical_kernel(db, q, nbh2, 0.1, (8, 2, 2))
    np.testing.assert_array_equal(np.asarray(filt), np.asarray(filt2))
