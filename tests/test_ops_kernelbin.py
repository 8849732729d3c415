"""Spherical kernel bin assignment vs. the NumPy semantics oracle."""

import numpy as np
import pytest

from sph3d_gcn_tpu.ops import _ref
from sph3d_gcn_tpu.ops.kernelbin import spherical_kernel, validate_kernel_size
from sph3d_gcn_tpu.ops.neighbor import build_sphere_neighbor
from sph3d_gcn_tpu.ops.types import Neighborhood


@pytest.mark.parametrize("kernel", [(8, 2, 2), (8, 2, 3), (8, 2, 1), (4, 4, 2)])
def test_bins_match_reference(kernel):
    rng = np.random.default_rng(0)
    db = rng.standard_normal((2, 64, 3)).astype(np.float32)
    radius = 0.8
    nbr = build_sphere_neighbor(db, db, radius=radius, nn_sample=16)
    idx, cnt, dist = (np.asarray(x) for x in nbr)
    ref = _ref.spherical_kernel(db, db, idx, cnt, dist, radius, kernel)
    got = np.asarray(
        spherical_kernel(db, db, Neighborhood(idx, cnt, dist), radius, kernel)
    )
    mask = np.arange(16)[None, None] < cnt[..., None]
    np.testing.assert_array_equal(got[mask], ref[mask])
    # Padding is zeroed in our implementation.
    assert (got[~mask] == 0).all()


def test_self_loop_gets_bin_zero():
    db = np.zeros((1, 4, 3), np.float32)
    db[0, 1:, 0] = [0.2, 0.4, 0.6]
    nbr = build_sphere_neighbor(db, db, radius=1.0, nn_sample=4)
    bins = np.asarray(
        spherical_kernel(db, db, nbr, 1.0, (8, 2, 2))
    )
    # each point's self edge (distance 0) must land in bin 0
    idx = np.asarray(nbr.idx)
    for m in range(4):
        for k in range(int(nbr.count[0, m])):
            if idx[0, m, k] == m:
                assert bins[0, m, k] == 0


def test_bin_range():
    rng = np.random.default_rng(1)
    db = rng.standard_normal((1, 128, 3)).astype(np.float32)
    kernel = (8, 2, 2)
    nbr = build_sphere_neighbor(db, db, radius=0.5, nn_sample=32)
    bins = np.asarray(spherical_kernel(db, db, nbr, 0.5, kernel))
    assert bins.min() >= 0
    assert bins.max() <= np.prod(kernel)


def test_kernel_validation():
    with pytest.raises(ValueError):
        validate_kernel_size((3, 2, 2))  # n odd
    with pytest.raises(ValueError):
        validate_kernel_size((2, 2, 2))  # n too small
    with pytest.raises(ValueError):
        validate_kernel_size((8, 3, 2))  # p odd
    with pytest.raises(ValueError):
        validate_kernel_size((8, 2, 0))  # q zero
    validate_kernel_size((8, 2, 1))
