"""Morton-order spatial sorting (groundwork for locality-windowed gathers)."""

import numpy as np

from sph3d_gcn_tpu.ops.locality import morton_codes, spatial_sort


def test_morton_codes_locality():
    # nearby points get nearby codes more often than far ones
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (1, 256, 3)).astype(np.float32)
    codes = np.asarray(morton_codes(pts))[0]
    assert codes.min() >= 0
    # identical points -> identical codes
    pts2 = np.concatenate([pts, pts[:, :1]], axis=1)
    codes2 = np.asarray(morton_codes(pts2))[0]
    assert codes2[-1] == codes2[0]


def test_spatial_sort_permutation_inverse():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((2, 128, 3)).astype(np.float32)
    perm, rank = (np.asarray(x) for x in spatial_sort(pts))
    for b in range(2):
        assert sorted(perm[b].tolist()) == list(range(128))
        np.testing.assert_array_equal(rank[b][perm[b]], np.arange(128))
    # sorted coordinates are spatially smoother than the input order
    sorted_pts = np.take_along_axis(pts, perm[..., None], axis=1)
    step_sorted = np.linalg.norm(np.diff(sorted_pts, axis=1), axis=-1).mean()
    step_orig = np.linalg.norm(np.diff(pts, axis=1), axis=-1).mean()
    assert step_sorted < step_orig
