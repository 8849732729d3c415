"""FPS / IDS / random sampling tests."""

import jax
import numpy as np

from sph3d_gcn_tpu.ops import _ref
from sph3d_gcn_tpu.ops.sample import (
    farthest_point_sample,
    inverse_density_sample,
    random_sample,
)


def test_fps_matches_reference():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((3, 128, 3)).astype(np.float32)
    ref = _ref.farthest_point_sample(32, pts)
    got = np.asarray(farthest_point_sample(32, pts))
    np.testing.assert_array_equal(got, ref)


def test_fps_seeds_at_zero():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((2, 50, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sample(10, pts))
    assert (got[:, 0] == 0).all()


def test_fps_selects_distinct_spread_points():
    # On a line, FPS from index 0 must pick the far end second.
    pts = np.zeros((1, 10, 3), np.float32)
    pts[0, :, 0] = np.arange(10)
    got = np.asarray(farthest_point_sample(3, pts))
    assert got[0, 0] == 0
    assert got[0, 1] == 9
    # third pick is the midpoint (max-min distance)
    assert got[0, 2] in (4, 5)


def test_fps_ignores_extra_channels():
    rng = np.random.default_rng(2)
    pts = rng.standard_normal((1, 64, 3)).astype(np.float32)
    pts6 = np.concatenate([pts, rng.standard_normal((1, 64, 3)).astype(np.float32)], -1)
    np.testing.assert_array_equal(
        np.asarray(farthest_point_sample(16, pts)),
        np.asarray(farthest_point_sample(16, pts6)),
    )


def test_inverse_density_sample_shape_and_bias():
    key = jax.random.key(0)
    prob = np.full((4, 256), 1e-6, np.float32)
    prob[:, :16] = 1e3  # overwhelming density weight on first 16 points
    idx = np.asarray(inverse_density_sample(8, prob, key))
    assert idx.shape == (4, 8)
    assert (idx < 16).all()
    # no duplicates within one draw (top-k without replacement)
    for row in idx:
        assert len(set(row.tolist())) == 8


def test_random_sample_bounds():
    key = jax.random.key(1)
    pts = np.zeros((3, 77, 3), np.float32)
    idx = np.asarray(random_sample(20, pts, key))
    assert idx.shape == (3, 20)
    assert (idx >= 0).all() and (idx < 77).all()
