"""Axis sorting for the locality-windowed edge engine."""

import numpy as np

from sph3d_gcn_tpu.ops.locality import choose_sort_axis, spatial_sort


def test_spatial_sort_permutation_inverse():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((2, 128, 3)).astype(np.float32)
    perm, rank = (np.asarray(x) for x in spatial_sort(pts, radius=0.1))
    for b in range(2):
        assert sorted(perm[b].tolist()) == list(range(128))
        np.testing.assert_array_equal(rank[b][perm[b]], np.arange(128))
    # sorted rows are monotone along the chosen axis
    axis = np.asarray(choose_sort_axis(pts, 0.1))
    for b in range(2):
        key = pts[b, perm[b], axis[b]]
        assert (np.diff(key) >= 0).all()


def test_choose_sort_axis_avoids_dominant_plane():
    # A scene block: half the points on a z=0 floor plane. z has the largest
    # extent but the floor makes its slab occupancy terrible — the chooser
    # must pick x or y.
    rng = np.random.default_rng(2)
    bulk = rng.uniform([0, 0, 0], [1.5, 1.5, 3.0], (2048, 3))
    floor = np.column_stack(
        [rng.uniform(0, 1.5, 2048), rng.uniform(0, 1.5, 2048), np.zeros(2048)]
    )
    pts = np.concatenate([bulk, floor])[None].astype(np.float32)
    axis = int(np.asarray(choose_sort_axis(pts, 0.1))[0])
    assert axis in (0, 1)


def test_spatial_sort_window_bound():
    # After sorting, all neighbors within radius lie inside the sorted-row
    # slab |axis - query_axis| < radius — the windowed engine's guarantee.
    rng = np.random.default_rng(3)
    pts = rng.standard_normal((1, 512, 3)).astype(np.float32)
    radius = 0.4
    perm, _ = (np.asarray(x) for x in spatial_sort(pts, radius))
    axis = int(np.asarray(choose_sort_axis(pts, radius))[0])
    s = pts[0, perm[0]]
    key = s[:, axis]
    d = np.linalg.norm(s[:, None, :] - s[None, :, :], axis=-1)
    qi, ni = np.where(d < radius)
    assert (np.abs(key[ni] - key[qi]) < radius).all()


def test_sort_indices_small_matches_jnp_sort():
    import jax.numpy as jnp

    from sph3d_gcn_tpu.ops.locality import sort_indices_small

    rng = np.random.default_rng(5)
    # with-replacement draws include duplicates — the stable compare-rank
    # sort must match jnp.sort exactly anyway
    idx = rng.integers(0, 50, (4, 64)).astype(np.int32)
    got = np.asarray(sort_indices_small(jnp.asarray(idx)))
    np.testing.assert_array_equal(got, np.sort(idx, axis=1))
