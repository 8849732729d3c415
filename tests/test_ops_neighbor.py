"""Sphere/cube neighbor queries vs. the NumPy semantics oracle."""

import numpy as np
import pytest

from sph3d_gcn_tpu.ops import _ref
from sph3d_gcn_tpu.ops.neighbor import build_cube_neighbor, build_sphere_neighbor


def _random_cloud(rng, b, n, scale=1.0):
    return (rng.standard_normal((b, n, 3)) * scale).astype(np.float32)


@pytest.mark.parametrize("radius,k", [(0.5, 8), (0.3, 4), (1.0, 16)])
def test_sphere_matches_reference(radius, k):
    rng = np.random.default_rng(0)
    db = _random_cloud(rng, 2, 64)
    q = _random_cloud(rng, 2, 32)
    ref_idx, ref_cnt, ref_dist = _ref.sphere_neighbor(db, q, radius, k)
    nbr = build_sphere_neighbor(db, q, radius=radius, nn_sample=k)
    np.testing.assert_array_equal(np.asarray(nbr.count), ref_cnt)
    # Compare only valid slots (padding content is unspecified in the ref).
    mask = np.arange(k)[None, None] < ref_cnt[..., None]
    np.testing.assert_array_equal(np.asarray(nbr.idx)[mask], ref_idx[mask])
    np.testing.assert_allclose(
        np.asarray(nbr.dist)[mask], ref_dist[mask], rtol=2e-5, atol=2e-5
    )


def test_sphere_self_query_includes_self():
    rng = np.random.default_rng(1)
    pts = _random_cloud(rng, 1, 40)
    nbr = build_sphere_neighbor(pts, pts, radius=0.7, nn_sample=40)
    idx, cnt = np.asarray(nbr.idx), np.asarray(nbr.count)
    assert (cnt >= 1).all()
    for m in range(40):
        valid = idx[0, m, : cnt[0, m]]
        assert m in valid  # self at distance 0 is always in range


def test_sphere_radius_growth_finds_isolated_point():
    # One far-away point has no neighbor at the base radius: the query must
    # grow the radius by +0.05 steps until it finds one
    # (ref tf_nnquery_gpu.cu:30-60). Query is the far point vs. a db cluster.
    db = np.zeros((1, 8, 3), np.float32)
    db[0, :, 0] = np.linspace(0, 0.05, 8)
    q = np.zeros((1, 1, 3), np.float32)
    q[0, 0, 0] = 3.0  # 2.95+ away from everything
    ref_idx, ref_cnt, ref_dist = _ref.sphere_neighbor(db, q, 0.1, 4)
    nbr = build_sphere_neighbor(db, q, radius=0.1, nn_sample=4)
    np.testing.assert_array_equal(np.asarray(nbr.count), ref_cnt)
    mask = np.arange(4)[None, None] < ref_cnt[..., None]
    np.testing.assert_array_equal(np.asarray(nbr.idx)[mask], ref_idx[mask])
    assert ref_cnt[0, 0] >= 1


def test_sphere_count_clamped_but_counts_all():
    # 20 coincident points, K=5: count must be 5 (clamped), first 5 indices.
    db = np.zeros((1, 20, 3), np.float32)
    q = np.zeros((1, 1, 3), np.float32)
    nbr = build_sphere_neighbor(db, q, radius=0.5, nn_sample=5)
    assert int(nbr.count[0, 0]) == 5
    np.testing.assert_array_equal(np.asarray(nbr.idx)[0, 0], np.arange(5))


def test_sphere_dist_is_sqrt_space():
    db = np.array([[[0.16, 0.0, 0.0], [0.0, 0.0, 0.0]]], np.float32)
    q = np.zeros((1, 1, 3), np.float32)
    nbr = build_sphere_neighbor(db, q, radius=0.5, nn_sample=2)
    # Euclidean distance 0.16 -> stored sqrt(0.16) = 0.4.
    np.testing.assert_allclose(np.asarray(nbr.dist)[0, 0, 0], 0.4, rtol=1e-6)


def test_sphere_large_tiled_query():
    # Exercise the tiling path (M not a multiple of the tile size).
    rng = np.random.default_rng(2)
    db = _random_cloud(rng, 1, 300)
    q = _random_cloud(rng, 1, 300)
    ref_idx, ref_cnt, _ = _ref.sphere_neighbor(db, q, 0.5, 8)
    nbr = build_sphere_neighbor(db, q, radius=0.5, nn_sample=8)
    np.testing.assert_array_equal(np.asarray(nbr.count), ref_cnt)
    mask = np.arange(8)[None, None] < ref_cnt[..., None]
    np.testing.assert_array_equal(np.asarray(nbr.idx)[mask], ref_idx[mask])


@pytest.mark.parametrize("length,gridsize,k", [(0.6, 3, 8), (1.0, 2, 4)])
def test_cube_matches_reference(length, gridsize, k):
    rng = np.random.default_rng(3)
    db = _random_cloud(rng, 2, 48)
    q = _random_cloud(rng, 2, 16)
    ref_idx, ref_bin, ref_cnt = _ref.cube_neighbor(db, q, length, k, gridsize)
    nbr = build_cube_neighbor(db, q, length=length, nn_sample=k, gridsize=gridsize)
    np.testing.assert_array_equal(np.asarray(nbr.count), ref_cnt)
    mask = np.arange(k)[None, None] < ref_cnt[..., None]
    np.testing.assert_array_equal(np.asarray(nbr.idx)[mask], ref_idx[mask])
    np.testing.assert_array_equal(np.asarray(nbr.bin)[mask], ref_bin[mask])


def test_dilation_rate_scales_radius():
    rng = np.random.default_rng(4)
    db = _random_cloud(rng, 1, 32)
    q = _random_cloud(rng, 1, 8)
    a = build_sphere_neighbor(db, q, radius=0.2, nn_sample=8, dilation_rate=2.0)
    b = build_sphere_neighbor(db, q, radius=0.4, nn_sample=8)
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))


def test_extra_feature_channels_ignored():
    rng = np.random.default_rng(5)
    db = _random_cloud(rng, 1, 32)
    db6 = np.concatenate([db, rng.standard_normal((1, 32, 3)).astype(np.float32)], -1)
    a = build_sphere_neighbor(db6, db6, radius=0.5, nn_sample=8)
    b = build_sphere_neighbor(db, db, radius=0.5, nn_sample=8)
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))


def test_self_graph_flag_equivalent_for_self_queries():
    rng = np.random.default_rng(11)
    pts = _random_cloud(rng, 2, 96)
    a = build_sphere_neighbor(pts, pts, radius=0.5, nn_sample=8)
    b = build_sphere_neighbor(pts, pts, radius=0.5, nn_sample=8, self_graph=True)
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
    np.testing.assert_allclose(np.asarray(a.dist), np.asarray(b.dist))
