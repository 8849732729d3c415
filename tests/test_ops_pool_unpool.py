"""Pooling and unpooling vs. the NumPy semantics oracle, incl. gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from sph3d_gcn_tpu.ops import _ref
from sph3d_gcn_tpu.ops.pool import avg_pool3d, max_pool3d
from sph3d_gcn_tpu.ops.unpool import mean_interpolate, weighted_interpolate


def _graph(b=2, n=32, m=12, k=6, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n, (b, m, k)).astype(np.int32)
    cnt = rng.integers(1, k + 1, (b, m)).astype(np.int32)
    return idx, cnt


def test_max_pool_matches_reference():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 5)).astype(np.float32)
    idx, cnt = _graph()
    ref_out, ref_arg = _ref.max_pool3d(x, idx, cnt)
    out, arg = max_pool3d(x, idx, cnt)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(arg), ref_arg)


def test_max_pool_grad_routes_to_argmax():
    x = np.array([[[1.0], [5.0], [3.0]]], np.float32)
    idx = np.array([[[0, 1, 2]]], np.int32)
    cnt = np.array([[3]], np.int32)

    def loss(x_):
        out, _ = max_pool3d(x_, idx, cnt)
        return jnp.sum(out)

    g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    np.testing.assert_allclose(g, [[[0.0], [1.0], [0.0]]])


def test_avg_pool_matches_reference():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 32, 5)).astype(np.float32)
    idx, cnt = _graph(seed=3)
    ref = _ref.avg_pool3d(x, idx, cnt)
    got = np.asarray(avg_pool3d(x, idx, cnt))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_avg_pool_grad_uniform_scatter():
    x = np.zeros((1, 4, 1), np.float32)
    idx = np.array([[[0, 1, 1, 3]]], np.int32)
    cnt = np.array([[3]], np.int32)  # neighbors 0, 1, 1

    def loss(x_):
        return jnp.sum(avg_pool3d(x_, idx, cnt))

    g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    # grad/cnt scattered per edge (ref tf_pool3d_gpu.cu:73-90): point 1 twice.
    np.testing.assert_allclose(g, [[[1 / 3], [2 / 3], [0.0], [0.0]]], rtol=1e-6)


def test_mean_interpolate_matches_reference():
    rng = np.random.default_rng(4)
    coarse = rng.standard_normal((2, 12, 5)).astype(np.float32)
    idx = rng.integers(0, 12, (2, 32, 4)).astype(np.int32)
    cnt = rng.integers(1, 5, (2, 32)).astype(np.int32)
    ref = _ref.mean_interpolate(coarse, idx, cnt)
    got = np.asarray(mean_interpolate(coarse, idx, cnt))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_weighted_interpolate_matches_reference():
    rng = np.random.default_rng(5)
    coarse = rng.standard_normal((2, 12, 5)).astype(np.float32)
    idx = rng.integers(0, 12, (2, 32, 4)).astype(np.int32)
    cnt = rng.integers(1, 5, (2, 32)).astype(np.int32)
    w = rng.random((2, 32, 4)).astype(np.float32)
    # oracle only reads k < cnt, so zero the padding there for a fair compare
    w_ref = w.copy()
    ref = _ref.weighted_interpolate(coarse, w_ref, idx, cnt)
    got = np.asarray(weighted_interpolate(coarse, w, idx, cnt))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_interpolate_grads_are_scatters():
    coarse = np.zeros((1, 3, 1), np.float32)
    idx = np.array([[[0, 1], [2, 2]]], np.int32)
    cnt = np.array([[2, 1]], np.int32)

    def loss(c):
        return jnp.sum(mean_interpolate(c, idx, cnt))

    g = np.asarray(jax.grad(loss)(jnp.asarray(coarse)))
    # fine pt 0: mean of coarse {0,1} -> 0.5 each; fine pt 1: coarse {2} -> 1.
    np.testing.assert_allclose(g, [[[0.5], [0.5], [1.0]]], rtol=1e-6)
