"""Depthwise graph convolution: forward vs. oracle, gradients vs. the
reference's analytic formulas (ref tf_conv3d_gpu.cu:33-101)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph3d_gcn_tpu.ops import _ref
from sph3d_gcn_tpu.ops.conv import depthwise_conv3d
from sph3d_gcn_tpu.ops.neighbor import build_sphere_neighbor
from sph3d_gcn_tpu.ops.kernelbin import spherical_kernel


def _setup(b=2, n=48, m=48, c=6, r=2, k=8, f=33, seed=0):
    rng = np.random.default_rng(seed)
    db = rng.standard_normal((b, n, 3)).astype(np.float32)
    nbr = build_sphere_neighbor(db, db[:, :m], radius=0.8, nn_sample=k)
    bins = np.asarray(
        spherical_kernel(db, db[:, :m], nbr, 0.8, (8, 2, 2))
    )
    x = rng.standard_normal((b, n, c)).astype(np.float32)
    w = (rng.standard_normal((f, c, r)) * 0.1).astype(np.float32)
    return x, w, np.asarray(nbr.idx), np.asarray(nbr.count), bins


@pytest.mark.parametrize("r", [1, 2])
def test_forward_matches_reference(r):
    x, w, idx, cnt, bins = _setup(r=r)
    w = w[:, :, :r]
    ref = _ref.depthwise_conv3d(x, w, idx, cnt, bins)
    got = np.asarray(depthwise_conv3d(x, w, idx, cnt, bins))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_gradients_match_reference_analytic():
    x, w, idx, cnt, bins = _setup(b=1, n=24, m=24, c=4, r=2, k=6)
    g_out = np.random.default_rng(1).standard_normal((1, 24, 8)).astype(np.float32)

    def loss(x_, w_):
        out = depthwise_conv3d(x_, w_, idx, cnt, bins)
        return jnp.sum(out * g_out)

    gx, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    ref_gx, ref_gw = _ref.depthwise_conv3d_grads(x, w, idx, cnt, bins, g_out)
    np.testing.assert_allclose(np.asarray(gx), ref_gx, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), ref_gw, rtol=1e-4, atol=1e-5)


def test_mean_normalization():
    # Single query with 4 identical neighbors in bin 1: output = x * w (mean).
    x = np.ones((1, 4, 1), np.float32) * 3.0
    w = np.zeros((2, 1, 1), np.float32)
    w[1, 0, 0] = 2.0
    idx = np.array([[[0, 1, 2, 3]]], np.int32)
    cnt = np.array([[4]], np.int32)
    bins = np.ones((1, 1, 4), np.int32)
    out = np.asarray(depthwise_conv3d(x, w, idx, cnt, bins))
    np.testing.assert_allclose(out, [[[6.0]]], rtol=1e-6)


def test_padding_ignored():
    # Entries past nn_count must not contribute even with junk indices/bins.
    x = np.random.default_rng(2).standard_normal((1, 8, 3)).astype(np.float32)
    w = np.random.default_rng(3).standard_normal((5, 3, 1)).astype(np.float32)
    idx = np.array([[[1, 2, 7, 7]]], np.int32)
    bins = np.array([[[1, 2, 4, 4]]], np.int32)
    cnt2 = np.array([[2]], np.int32)
    out2 = np.asarray(depthwise_conv3d(x, w, idx, cnt2, bins))
    ref2 = _ref.depthwise_conv3d(x, w, idx, cnt2, bins)
    np.testing.assert_allclose(out2, ref2, rtol=1e-5, atol=1e-6)


def test_chunked_path_equivalence():
    # Large M to exercise the internal lax.map chunking.
    x, w, idx, cnt, bins = _setup(b=1, n=200, m=200, c=3, r=1, k=8, seed=4)
    w = w[:, :, :1]
    ref = _ref.depthwise_conv3d(x, w, idx, cnt, bins)
    got = np.asarray(depthwise_conv3d(x, w, idx, cnt, bins))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
