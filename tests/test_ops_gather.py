"""Shared gather op: forward equivalence and sort-based scatter VJP."""

import jax
import jax.numpy as jnp
import numpy as np

from sph3d_gcn_tpu.ops.gather import (
    gather_features,
    segment_scatter_add,
)


def test_gather_forward():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, (2, 5, 3)).astype(np.int32)
    out = np.asarray(gather_features(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(2):
        for m in range(5):
            for k in range(3):
                np.testing.assert_array_equal(out[b, m, k], feats[b, idx[b, m, k]])


def test_segment_scatter_add_matches_numpy():
    rng = np.random.default_rng(1)
    vals = rng.standard_normal((3, 40, 5)).astype(np.float32)
    idx = rng.integers(0, 12, (3, 40)).astype(np.int32)
    got = np.asarray(segment_scatter_add(jnp.asarray(vals), jnp.asarray(idx), 12))
    want = np.zeros((3, 12, 5), np.float32)
    for b in range(3):
        for e in range(40):
            want[b, idx[b, e]] += vals[b, e]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_scatter_add_empty_and_full_targets():
    vals = np.ones((1, 4, 2), np.float32)
    idx = np.array([[3, 3, 3, 3]], np.int32)
    got = np.asarray(segment_scatter_add(jnp.asarray(vals), jnp.asarray(idx), 5))
    want = np.zeros((1, 5, 2), np.float32)
    want[0, 3] = 4.0
    np.testing.assert_allclose(got, want)


def test_gather_vjp_matches_autodiff_scatter():
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((2, 16, 6)).astype(np.float32)
    idx = rng.integers(0, 16, (2, 8, 4)).astype(np.int32)
    cotangent = rng.standard_normal((2, 8, 4, 6)).astype(np.float32)

    def loss_custom(f):
        return jnp.sum(gather_features(f, idx) * cotangent)

    def loss_plain(f):
        b = idx.shape[0]
        flat = jnp.take_along_axis(f, idx.reshape(b, -1, 1), axis=1)
        g = flat.reshape(idx.shape + (f.shape[-1],))
        return jnp.sum(g * cotangent)

    g_custom = np.asarray(jax.grad(loss_custom)(jnp.asarray(feats)))
    g_plain = np.asarray(jax.grad(loss_plain)(jnp.asarray(feats)))
    np.testing.assert_allclose(g_custom, g_plain, rtol=1e-4, atol=1e-5)


def test_gather_vjp_deterministic():
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((1, 32, 8)).astype(np.float32)
    idx = rng.integers(0, 32, (1, 64, 8)).astype(np.int32)

    def loss(f):
        return jnp.sum(gather_features(f, idx) ** 2)

    g1 = np.asarray(jax.grad(loss)(jnp.asarray(feats)))
    g2 = np.asarray(jax.grad(loss)(jnp.asarray(feats)))
    np.testing.assert_array_equal(g1, g2)
