"""Locality-windowed edge engine vs the plain-gather ops (exactness)."""

import jax
import jax.numpy as jnp
import numpy as np

from sph3d_gcn_tpu.ops.conv import depthwise_conv3d
from sph3d_gcn_tpu.ops.gather import gather_features
from sph3d_gcn_tpu.ops.pool import avg_pool3d, max_pool3d
from sph3d_gcn_tpu.ops.unpool import mean_interpolate, weighted_interpolate
from sph3d_gcn_tpu.ops.windowed import windowed_gather


def _local_edges(rng, b, n, m, k, spread):
    """Sorted-ish neighbor indices with a bounded spread (windowed regime)."""
    base = np.sort(rng.integers(0, n, (b, m)))
    idx = np.clip(
        base[..., None] + rng.integers(-spread, spread, (b, m, k)), 0, n - 1
    ).astype(np.int32)
    count = rng.integers(1, k + 1, (b, m)).astype(np.int32)
    return idx, count


def test_windowed_gather_matches_plain():
    rng = np.random.default_rng(0)
    b, n, c, m, k = 2, 300, 7, 260, 9
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    idx, count = _local_edges(rng, b, n, m, k, spread=30)
    valid = np.arange(k)[None, None, :] < count[..., None]
    ref = np.asarray(gather_features(jnp.array(feats), jnp.array(idx)))
    ref = np.where(valid[..., None], ref, 0.0)
    for window in (128, 256, 512):  # 512 > n: dense degenerate case
        got = np.asarray(
            windowed_gather(
                jnp.array(feats), jnp.array(idx), jnp.array(count),
                window=window,
            )
        )
        np.testing.assert_array_equal(got, ref)


def test_windowed_gather_overflow_falls_back():
    rng = np.random.default_rng(1)
    b, n, c, m, k = 1, 400, 5, 256, 4
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    idx, count = _local_edges(rng, b, n, m, k, spread=10)
    idx[0, 0, 0] = n - 1  # first tile must also reach row 0 neighbors
    idx[0, 1, 0] = 0
    count[0, :2] = k
    valid = np.arange(k)[None, None, :] < count[..., None]
    ref = np.asarray(gather_features(jnp.array(feats), jnp.array(idx)))
    ref = np.where(valid[..., None], ref, 0.0)
    got = np.asarray(
        windowed_gather(
            jnp.array(feats), jnp.array(idx), jnp.array(count), window=128
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_windowed_gather_grad_matches_plain():
    rng = np.random.default_rng(2)
    b, n, c, m, k = 2, 256, 6, 256, 5
    feats = jnp.array(rng.standard_normal((b, n, c)).astype(np.float32))
    idx, count = _local_edges(rng, b, n, m, k, spread=20)
    idx, count = jnp.array(idx), jnp.array(count)
    valid = jnp.arange(k)[None, None, :] < count[..., None]

    def loss_w(f):
        return jnp.sum(
            jnp.sin(windowed_gather(f, idx, count, window=128)) * 0.3
        )

    def loss_p(f):
        g = jnp.where(valid[..., None], gather_features(f, idx), 0.0)
        return jnp.sum(jnp.sin(g) * 0.3)

    gw = jax.grad(loss_w)(feats)
    gp = jax.grad(loss_p)(feats)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gp), atol=1e-5)


def test_windowed_conv_matches_plain():
    rng = np.random.default_rng(3)
    b, n, c, m, k, f_bins, mult = 2, 260, 8, 250, 7, 9, 2
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    filt = rng.standard_normal((f_bins, c, mult)).astype(np.float32)
    idx, count = _local_edges(rng, b, n, m, k, spread=25)
    bins = rng.integers(0, f_bins, (b, m, k)).astype(np.int32)
    args = (jnp.array(feats), jnp.array(filt), jnp.array(idx),
            jnp.array(count), jnp.array(bins))
    ref = np.asarray(depthwise_conv3d(*args))
    got = np.asarray(depthwise_conv3d(*args, window=128))
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)

    # gradients (both input and filter) agree too
    def loss(fn_kwargs):
        def inner(feats, filt):
            out = depthwise_conv3d(
                feats, filt, args[2], args[3], args[4], **fn_kwargs
            )
            return jnp.sum(jnp.sin(out))
        return inner

    g_ref = jax.grad(loss({}), argnums=(0, 1))(args[0], args[1])
    g_win = jax.grad(loss({"window": 128}), argnums=(0, 1))(args[0], args[1])
    for a, e in zip(g_win, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-5)


def test_windowed_pools_match_plain():
    rng = np.random.default_rng(4)
    b, n, c, m, k = 2, 300, 6, 140, 8
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    idx, count = _local_edges(rng, b, n, m, k, spread=30)
    args = (jnp.array(feats), jnp.array(idx), jnp.array(count))

    out_ref, arg_ref = max_pool3d(*args)
    out_win, arg_win = max_pool3d(*args, window=128)
    np.testing.assert_array_equal(np.asarray(out_win), np.asarray(out_ref))
    np.testing.assert_array_equal(np.asarray(arg_win), np.asarray(arg_ref))

    np.testing.assert_allclose(
        np.asarray(avg_pool3d(*args, window=128)),
        np.asarray(avg_pool3d(*args)), rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mean_interpolate(*args, window=128)),
        np.asarray(mean_interpolate(*args)), rtol=1e-6, atol=1e-6,
    )
    weight = rng.random((b, m, k)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(weighted_interpolate(
            args[0], jnp.array(weight), args[1], args[2], window=128)),
        np.asarray(weighted_interpolate(
            args[0], jnp.array(weight), args[1], args[2])),
        rtol=1e-6, atol=1e-6,
    )


def test_windowed_model_matches_plain_model():
    """Full ModelNet forward: windowed+sorted config == plain config up to
    the input permutation (classification head consumes per-level maxima
    and the centroid graph — invariant to input order only when the graph
    itself is order-independent, so compare on the SAME pre-sorted input
    with sorting disabled vs windows enabled)."""
    import dataclasses

    from sph3d_gcn_tpu.configs import modelnet_config
    from sph3d_gcn_tpu.models import SPH3DModelNet

    rng = np.random.default_rng(5)
    cfg = modelnet_config(num_input=256)
    # pre-sort the cloud so both paths see identical point order
    pts = rng.standard_normal((2, 256, 3)).astype(np.float32)
    order = np.argsort(pts[..., 0], axis=1)
    pts = np.take_along_axis(pts, order[..., None], axis=1)

    cfg_win = dataclasses.replace(cfg, windows=(128,) * len(cfg.num_sample))
    model = SPH3DModelNet(cfg)
    model_win = SPH3DModelNet(cfg_win)
    variables = model.init(jax.random.key(0), pts[:1], train=False)
    ref = np.asarray(model.apply(variables, pts, train=False))
    got = np.asarray(model_win.apply(variables, pts, train=False))
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-5)
