"""Layer library tests: BN-after-activation ordering, unpool weight quirk,
graph builders, L2 regularization collection."""

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from sph3d_gcn_tpu.nn.graph import (
    build_global_graph,
    build_graph,
    build_graph_deconv,
    gather_neighborhood,
    gather_points,
)
from sph3d_gcn_tpu.nn.layers import (
    PointwiseConv3d,
    l2_regularization,
    unpool3d,
)
from sph3d_gcn_tpu.ops.types import Neighborhood


def test_pointwise_conv_is_matmul_with_elu():
    model = PointwiseConv3d(4, with_bn=False, with_bias=False)
    x = np.random.default_rng(0).standard_normal((2, 8, 3)).astype(np.float32)
    v = model.init(jax.random.key(0), x)
    out = model.apply(v, x)
    w = np.asarray(v["params"]["weights"])
    expected = jax.nn.elu(x @ w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)


def test_bn_applied_after_activation():
    # With BN after ELU (ref sph3gcn_util.py:157-161), train-mode output is
    # normalized over the *activated* values: mean ~0 even though ELU output
    # of positive-mean input would have nonzero mean.
    model = PointwiseConv3d(4, with_bn=True, with_bias=False)
    x = (
        np.random.default_rng(1).standard_normal((4, 16, 3)).astype(np.float32)
        + 2.0
    )
    v = model.init(jax.random.key(0), x, train=False)
    out, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
    means = np.asarray(out).reshape(-1, 4).mean(axis=0)
    np.testing.assert_allclose(means, 0.0, atol=1e-4)


def test_bn_momentum_and_epsilon():
    model = PointwiseConv3d(2, with_bn=True)
    x = np.random.default_rng(2).standard_normal((2, 8, 3)).astype(np.float32)
    v = model.init(jax.random.key(0), x, train=False)
    _, mut = model.apply(v, x, train=True, mutable=["batch_stats"])
    # momentum 0.99: running mean moves only 1% toward the batch mean.
    new_mean = np.asarray(jax.tree_util.tree_leaves(mut["batch_stats"])[0])
    assert np.all(np.abs(new_mean) > 0)  # moved
    assert np.all(np.abs(new_mean) < 0.2)  # but only by ~1%


def test_weighted_unpool_distance_proportional():
    # Quirk: weights are proportional to distance (ref sph3gcn_util.py:317-321).
    coarse = jnp.asarray(np.array([[[1.0], [2.0]]], np.float32))
    idx = jnp.asarray(np.array([[[0, 1]]], np.int32))
    cnt = jnp.asarray(np.array([[2]], np.int32))
    dist = jnp.asarray(np.array([[[1.0, 3.0]]], np.float32))
    nbh = Neighborhood(idx, cnt, dist)
    out = unpool3d(coarse, nbh, method="weighted")
    # weights = (d + eps) / (sum_d + eps) ~ [0.25, 0.75] -> 0.25*1 + 0.75*2
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 1.75, rtol=1e-5)


def test_build_graph_fps_subsample():
    rng = np.random.default_rng(3)
    xyz = rng.standard_normal((2, 64, 3)).astype(np.float32)
    nbh, idx = build_graph(xyz, radius=0.8, nn_uplimit=8, num_sample=16,
                           sample_method="FPS")
    assert nbh.idx.shape == (2, 64, 8)
    assert idx.shape == (2, 16)
    assert (np.asarray(idx)[:, 0] == 0).all()  # FPS seed
    coarse = gather_points(jnp.asarray(xyz), idx)
    assert coarse.shape == (2, 16, 3)
    sub = gather_neighborhood(nbh, idx)
    assert sub.idx.shape == (2, 16, 8)
    np.testing.assert_array_equal(
        np.asarray(sub.idx[0, 0]), np.asarray(nbh.idx[0, 0])
    )


def test_build_graph_no_subsample():
    xyz = np.zeros((1, 8, 3), np.float32)
    nbh, idx = build_graph(xyz, radius=0.5, nn_uplimit=4, num_sample=None)
    assert idx is None
    assert nbh.idx.shape == (1, 8, 4)


def test_build_graph_deconv_shapes():
    rng = np.random.default_rng(4)
    coarse = rng.standard_normal((1, 16, 3)).astype(np.float32)
    fine = rng.standard_normal((1, 32, 3)).astype(np.float32)
    intra, inter = build_graph_deconv(coarse, fine, radius=1.0, nn_uplimit=8)
    assert intra.idx.shape == (1, 16, 8)
    assert inter.idx.shape == (1, 32, 8)  # fine queries over coarse db
    assert (np.asarray(inter.idx) < 16).all()


def test_build_global_graph_connects_all():
    rng = np.random.default_rng(5)
    xyz = rng.standard_normal((1, 24, 3)).astype(np.float32)
    query = xyz.mean(axis=1, keepdims=True)
    nbh = build_global_graph(xyz, query, radius=100.0)
    assert nbh.idx.shape == (1, 1, 24)
    assert int(nbh.count[0, 0]) == 24


def test_l2_regularization_collects_kernels_and_bn():
    class Tiny(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            return PointwiseConv3d(4, with_bn=True, with_bias=True)(x, train)

    x = np.ones((1, 4, 3), np.float32)
    v = Tiny().init(jax.random.key(0), x)
    reg = float(l2_regularization(v["params"]))
    # manual: kernels + BN scale/bias (scale init 1 -> 4*0.5 = 2), biases excluded
    params = v["params"]["PointwiseConv3d_0"]
    w = np.asarray(params["weights"])
    expected = 0.5 * np.sum(w**2) + 0.5 * 4  # + 0.5*sum(bias^2)=0
    np.testing.assert_allclose(reg, expected, rtol=1e-5)
