"""Validate the vectorized NumPy reference (scripts/numpy_reference.py)
against the loop oracle (ops/_ref.py) at small N, and the full-model NumPy
forwards against the JAX models at tiny configs.

This is the foundation of the full-scale logit-parity evidence
(PARITY_RESULTS.md): the loop oracle is the CUDA-semantics contract, the
vectorized version must match it exactly, and the model forwards must match
the JAX models in eval mode.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)

import numpy_reference as npref  # noqa: E402

from sph3d_gcn_tpu.configs import SPH3DConfig, modelnet_config  # noqa: E402
from sph3d_gcn_tpu.models import SPH3DModelNet, SPH3DSceneSeg  # noqa: E402
from sph3d_gcn_tpu.ops import _ref  # noqa: E402


def _cloud(rng, b, n, d=3):
    return rng.standard_normal((b, n, d)).astype(np.float32)


def test_vectorized_sphere_matches_loop_oracle():
    rng = np.random.default_rng(0)
    db = _cloud(rng, 2, 120)
    q = _cloud(rng, 2, 40)
    for radius, k in [(0.5, 6), (0.9, 12)]:
        ri, rc, rd = _ref.sphere_neighbor(db, q, radius, k)
        gi, gc, gd = npref.sphere_neighbor(db, q, radius, k)
        np.testing.assert_array_equal(gi, ri)
        np.testing.assert_array_equal(gc, rc)
        # distances agree to 1 ULP (np.dot BLAS accumulation vs np.sum)
        np.testing.assert_allclose(gd, rd, rtol=1e-6, atol=0)


def test_vectorized_fps_and_kernel_match_loop_oracle():
    rng = np.random.default_rng(1)
    db = _cloud(rng, 2, 100)
    np.testing.assert_array_equal(
        npref.farthest_point_sample(30, db),
        _ref.farthest_point_sample(30, db),
    )
    idx, cnt, dist = _ref.sphere_neighbor(db, db, 0.7, 8)
    np.testing.assert_array_equal(
        npref.spherical_kernel(db, db, idx, cnt, dist, 0.7, (8, 2, 2)),
        _ref.spherical_kernel(db, db, idx, cnt, dist, 0.7, (8, 2, 2)),
    )


def test_vectorized_conv_pool_interp_match_loop_oracle():
    rng = np.random.default_rng(2)
    db = _cloud(rng, 2, 90)
    feats = _cloud(rng, 2, 90, 5)
    filt = rng.standard_normal((33, 5, 2)).astype(np.float32)
    idx, cnt, dist = _ref.sphere_neighbor(db, db, 0.7, 7)
    bins = _ref.spherical_kernel(db, db, idx, cnt, dist, 0.7, (8, 2, 2))
    np.testing.assert_allclose(
        npref.depthwise_conv3d(feats, filt, idx, cnt, bins),
        _ref.depthwise_conv3d(feats, filt, idx, cnt, bins),
        rtol=1e-6, atol=1e-6,
    )
    out_v, arg_v = npref.max_pool3d(feats, idx, cnt)
    out_r, arg_r = _ref.max_pool3d(feats, idx, cnt)
    np.testing.assert_array_equal(out_v, out_r)
    np.testing.assert_array_equal(arg_v, arg_r)
    np.testing.assert_allclose(
        npref.mean_interpolate(feats, idx, cnt),
        _ref.mean_interpolate(feats, idx, cnt),
        rtol=1e-6, atol=1e-6,
    )
    w = rng.random((2, 90, 7)).astype(np.float32)
    np.testing.assert_allclose(
        npref.weighted_interpolate(feats, w, idx, cnt),
        _ref.weighted_interpolate(feats, w, idx, cnt),
        rtol=1e-6, atol=1e-6,
    )


def test_numpy_modelnet_forward_matches_jax():
    cfg = modelnet_config(num_input=512)
    model = SPH3DModelNet(cfg)
    pts = _cloud(np.random.default_rng(3), 2, 512)
    variables = model.init(jax.random.key(0), pts)
    ref = np.asarray(model.apply(variables, pts, train=False))
    got = npref.forward_modelnet(
        jax.tree.map(np.asarray, variables), cfg, pts
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("unpool", ["mean", "weighted"])
def test_numpy_scene_seg_forward_matches_jax(unpool):
    cfg = SPH3DConfig(
        num_input=64,
        num_cls=5,
        mlp=8,
        num_sample=(32, 16),
        radius=(1.5, 3.0),
        nn_uplimit=(8, 8),
        channels=((8, 8), (16, 16)),
        multiplier=((2, 2), (2, 2)),
        weight_decay=None,
        unpool_method=unpool,
    )
    model = SPH3DSceneSeg(cfg)
    pts = _cloud(np.random.default_rng(4), 2, 64, 9)
    variables = model.init(jax.random.key(0), pts)
    ref = np.asarray(model.apply(variables, pts, train=False))
    got = npref.forward_scene_seg(
        jax.tree.map(np.asarray, variables), cfg, pts
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
