"""Dense windowed engine vs the classic per-edge ops (exact equivalence).

The dense maps must reproduce the classic pipeline bit-for-bit whenever
the provable window bound holds (axis-sorted cloud, slab <= W): same
selection (first-K in point order), same counts, same spherical bins, and
identical conv/pool/unpool outputs and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph3d_gcn_tpu.ops.conv import depthwise_conv3d
from sph3d_gcn_tpu.ops.dense import (
    build_dense_graph,
    dense_avg_pool3d,
    dense_depthwise_conv3d,
    dense_ids_prob,
    dense_max_pool3d,
    dense_weighted_interpolate,
)
from sph3d_gcn_tpu.ops.neighbor import build_sphere_neighbor_and_bins
from sph3d_gcn_tpu.ops.pool import avg_pool3d, max_pool3d
from sph3d_gcn_tpu.ops.unpool import weighted_interpolate

KERNEL = (8, 2, 2)
F_BINS = 8 * 2 * 2 + 1


def _sorted_cloud(rng, b, n):
    pts = rng.standard_normal((b, n, 3)).astype(np.float32)
    order = np.argsort(pts[..., 0], axis=1)
    return np.take_along_axis(pts, order[..., None], axis=1)


def _edge_maps_from_dense(dnbh):
    """Expand dense maps back to per-edge (idx, bins) for comparison.
    Grouped maps (sort-grouped bin renumbering, ops/dense.py zone-split
    conv) are mapped back to ref bin order via _grouped_perm."""
    from sph3d_gcn_tpu.ops.dense import _grouped_perm

    packed = np.asarray(dnbh.packed)
    s_blk = np.asarray(dnbh.s_blk)
    b, n_t, t, w = packed.shape
    if dnbh.grouped:
        perm = np.asarray(_grouped_perm(F_BINS))
        axis = np.asarray(dnbh.axis)
    rows = []
    for bi in range(b):
        for ti in range(n_t):
            for qi in range(t):
                m = ti * t + qi
                if m >= dnbh.num_query:
                    continue
                ws = np.where(packed[bi, ti, qi] > 0)[0]
                idx = ws + s_blk[bi, ti] * 128
                bins = packed[bi, ti, qi, ws].astype(np.int32) - 1
                if dnbh.grouped:
                    bins = perm[axis[bi]][bins]
                rows.append((bi, m, idx, bins))
    return rows


def test_dense_graph_matches_classic_query():
    rng = np.random.default_rng(0)
    pts = jnp.array(_sorted_cloud(rng, 2, 300))
    radius, k = 0.35, 9
    nbh, filt = build_sphere_neighbor_and_bins(
        pts, pts, radius, k, KERNEL, self_graph=True
    )
    dnbh = build_dense_graph(
        pts, pts, radius, k, KERNEL, window=384, self_graph=True
    )
    assert bool(dnbh.ok)
    np.testing.assert_array_equal(
        np.asarray(dnbh.count), np.asarray(nbh.count)
    )
    idx_ref = np.asarray(nbh.idx)
    bins_ref = np.asarray(filt)
    cnt = np.asarray(nbh.count)
    for bi, m, idx, bins in _edge_maps_from_dense(dnbh):
        c = cnt[bi, m]
        assert len(idx) == c, (bi, m, len(idx), c)
        np.testing.assert_array_equal(idx, idx_ref[bi, m, :c])
        np.testing.assert_array_equal(bins, bins_ref[bi, m, :c])


def test_dense_graph_flags_unsorted_and_overflow():
    rng = np.random.default_rng(1)
    pts_unsorted = jnp.array(
        rng.standard_normal((1, 256, 3)).astype(np.float32)
    )
    d = build_dense_graph(
        pts_unsorted, pts_unsorted, 0.3, 8, None, window=128,
        self_graph=True,
    )
    assert not bool(d.ok)
    pts = jnp.array(_sorted_cloud(rng, 1, 512))
    # radius so large the slab cannot fit one 128 window
    d = build_dense_graph(pts, pts, 2.0, 8, None, window=128,
                          self_graph=True)
    assert not bool(d.ok)
    # full-width window is always provably covered on sorted input
    d = build_dense_graph(pts, pts, 2.0, 8, None, window=512,
                          self_graph=True)
    assert bool(d.ok)


def test_dense_conv_matches_classic():
    rng = np.random.default_rng(2)
    b, n, c, k, mult = 2, 300, 6, 7, 2
    pts = jnp.array(_sorted_cloud(rng, b, n))
    feats = jnp.array(rng.standard_normal((b, n, c)).astype(np.float32))
    filt = jnp.array(
        rng.standard_normal((F_BINS, c, mult)).astype(np.float32)
    )
    radius = 0.35
    nbh, bins = build_sphere_neighbor_and_bins(
        pts, pts, radius, k, KERNEL, self_graph=True
    )
    dnbh = build_dense_graph(
        pts, pts, radius, k, KERNEL, window=384, self_graph=True
    )
    assert bool(dnbh.ok)
    ref = np.asarray(depthwise_conv3d(feats, filt, nbh.idx, nbh.count, bins))
    got = np.asarray(dense_depthwise_conv3d(feats, filt, dnbh))
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)

    def loss_dense(feats, filt):
        return jnp.sum(jnp.sin(dense_depthwise_conv3d(feats, filt, dnbh)))

    def loss_ref(feats, filt):
        return jnp.sum(
            jnp.sin(depthwise_conv3d(feats, filt, nbh.idx, nbh.count, bins))
        )

    g_d = jax.grad(loss_dense, argnums=(0, 1))(feats, filt)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(feats, filt)
    for a, e in zip(g_d, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-5, atol=1e-5
        )


def test_dense_pools_match_classic():
    rng = np.random.default_rng(3)
    b, n, c, k, s = 2, 300, 5, 8, 75
    pts = jnp.array(_sorted_cloud(rng, b, n))
    feats = jnp.array(rng.standard_normal((b, n, c)).astype(np.float32))
    radius = 0.4
    nbh, _ = build_sphere_neighbor_and_bins(
        pts, pts, radius, k, KERNEL, self_graph=True
    )
    # pool at a sorted subsample (as the models do)
    samp = np.sort(rng.choice(n, s, replace=False))
    q = jnp.array(np.take_along_axis(
        np.asarray(pts), samp[None, :, None].repeat(b, 0), axis=1
    ))
    idx_s = jnp.asarray(np.asarray(nbh.idx)[:, samp])
    cnt_s = jnp.asarray(np.asarray(nbh.count)[:, samp])
    dnbh = build_dense_graph(
        pts, q, radius, k, None, window=384, self_graph=False
    )
    assert bool(dnbh.ok)
    out_ref, arg_ref = max_pool3d(feats, idx_s, cnt_s)
    out_d, arg_d = dense_max_pool3d(feats, dnbh)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_ref))
    np.testing.assert_array_equal(np.asarray(arg_d), np.asarray(arg_ref))
    np.testing.assert_allclose(
        np.asarray(dense_avg_pool3d(feats, dnbh)),
        np.asarray(avg_pool3d(feats, idx_s, cnt_s)),
        rtol=1e-6, atol=1e-6,
    )


def test_dense_weighted_interpolate_and_ids_match_classic():
    rng = np.random.default_rng(4)
    b, n_coarse, n_fine, c, k = 2, 100, 280, 4, 6
    coarse = jnp.array(_sorted_cloud(rng, b, n_coarse))
    fine = jnp.array(_sorted_cloud(rng, b, n_fine))
    feats = jnp.array(
        rng.standard_normal((b, n_coarse, c)).astype(np.float32)
    )
    radius = 2.5  # large enough that every fine point has a coarse
    # neighbor (zero-count queries trip the growth flag by design)
    nbh, _ = build_sphere_neighbor_and_bins(
        coarse, fine, radius, k, KERNEL
    )
    dnbh = build_dense_graph(
        coarse, fine, radius, k, None, window=128, self_graph=False,
        need_dist=True,
    )
    assert bool(dnbh.ok)
    eps = 1e-7
    sum_dist = jnp.sum(nbh.dist, axis=-1, keepdims=True)
    weight = (nbh.dist + eps) / (sum_dist + eps)
    ref = np.asarray(
        weighted_interpolate(feats, weight, nbh.idx, nbh.count)
    )
    got = np.asarray(dense_weighted_interpolate(feats, dnbh))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    # IDS probability (sum dist / count, ref sph3gcn_util.py:37-39)
    prob_ref = np.asarray(
        jnp.sum(nbh.dist, axis=-1)
        / jnp.maximum(nbh.count, 1).astype(jnp.float32)
    )
    prob_d = np.asarray(dense_ids_prob(dnbh))
    np.testing.assert_allclose(prob_d, prob_ref, rtol=1e-5, atol=1e-6)


def test_dense_conv_bf16_path():
    rng = np.random.default_rng(5)
    b, n, c, k, mult = 1, 256, 8, 5, 1
    pts = jnp.array(_sorted_cloud(rng, b, n))
    feats = jnp.array(
        rng.standard_normal((b, n, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    filt = jnp.array(
        rng.standard_normal((F_BINS, c, mult)).astype(np.float32)
    )
    dnbh = build_dense_graph(
        pts, pts, 0.3, k, KERNEL, window=384, self_graph=True
    )
    out = dense_depthwise_conv3d(feats, filt, dnbh)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


# ------------------- model-level dense == classic -------------------

import dataclasses

from sph3d_gcn_tpu.configs import SPH3DConfig, modelnet_config
from sph3d_gcn_tpu.models import SPH3DModelNet, SPH3DSceneSeg


def test_modelnet_dense_matches_classic():
    base = modelnet_config(num_input=512)  # 1 level: num_sample=(128,)
    classic = dataclasses.replace(base, spatial_sort=True)
    dense = dataclasses.replace(
        base, spatial_sort=True, windows=(512,), dense_graph=True
    )
    pts = np.random.default_rng(10).standard_normal((2, 512, 3)).astype(
        np.float32
    )
    variables = SPH3DModelNet(classic).init(jax.random.key(0), pts)
    ref = SPH3DModelNet(classic).apply(variables, pts)
    got, inter = SPH3DModelNet(dense).apply(
        variables, pts, mutable=["intermediates"]
    )
    (ok,) = inter["intermediates"]["dense_ok"]
    assert bool(ok)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def _seg_cfg(**kw):
    return SPH3DConfig(
        num_input=64,
        num_cls=5,
        mlp=8,
        num_sample=(32, 16),
        radius=(1.5, 3.0),  # large enough that every fine point keeps a
        # coarse neighbor (zero-count growth trips ok=False by design)
        nn_uplimit=(8, 8),
        channels=((8, 8), (16, 16)),
        multiplier=((2, 2), (2, 2)),
        weight_decay=None,
        **kw,
    )


@pytest.mark.parametrize("unpool", ["mean", "weighted"])
def test_scene_seg_dense_matches_classic(unpool):
    classic = _seg_cfg(spatial_sort=True, unpool_method=unpool)
    dense = dataclasses.replace(
        classic, windows=(128, 128), dense_graph=True
    )
    pts = np.random.default_rng(11).standard_normal((2, 64, 9)).astype(
        np.float32
    )
    variables = SPH3DSceneSeg(classic).init(jax.random.key(0), pts)
    ref = SPH3DSceneSeg(classic).apply(variables, pts)
    got, inter = SPH3DSceneSeg(dense).apply(
        variables, pts, mutable=["intermediates"]
    )
    (ok,) = inter["intermediates"]["backbone"]["dense_ok"]
    assert bool(ok)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_scene_seg_dense_ids_trains():
    cfg = _seg_cfg(spatial_sort=True, sample="IDS")
    cfg = dataclasses.replace(cfg, windows=(128, 128), dense_graph=True)
    pts = np.random.default_rng(12).standard_normal((2, 64, 9)).astype(
        np.float32
    )
    model = SPH3DSceneSeg(cfg)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, pts
    )
    logits = model.apply(
        variables, pts, rngs={"sample": jax.random.key(2)}
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_dense_maxpool_grad_matches_classic():
    rng = np.random.default_rng(6)
    b, n, c, k, s = 2, 300, 5, 8, 75
    pts = jnp.array(_sorted_cloud(rng, b, n))
    feats = jnp.array(rng.standard_normal((b, n, c)).astype(np.float32))
    radius = 0.4
    nbh, _ = build_sphere_neighbor_and_bins(
        pts, pts, radius, k, KERNEL, self_graph=True
    )
    samp = np.sort(rng.choice(n, s, replace=False))
    q = jnp.array(np.take_along_axis(
        np.asarray(pts), samp[None, :, None].repeat(b, 0), axis=1
    ))
    idx_s = jnp.asarray(np.asarray(nbh.idx)[:, samp])
    cnt_s = jnp.asarray(np.asarray(nbh.count)[:, samp])
    dnbh = build_dense_graph(
        pts, q, radius, k, None, window=384, self_graph=False
    )
    assert bool(dnbh.ok)

    def loss_dense(feats):
        out, _ = dense_max_pool3d(feats, dnbh)
        return jnp.sum(jnp.sin(out))

    def loss_ref(feats):
        out, _ = max_pool3d(feats, idx_s, cnt_s)
        return jnp.sum(jnp.sin(out))

    g_d = jax.grad(loss_dense)(feats)
    g_r = jax.grad(loss_ref)(feats)
    np.testing.assert_allclose(
        np.asarray(g_d), np.asarray(g_r), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_dense_model_train_step_runs():
    """Full value_and_grad through a dense-graph model (conv VJP, max-pool
    VJP, window scatter) produces finite grads matching the classic path."""
    base = modelnet_config(num_input=512)
    classic = dataclasses.replace(base, spatial_sort=True)
    dense = dataclasses.replace(
        base, spatial_sort=True, windows=(512,), dense_graph=True
    )
    pts = np.random.default_rng(13).standard_normal((2, 512, 3)).astype(
        np.float32
    )
    labels = jnp.array([3, 7], jnp.int32)
    variables = SPH3DModelNet(classic).init(jax.random.key(0), pts)

    def loss_fn(params, cfg_model):
        logits, _ = cfg_model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, train=True, rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"],
        )
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(
            jnp.take_along_axis(logp, labels[:, None], axis=-1)
        )

    g_c = jax.grad(loss_fn)(variables["params"], SPH3DModelNet(classic))
    g_d = jax.grad(loss_fn)(variables["params"], SPH3DModelNet(dense))
    flat_c = jax.tree_util.tree_leaves(g_c)
    flat_d = jax.tree_util.tree_leaves(g_d)
    for a, e in zip(flat_d, flat_c):
        assert np.isfinite(np.asarray(a)).all()
        # engine paths accumulate f32 sums in different orders; the
        # composition through 13 layers + train-mode BN amplifies the
        # per-op 1e-5 agreement (tested above) into ~1e-1 on tiny grads
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-1, atol=5e-3
        )


def test_dense_maxpool_bf16_composite_matches_classic():
    """The bf16 path packs (value, column) into one uint32 sort key; it
    must reproduce the classic max + first-argmax exactly on bf16 data."""
    rng = np.random.default_rng(7)
    b, n, c, k, s = 2, 300, 5, 8, 75
    pts = jnp.array(_sorted_cloud(rng, b, n))
    # include negatives, zeros and duplicated values to stress the encode
    base = rng.standard_normal((b, n, c)).astype(np.float32)
    base[:, ::7] = 0.0
    base[:, 1::9] = base[:, ::9][:, : base[:, 1::9].shape[1]]
    feats = jnp.array(base).astype(jnp.bfloat16)
    radius = 0.4
    nbh, _ = build_sphere_neighbor_and_bins(
        pts, pts, radius, k, KERNEL, self_graph=True
    )
    samp = np.sort(rng.choice(n, s, replace=False))
    idx_s = jnp.asarray(np.asarray(nbh.idx)[:, samp])
    cnt_s = jnp.asarray(np.asarray(nbh.count)[:, samp])
    q = jnp.array(np.take_along_axis(
        np.asarray(pts), samp[None, :, None].repeat(b, 0), axis=1
    ))
    dnbh = build_dense_graph(
        pts, q, radius, k, None, window=384, self_graph=False
    )
    assert bool(dnbh.ok)
    out_ref, arg_ref = max_pool3d(feats, idx_s, cnt_s)
    out_d, arg_d = dense_max_pool3d(feats, dnbh)
    np.testing.assert_array_equal(
        np.asarray(out_d, dtype=np.float32),
        np.asarray(out_ref, dtype=np.float32),
    )
    np.testing.assert_array_equal(np.asarray(arg_d), np.asarray(arg_ref))

    # Grad comparison on tie-free features: on exact ties the dense VJP
    # routes all of dout to the FIRST max (the CUDA semantics,
    # tf_pool3d_gpu.cu:38-50) while the classic path's jnp.max autodiff
    # splits them — the dense path is the more faithful one.
    # random bf16 values collide (8 mantissa bits); draw from a pool of
    # distinct bf16 values instead so no accidental ties remain
    pool = np.unique(
        np.linspace(1.0, 15.9, 8000).astype(np.float32).astype(
            jnp.bfloat16
        ).astype(np.float32)
    )
    vals = np.stack([
        rng.choice(pool, n, replace=False) for _ in range(b * c)
    ]).reshape(b, c, n).transpose(0, 2, 1)
    feats_nt = jnp.array(vals.astype(np.float32)).astype(jnp.bfloat16)

    def loss_dense(f):
        out, _ = dense_max_pool3d(f, dnbh, with_index=False)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    def loss_ref(f):
        out, _ = max_pool3d(f, idx_s, cnt_s)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    g_d = jax.grad(loss_dense)(feats_nt)
    g_r = jax.grad(loss_ref)(feats_nt)
    np.testing.assert_allclose(
        np.asarray(g_d, dtype=np.float32),
        np.asarray(g_r, dtype=np.float32),
        rtol=1e-2, atol=1e-3,
    )


def test_dense_growth_matches_classic_interpolate():
    """Fine points with no coarse neighbor trigger the reference's +0.05
    radius growth (ref tf_nnquery_gpu.cu:30-60); the dense in-window
    growth must reproduce the classic op exactly when certified ok."""
    rng = np.random.default_rng(8)
    b, n_coarse, n_fine, c, k = 2, 96, 280, 4, 6
    coarse = jnp.array(_sorted_cloud(rng, b, n_coarse))
    fine = jnp.array(_sorted_cloud(rng, b, n_fine))
    feats = jnp.array(
        rng.standard_normal((b, n_coarse, c)).astype(np.float32)
    )
    radius = 0.25  # small: many fine points have zero coarse neighbors
    nbh, _ = build_sphere_neighbor_and_bins(coarse, fine, radius, k, KERNEL)
    dnbh = build_dense_graph(
        coarse, fine, radius, k, None, window=256, self_graph=False,
        need_dist=True, growth_steps=40,  # gaussian outliers grow far
    )
    assert bool(dnbh.ok)
    # growth actually occurred (otherwise this test is vacuous)
    assert int(jnp.min(nbh.count)) >= 1
    from sph3d_gcn_tpu.ops.dense import dense_mean_interpolate
    from sph3d_gcn_tpu.ops.unpool import mean_interpolate
    np.testing.assert_allclose(
        np.asarray(dense_mean_interpolate(feats, dnbh)),
        np.asarray(mean_interpolate(feats, nbh.idx, nbh.count)),
        rtol=1e-5, atol=1e-6,
    )
    eps = 1e-7
    sum_dist = jnp.sum(nbh.dist, axis=-1, keepdims=True)
    weight = (nbh.dist + eps) / (sum_dist + eps)
    np.testing.assert_allclose(
        np.asarray(dense_weighted_interpolate(feats, dnbh)),
        np.asarray(
            weighted_interpolate(feats, weight, nbh.idx, nbh.count)
        ),
        rtol=1e-5, atol=1e-6,
    )


def test_dense_conv_wide_channels_matches_classic():
    """C > 128 takes the row-major kernel path — must match too."""
    rng = np.random.default_rng(9)
    b, n, c, k, mult = 1, 256, 160, 6, 2
    pts = jnp.array(_sorted_cloud(rng, b, n))
    feats = jnp.array(rng.standard_normal((b, n, c)).astype(np.float32))
    filt = jnp.array(
        rng.standard_normal((F_BINS, c, mult)).astype(np.float32)
    )
    radius = 0.35
    nbh, bins = build_sphere_neighbor_and_bins(
        pts, pts, radius, k, KERNEL, self_graph=True
    )
    dnbh = build_dense_graph(
        pts, pts, radius, k, KERNEL, window=256, self_graph=True
    )
    assert bool(dnbh.ok)
    ref = np.asarray(depthwise_conv3d(feats, filt, nbh.idx, nbh.count, bins))
    got = np.asarray(dense_depthwise_conv3d(feats, filt, dnbh))
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)

    def loss_dense(feats, filt):
        return jnp.sum(jnp.sin(dense_depthwise_conv3d(feats, filt, dnbh)))

    def loss_ref(feats, filt):
        return jnp.sum(
            jnp.sin(depthwise_conv3d(feats, filt, nbh.idx, nbh.count, bins))
        )

    g_d = jax.grad(loss_dense, argnums=(0, 1))(feats, filt)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(feats, filt)
    for a, e in zip(g_d, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-5, atol=1e-5
        )


def test_dense_maxpool_rank_compacted_matches_classic():
    """c=64 + bf16 + kernel=None maps (k_max > 0) dispatch to the
    rank-compacted MXU pool (ops/dense.py _rank_pool_fwd_kernel). It must
    reproduce the classic max exactly, and its VJP must route all of dout
    to the FIRST maximal neighbor (ref tf_pool3d_gpu.cu:26,38-50)."""
    rng = np.random.default_rng(11)
    b, n, c, k, s = 2, 300, 64, 8, 75
    pts = jnp.array(_sorted_cloud(rng, b, n))
    base = rng.standard_normal((b, n, c)).astype(np.float32)
    base[:, ::7] = 0.0
    feats = jnp.array(base).astype(jnp.bfloat16)
    radius = 0.4
    nbh, _ = build_sphere_neighbor_and_bins(
        pts, pts, radius, k, KERNEL, self_graph=True
    )
    samp = np.sort(rng.choice(n, s, replace=False))
    idx_s = jnp.asarray(np.asarray(nbh.idx)[:, samp])
    cnt_s = jnp.asarray(np.asarray(nbh.count)[:, samp])
    dnbh = build_dense_graph(
        pts,
        jnp.array(np.take_along_axis(
            np.asarray(pts), samp[None, :, None].repeat(b, 0), axis=1
        )),
        radius, k, None, window=384, self_graph=False,
    )
    assert bool(dnbh.ok)
    assert dnbh.k_max == k
    out_ref, _ = max_pool3d(feats, idx_s, cnt_s)
    out_d, _ = dense_max_pool3d(feats, dnbh, with_index=False)
    np.testing.assert_array_equal(
        np.asarray(out_d, dtype=np.float32),
        np.asarray(out_ref, dtype=np.float32),
    )

    # tie-free gradient parity (distinct bf16 values per channel)
    pool = np.unique(
        np.linspace(1.0, 15.9, 8000).astype(np.float32).astype(
            jnp.bfloat16
        ).astype(np.float32)
    )
    vals = np.stack([
        rng.choice(pool, n, replace=False) for _ in range(b * c)
    ]).reshape(b, c, n).transpose(0, 2, 1)
    feats_nt = jnp.array(vals.astype(np.float32)).astype(jnp.bfloat16)

    def loss_dense(f):
        out, _ = dense_max_pool3d(f, dnbh, with_index=False)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    def loss_ref(f):
        out, _ = max_pool3d(f, idx_s, cnt_s)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    g_d = jax.grad(loss_dense)(feats_nt)
    g_r = jax.grad(loss_ref)(feats_nt)
    np.testing.assert_allclose(
        np.asarray(g_d, dtype=np.float32),
        np.asarray(g_r, dtype=np.float32),
        rtol=1e-2, atol=1e-3,
    )


@pytest.mark.parametrize("c,dt", [(6, np.float32), (64, np.float32),
                                  (144, np.float32), (64, "bfloat16")])
def test_dense_conv_pointwise_fold_matches_unfused(c, dt):
    """SeparableConv3d folds the 1x1 GEMM into dense_depthwise_conv3d
    (pointwise=...); the fold must equal depthwise-then-matmul in BOTH
    kernel orientations (transposed C<=128 and row-major C>128) and
    dtypes, values and grads."""
    rng = np.random.default_rng(11)
    b, n, k, mult, c_out = 2, 300, 7, 2, 24
    dtype = jnp.dtype(dt)
    pts = jnp.array(_sorted_cloud(rng, b, n))
    feats = jnp.array(
        rng.standard_normal((b, n, c)).astype(np.float32)
    ).astype(dtype)
    filt = jnp.array(
        rng.standard_normal((F_BINS, c, mult)).astype(np.float32)
    ).astype(dtype)
    pw = jnp.array(
        rng.standard_normal((c * mult, c_out)).astype(np.float32) * 0.1
    ).astype(dtype)
    dnbh = build_dense_graph(
        pts, pts, 0.35, k, KERNEL, window=384, self_graph=True
    )
    assert bool(dnbh.ok)

    def fused(feats, filt, pw):
        return dense_depthwise_conv3d(feats, filt, dnbh, pointwise=pw)

    def unfused(feats, filt, pw):
        out = dense_depthwise_conv3d(feats, filt, dnbh)
        return jnp.einsum(
            "bmc,co->bmo", out, pw, preferred_element_type=jnp.float32
        ).astype(out.dtype)

    got = np.asarray(fused(feats, filt, pw), np.float32)
    ref = np.asarray(unfused(feats, filt, pw), np.float32)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)

    gf = jax.grad(lambda *a: jnp.sum(jnp.sin(fused(*a).astype(jnp.float32))),
                  argnums=(0, 1, 2))(feats, filt, pw)
    gu = jax.grad(lambda *a: jnp.sum(jnp.sin(unfused(*a).astype(jnp.float32))),
                  argnums=(0, 1, 2))(feats, filt, pw)
    # grads see a different (equally bf16-truncated) matmul reduction
    # order through the fold — tolerance covers the reordering noise
    gtol = 2e-2 if dtype == jnp.bfloat16 else 5e-4
    for a, e in zip(gf, gu):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(e, np.float32),
            rtol=gtol, atol=gtol,
        )


def test_dense_maxpool_rank_kused_skip_matches_classic():
    """k=64 gives two rank chunks (kchunk=32); a cloud with a dense
    cluster (counts > 32) and a sparse tail (counts < 10) exercises both
    the skipped (k_used=1) and full (k_used=2) rank sweeps."""
    rng = np.random.default_rng(13)
    b, n, c, k, s = 2, 768, 64, 64, 256
    dense_part = rng.uniform(0, 0.25, (b, n // 2, 3))
    sparse_part = rng.uniform(0.5, 3.0, (b, n // 2, 3))
    pts_np = np.concatenate([dense_part, sparse_part], axis=1)
    pts_np = pts_np.astype(np.float32)
    pts_np = np.stack(
        [pts_np[i][np.argsort(pts_np[i, :, 0], kind="stable")]
         for i in range(b)]
    )
    pts = jnp.array(pts_np)
    feats = jnp.array(
        rng.standard_normal((b, n, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    radius = 0.3
    nbh, _ = build_sphere_neighbor_and_bins(
        pts, pts, radius, k, KERNEL, self_graph=True
    )
    samp = np.sort(rng.choice(n, s, replace=False))
    idx_s = jnp.asarray(np.asarray(nbh.idx)[:, samp])
    cnt_s = jnp.asarray(np.asarray(nbh.count)[:, samp])
    q = jnp.array(np.take_along_axis(
        np.asarray(pts), samp[None, :, None].repeat(b, 0), axis=1
    ))
    dnbh = build_dense_graph(
        pts, q, radius, k, None, window=640, self_graph=False,
    )
    assert bool(dnbh.ok)
    # both k_used regimes: some query TILE maxes out both rank chunks
    # (max count > 32), some tile provably skips the second (max <= 32)
    counts = np.asarray(dnbh.count)
    m_pad = -(-s // 128) * 128
    tile_max = np.pad(counts, ((0, 0), (0, m_pad - s))).reshape(
        b, -1, 128
    ).max(axis=2)
    assert tile_max.max() > 32 and tile_max.min() <= 32
    out_ref, _ = max_pool3d(feats, idx_s, cnt_s)
    out_d, _ = dense_max_pool3d(feats, dnbh, with_index=False)
    np.testing.assert_array_equal(
        np.asarray(out_d, np.float32), np.asarray(out_ref, np.float32)
    )

    def loss_d(f):
        return jnp.sum(jnp.cos(
            dense_max_pool3d(f, dnbh, with_index=False)[0].astype(jnp.float32)
        ))

    gd = np.asarray(jax.grad(loss_d)(feats), np.float32)
    # exact f32 oracle: ALL of dout to the first-max input point
    # (ref tf_pool3d_gpu.cu:38-50). The classic path agrees semantically
    # but scatters sequentially in bf16, so compare against the oracle
    # (dense accumulates in f32; only the final bf16 round remains).
    _, arg_ref2 = max_pool3d(feats, idx_s, cnt_s)
    out_np = np.asarray(out_ref, np.float32)
    arg_np = np.asarray(arg_ref2)
    dout = -np.sin(out_np)
    exp = np.zeros((b, n, c), np.float64)
    for bi in range(b):
        for m in range(s):
            if np.asarray(cnt_s)[bi, m] == 0:
                continue
            np.add.at(exp[bi], (arg_np[bi, m], np.arange(c)), dout[bi, m])
    err = np.abs(gd - exp.astype(np.float32))
    assert err.max() <= 0.02 * np.abs(exp).max() + 0.02, err.max()


@pytest.mark.parametrize("direct", [False, True])
def test_dense_conv_pool_both_window_paths(direct, monkeypatch):
    """Both window-feed modes — materialized (g, W, C) HBM windows and
    direct in-kernel window DMA from the TILE-row-blocked feature array
    (ops/dense.py _DIRECT_WIN_DMA) — must match the classic ops exactly,
    values and grads, in all three kernels (transposed conv C<=128,
    row-major conv C>128, rank-compacted bf16 pool). The lru_cache
    factories key on (n_t, nbt) so both variants coexist."""
    import sph3d_gcn_tpu.ops.dense as dense_mod

    monkeypatch.setattr(dense_mod, "_DIRECT_WIN_DMA", direct)
    rng = np.random.default_rng(17)
    b, n, k = 2, 300, 7
    pts = jnp.array(_sorted_cloud(rng, b, n))
    radius = 0.35
    nbh, bins = build_sphere_neighbor_and_bins(
        pts, pts, radius, k, KERNEL, self_graph=True
    )
    dnbh = build_dense_graph(
        pts, pts, radius, k, KERNEL, window=384, self_graph=True
    )
    assert bool(dnbh.ok)

    # 6: narrow fallback (DMA illegal, flag ignored); 128: transposed
    # kernel DMA; 256: row-major kernel DMA (cc % 128 == 0 gate)
    for c in (6, 128, 256):
        feats = jnp.array(rng.standard_normal((b, n, c)).astype(np.float32))
        filt = jnp.array(
            rng.standard_normal((F_BINS, c, 2)).astype(np.float32)
        )
        ref = np.asarray(
            depthwise_conv3d(feats, filt, nbh.idx, nbh.count, bins)
        )
        got = np.asarray(dense_depthwise_conv3d(feats, filt, dnbh))
        np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)
        g_d = jax.grad(lambda f, w: jnp.sum(jnp.sin(
            dense_depthwise_conv3d(f, w, dnbh))), argnums=(0, 1)
        )(feats, filt)
        g_r = jax.grad(lambda f, w: jnp.sum(jnp.sin(
            depthwise_conv3d(f, w, nbh.idx, nbh.count, bins))),
            argnums=(0, 1)
        )(feats, filt)
        for a, e in zip(g_d, g_r):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(e), rtol=1e-4, atol=2e-5
            )

    # rank-compacted bf16 pool (kernel=None maps, tie-free values);
    # c=64: narrow fallback; c=128: DMA feed; c=256: chunked (n_cc=2) DMA
    samp = np.sort(rng.choice(n, 75, replace=False))
    idx_s = jnp.asarray(np.asarray(nbh.idx)[:, samp])
    cnt_s = jnp.asarray(np.asarray(nbh.count)[:, samp])
    dnbh_p = build_dense_graph(
        pts,
        jnp.array(np.take_along_axis(
            np.asarray(pts), samp[None, :, None].repeat(b, 0), axis=1
        )),
        radius, k, None, window=384, self_graph=False,
    )
    assert bool(dnbh_p.ok)
    pool_vals = np.unique(
        np.linspace(1.0, 15.9, 8000).astype(np.float32)
        .astype(jnp.bfloat16).astype(np.float32)
    )
    for c in (64, 128, 256) if direct else (64,):
        vals = np.stack([
            rng.choice(pool_vals, n, replace=False) for _ in range(b * c)
        ]).reshape(b, c, n).transpose(0, 2, 1)
        feats = jnp.array(vals.astype(np.float32)).astype(jnp.bfloat16)
        out_ref, _ = max_pool3d(feats, idx_s, cnt_s)
        out_d, _ = dense_max_pool3d(feats, dnbh_p, with_index=False)
        np.testing.assert_array_equal(
            np.asarray(out_d, np.float32), np.asarray(out_ref, np.float32)
        )
        g_d = jax.grad(lambda f: jnp.sum(jnp.sin(
            dense_max_pool3d(f, dnbh_p, with_index=False)[0]
            .astype(jnp.float32))))(feats)
        g_r = jax.grad(lambda f: jnp.sum(jnp.sin(
            max_pool3d(f, idx_s, cnt_s)[0].astype(jnp.float32))))(feats)
        np.testing.assert_allclose(
            np.asarray(g_d, np.float32), np.asarray(g_r, np.float32),
            rtol=1e-2, atol=1e-3,
        )


def test_dense_conv_recompute_bwd_matches_stash(monkeypatch):
    """The no-stash backward (_S_STASH_MAX_CC gate: S recomputed on the
    dfw dot's A chunks) must produce the same value and grads as the
    stash backward, in BOTH kernel orientations (C <= 128 transposed,
    C > 128 row-major) and both window feeds."""
    from sph3d_gcn_tpu.ops import dense as dense_mod

    rng = np.random.default_rng(11)
    b, n, k, mult = 2, 384, 16, 2
    pts = jnp.array(_sorted_cloud(rng, b, n))
    dnbh = build_dense_graph(
        pts, pts, 0.35, k, KERNEL, window=384, self_graph=True
    )
    for c in (64, 256):
        feats = jnp.array(
            rng.standard_normal((b, n, c)).astype(np.float32)
        )
        filt = jnp.array(
            rng.standard_normal((F_BINS, c, mult)).astype(np.float32) * 0.1
        )

        def loss(f, w):
            out = dense_depthwise_conv3d(f, w, dnbh)
            return jnp.sum(jnp.sin(out))

        got = {}
        for tag, thresh in (("stash", 1 << 30), ("recompute", 0)):
            monkeypatch.setattr(dense_mod, "_S_STASH_MAX_CC", thresh)
            dense_mod._dense_conv_for.cache_clear()
            dense_mod._dense_conv_rm_for.cache_clear()
            v, (df, dw) = jax.value_and_grad(loss, argnums=(0, 1))(
                feats, filt
            )
            got[tag] = (np.asarray(v), np.asarray(df), np.asarray(dw))
        dense_mod._dense_conv_for.cache_clear()
        dense_mod._dense_conv_rm_for.cache_clear()
        for a, e in zip(got["recompute"], got["stash"]):
            np.testing.assert_allclose(a, e, rtol=1e-5, atol=1e-5)
