"""Point-axis (spatial) sharding vs the unsharded dense engine.

The halo-exchange + s_blk-rebase machinery (parallel/spatial.py) must
make the dense kernels produce bit-identical results per shard: same
conv outputs AND gradients as the unsharded op, with `shard_ok=True`
certifying the halo covered every window.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sph3d_gcn_tpu.ops.dense import (
    TILE,
    build_dense_graph,
    dense_depthwise_conv3d,
)
from sph3d_gcn_tpu.parallel.spatial import (
    halo_exchange,
    halo_reduce,
    local_neighborhood,
    pad_count_for_sharding,
)

KERNEL = (8, 2, 2)
F_BINS = 8 * 2 * 2 + 1


def _points_mesh(n: int) -> Mesh:
    return Mesh(np.array(jax.devices()[:n]), ("points",))


def _sorted_cloud(rng, b, n):
    pts = rng.standard_normal((b, n, 3)).astype(np.float32)
    order = np.argsort(pts[..., 0], axis=1)
    return np.take_along_axis(pts, order[..., None], axis=1)


@pytest.mark.parametrize("halo,n_local", [(2, 4), (5, 4), (8, 2)])
def test_halo_exchange_matches_numpy(halo, n_local):
    """Multi-hop halo exchange == slicing the gathered global array,
    including halos wider than the shard (ring hops) and zero edges."""
    shards = 4
    mesh = _points_mesh(shards)
    b, c = 2, 3
    n = shards * n_local
    x = np.arange(b * n * c, dtype=np.float32).reshape(b, n, c) + 1.0

    f = shard_map(
        functools.partial(halo_exchange, halo=halo, axis_name="points"),
        mesh=mesh,
        in_specs=P(None, "points", None),
        out_specs=P(None, "points", None),
    )
    got = np.asarray(f(jnp.array(x)))  # (B, shards*(2*halo+n_local), C)
    got = got.reshape(b, shards, 2 * halo + n_local, c)

    xpad = np.pad(x, ((0, 0), (halo, halo), (0, 0)))
    for s in range(shards):
        np.testing.assert_array_equal(
            got[:, s], xpad[:, s * n_local:s * n_local + n_local + 2 * halo]
        )


def test_halo_reduce_is_exchange_transpose():
    """halo_reduce == the VJP of halo_exchange (cross-shard cotangent
    routing), and grad-through-exchange equals it automatically."""
    shards, n_local, halo, b, c = 4, 2, 3, 1, 2
    mesh = _points_mesh(shards)
    rng = np.random.default_rng(0)
    x = jnp.array(rng.standard_normal((b, shards * n_local, c)), jnp.float32)
    y = jnp.array(
        rng.standard_normal((b, shards * (n_local + 2 * halo), c)),
        jnp.float32,
    )

    exch = shard_map(
        functools.partial(halo_exchange, halo=halo, axis_name="points"),
        mesh=mesh,
        in_specs=P(None, "points", None),
        out_specs=P(None, "points", None),
    )
    red = shard_map(
        functools.partial(halo_reduce, halo=halo, axis_name="points"),
        mesh=mesh,
        in_specs=P(None, "points", None),
        out_specs=P(None, "points", None),
    )
    # <exchange(x), y> == <x, reduce(y)>  (transpose identity)
    lhs = jnp.vdot(exch(x), y)
    rhs = jnp.vdot(x, red(y))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-6)

    g = jax.grad(lambda x: jnp.vdot(exch(x), y))(x)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(red(y)), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize(
    "c", [6, pytest.param(160, marks=pytest.mark.slow)]
)
def test_point_sharded_conv_matches_unsharded(c):
    """Intra-level conv under 4-way point sharding: halo = one window,
    outputs and grads identical to the unsharded dense op, shard_ok
    certified per shard."""
    shards = 4
    mesh = _points_mesh(shards)
    rng = np.random.default_rng(7)
    b, n, k, mult = 2, 2048, 7, 2
    w = 512
    pts = jnp.array(_sorted_cloud(rng, b, n))
    feats = jnp.array(rng.standard_normal((b, n, c)).astype(np.float32))
    filt = jnp.array(
        rng.standard_normal((F_BINS, c, mult)).astype(np.float32)
    )
    dnbh = build_dense_graph(
        pts, pts, 0.15, k, KERNEL, window=w, self_graph=True
    )
    assert bool(dnbh.ok)
    ref = dense_depthwise_conv3d(feats, filt, dnbh)

    dnbh_p = pad_count_for_sharding(dnbh, shards)
    n_t = dnbh_p.s_blk.shape[1]
    n_local_blocks = n_t // shards
    halo_blocks = w // TILE

    def per_shard(feats, packed, s_blk, count, ok, filt):
        fw = halo_exchange(feats, halo_blocks * TILE, "points")
        import dataclasses

        shard_dnbh = dataclasses.replace(
            dnbh_p, packed=packed, s_blk=s_blk, count=count, ok=ok,
            num_query=s_blk.shape[1] * TILE,
        )
        local, shard_ok = local_neighborhood(
            shard_dnbh, "points", halo_blocks, n_local_blocks
        )
        out = dense_depthwise_conv3d(fw, filt, local)
        return out, shard_ok[None]

    f = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(None, "points", None),          # feats rows
            P(None, "points", None, None),    # packed tiles
            P(None, "points"),                # s_blk
            P(None, "points"),                # count (padded to m_pad)
            P(),                              # ok
            P(),                              # filt
        ),
        out_specs=(P(None, "points", None), P("points")),
        check_vma=False,
    )

    got, shard_ok = f(
        feats, dnbh_p.packed, dnbh_p.s_blk, dnbh_p.count, dnbh_p.ok, filt
    )
    assert bool(jnp.all(shard_ok))
    np.testing.assert_allclose(
        np.asarray(got)[:, : dnbh.num_query], np.asarray(ref),
        rtol=2e-6, atol=2e-6,
    )

    # gradients: cross-shard dfw cotangents ride the halo transpose
    def loss_sharded(feats, filt):
        out, _ = f(feats, dnbh_p.packed, dnbh_p.s_blk, dnbh_p.count,
                   dnbh_p.ok, filt)
        return jnp.sum(jnp.sin(out[:, : dnbh.num_query]))

    def loss_ref(feats, filt):
        return jnp.sum(jnp.sin(dense_depthwise_conv3d(feats, filt, dnbh)))

    g_s = jax.grad(loss_sharded, argnums=(0, 1))(feats, filt)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(feats, filt)
    for a, e in zip(g_s, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-4, atol=2e-5
        )


def test_composed_dp_sp_conv_matches_unsharded():
    """Composed 2x2 ('data', 'points') mesh at a realistic window/halo
    ratio (halo 4 blocks vs 8 local blocks — the production S3DIS ratio
    is 13/32): batch items shard over 'data', each cloud's rows over
    'points'. Conv outputs and feats/filt grads must match the unsharded
    op exactly — the default-lane guard that composed-mesh halo exchange
    and grad transposes stay correct as kernels change (the full-model
    composed step test is slow-marked)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(
        np.array(jax.devices()[:4]).reshape(2, 2), ("data", "points")
    )
    shards = 2  # point shards
    rng = np.random.default_rng(11)
    b, n, k, c, mult = 2, 2048, 7, 6, 2
    w = 512
    pts = jnp.array(_sorted_cloud(rng, b, n))
    feats = jnp.array(rng.standard_normal((b, n, c)).astype(np.float32))
    filt = jnp.array(
        rng.standard_normal((F_BINS, c, mult)).astype(np.float32)
    )
    dnbh = build_dense_graph(
        pts, pts, 0.15, k, KERNEL, window=w, self_graph=True
    )
    assert bool(dnbh.ok)
    ref = dense_depthwise_conv3d(feats, filt, dnbh)

    dnbh_p = pad_count_for_sharding(dnbh, shards)
    n_t = dnbh_p.s_blk.shape[1]
    n_local_blocks = n_t // shards
    halo_blocks = w // TILE
    assert 2 * halo_blocks == n_local_blocks  # realistic ratio, multi-hop

    def per_shard(feats, packed, s_blk, count, ok, axis_f, filt):
        fw = halo_exchange(feats, halo_blocks * TILE, "points")
        import dataclasses

        shard_dnbh = dataclasses.replace(
            dnbh_p, packed=packed, s_blk=s_blk, count=count, ok=ok,
            axis=axis_f, num_query=s_blk.shape[1] * TILE,
        )
        local, shard_ok = local_neighborhood(
            shard_dnbh, "points", halo_blocks, n_local_blocks
        )
        out = dense_depthwise_conv3d(fw, filt, local)
        return out, shard_ok[None]

    f = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P("data", "points", None),          # feats: batch x rows
            P("data", "points", None, None),    # packed tiles
            P("data", "points"),                # s_blk
            P("data", "points"),                # count
            P(),                                # ok
            P("data"),                          # per-cloud sort axis
            P(),                                # filt (replicated)
        ),
        out_specs=(P("data", "points", None), P("points")),
        check_vma=False,
    )

    got, shard_ok = f(
        feats, dnbh_p.packed, dnbh_p.s_blk, dnbh_p.count, dnbh_p.ok,
        dnbh_p.axis, filt,
    )
    assert bool(jnp.all(shard_ok))
    np.testing.assert_allclose(
        np.asarray(got)[:, : dnbh.num_query], np.asarray(ref),
        rtol=2e-6, atol=2e-6,
    )

    def loss_sharded(feats, filt):
        out, _ = f(feats, dnbh_p.packed, dnbh_p.s_blk, dnbh_p.count,
                   dnbh_p.ok, dnbh_p.axis, filt)
        return jnp.sum(jnp.sin(out[:, : dnbh.num_query]))

    def loss_ref(feats, filt):
        return jnp.sum(jnp.sin(dense_depthwise_conv3d(feats, filt, dnbh)))

    g_s = jax.grad(loss_sharded, argnums=(0, 1))(feats, filt)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(feats, filt)
    for a, e in zip(g_s, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-4, atol=2e-5
        )


def test_point_sharded_halo_violation_flags_not_crashes():
    """A halo too small for the windows clamps s_blk (well-defined
    garbage) and reports shard_ok=False — the sharding analogue of the
    dense_ok contract."""
    shards = 4
    mesh = _points_mesh(shards)
    rng = np.random.default_rng(8)
    b, n, k, c = 1, 1024, 5, 6
    w = 512  # wide windows, but halo below will be just 1 block
    pts = jnp.array(_sorted_cloud(rng, b, n))
    feats = jnp.array(rng.standard_normal((b, n, c)).astype(np.float32))
    filt = jnp.array(
        rng.standard_normal((F_BINS, c, 1)).astype(np.float32)
    )
    dnbh = build_dense_graph(
        pts, pts, 0.25, k, KERNEL, window=w, self_graph=True
    )
    assert bool(dnbh.ok)
    dnbh_p = pad_count_for_sharding(dnbh, shards)
    n_t = dnbh_p.s_blk.shape[1]
    n_local_blocks = n_t // shards
    halo_blocks = 1

    def per_shard(feats, packed, s_blk, count, ok, filt):
        fw = halo_exchange(feats, halo_blocks * TILE, "points")
        import dataclasses

        shard_dnbh = dataclasses.replace(
            dnbh_p, packed=packed, s_blk=s_blk, count=count, ok=ok,
            num_query=s_blk.shape[1] * TILE,
        )
        local, shard_ok = local_neighborhood(
            shard_dnbh, "points", halo_blocks, n_local_blocks
        )
        out = dense_depthwise_conv3d(fw, filt, local)
        return out, shard_ok[None]

    f = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(None, "points", None), P(None, "points", None, None),
            P(None, "points"), P(None, "points"), P(), P(),
        ),
        out_specs=(P(None, "points", None), P("points")),
        check_vma=False,
    )
    out, shard_ok = f(
        feats, dnbh_p.packed, dnbh_p.s_blk, dnbh_p.count, dnbh_p.ok, filt
    )
    assert not bool(jnp.all(shard_ok))
    assert bool(jnp.all(jnp.isfinite(out)))


def _shard_op(mesh, dnbh_p, op, n_local_blocks, halo_blocks,
              with_dist=False):
    """shard_map wrapper running a dense op on a tile-sharded
    neighborhood with haloed database features."""
    import dataclasses

    def per_shard(feats, packed, s_blk, count, dist, ok):
        fw = halo_exchange(feats, halo_blocks * TILE, "points")
        shard_dnbh = dataclasses.replace(
            dnbh_p, packed=packed, s_blk=s_blk, count=count, ok=ok,
            dist=dist, num_query=s_blk.shape[1] * TILE,
        )
        local, shard_ok = local_neighborhood(
            shard_dnbh, "points", halo_blocks, n_local_blocks
        )
        return op(fw, local), shard_ok[None]

    dist_spec = P(None, "points", None, None) if with_dist else P()
    return shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(None, "points", None), P(None, "points", None, None),
            P(None, "points"), P(None, "points"), dist_spec, P(),
        ),
        out_specs=(P(None, "points", None), P("points")),
        check_vma=False,
    )


@pytest.mark.parametrize(
    "dt", [pytest.param(np.float32, marks=pytest.mark.slow), "bfloat16"]
)
def test_point_sharded_pool_matches_unsharded(dt):
    """Inter-level max pool: coarse query tiles and fine feature rows
    shard over the same axis; the fine halo covers the pool windows.
    bf16 exercises the rank-compacted kernel, f32 the masked-max path."""
    from sph3d_gcn_tpu.ops.dense import dense_max_pool3d

    shards = 4
    mesh = _points_mesh(shards)
    rng = np.random.default_rng(9)
    b, n, k, c, w = 2, 2048, 8, 64, 1024
    dtype = jnp.dtype(dt)
    pts = jnp.array(_sorted_cloud(rng, b, n))
    coarse = pts[:, ::4]  # sorted uniform subsample, 512 rows
    # sharded vs unsharded dense use the SAME kernel and rank order, so
    # ties resolve identically — no tie-free construction needed
    feats = jnp.array(
        rng.standard_normal((b, n, c)).astype(np.float32)
    ).astype(dtype)
    dnbh = build_dense_graph(
        pts, coarse, 0.15, k, None, window=w, self_graph=False
    )
    assert bool(dnbh.ok)
    out_ref, _ = dense_max_pool3d(feats, dnbh, with_index=False)

    dnbh_p = pad_count_for_sharding(dnbh, shards)
    f = _shard_op(
        mesh, dnbh_p,
        lambda fw, loc: dense_max_pool3d(fw, loc, with_index=False)[0],
        n_local_blocks=(n // TILE) // shards,
        halo_blocks=w // TILE,
    )
    got, shard_ok = f(feats, dnbh_p.packed, dnbh_p.s_blk, dnbh_p.count,
                      dnbh_p.dist, dnbh_p.ok)
    assert bool(jnp.all(shard_ok))
    np.testing.assert_array_equal(
        np.asarray(got, np.float32)[:, : dnbh.num_query],
        np.asarray(out_ref, np.float32),
    )

    # gradient parity (first-max routing must survive the halo transpose)
    def loss_sharded(feats):
        out, _ = f(feats, dnbh_p.packed, dnbh_p.s_blk, dnbh_p.count,
                   dnbh_p.dist, dnbh_p.ok)
        return jnp.sum(jnp.sin(
            out[:, : dnbh.num_query].astype(jnp.float32)))

    def loss_ref(feats):
        out, _ = dense_max_pool3d(feats, dnbh, with_index=False)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    g_s = jax.grad(loss_sharded)(feats)
    g_r = jax.grad(loss_ref)(feats)
    np.testing.assert_allclose(
        np.asarray(g_s, np.float32), np.asarray(g_r, np.float32),
        rtol=1e-2, atol=1e-3,
    )


def test_point_sharded_unpool_matches_unsharded():
    """Deconv direction: fine query tiles shard, coarse feature rows
    shard, the coarse halo covers the unpool windows; distance-
    proportional weights ride the sharded dist maps."""
    from sph3d_gcn_tpu.ops.dense import dense_weighted_interpolate

    shards = 4
    mesh = _points_mesh(shards)
    rng = np.random.default_rng(10)
    b, n, k, c, w = 2, 4096, 6, 32, 768
    # uniform cube (no gaussian tail stragglers): every fine point has a
    # coarse neighbour within the base radius, windows stay non-degenerate
    cube = rng.uniform(0.0, 1.0, (b, n, 3)).astype(np.float32)
    order = np.argsort(cube[..., 0], axis=1)
    pts = jnp.array(np.take_along_axis(cube, order[..., None], axis=1))
    coarse = pts[:, ::4]  # 512 rows = 4 blocks, 1 per shard
    feats = jnp.array(
        rng.standard_normal((b, coarse.shape[1], c)).astype(np.float32)
    )
    dnbh = build_dense_graph(
        coarse, pts, 0.2, k, None, window=w, self_graph=False,
        need_dist=True, growth_steps=12,
    )
    assert bool(dnbh.ok)
    ref = dense_weighted_interpolate(feats, dnbh)

    dnbh_p = pad_count_for_sharding(dnbh, shards)
    f = _shard_op(
        mesh, dnbh_p, dense_weighted_interpolate,
        n_local_blocks=(coarse.shape[1] // TILE) // shards,
        halo_blocks=w // TILE,
        with_dist=True,
    )
    got, shard_ok = f(feats, dnbh_p.packed, dnbh_p.s_blk, dnbh_p.count,
                      dnbh_p.dist, dnbh_p.ok)
    assert bool(jnp.all(shard_ok))
    np.testing.assert_allclose(
        np.asarray(got)[:, : dnbh.num_query], np.asarray(ref),
        rtol=1e-5, atol=1e-6,
    )

    g_s = jax.grad(lambda fe: jnp.sum(jnp.sin(
        f(fe, dnbh_p.packed, dnbh_p.s_blk, dnbh_p.count, dnbh_p.dist,
          dnbh_p.ok)[0][:, : dnbh.num_query])))(feats)
    g_r = jax.grad(lambda fe: jnp.sum(jnp.sin(
        dense_weighted_interpolate(fe, dnbh))))(feats)
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_r), rtol=1e-4, atol=2e-5
    )


@pytest.mark.slow
def test_point_sharded_scene_seg_step_matches_unsharded():
    """Full S3DIS-family train step under 2-way point sharding: the model
    shards levels 0-1 (8 and 2 tiles), runs the coarse tail replicated,
    and gathers logits — losses, dense_ok, logits and updated params must
    match the unsharded dense step (same rngs)."""
    import dataclasses

    from sph3d_gcn_tpu.configs import s3dis_config
    from sph3d_gcn_tpu.models import SPH3DSceneSeg
    from sph3d_gcn_tpu.train import make_optimizer, segmentation_step_factory

    cfg = s3dis_config(num_input=1024, fast=True, dense=True)
    # the shipped windows/growth are calibrated for the 8192-point
    # reference pyramid; at 1024 points the fixed radii need more growth
    # and relatively wider windows to certify (dense_ok)
    # f32 so sharded-vs-unsharded differences are pure fp noise (bf16
    # rounding makes near-cancelling BN-bias grad sums sign-unstable,
    # which Adam amplifies to full +-lr update flips)
    cfg = dataclasses.replace(
        cfg, windows=(768, 512, 256, 128), dec_windows=(512,) * 4,
        growth_steps=12, dec_margin=384, compute_dtype="float32",
    )
    cfg_sp = dataclasses.replace(cfg, point_axis="points")
    mesh = _points_mesh(2)
    tx = make_optimizer("adam", 1e-3)
    fac_ref = segmentation_step_factory(
        SPH3DSceneSeg(cfg), tx, inner_masked=True
    )
    fac_sp = segmentation_step_factory(
        SPH3DSceneSeg(cfg_sp), tx, inner_masked=True,
        mesh=mesh, point_axis="points",
    )

    from bench import scene_blocks

    rng = np.random.default_rng(3)
    b, n = 2, cfg.num_input
    batch = {
        "points": scene_blocks(rng, b, n),
        "label": rng.integers(0, cfg.num_cls, (b, n)).astype(np.int32),
        "inner_label": rng.integers(0, 2, (b, n)).astype(np.int32),
    }
    batch = jax.tree.map(jnp.asarray, batch)

    state_ref = fac_ref.init_state(jax.random.key(0), batch)
    state_sp = fac_sp.init_state(jax.random.key(0), batch)
    chex = jax.tree.map(
        lambda a, b_: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b_)
        ),
        state_ref.params, state_sp.params,
    )
    del chex

    step_ref = fac_ref.train_step(donate=False)
    step_sp = fac_sp.train_step(donate=False)
    for i in range(2):
        key = jax.random.key(7 + i)
        state_ref, m_ref = step_ref(state_ref, batch, key)
        state_sp, m_sp = step_sp(state_sp, batch, key)
        assert bool(m_ref["dense_ok"]) and bool(m_sp["dense_ok"])
        np.testing.assert_allclose(
            float(m_sp["loss"]), float(m_ref["loss"]), rtol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(m_sp["logits"], np.float32),
            np.asarray(m_ref["logits"], np.float32),
            rtol=5e-2, atol=5e-2,
        )

    # updated parameters (grads rode the halo/gather transposes + the
    # psum(total/d) seeding; bf16 forward, f32 master params)
    flat_ref = jax.tree_util.tree_leaves_with_path(state_ref.params)
    flat_sp = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(state_sp.params)
    }
    for path, leaf in flat_ref:
        got = np.asarray(flat_sp[jax.tree_util.keystr(path)], np.float32)
        exp = np.asarray(leaf, np.float32)
        # atol 2.5e-3 = 2.5x lr: where a grad is a near-zero cancelling
        # sum (BN biases), fp noise can flip its sign and Adam's
        # normalized first step moves +-lr either way
        np.testing.assert_allclose(
            got, exp, rtol=5e-3, atol=2.5e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_point_sharded_modelnet_step_matches_unsharded():
    """ModelNet classifier under 4-way point sharding: sharded encoder
    levels + gathered multi-scale global maxima + replicated global conv
    and FC head — loss, logits and updated params match unsharded."""
    import dataclasses

    from sph3d_gcn_tpu.configs import modelnet_config
    from sph3d_gcn_tpu.models import SPH3DModelNet
    from sph3d_gcn_tpu.train import (
        classification_step_factory,
        make_optimizer,
    )

    # at 1024 points the scaled config is single-level: level 0 shards
    # 4-way, the 256-point pooled cloud and global conv run replicated
    cfg = modelnet_config(num_input=1024, fast=True, dense=True)
    cfg = dataclasses.replace(
        cfg, windows=(768,), compute_dtype="float32",
    )
    cfg_sp = dataclasses.replace(cfg, point_axis="points")
    mesh = _points_mesh(4)
    tx = make_optimizer("adam", 1e-3)
    fac_ref = classification_step_factory(
        SPH3DModelNet(cfg), tx, weight_decay=cfg.weight_decay
    )
    fac_sp = classification_step_factory(
        SPH3DModelNet(cfg_sp), tx, weight_decay=cfg.weight_decay,
        mesh=mesh, point_axis="points",
    )

    from bench import surface_clouds

    rng = np.random.default_rng(5)
    b = 2
    batch = {
        "points": surface_clouds(rng, b, cfg.num_input),
        "label": rng.integers(0, cfg.num_cls, (b,)).astype(np.int32),
    }
    batch = jax.tree.map(jnp.asarray, batch)

    state_ref = fac_ref.init_state(jax.random.key(0), batch)
    state_sp = fac_sp.init_state(jax.random.key(0), batch)
    step_ref = fac_ref.train_step(donate=False)
    step_sp = fac_sp.train_step(donate=False)
    key = jax.random.key(11)
    state_ref, m_ref = step_ref(state_ref, batch, key)
    state_sp, m_sp = step_sp(state_sp, batch, key)
    assert bool(m_ref["dense_ok"]) and bool(m_sp["dense_ok"])
    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_ref["loss"]), rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(m_sp["logits"], np.float32),
        np.asarray(m_ref["logits"], np.float32),
        rtol=5e-2, atol=5e-3,
    )
    flat_sp = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(state_sp.params)
    }
    for path, leaf in jax.tree_util.tree_leaves_with_path(state_ref.params):
        got = np.asarray(flat_sp[jax.tree_util.keystr(path)], np.float32)
        np.testing.assert_allclose(
            got, np.asarray(leaf, np.float32), rtol=5e-3, atol=2.5e-3,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_composed_dp_sp_scene_seg_step_matches_unsharded():
    """2x2 ('data', 'points') mesh: the batch shards over 'data' and each
    cloud's rows over 'points' inside one shard_map'ed step. BN stats
    sync over both axes and the inner-masked (SUM-reduced) loss
    reassembles exactly — loss/logits/updated params match unsharded."""
    import dataclasses

    from jax.sharding import Mesh

    from bench import scene_blocks
    from sph3d_gcn_tpu.configs import s3dis_config
    from sph3d_gcn_tpu.models import SPH3DSceneSeg
    from sph3d_gcn_tpu.train import make_optimizer, segmentation_step_factory

    cfg = s3dis_config(num_input=1024, fast=True, dense=True)
    cfg = dataclasses.replace(
        cfg, windows=(768, 512, 256, 128), dec_windows=(512,) * 4,
        growth_steps=12, dec_margin=384, compute_dtype="float32",
    )
    cfg_sp = dataclasses.replace(
        cfg, point_axis="points", data_axis="data"
    )
    mesh = Mesh(
        np.array(jax.devices()[:4]).reshape(2, 2), ("data", "points")
    )
    tx = make_optimizer("adam", 1e-3)
    fac_ref = segmentation_step_factory(
        SPH3DSceneSeg(cfg), tx, inner_masked=True
    )
    fac_sp = segmentation_step_factory(
        SPH3DSceneSeg(cfg_sp), tx, inner_masked=True,
        mesh=mesh, point_axis="points", data_axis="data",
    )

    rng = np.random.default_rng(13)
    b, n = 4, cfg.num_input
    batch = {
        "points": scene_blocks(rng, b, n),
        "label": rng.integers(0, cfg.num_cls, (b, n)).astype(np.int32),
        "inner_label": rng.integers(0, 2, (b, n)).astype(np.int32),
    }
    batch = jax.tree.map(jnp.asarray, batch)

    state_ref = fac_ref.init_state(jax.random.key(0), batch)
    state_sp = fac_sp.init_state(jax.random.key(0), batch)
    step_ref = fac_ref.train_step(donate=False)
    step_sp = fac_sp.train_step(donate=False)
    key = jax.random.key(17)
    state_ref, m_ref = step_ref(state_ref, batch, key)
    state_sp, m_sp = step_sp(state_sp, batch, key)
    assert bool(m_ref["dense_ok"]) and bool(m_sp["dense_ok"])
    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_ref["loss"]), rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(m_sp["logits"], np.float32),
        np.asarray(m_ref["logits"], np.float32),
        rtol=5e-2, atol=5e-2,
    )
    flat_sp = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(state_sp.params)
    }
    for path, leaf in jax.tree_util.tree_leaves_with_path(state_ref.params):
        got = np.asarray(flat_sp[jax.tree_util.keystr(path)], np.float32)
        np.testing.assert_allclose(
            got, np.asarray(leaf, np.float32), rtol=5e-3, atol=2.5e-3,
            err_msg=jax.tree_util.keystr(path),
        )
    # BN running stats must also sync to the global batch statistics
    flat_sp_s = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(
            state_sp.batch_stats)
    }
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            state_ref.batch_stats):
        got = np.asarray(flat_sp_s[jax.tree_util.keystr(path)], np.float32)
        np.testing.assert_allclose(
            got, np.asarray(leaf, np.float32), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_halo_only_violation_recovers_with_wider_halo():
    """The halo-retry contract (round-4 directive): a halo too small for
    the windows flags shard_ok=False and produces clamped (wrong)
    results; re-running SHARDED with the halo doubled recovers the exact
    unsharded output — no single chip ever holds the whole cloud (the
    classic fallback's memory bound, StepFactory.classic_fallback)."""
    shards = 4
    mesh = _points_mesh(shards)
    rng = np.random.default_rng(9)
    b, n, k, c = 1, 1024, 5, 6
    w = 512
    pts = jnp.array(_sorted_cloud(rng, b, n))
    feats = jnp.array(rng.standard_normal((b, n, c)).astype(np.float32))
    filt = jnp.array(
        rng.standard_normal((F_BINS, c, 1)).astype(np.float32)
    )
    dnbh = build_dense_graph(
        pts, pts, 0.25, k, KERNEL, window=w, self_graph=True
    )
    assert bool(dnbh.ok)
    ref = dense_depthwise_conv3d(feats, filt, dnbh)
    dnbh_p = pad_count_for_sharding(dnbh, shards)
    n_t = dnbh_p.s_blk.shape[1]
    n_local_blocks = n_t // shards

    def run(halo_blocks):
        f = _shard_op(
            mesh, dnbh_p,
            lambda fw, local: dense_depthwise_conv3d(fw, filt, local),
            n_local_blocks, halo_blocks,
        )
        out, shard_ok = f(
            feats, dnbh_p.packed, dnbh_p.s_blk, dnbh_p.count,
            dnbh_p.dist, dnbh_p.ok,
        )
        return out, bool(jnp.all(shard_ok))

    out1, ok1 = run(1)        # too narrow: windows breach the halo
    assert not ok1
    out2, ok2 = run(2)        # doubled: covers this cloud's windows
    assert ok2
    np.testing.assert_allclose(
        np.asarray(out2)[:, : dnbh.num_query], np.asarray(ref),
        rtol=2e-6, atol=2e-6,
    )


def test_halo_widened_factory_matches_unsharded():
    """StepFactory.halo_widened doubles cfg.halo_scale and its (still
    sharded) train step reproduces the unsharded loss; halo_ok is
    reported in the metrics."""
    import dataclasses

    from sph3d_gcn_tpu.configs import SPH3DConfig
    from sph3d_gcn_tpu.models import SPH3DSceneSeg
    from sph3d_gcn_tpu.train import make_optimizer, segmentation_step_factory

    n = 256
    cfg = SPH3DConfig(
        num_input=n, num_cls=5, mlp=8,
        num_sample=(n // 2,), radius=(1.5,), nn_uplimit=(8,),
        channels=((8, 8),), multiplier=((2, 2),), weight_decay=None,
        spatial_sort=True, dense_graph=True, windows=(n,),
        dec_windows=(n,), dec_margin=128, growth_steps=6,
        point_axis="points",
    )
    mesh = _points_mesh(2)
    tx = make_optimizer("adam", 1e-3)
    fac = segmentation_step_factory(
        SPH3DSceneSeg(cfg), tx, inner_masked=True,
        mesh=mesh, point_axis="points",
    )
    wide = fac.halo_widened()
    assert wide.model.config.halo_scale == 2

    rng = np.random.default_rng(5)
    batch = {
        "points": rng.standard_normal((2, n, 9)).astype(np.float32),
        "label": rng.integers(0, 5, (2, n)).astype(np.int32),
        "inner_label": rng.integers(0, 2, (2, n)).astype(np.int32),
    }
    state = wide.init_state(jax.random.key(0), batch)
    state_host = jax.tree.map(np.asarray, state)
    _, m = wide.train_step(donate=False)(state, batch, jax.random.key(1))
    assert bool(m["dense_ok"]) and bool(m["halo_ok"])

    ref_fac = segmentation_step_factory(
        SPH3DSceneSeg(dataclasses.replace(cfg, point_axis=None)),
        tx, inner_masked=True,
    )
    ref_state = jax.device_put(state_host)
    _, m_ref = ref_fac.train_step(donate=False)(
        ref_state, batch, jax.random.key(1)
    )
    np.testing.assert_allclose(
        float(m["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
