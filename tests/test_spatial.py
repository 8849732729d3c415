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


@pytest.mark.parametrize("c", [6, 160])
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
