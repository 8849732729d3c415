"""Pallas kernels validated in interpreter mode against the oracle (CPU CI);
the compiled TPU path is exercised by bench/verify on real hardware."""

import numpy as np

from sph3d_gcn_tpu.ops import _ref
from sph3d_gcn_tpu.ops.pallas.fps_kernel import farthest_point_sample_pallas
from sph3d_gcn_tpu.ops.sample import farthest_point_sample_xla


def test_pallas_fps_matches_oracle_interpret():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((2, 300, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sample_pallas(48, pts, interpret=True))
    want = _ref.farthest_point_sample(48, pts)
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_matches_xla_impl():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((1, 1024, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sample_pallas(128, pts, interpret=True))
    want = np.asarray(farthest_point_sample_xla(128, pts))
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_nonaligned_point_count():
    # N not a multiple of 1024 exercises the padding path.
    rng = np.random.default_rng(2)
    pts = rng.standard_normal((2, 777, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sample_pallas(32, pts, interpret=True))
    want = _ref.farthest_point_sample(32, pts)
    np.testing.assert_array_equal(got, want)


def _bins_both(dx, dy, dz, radius, kernel):
    """Evaluate the compare-only (8,2,q) bins and the general atan2 bins
    on the same candidates; d3 is the sqrt-space candidate distance the
    query kernel feeds them (sqrt of the true euclidean distance)."""
    import jax.numpy as jnp

    from sph3d_gcn_tpu.ops.pallas import query_kernel as qk

    d3 = jnp.sqrt(
        jnp.asarray(dx) ** 2 + jnp.asarray(dy) ** 2 + jnp.asarray(dz) ** 2
    )
    fast = qk._bins_822(
        jnp.asarray(dx), jnp.asarray(dy), jnp.asarray(dz), d3, radius, kernel
    )
    pi = __import__("math").pi
    nn_dist = jnp.sqrt(d3)
    dist2d = jnp.sqrt(jnp.asarray(dx) ** 2 + jnp.asarray(dy) ** 2)
    theta = jnp.arctan2(jnp.asarray(dy), jnp.asarray(dx))
    theta = jnp.where(theta < pi, theta, -pi)
    theta = jnp.maximum(theta, -pi) + pi
    phi = jnp.clip(jnp.arctan2(jnp.asarray(dz), dist2d), -pi / 2, pi / 2) + pi / 2
    n_bins, p_bins, q_bins = kernel
    n_id = jnp.minimum(
        n_bins - 1, (theta * n_bins / 2.0 / pi).astype(jnp.int32)
    )
    p_id = jnp.minimum(p_bins - 1, (phi * p_bins / pi).astype(jnp.int32))
    gamma = nn_dist * q_bins / (radius + 1e-6)
    q_id = jnp.minimum(q_bins - 1, gamma.astype(jnp.int32))
    bins = q_id * p_bins * n_bins + p_id * n_bins + n_id + 1
    is_far = (nn_dist > qk._M_EPS) & (jnp.abs(nn_dist - qk._M_EPS) > 1e-6)
    ref = jnp.where(is_far, bins, 0)
    return np.asarray(fast), np.asarray(ref)


def test_bins_822_matches_atan2_form_random():
    rng = np.random.default_rng(3)
    d = rng.uniform(-0.2, 0.2, (3, 4096)).astype(np.float32)
    fast, ref = _bins_both(d[0], d[1], d[2], 0.1, (8, 2, 2))
    np.testing.assert_array_equal(fast, ref)


def test_bins_822_matches_on_axis_aligned_rays():
    """Bin boundaries: axis-aligned and 45-degree rays incl. signed zeros.
    These are exactly the azimuth octant boundaries, the dz==0 elevation
    boundary, and the self-loop M_EPS ball."""
    vals = [0.0, -0.0, 0.03, -0.03, 1e-4, -1e-4, 5e-4]
    pts = [
        (a, b, c)
        for a in vals for b in vals for c in vals
        if not (abs(a) == 0 and abs(b) == 0 and abs(c) == 0)
    ]
    d = np.array(pts, np.float32).T
    fast, ref = _bins_both(d[0], d[1], d[2], 0.1, (8, 2, 2))
    np.testing.assert_array_equal(fast, ref)
    # q_bins > 2 exercises the multi-threshold radial path
    fast, ref = _bins_both(d[0], d[1], d[2], 0.1, (8, 2, 3))
    np.testing.assert_array_equal(fast, ref)
