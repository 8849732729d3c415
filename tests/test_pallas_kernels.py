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
