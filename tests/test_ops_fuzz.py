"""Randomized shape/parameter fuzzing of the sphere query vs the oracle."""

import numpy as np
import pytest

from sph3d_gcn_tpu.ops import _ref
from sph3d_gcn_tpu.ops.neighbor import build_sphere_neighbor


@pytest.mark.parametrize("seed", range(8))
def test_sphere_query_fuzz(seed):
    rng = np.random.default_rng(seed)
    b = int(rng.integers(1, 4))
    n = int(rng.integers(3, 200))
    m = int(rng.integers(1, 150))
    k = int(rng.integers(1, 70))
    r = float(rng.uniform(0.05, 2.0))
    db = (rng.standard_normal((b, n, 3)) * rng.uniform(0.2, 2)).astype(np.float32)
    q = (rng.standard_normal((b, m, 3)) * rng.uniform(0.2, 2)).astype(np.float32)
    ref_idx, ref_cnt, ref_dist = _ref.sphere_neighbor(db, q, r, k)
    nbr = build_sphere_neighbor(db, q, radius=r, nn_sample=k)
    np.testing.assert_array_equal(np.asarray(nbr.count), ref_cnt)
    mask = np.arange(k)[None, None] < ref_cnt[..., None]
    np.testing.assert_array_equal(np.asarray(nbr.idx)[mask], ref_idx[mask])
    np.testing.assert_allclose(
        np.asarray(nbr.dist)[mask], ref_dist[mask], rtol=3e-5, atol=3e-5
    )
