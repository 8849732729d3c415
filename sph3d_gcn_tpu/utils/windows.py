"""Window calibration: measure per-level slab requirements on data.

The dense windowed engine (ops/dense.py) is exact iff every graph's
in-range candidate slab fits its configured row window; the shipped
per-dataset windows were hand-measured in round 2 ("worst measured slabs
... plus margin", configs/__init__.py). This module derives them from
data: it replays the model's level pyramid (spatial sort, FPS, radius
schedule) on sample clouds and records, for every graph the model will
build — encoder intra, pooling, decoder intra, decoder inter including
the +0.05 radius growth (ref tf_nnquery_gpu.cu:30-60) — the exact
window width the dense builder would need for its coverage certificate
to hold, using the same tile/slab arithmetic as
ops.dense.build_dense_graph.

Outputs feed ``SPH3DConfig.windows`` / ``dec_margin`` / ``growth_steps``
via :func:`derive_config_windows`; scripts/measure_windows.py is the CLI.
"""

from __future__ import annotations

import dataclasses

import numpy as np

TILE = 128
_BOUNDARY_EPS = 1e-6


def _round_up(x: int, m: int) -> int:
    return int(-(-int(x) // m) * m)


@dataclasses.dataclass
class LevelRequirement:
    """Worst-case measured slab widths (rows) for one pyramid level."""

    enc: int = 0        # intra graph at the level cloud
    pool: int = 0       # sampled points querying the level cloud
    dec: int = 0        # decoder intra graph at the sampled cloud
    dec_inter: int = 0  # finer cloud querying the sampled cloud (+growth)
    growth: int = 0     # max growth steps any inter row needed


def slab_requirement(
    db_key: np.ndarray, q_key: np.ndarray, radius, growth_block: bool = False
) -> int:
    """Required window rows for one graph on one cloud.

    Reproduces build_dense_graph's slab arithmetic: per 128-query tile,
    the window must span from the tile's clamped start block to the last
    db row with key <= tile_max + radius.

    Args:
      db_key: (N,) sorted db coordinates along the sort axis.
      q_key: (M,) query coordinates along the same axis.
      radius: scalar or per-tile (nT,) search radius (grown radii differ
        per tile).
      growth_block: the builder starts growth windows one block early.

    Returns:
      Required W in rows (not yet rounded to 128).
    """
    m = len(q_key)
    m_pad = _round_up(m, TILE)
    qk = np.full(m_pad, np.nan, np.float64)
    qk[:m] = q_key
    qk = qk.reshape(-1, TILE)
    tile_min = np.nanmin(qk, axis=1)
    tile_max = np.nanmax(qk, axis=1)
    real = ~np.isnan(tile_min)
    radius = np.broadcast_to(np.asarray(radius, np.float64), tile_min.shape)
    lo = tile_min - radius
    hi = tile_max + radius
    s_row = np.searchsorted(db_key, lo, side="left")
    e_row = np.searchsorted(db_key, hi, side="right")
    s_start = s_row // TILE - (1 if growth_block else 0)
    need = e_row - np.maximum(s_start, 0) * TILE
    need = np.where(real, need, 0)
    return int(need.max(initial=0))


def growth_steps_needed(
    db: np.ndarray, q: np.ndarray, radius: float, max_steps: int = 64
) -> np.ndarray:
    """Per-query first growth step with >= 1 strict-< in-range neighbor
    (the reference's +0.05 rescan schedule, ref tf_nnquery_gpu.cu:30-60).

    Returns (M,) int32; ``max_steps`` marks rows that never find one.
    """
    # exact nearest distance per query (chunked brute force)
    d_min = np.empty(len(q), np.float32)
    for i0 in range(0, len(q), 1024):
        chunk = q[i0:i0 + 1024, None, :3] - db[None, :, :3]
        d = np.sqrt((chunk.astype(np.float32) ** 2).sum(-1))
        d_min[i0:i0 + 1024] = d.min(axis=1)
    steps = np.full(len(q), max_steps, np.int32)
    r = np.float32(radius)
    for g in range(max_steps):
        hit = (d_min < r) & (np.abs(d_min - r) > _BOUNDARY_EPS)
        steps = np.where(hit & (steps == max_steps), g, steps)
        r = np.float32(r + np.float32(0.05))
    return steps


def measure_requirements(cfg, clouds: np.ndarray) -> list[LevelRequirement]:
    """Replay cfg's pyramid on (B, N, 3+) clouds; collect worst slabs.

    Uses the library's own spatial sort and FPS (identical point order to
    a real run; IDS/random configs are measured with FPS — their samples
    are a subset of the same cloud with the same radii, so slab widths
    are statistically identical).
    """
    import jax.numpy as jnp

    from sph3d_gcn_tpu.ops.locality import permute_points, spatial_sort
    from sph3d_gcn_tpu.ops.sample import farthest_point_sample

    num_levels = len(cfg.radius)
    reqs = [LevelRequirement() for _ in range(num_levels)]

    perm, _ = spatial_sort(jnp.asarray(clouds[..., :3]), cfg.radius[0])
    sorted_pts = np.asarray(
        permute_points(jnp.asarray(clouds[..., :3]), perm)
    )

    for b in range(len(sorted_pts)):
        levels = [sorted_pts[b]]
        pts = sorted_pts[b]
        for level in range(num_levels):
            s = cfg.num_sample[level]
            idx = np.sort(
                np.asarray(farthest_point_sample(s, jnp.asarray(pts[None])))[0]
            )
            pts = pts[idx]
            levels.append(pts)
        for level in range(num_levels):
            fine = levels[level]
            coarse = levels[level + 1]
            r = cfg.radius[level]
            key_f = fine[:, _sort_axis(fine)].astype(np.float64)
            key_c = coarse[:, _sort_axis(coarse)].astype(np.float64)
            req = reqs[level]
            req.enc = max(req.enc, slab_requirement(key_f, key_f, r))
            req.pool = max(req.pool, slab_requirement(key_f, key_c, r))
            req.dec = max(req.dec, slab_requirement(key_c, key_c, r))
            # decoder inter: fine points query the coarse cloud, with the
            # builder's per-tile grown radius re-certification
            g = growth_steps_needed(coarse, fine, r)
            req.growth = max(req.growth, int(g.max(initial=0)))
            m_pad = _round_up(len(fine), TILE)
            g_pad = np.zeros(m_pad, np.int32)
            g_pad[: len(fine)] = np.minimum(g, 63)
            g_tile = g_pad.reshape(-1, TILE).max(axis=1)
            r_eff = r + 0.05 * g_tile
            req.dec_inter = max(
                req.dec_inter,
                slab_requirement(key_c, key_f, r_eff, growth_block=True),
            )
    return reqs


def _sort_axis(pts: np.ndarray) -> int:
    """The axis the cloud is sorted along (first non-decreasing axis)."""
    for a in range(3):
        if np.all(np.diff(pts[:, a]) >= 0):
            return a
    raise ValueError("cloud is not axis-sorted")


def derive_config_windows(
    cfg, reqs: list[LevelRequirement], margin: float = 0.10
) -> tuple[tuple[int, ...], tuple[int, ...], int, int]:
    """Smallest calibrated window tables covering every measured
    requirement with ``margin`` headroom.

    Returns (windows, dec_windows, dec_margin, growth_steps) for
    ``SPH3DConfig``. The encoder window must also cover the pooling graph
    through the config's additive pool formula; decoder windows get their
    own table (the legacy subsample-ratio formula under-counts the
    128-row tile span).
    """
    import dataclasses as dc

    num_levels = len(cfg.radius)
    windows: list[int] = []
    dec_windows: list[int] = []
    dec_margin = 0
    for level, r in enumerate(reqs):
        n_level = cfg.num_input if level == 0 else cfg.num_sample[level - 1]
        cap = _round_up(n_level, TILE)
        s_cap = _round_up(cfg.num_sample[level], TILE)
        probe = dc.replace(
            cfg, windows=(TILE,) * num_levels, spatial_sort=True
        )
        pool_extra = probe.pool_window(level) - TILE
        enc_need = r.enc * (1 + margin)
        pool_need = r.pool * (1 + margin) - pool_extra
        w = _round_up(max(enc_need, pool_need, TILE), TILE)
        windows.append(min(w, cap))
        dw = _round_up(max(r.dec * (1 + margin), TILE), TILE)
        dec_windows.append(min(dw, s_cap))
        dec_margin = max(
            dec_margin, r.dec_inter * (1 + margin) - dec_windows[-1]
        )
    dec_margin = max(_round_up(max(dec_margin, 0), TILE), TILE)
    growth = max((r.growth for r in reqs), default=0)
    return tuple(windows), tuple(dec_windows), dec_margin, growth + 2
