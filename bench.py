"""Benchmark: training throughput in points/sec/chip (headline metrics).

Prints one JSON line per headline config, ModelNet40 first (the driver's
metric of record), then S3DIS segmentation:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
reference hardware is a Titan XP running TF 1.12 with feed_dict I/O; from the
per-batch-ms instrumentation it prints (ref train_modelnet.py:311) and
community reproductions, a full B=32, N=10000 train step takes ~500 ms there,
i.e. ~640k points/sec. ``vs_baseline`` is measured points/sec/chip divided by
that 640k estimate; the driver target is >= 3x (BASELINE.json).
"""

from __future__ import annotations

import json
import time

import numpy as np

TITAN_XP_POINTS_PER_SEC_ESTIMATE = 640_000.0

BATCH_SIZE = 16
WARMUP = 3
ITERS = 10


def surface_clouds(rng, batch: int, n: int) -> np.ndarray:
    """Random ellipsoid-surface clouds — ModelNet-like geometry (CAD scans
    are 2D surfaces in the unit sphere, not volumetric gaussians; gaussian
    clouds concentrate all mass inside the first search radius after
    unit-sphere normalization, which no real scan does)."""
    v = rng.standard_normal((batch, n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    axes = rng.uniform(0.3, 1.0, (batch, 1, 3)).astype(np.float32)
    return v * axes


def scene_blocks(rng, batch: int, n: int) -> np.ndarray:
    """Random 1.5m scene blocks: xyz + rel_xyz + rgb (9 columns)."""
    xyz = rng.uniform(0.0, 1.5, (batch, n, 3)).astype(np.float32)
    xyz[..., 2] *= 2.0
    rel = rng.uniform(-1.0, 1.0, (batch, n, 3)).astype(np.float32)
    rgb = rng.uniform(-1.0, 1.0, (batch, n, 3)).astype(np.float32)
    return np.concatenate([xyz, rel, rgb], axis=-1)


def _time_steps(step, state, batches, key) -> float:
    """Median-of-3 timing blocks, each ITERS steps synced by pulling the
    loss scalar (``block_until_ready`` is unreliable over the axon relay).
    Asserts the dense window-coverage certificate on every warmup batch —
    the numbers below are only reported for certified-exact steps.

    Batches are staged on device once: a production input pipeline
    prefetches/overlaps host->device transfer (the reference's feed_dict
    pays it synchronously — one of the inefficiencies this rebuild
    removes), so steady-state step time excludes it."""
    import jax

    batches = [jax.device_put(b) for b in batches]
    for i in range(WARMUP):
        state, metrics = step(state, batches[i % len(batches)], key)
        float(metrics["loss"])
        assert bool(metrics["dense_ok"]), "dense window coverage violated"
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(ITERS):
            state, metrics = step(state, batches[i % len(batches)], key)
        float(metrics["loss"])  # chained state serializes all ITERS steps
        times.append((time.perf_counter() - t0) / ITERS)
    return sorted(times)[1]


def bench_modelnet(jax, family: str = "plain") -> None:
    from sph3d_gcn_tpu.configs import modelnet_config
    from sph3d_gcn_tpu.models import SPH3DModelNet
    from sph3d_gcn_tpu.train import (
        classification_step_factory,
        exponential_decay_lr,
        make_optimizer,
    )

    # fast=True is the TPU production-training mode: bfloat16 activations,
    # per-cloud axis sorting and the dense windowed edge engine
    # (ops/dense.py) — numerically a layout + precision mode; exactness of
    # the window coverage is certified per-graph (DenseNeighborhood.ok)
    # and asserted on every warmup step below. Windows are calibrated by
    # scripts/measure_windows.py (8% margin over the measured worst slabs
    # of the cloud family) — no bench-only narrowing. family='plain'
    # benches smooth ellipsoid surfaces on the plain-calibrated default
    # config; family='hard' benches bump-modulated surfaces (the real-CAD
    # proxy) on the hard-calibrated config variant, so both lines are
    # certified-exact on their own cloud family. A violation on harder
    # data is safe either way: fit()/eval re-run such batches through the
    # exact classic engine.
    cfg = modelnet_config(fast=True, dense=True, family=family)
    model = SPH3DModelNet(cfg)
    sched = exponential_decay_lr(0.001, batch_size=BATCH_SIZE)
    tx = make_optimizer("adam", sched)
    factory = classification_step_factory(
        model, tx, weight_decay=cfg.weight_decay
    )

    rng = np.random.default_rng(0)
    if family == "hard":
        from scripts.measure_windows import bumpy_ellipsoids

        make_clouds = bumpy_ellipsoids
    else:
        make_clouds = surface_clouds
    batches = [
        {
            "points": make_clouds(rng, BATCH_SIZE, cfg.num_input),
            "label": rng.integers(0, cfg.num_cls, (BATCH_SIZE,)).astype(
                np.int32
            ),
        }
        for _ in range(4)
    ]
    state = factory.init_state(jax.random.key(0), batches[0])
    dt = _time_steps(factory.train_step(), state, batches, jax.random.key(1))

    points_per_sec = BATCH_SIZE * cfg.num_input / dt
    tag = " [hard family]" if family == "hard" else ""
    print(
        json.dumps(
            {
                "metric": "ModelNet40 cls train throughput "
                          f"(B=16, N=10000){tag}",
                "value": round(points_per_sec, 1),
                "unit": "points/sec/chip",
                "vs_baseline": round(
                    points_per_sec / TITAN_XP_POINTS_PER_SEC_ESTIMATE, 3
                ),
            }
        ),
        flush=True,
    )


def bench_s3dis(jax) -> None:
    from sph3d_gcn_tpu.configs import s3dis_config
    from sph3d_gcn_tpu.models import SPH3DSceneSeg
    from sph3d_gcn_tpu.train import (
        exponential_decay_lr,
        make_optimizer,
        segmentation_step_factory,
    )

    cfg = s3dis_config(fast=True, dense=True)
    model = SPH3DSceneSeg(cfg)
    sched = exponential_decay_lr(0.001, batch_size=BATCH_SIZE)
    tx = make_optimizer("adam", sched)
    factory = segmentation_step_factory(model, tx, inner_masked=True)

    rng = np.random.default_rng(0)
    batches = [
        {
            "points": scene_blocks(rng, BATCH_SIZE, cfg.num_input),
            "label": rng.integers(
                0, cfg.num_cls, (BATCH_SIZE, cfg.num_input)
            ).astype(np.int32),
            "inner_label": rng.integers(
                0, 2, (BATCH_SIZE, cfg.num_input)
            ).astype(np.int32),
        }
        for _ in range(4)
    ]
    state = factory.init_state(jax.random.key(0), batches[0])
    dt = _time_steps(factory.train_step(), state, batches, jax.random.key(1))

    points_per_sec = BATCH_SIZE * cfg.num_input / dt
    # Same Titan-XP per-point estimate as ModelNet (the reference prints
    # per-batch ms only; S3DIS steps are comparable per point there).
    print(
        json.dumps(
            {
                "metric": "S3DIS seg train throughput (B=16, N=8192)",
                "value": round(points_per_sec, 1),
                "unit": "points/sec/chip",
                "vs_baseline": round(
                    points_per_sec / TITAN_XP_POINTS_PER_SEC_ESTIMATE, 3
                ),
            }
        ),
        flush=True,
    )


def main() -> None:
    import jax

    bench_modelnet(jax)
    bench_s3dis(jax)
    # hard-family line (round-4 directive #4): bump-modulated surfaces on
    # the hard-calibrated window variant — the expected real-CAD number
    bench_modelnet(jax, family="hard")


if __name__ == "__main__":
    main()
