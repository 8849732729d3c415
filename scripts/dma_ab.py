"""A/B the direct in-kernel window DMA path on the real TPU chip.

``ops/dense.py::_DIRECT_WIN_DMA`` replaces the materialized (g, W, C)
HBM feature windows with per-tile slab DMAs from a TILE-row-blocked
feature array. Interpret-mode parity is covered by
tests/test_dense.py::test_dense_conv_pool_both_window_paths; this tool
validates the Mosaic lowering + numerics on REAL hardware and times the
two headline benches under each setting.

Also A/Bs ``ops/dense.py::_GROUPED_BINS`` (sort-grouped bins / zone-split
conv): ``kernels`` asserts grouped==ungrouped value+grad parity on-chip,
and the bench modes take an optional ``g0``/``g1`` third argument.

Usage (one TPU process at a time — run modes sequentially):
    python scripts/dma_ab.py kernels        # compile + on-chip parity
    python scripts/dma_ab.py modelnet 0     # bench with DMA flag off
    python scripts/dma_ab.py modelnet 1     # bench with DMA flag on
    python scripts/dma_ab.py s3dis 1 g0     # DMA on, grouped bins off
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _kernels() -> None:
    """Compile the three Pallas kernels (transposed conv C<=128,
    row-major conv C>128, rank pool) with the DMA path on the real chip
    and assert value+grad parity against the materialized-window path."""
    import jax
    import jax.numpy as jnp

    import sph3d_gcn_tpu.ops.dense as dense

    if jax.devices()[0].platform != "tpu":
        print(
            "WARNING: not on a TPU — Pallas runs in INTERPRET mode here, "
            "so this validates numerics only, NOT the Mosaic lowering",
            flush=True,
        )

    rng = np.random.default_rng(17)
    b, n, k = 2, 1000, 16
    kernel = (8, 2, 3)
    pts = rng.standard_normal((b, n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    order = np.argsort(pts[..., 0], axis=-1)
    pts = np.take_along_axis(pts, order[..., None], axis=1)
    pts = jnp.array(pts)

    f_bins = kernel[0] * kernel[1] * kernel[2] + 1  # n*p*q + self bin

    def run(direct: bool, grouped: bool = True):
        dense._DIRECT_WIN_DMA = direct
        dense._GROUPED_BINS = grouped
        dnbh = dense.build_dense_graph(
            pts, pts, 0.35, k, kernel, window=768, self_graph=True
        )
        assert bool(dnbh.ok), "graph not certified on test cloud"
        assert dnbh.grouped == grouped
        outs = []
        # 35/64: lane-padded transposed-kernel DMA (C < 128 slabs pad to
        # 128 lanes, kernels slice); 128: aligned transposed; 256: row-major
        for c in (35, 64, 128, 256):
            feats = jnp.array(
                rng2.standard_normal((b, n, c)).astype(np.float32)
            )
            filt = jnp.array(
                rng2.standard_normal((f_bins, c, 2)).astype(np.float32)
            )

            def loss(f, w):
                return jnp.sum(jnp.sin(
                    dense.dense_depthwise_conv3d(f, w, dnbh)
                ))

            val, grads = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(
                feats, filt
            )
            outs.append(np.asarray(val))
            outs.extend(np.asarray(g) for g in grads)
        # rank pool (bf16 selection-only graph): c=64 is the lane-padded
        # n_cc==1 DMA path, c=128 the aligned one; 256/512 exercise the
        # CHUNKED per-grid-cell lane-offset DMA (n_cc=2/4) that S3DIS's
        # coarse pools run in production
        pnbh = dense.build_dense_graph(
            pts, pts[:, ::4], 0.35, 32, None, window=768
        )
        assert bool(pnbh.ok) and pnbh.k_max > 0
        for pc in (64, 128, 256, 512):
            fp = jnp.array(
                rng2.standard_normal((b, n, pc)).astype(np.float32)
            ).astype(jnp.bfloat16)

            def ploss(f):
                out, _ = dense.dense_max_pool3d(f, pnbh, with_index=False)
                return jnp.sum(out.astype(jnp.float32))

            pv, pg = jax.jit(jax.value_and_grad(ploss))(fp)
            outs.append(np.asarray(pv))
            outs.append(np.asarray(pg, dtype=np.float32))
        return outs

    t0 = time.perf_counter()
    results = {}
    for combo in ((False, False), (True, False), (False, True), (True, True)):
        rng2 = np.random.default_rng(3)
        results[combo] = run(*combo)

    def check(a, b, tag, rtol, atol):
        for i, (x, y) in enumerate(zip(results[a], results[b])):
            np.testing.assert_allclose(y, x, rtol=rtol, atol=atol,
                                       err_msg=f"[{tag}] output {i}")

    # DMA toggle at fixed grouping: identical math, different feed — tight.
    check((False, False), (True, False), "DMA", 2e-6, 2e-6)
    check((False, True), (True, True), "DMA@grouped", 2e-6, 2e-6)
    # Grouping toggle: the hemisphere sort reorders the window, so f32
    # accumulation order differs — reassociation-level tolerance.
    check((False, False), (False, True), "grouped", 2e-3, 2e-4)
    dense._DIRECT_WIN_DMA = True
    dense._GROUPED_BINS = True
    print(f"kernels OK: DMA and zone-split grouped paths compile on "
          f"{jax.devices()[0].platform} and match the materialized "
          f"ungrouped path ({len(results[(True, True)])} arrays, "
          f"{time.perf_counter() - t0:.1f}s)")


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(
            "usage: dma_ab.py kernels | {modelnet,s3dis} {0,1}\n"
            "  kernels: on-chip value+grad parity of the DMA kernels\n"
            "  modelnet/s3dis 0|1: bench with _DIRECT_WIN_DMA off|on"
        )
    mode = sys.argv[1]
    if mode == "kernels":
        _kernels()
        return
    flag = bool(int(sys.argv[2]))
    grouped = True
    if len(sys.argv) > 3:
        assert sys.argv[3] in ("g0", "g1"), sys.argv[3]
        grouped = sys.argv[3] == "g1"
    import jax

    import bench
    import sph3d_gcn_tpu.ops.dense as dense

    dense._DIRECT_WIN_DMA = flag
    dense._GROUPED_BINS = grouped
    print(f"_DIRECT_WIN_DMA={flag} _GROUPED_BINS={grouped}", flush=True)
    if mode == "modelnet":
        bench.bench_modelnet(jax)
    elif mode == "s3dis":
        bench.bench_s3dis(jax)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
