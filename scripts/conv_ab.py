"""Microbench the fused dense conv kernels at headline level shapes.

The round-4 profile attributes ~40% of the ModelNet step and ~55% of the
S3DIS step to the per-level conv Pallas kernels, and the cost model says
the one-hot A construction (F*T*W compares + casts on the VPU per window
chunk) rivals or exceeds the kernels' MXU time. This tool times the conv
forward and forward+backward in isolation at the real level shapes so A/B
experiments (A-build dtype, S-stash, DMA feeds) measure in minutes, not
full-bench compiles.

Usage (real chip, one TPU process at a time):
    python scripts/conv_ab.py mn1 [int32|int8|float32]
    python scripts/conv_ab.py all int8
Cases: mn1 (C=35,m=2) mn2 (C=64,m=1) s1 (C=64,m=2) s2 (C=128,m=2)
       s3 (level-2, C=256,m=2 row-major)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

B = 16
KERNEL = (8, 2, 2)
F_BINS = KERNEL[0] * KERNEL[1] * KERNEL[2] + 1  # ops/kernelbin.py: n*p*q + 1


def _sorted_cloud(rng, b, n, kind):
    if kind == "surface":
        from bench import surface_clouds

        pts = surface_clouds(rng, b, n)
    else:
        from bench import scene_blocks

        pts = scene_blocks(rng, b, n)[..., :3]
    order = np.argsort(pts[..., 0], axis=-1)
    return np.take_along_axis(pts, order[..., None], axis=1)


CASES = {
    # name: (cloud, n, radius, window, c_in, mult)
    "mn1": ("surface", 10000, 0.1, 1536, 35, 2),
    "mn2": ("surface", 10000, 0.1, 1536, 64, 1),
    "s1": ("scene", 8192, 0.1, 1664, 64, 2),
    "s2": ("scene", 8192, 0.1, 1664, 128, 2),
    "s3": ("scene", 2048, 0.2, 896, 256, 2),
}


def run_case(name: str) -> None:
    import jax
    import jax.numpy as jnp

    import sph3d_gcn_tpu.ops.dense as dense

    kind, n, radius, window, c_in, mult = CASES[name]
    rng = np.random.default_rng(0)
    pts = jnp.array(_sorted_cloud(rng, B, n, kind))
    dnbh = dense.build_dense_graph(
        pts, pts, radius, 64, KERNEL, window=window, self_graph=True
    )
    ok = bool(dnbh.ok)
    feats = jnp.array(
        rng.standard_normal((B, n, c_in)).astype(np.float32)
    ).astype(jnp.bfloat16)
    filt = jnp.array(
        rng.standard_normal((F_BINS, c_in, mult)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)

    @jax.jit
    def fwd(f, w):
        return jnp.sum(
            dense.dense_depthwise_conv3d(f, w, dnbh).astype(jnp.float32)
        )

    @jax.jit
    def fwdbwd(f, w):
        def loss(f, w):
            return jnp.sum(
                dense.dense_depthwise_conv3d(f, w, dnbh).astype(jnp.float32)
            )

        v, (df, dw) = jax.value_and_grad(loss, argnums=(0, 1))(f, w)
        return v + jnp.sum(df.astype(jnp.float32)) + jnp.sum(
            dw.astype(jnp.float32)
        )

    for tag, fn in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
        float(fn(feats, filt))  # compile + warm
        float(fn(feats, filt))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            acc = 0.0
            for _ in range(5):
                acc = fn(feats, filt)
            float(acc)
            times.append((time.perf_counter() - t0) / 5)
        dt = sorted(times)[1]
        print(f"{name} {tag}: {dt * 1000:8.2f} ms  (ok={ok})", flush=True)


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    sel = sys.argv[1]
    if len(sys.argv) > 2:
        import jax.numpy as jnp

        import sph3d_gcn_tpu.ops.dense as dense

        if sys.argv[2].startswith("wch"):
            dense._WCH_OVERRIDE = int(sys.argv[2][3:])
            print(f"_WCH_OVERRIDE={dense._WCH_OVERRIDE}")
        elif sys.argv[2].startswith("stash"):
            dense._S_STASH_MAX_CC = int(sys.argv[2][5:])
            print(f"_S_STASH_MAX_CC={dense._S_STASH_MAX_CC}")
        else:
            dense._A_CMP_DTYPE = jnp.dtype(sys.argv[2]).type
            print(f"_A_CMP_DTYPE={sys.argv[2]}")
    names = CASES if sel == "all" else [sel]
    for name in names:
        run_case(name)


if __name__ == "__main__":
    main()
