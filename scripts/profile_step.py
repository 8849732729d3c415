#!/usr/bin/env python
"""Device-time breakdown of a full train step, mapped to source operations.

Captures a jax.profiler trace of one ModelNet (or S3DIS) train step on the
current backend and aggregates device op time by the originating source op
(grepping ``op_name`` metadata out of the compiled HLO). This is the tool
that located every round-1 bottleneck (top_k lowering to sort, in-loop
gathers, unpool backward blowup) — see CLAUDE.md "Platform gotchas".

Usage: python scripts/profile_step.py [--model s3dis] [--batch_size 16]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="modelnet",
                        choices=["modelnet", "s3dis"])
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--min_us", type=int, default=200,
                        help="drop device events shorter than this (us); "
                        "lower it to see the small-fusion tail (BN, opt)")
    parser.add_argument("--platform", default=None)
    parser.add_argument("--fast", action="store_true",
                        help="profile the fast (bf16 + windowed) config")
    parser.add_argument("--dense", action="store_true",
                        help="with --fast: use the dense windowed engine")
    args = parser.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from sph3d_gcn_tpu.configs import modelnet_config, s3dis_config
    from sph3d_gcn_tpu.models import SPH3DModelNet, SPH3DSceneSeg
    from sph3d_gcn_tpu.train import (
        classification_step_factory,
        make_optimizer,
        segmentation_step_factory,
    )

    rng = np.random.default_rng(0)
    b = args.batch_size
    if args.model == "modelnet":
        from bench import surface_clouds

        cfg = modelnet_config(fast=args.fast, dense=args.dense)
        model = SPH3DModelNet(cfg)
        factory = classification_step_factory(
            model, make_optimizer("adam", 1e-3), weight_decay=cfg.weight_decay
        )
        batch = {
            "points": surface_clouds(rng, b, cfg.num_input),
            "label": rng.integers(0, cfg.num_cls, (b,)).astype(np.int32),
        }
        tag = "SPH3DModelNet"
    else:
        cfg = s3dis_config(fast=args.fast, dense=args.dense)
        model = SPH3DSceneSeg(cfg)
        factory = segmentation_step_factory(
            model, make_optimizer("adam", 1e-3), inner_masked=True
        )
        batch = {
            "points": rng.uniform(-2, 2, (b, cfg.num_input, 6)).astype(np.float32),
            "label": rng.integers(0, cfg.num_cls, (b, cfg.num_input)).astype(np.int32),
            "inner_label": rng.integers(0, 2, (b, cfg.num_input)).astype(np.int32),
        }
        tag = "SPH3DSceneSeg"

    state = factory.init_state(jax.random.key(0), batch)
    # stage once: a numpy batch would re-upload every step and the
    # DevicePut transfers would pollute the device trace (~13ms at
    # S3DIS batch sizes over the relay)
    batch = jax.device_put(batch)
    step = factory.train_step()
    key = jax.random.key(1)
    state, m = step(state, batch, key)
    print("warm loss:", float(m["loss"]))

    trace_dir = tempfile.mkdtemp(prefix="sph3d_trace_")
    with jax.profiler.trace(trace_dir):
        state, m = step(state, batch, key)
        float(m["loss"])

    # Map fusion/while names -> source op names from the compiled HLO.
    hlo = step.lower(state, batch, key).compile().as_text()
    meta = {
        mm.group(1): mm.group(2)
        for mm in re.finditer(r"%([\w\.\-]+) = [^\n]*?op_name=\"([^\"]+)\"", hlo)
    }
    # Fusions without their own op_name: borrow the computation ROOT's
    # metadata (fusion %fusion.N ... calls=%fused_computation.N whose ROOT
    # carries the dominant op's op_name).
    calls = {
        mm.group(1): mm.group(2)
        for mm in re.finditer(
            r"%(fusion[\w\.\-]*) = [^\n]*?(?:calls|fusion)=%([\w\.\-]+)", hlo
        )
    }
    roots = {}
    cur = None
    for line in hlo.splitlines():
        mm = re.match(r"%([\w\.\-]+) \(", line)
        if mm:
            cur = mm.group(1)
        elif cur and " ROOT " in line:
            mm = re.search(r'op_name="([^"]+)"', line)
            if mm:
                roots[cur] = mm.group(1)
    for fusion, comp in calls.items():
        if fusion not in meta and comp in roots:
            meta[fusion] = roots[comp] + " (fusion-root)"

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    # device-track events only: host rows (PjitFunction dispatch,
    # DevicePut, ParseArguments) measure wall/dispatch time, not chip
    # time, and used to masquerade as ~35ms of "unmapped" step cost
    device_pids = {
        e["pid"]
        for e in trace["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "/device:" in str(e.get("args", {}).get("name", ""))
    }
    events = [
        e for e in trace["traceEvents"]
        if e.get("ph") == "X" and e.get("dur", 0) > args.min_us
        and e.get("pid") in device_pids
    ]
    agg = collections.Counter()
    unmapped = collections.Counter()
    for e in events:
        name = e["name"]
        if name in meta:
            src = meta[name]
            src = re.sub(r"jit\(step\)/", "", src)
            src = re.sub(rf"transpose\(jvp\({tag}\)\)", "BWD", src)
            src = re.sub(rf"jvp\({tag}\)", "FWD", src)
            agg[src[:110]] += e["dur"]
        elif not name.startswith("$") and "jit_" not in name and name not in (
            "np.asarray(jax.Array)", "0",
        ):
            unmapped[name] += e["dur"]

    print("== mapped device time by source op ==")
    for name, dur in agg.most_common(args.top):
        print(f"{dur / 1000:8.2f} ms  {name}")
    print(f"mapped total: {sum(agg.values()) / 1000:.1f} ms")
    print("== unmapped (late-pass fusions: scatters, optimizer, BN) ==")
    # For unmapped fusions, summarize the fused computation's contents:
    # every distinct op_name of its inner instructions (the metadata the
    # late fusion pass dropped from the fusion op itself).
    comp_ops: dict[str, collections.Counter] = {}
    cur = None
    for line in hlo.splitlines():
        mm = re.match(r"%([\w\.\-]+) \(", line)
        if mm:
            cur = mm.group(1)
        elif cur is not None:
            mm = re.search(r'op_name="([^"]+)"', line)
            if mm:
                comp_ops.setdefault(cur, collections.Counter())[
                    re.sub(r"jit\(step\)/", "", mm.group(1))[:70]
                ] += 1
    for name, dur in unmapped.most_common(10):
        print(f"{dur / 1000:8.2f} ms  {name[:80]}")
        comp = calls.get(name)
        inner = comp_ops.get(comp, collections.Counter())
        for src, cnt in inner.most_common(3):
            print(f"              <- {cnt}x {src}")
    print(f"unmapped total: {sum(unmapped.values()) / 1000:.1f} ms")

    # MFU: HLO-counted flops per steady-state step over the v5e bf16 MXU
    # peak (197 TFLOP/s). HLO flops include engine overheads (e.g. the
    # dense one-hot matmuls), so this is hardware utilization, an upper
    # bound on model-flop utilization.
    import time

    cost = step.lower(state, batch, key).compile().cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    for _ in range(2):
        state, m = step(state, batch, key)
        float(m["loss"])
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        state, m = step(state, batch, key)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    peak = 197e12
    print(f"== step {dt * 1000:.1f} ms, {flops / 1e9:.1f} GFLOP (HLO), "
          f"MFU {flops / dt / peak * 100:.2f}% of v5e bf16 peak ==")

    # ---- engine roofline (round-4 directive #2) ----
    # The dense engine's own physical work per step, from the trace-time
    # cost ledger (ops/dense.py _COST_LEDGER: exact per-op kernel shapes,
    # no config re-derivation), converted to per-resource lower bounds.
    # HLO "useful" flops miss the one-hot matmuls' MXU work and the
    # window-slab HBM traffic entirely, so MFU alone cannot falsify
    # "the conv is at its floor" — these bounds can.
    import sph3d_gcn_tpu.ops.dense as dense_mod

    ledger: list = []
    dense_mod._COST_LEDGER = ledger
    jax.eval_shape(
        factory.train_step(donate=False), state, batch, key
    )
    dense_mod._COST_LEDGER = None
    bound = roofline(ledger)
    for k, v in bound.items():
        print(f"roofline {k}: {v:.2f} ms")
    floor = max(bound.values())
    print(
        f"== modeled step floor {floor:.2f} ms "
        f"(measured {dt * 1000:.1f} ms = {dt * 1000 / floor:.2f}x the "
        f"binding resource) =="
    )


# v5e rates (approximate, documented): MXU 197 bf16 TFLOP/s => 98.5e12
# MAC/s; VPU ~ 8 sublanes x 128 lanes x 4 ALUs x ~0.94 GHz ~= 3.9e12
# 32-bit lane-ops/s (16-bit ops pack 2x); HBM ~ 810 GB/s.
_MXU = 98.5e12
_VPU = 3.9e12
_HBM = 8.1e11


def roofline(ledger: list) -> dict:
    """Per-resource time (ms) the recorded dense ops need at the v5e
    rates above, for one TRAIN step (fwd + bwd multipliers per op kind).

    Conservative in both directions by design: windows are counted at
    full padded width (the kernels skip all-zero tail chunks), but BN,
    optimizer, FPS, logits/loss and XLA fusions are not modeled at all.
    The binding resource's time is a floor for the step; "measured /
    floor" close to 1 means the engine is at its own structural limit
    and further wins require changing the engine, not tuning kernels."""
    mxu = vpu = hbm = 0.0
    t = 128
    for r in ledger:
        g, w = r["g"], r.get("w", 0)
        c = r.get("c", 0)
        c_dma = -(-c // 128) * 128  # DMA slabs are lane-padded (_dma_c)
        if r["kind"] == "conv":
            f, mult = r["f"], r["mult"]
            # S/dfw one-hot matmuls: fwd S, bwd dfw (the VJP forward
            # stashes S, so the backward never recomputes it)
            mxu += 2 * g * c * f * t * w
            # A builds (compare + cast over (F, T, W)): fwd + bwd
            vpu += 2 * 2 * g * f * t * w
            # window slab traffic: fwd read + bwd dfw write/read (the
            # S-stash means no bwd window read on either feed; the
            # materialized path pays the gather einsum round trip too),
            # + packed map reads + the S stash write/read
            slab_r = g * w * (c_dma if r["dma"] else c) * 2
            slab_w = 2 * g * w * c * 2
            hbm += slab_r + slab_w + (slab_r if not r["dma"] else 0)
            hbm += 2 * g * t * w + 2 * g * f * t * c * 2
            if r["pointwise"]:
                mxu += 3 * g * t * (c * mult) * r["pointwise"]
        elif r["kind"] == "max_pool":
            k = r["k"] or 64
            # rank-compaction matmuls fwd + bwd
            mxu += 2 * g * k * t * w * c
            vpu += 2 * 2 * g * k * t * w
            slab_r = g * w * (c_dma if r["dma"] else c) * 2
            hbm += slab_r + 2 * g * w * c * 2 + 2 * g * t * w
        elif r["kind"] == "masked_mean":
            mxu += 3 * g * t * w * c
            vpu += 2 * g * t * w
            hbm += 2 * g * t * w
        elif r["kind"] == "window_gather":
            # one-hot block gather einsum + its backward scatter
            nb = r["n_pad"] // t + 1
            mxu += 2 * g * (r["w"] // t) * nb * t * c
        elif r["kind"] == "query":
            # distance + compare-only bin/rank passes, ~20 lane-ops per
            # (query, candidate); fwd only (no gradient)
            vpu += 20 * g * t * w
    return {
        "mxu": mxu / _MXU * 1e3,
        "vpu": vpu / _VPU * 1e3,
        "hbm": hbm / _HBM * 1e3,
    }


if __name__ == "__main__":
    main()
