#!/usr/bin/env python
"""Speed-of-light accounting for the NN correspondence kernel.

BASELINE.json metric 3 asks for the NN + Gauss-Newton kernels at
speed-of-light per chip.  This script measures the Pallas brute-force KNN
kernel (the framework's FLOP-dominant primitive) at production shapes and
reports achieved pair-rate against the two hardware roofs:

  MXU roof    the distance cross-term is one f32 [N,D]x[D,M] matmul:
              2*N*M*D FLOP.  v5e peak is ~394 TFLOP/s bf16 / ~98 f32-ish
              via 4-pass bf16x3; the kernel runs f32 HIGHEST (3-pass),
              so the relevant roof is ~1/4 of bf16 peak.
  VPU roof    per-pair epilogue (assemble d2, mask, top-k merge) is
              ~6 VPU ops/pair; v5e VPU is ~ 4 lanes*8 sublanes*2 unit
              * ~0.94 GHz ~ 60 GOP/s/core... in practice the top-k merge
              bounds the kernel at large k.

Also measures the radius-PCA moment-accumulation kernel (the surface-normal
engine, ``ops/pca.py``): per ref tile it runs TWO f32 matmuls — the
[T,D]x[D,N] distance cross-term and the [nm,T]x[T,N] moment accumulation
(nm = 1+2D+D(D-1)/2 = 10 at D=3) — so its matmul roof is 2*N*M*(D+nm) FLOP.

Prints one JSON line per configuration with achieved Gpair/s and the
percent of the matmul-roof pair rate; writes all rows to ``--out``
(default ``SOL.json`` at the repo root — commit the round artifact as
``SOL_r{N}.json``).  Run on the real chip.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

V5E_BF16_TFLOPS = 394.0  # per chip, public figure
F32_FACTOR = 1.0 / 4.0  # f32-via-bf16x3 + rounding passes (approx)
ROOF = V5E_BF16_TFLOPS * 1e12 * F32_FACTOR
# VPU estimate: 8 sublanes x 128 lanes x ~4-wide f32 ALU x ~0.94 GHz.
# For D=3 NN the MATMUL roof is not the binding roof: the cross-term has
# only 3 MXU flops/pair (and the padded-8 contraction runs the MXU at
# 8/128 utilization), while the min/argmin epilogue costs ~3 VPU
# element-passes per pair — the kernel is VPU-reduction-bound.
V5E_VPU_TOPS = 3.85
VPU_ROOF = V5E_VPU_TOPS * 1e12


def timed(f, *args):
    import jax
    jax.block_until_ready(f(*args))  # compile
    # the tunneled backend has a ~23 ms completion-notification latency
    # per host sync; amortize it over CHAIN back-to-back executions so
    # the measurement reflects device time
    CHAIN = 20
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(CHAIN)]
        jax.block_until_ready(outs[-1])
        ts.append((time.perf_counter() - t0) / CHAIN)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "SOL.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from norlab_icp_mapper_tpu.ops.nn_pallas import knn_pallas
    from norlab_icp_mapper_tpu.ops.pca import radius_pca

    rng = np.random.default_rng(0)
    rows = []

    knn_configs = [
        # (N queries, M refs, k) — production-ish shapes
        (49152, 8192, 6),    # ICP matcher sweep window slice
        (49152, 163840, 1),  # PointDistance gate, full map
        (163840, 49152, 1),  # dynamic-points angular NN shape class
        (131072, 131072, 8), # large-map stress
    ]
    for n, m, k in knn_configs:
        q = jnp.asarray(rng.uniform(0, 100, (n, 3)).astype(np.float32))
        r = jnp.asarray(rng.uniform(0, 100, (m, 3)).astype(np.float32))
        qm = jnp.ones((n,), bool)
        rm = jnp.ones((m,), bool)
        f = jax.jit(lambda q, r: knn_pallas(q, r, qm, rm, k=k))
        dt = timed(f, q, r)
        pairs = n * m
        flops = 2.0 * pairs * 3  # matmul cross-term only
        # epilogue VPU ops/pair: shifted-distance FMA + min + argmin for
        # k=1; k rounds of min-extraction (min/argmin/select) for k>1
        vpu_ops = pairs * (3.0 if k == 1 else 1.0 + 3.0 * k)
        rows.append({
            "kernel": "knn_pallas", "N": n, "M": m, "k": k,
            "ms": round(dt * 1e3, 2),
            "gpairs_per_s": round(pairs / dt / 1e9, 1),
            "matmul_roof_pct": round(100.0 * (flops / dt) / ROOF, 1),
            "vpu_roof_pct": round(100.0 * (vpu_ops / dt) / VPU_ROOF, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    pca_configs = [
        # (N queries == refs) — normals recompute over the merged map
        (81920,),
        (163840,),
    ]
    W = 4096  # sweep window (production default)
    for (n,) in pca_configs:
        p = jnp.asarray(rng.uniform(0, 100, (n, 3)).astype(np.float32))
        pm = jnp.ones((n,), bool)
        f = jax.jit(lambda p: radius_pca(p, p, pm, pm, max_radius=1.0,
                                         W=W)[:3])
        dt = timed(f, p)
        # the TPU path is the SORTED-SWEEP kernel: each query examines a
        # W-candidate window, so the matmul work is 2*N*W*(D + nm) FLOP
        # (cross-term + moment matmul); the sort/permute prologue is
        # non-matmul work the roof %% deliberately charges against it
        pairs = n * W
        flops = 2.0 * pairs * (3 + 10)
        vpu_ops = pairs * 3.0  # window gather + d2 + in-radius mask
        rows.append({
            "kernel": "radius_pca_sweep", "N": n, "W": W,
            "ms": round(dt * 1e3, 2),
            "gpairs_per_s": round(pairs / dt / 1e9, 1),
            "matmul_roof_pct": round(100.0 * (flops / dt) / ROOF, 1),
            "vpu_roof_pct": round(100.0 * (vpu_ops / dt) / VPU_ROOF, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    with open(args.out, "w") as fh:
        json.dump({"roof_model": {
            "v5e_bf16_tflops": V5E_BF16_TFLOPS,
            "f32_factor": F32_FACTOR,
            "v5e_vpu_tops_est": V5E_VPU_TOPS,
            "note": "f32 HIGHEST matmuls; matmul roof = bf16 peak / 4. "
                    "For D=3 NN the binding roof is the VPU epilogue "
                    "(3 MXU flop/pair vs ~3 VPU passes/pair; the padded-8 "
                    "contraction also caps MXU utilization at 8/128): "
                    "vpu_roof_pct is the relevant speed-of-light figure. "
                    "Tile sweep measured FLAT 67-80 ms across "
                    "(tq,tr) in {512..4096}x{256..2048} at 49k x 164k, "
                    "confirming the bound is per-pair VPU work, not "
                    "layout."},
            "rows": rows}, fh, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
