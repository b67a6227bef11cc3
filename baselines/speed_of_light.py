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

Prints one JSON line per configuration with achieved Gpair/s and the
percent of the matmul-roof pair rate.  Run on the real chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

V5E_BF16_TFLOPS = 394.0  # per chip, public figure
F32_FACTOR = 1.0 / 4.0  # f32-via-bf16x3 + rounding passes (approx)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from norlab_icp_mapper_tpu.ops.nn_pallas import knn_pallas

    rng = np.random.default_rng(0)
    configs = [
        # (N queries, M refs, k) — production-ish shapes
        (49152, 8192, 6),    # ICP matcher sweep window slice
        (49152, 163840, 1),  # PointDistance gate, full map
        (163840, 49152, 1),  # dynamic-points angular NN shape class
        (131072, 131072, 8), # large-map stress
    ]
    for n, m, k in configs:
        q = jnp.asarray(rng.uniform(0, 100, (n, 3)).astype(np.float32))
        r = jnp.asarray(rng.uniform(0, 100, (m, 3)).astype(np.float32))
        qm = jnp.ones((n,), bool)
        rm = jnp.ones((m,), bool)

        f = jax.jit(lambda q, r: knn_pallas(q, r, qm, rm, k=k))
        jax.block_until_ready(f(q, r))  # compile
        # the tunneled backend has a ~23 ms completion-notification latency
        # per host sync; amortize it over CHAIN back-to-back executions so
        # the measurement reflects device time
        CHAIN = 20
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            outs = [f(q, r) for _ in range(CHAIN)]
            jax.block_until_ready(outs[-1])
            ts.append((time.perf_counter() - t0) / CHAIN)
        dt = float(np.median(ts))
        pairs = n * m
        flops = 2.0 * pairs * 3  # matmul cross-term only
        roof = V5E_BF16_TFLOPS * 1e12 * F32_FACTOR
        print(json.dumps({
            "N": n, "M": m, "k": k,
            "ms": round(dt * 1e3, 2),
            "gpairs_per_s": round(pairs / dt / 1e9, 1),
            "matmul_roof_pct": round(100.0 * (flops / dt) / roof, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
