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
F32_FACTOR = 1.0 / 4.0  # legacy matmul-roof scaling kept for row parity
ROOF = V5E_BF16_TFLOPS * 1e12 * F32_FACTOR
V5E_VPU_TOPS = 3.85  # 8 sublanes x 128 lanes x ~4-wide f32 ALU x ~0.94 GHz
VPU_ROOF = V5E_VPU_TOPS * 1e12
# CORRECTED roof model (r4, measured — replaces r3's "VPU epilogue is
# binding" claim): at f32 HIGHEST the MXU cross-term IS the binding
# resource for k=1.  The D=3 contraction pads to the MXU's 128-deep
# systolic pass, so every pair consumes 128 MACs per pass, and HIGHEST
# f32 runs 6 bf16 passes -> pair-rate roof =
#   (394e12/2 MAC/s) / (128 * 6) = 256 Gpair/s.
# Evidence (r4 component runs): folding the epilogue FMA into the matmul
# changed nothing (epilogue not binding); dropping the matmul to
# 1-pass DEFAULT ran 3.07x faster (precision passes ARE binding) but with
# |d2| error up to ~17 m^2 at +-50 m coords — unusable for exact NN.
MXU_MAC_PER_S = V5E_BF16_TFLOPS * 1e12 / 2.0
K1_PAIR_ROOF_HIGHEST = MXU_MAC_PER_S / (128.0 * 6)
K1_PAIR_ROOF_DEFAULT = MXU_MAC_PER_S / 128.0


def timed(f, *args):
    import jax
    jax.device_get(jax.tree.leaves(f(*args))[0])  # compile + sync
    # the tunneled backend has a ~25 ms round-trip per blocking read (and
    # block_until_ready does NOT reliably sync on it — measured r4);
    # amortize ONE device_get over CHAIN back-to-back executions so the
    # measurement reflects device time
    CHAIN = 20
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            out = f(*args)
        jax.device_get(jax.tree.leaves(out)[0])
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

    # ---- r5: the PRODUCTION matcher kernel (single-launch sorted sweep,
    # VPU-direct distances).  The r4 roof model treated the 6-pass f32
    # MXU cross-term as the binding resource (256 Gpair/s); r5 replaces
    # the distance computation entirely: for D=3 the MXU pads its
    # contraction to the array's 128 depth, while ~3 (sub, fma) VPU
    # ops/pair roof at V5E_VPU/9 ~ 430 Gpair/s AND are numerically exact
    # with no |q|^2/|r|^2 cancellation.  Measured k=1 kernel: 5.10 ms
    # (MXU HIGHEST) -> 2.97 ms (VPU) at 402 Mpair = 135 Gpair/s.
    from norlab_icp_mapper_tpu.ops.nn_sweep import sweep_knn, presort_ref
    q = jnp.asarray(np.concatenate([
        rng.uniform(0, 100, (49152, 2)),
        rng.uniform(0, 8, (49152, 1))], axis=1).astype(np.float32))
    r = jnp.asarray(np.concatenate([
        rng.uniform(0, 100, (163840, 2)),
        rng.uniform(0, 8, (163840, 1))], axis=1).astype(np.float32))
    qm = jnp.ones((49152,), bool)
    rm = jnp.ones((163840,), bool)
    pre = jax.tree.map(lambda x: x.block_until_ready(), presort_ref(r, rm))
    qs = q[jnp.argsort(q[:, 0])]
    for k, packed in ((1, False), (3, True)):
        f = jax.jit(lambda qs=qs, k=k, packed=packed: sweep_knn(
            qs, r, qm, rm, k=k, max_radius=2.0, q_tile=1024, W=8192,
            use_pallas=True, presorted=pre, assume_sorted=True,
            packed=packed))
        dt = timed(f)
        pairs = 49152 * 8704  # N x (W + tr) live window pairs
        vpu_ops = pairs * (9.0 + (2.0 if k == 1 else 2.0 + 2.0 * k))
        rows.append({
            "kernel": "sweep_knn_fused_vpu", "N": 49152, "W": 8192,
            "k": k, "packed": packed, "ms": round(dt * 1e3, 2),
            "gpairs_per_s": round(pairs / dt / 1e9, 1),
            "vpu_roof_pct": round(100.0 * (vpu_ops / dt) / VPU_ROOF, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

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
        row = {
            "kernel": "knn_pallas", "N": n, "M": m, "k": k,
            "ms": round(dt * 1e3, 2),
            "gpairs_per_s": round(pairs / dt / 1e9, 1),
            "matmul_roof_pct": round(100.0 * (flops / dt) / ROOF, 1),
            "vpu_roof_pct": round(100.0 * (vpu_ops / dt) / VPU_ROOF, 1),
        }
        if k == 1:
            # the corrected binding roof: 6-pass f32 cross-term on the
            # 128-padded MXU contraction (see header)
            row["mxu_k1_roof_pct"] = round(
                100.0 * (pairs / dt) / K1_PAIR_ROOF_HIGHEST, 1)
        rows.append(row)
        print(json.dumps(rows[-1]), flush=True)

    # ---- component attribution at the flagship k=1 shape: where do the
    # milliseconds actually go, and what does each precision buy?
    n, m = 49152, 163840
    q = jnp.asarray(rng.uniform(0, 100, (n, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(0, 100, (m, 3)).astype(np.float32))
    qm = jnp.ones((n,), bool)
    rm = jnp.ones((m,), bool)
    f_hi = jax.jit(lambda q, r: knn_pallas(q, r, qm, rm, k=1))
    f_lo = jax.jit(lambda q, r: knn_pallas(
        q, r, qm, rm, k=1, precision=jax.lax.Precision.DEFAULT))
    dt_hi = timed(f_hi, q, r)
    dt_lo = timed(f_lo, q, r)
    d_hi, i_hi = (np.asarray(jax.device_get(v)) for v in f_hi(q, r))
    d_lo, i_lo = (np.asarray(jax.device_get(v)) for v in f_lo(q, r))
    pairs = n * m
    components = {
        "shape": [n, m, 1],
        "full_highest_ms": round(dt_hi * 1e3, 2),
        "full_default_ms": round(dt_lo * 1e3, 2),
        "default_speedup": round(dt_hi / dt_lo, 2),
        # 1 DEFAULT pass vs 6 HIGHEST passes isolates the matmul share:
        # mm6 ~ 6/5 * (dt_hi - dt_lo), epilogue ~ dt_hi - mm6
        "mm6_ms_est": round((dt_hi - dt_lo) * 6 / 5 * 1e3, 2),
        "epilogue_ms_est": round(
            (dt_hi - (dt_hi - dt_lo) * 6 / 5) * 1e3, 2),
        "mm6_gpairs_per_s": round(
            pairs / ((dt_hi - dt_lo) * 6 / 5) / 1e9, 1),
        "mm6_pct_of_mxu_roof": round(
            100.0 * pairs / ((dt_hi - dt_lo) * 6 / 5)
            / K1_PAIR_ROOF_HIGHEST, 1),
        "default_idx_agreement": round(
            float((i_hi[:, 0] == i_lo[:, 0]).mean()), 4),
        "default_max_d2_err": round(
            float(np.nanmax(np.abs(
                np.where(np.isfinite(d_hi[:, 0]) & np.isfinite(d_lo[:, 0]),
                         d_hi[:, 0] - d_lo[:, 0], 0.0)))), 3),
    }
    print(json.dumps({"components": components}), flush=True)

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
        json.dump({"components": components, "roof_model": {
            "v5e_bf16_tflops": V5E_BF16_TFLOPS,
            "f32_factor": F32_FACTOR,
            "v5e_vpu_tops_est": V5E_VPU_TOPS,
            "k1_pair_roof_highest_gpairs": round(
                K1_PAIR_ROOF_HIGHEST / 1e9, 1),
            "k1_pair_roof_default_gpairs": round(
                K1_PAIR_ROOF_DEFAULT / 1e9, 1),
            "note": "r5 roof model: the PRODUCTION sweep kernel computes "
                    "distances DIRECTLY on the VPU (subtract-first "
                    "squares, ~9 ops/pair, roof ~430 Gpair/s) — for D=3 "
                    "this beats the r4 'binding' MXU route, whose "
                    "128-padded 6-pass HIGHEST contraction roofs at 256 "
                    "Gpair/s, while being numerically exact (no "
                    "|q|^2/|r|^2 cancellation).  Measured k=1 kernel "
                    "5.10 -> 2.97 ms (sweep_knn_fused_vpu rows).  k>1 "
                    "uses quantized packed-key merging (r^2/2^17 ranking "
                    "steps, SWEEP_PRECISION.json) — plain integer mins, "
                    "no argmin/index planes.  The knn_pallas brute-force "
                    "rows below keep the MXU route for comparison; the "
                    "production matcher does ~20x fewer pairs than those "
                    "brute-force shapes via the sorted sweep."},
            "rows": rows}, fh, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
