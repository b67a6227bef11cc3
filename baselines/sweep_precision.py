#!/usr/bin/env python
"""Measure the sweep matcher's precision tiers on the REAL map (VERDICT r4
item 4: "earn the NN kernel roof claim" — a run, not an argument).

Builds the steady-state P2Plane mapper on the bundled 14-scan dataset, then
runs the production sweep matcher (``ops.nn_sweep.sweep_knn``) at each
cross-term ranking precision:

  highest   6-pass exact f32 (the r4 default)
  bf16x3    3-pass f32 emulation (hi/lo bf16 split, lo*lo dropped)
  bf16      1-pass bf16

on the real steady-state (reading, map) operands, and reports per tier:
p50 device ms, index agreement vs exact, and — for disagreeing picks —
the |d2(chosen) - d2(exact)| distribution (a disagreement whose distance
delta is ~0 is a near-tie swap, physically the same correspondence; the
engine's exactness claim rests on this number, not raw index agreement).

All tiers share the same centered coordinates and the same exact-f32
re-rank of survivors (reported distances are always exact); only WHICH
candidates reach the top-k differs.

Writes ``--out`` (default SWEEP_PRECISION.json at the repo root); merge
into the round's SOL artifact.  Run on the real chip.
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

DATA = "/root/reference/examples/data"
CONFIG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      "examples", "config_p2plane.yaml")


def timed(f, *args):
    import jax
    out = f(*args)
    jax.device_get(jax.tree.leaves(out)[0])  # compile + sync
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
        os.path.dirname(os.path.abspath(__file__)), "..",
        "SWEEP_PRECISION.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from norlab_icp_mapper_tpu import Mapper, PointBatch, se3
    from norlab_icp_mapper_tpu.io import read_vtk, read_trajectory_csv
    from norlab_icp_mapper_tpu.ops.nn_sweep import (sweep_knn, presort_ref,
                                                    presort_queries)

    scans_dir = os.path.join(DATA, "scans")
    scan_files = sorted(f for f in os.listdir(scans_dir)
                        if f.endswith(".vtk"))
    poses = read_trajectory_csv(os.path.join(DATA, "icp_odom.csv"))
    scans, hints = [], []
    for f in scan_files:
        pos, desc = read_vtk(os.path.join(scans_dir, f))
        scans.append(PointBatch.from_numpy(pos, desc))
        hints.append(pos.shape[0])

    mapper = Mapper(CONFIG, is_3d=True, is_online=False, is_mapping=True)
    for off in (0, int(2e9)):
        for batch, hint, (pose, stamp) in zip(scans, hints, poses):
            filtered = mapper.apply_input_filters(batch)
            mapper.process_input(filtered, pose, stamp + off,
                                 scan_valid_hint=hint)
    mapper.drain()

    ref = mapper.icp._ref if mapper.icp._ref is not None \
        else mapper.map.local
    scan = mapper.apply_input_filters(scans[7])
    est_pose = jnp.asarray(np.asarray(poses[7][0], np.float32))
    scan_m = jax.jit(se3.apply)(est_pose, scan)
    q, qm = scan_m.positions, scan_m.mask
    r, rm = ref.positions, ref.mask
    pre = presort_ref(r, rm)
    pre = jax.tree.map(lambda x: x.block_until_ready(), pre)
    pq = presort_queries(q, qm)

    report = {"shape": {"n_cap": int(q.shape[0]), "m_cap": int(r.shape[0]),
                        "n_valid": int(np.asarray(jnp.sum(qm))),
                        "m_valid": int(np.asarray(jnp.sum(rm)))},
              "tiers": {}}
    exact = {}
    for k in (1, 3):
        for tier in ("highest", "packed", "bf16x3", "bf16"):
            prec = None if tier in ("highest", "packed") else tier
            f = functools.partial(sweep_knn, q, r, qm, rm, k=k,
                                  max_radius=2.0, q_tile=1024, W=8192,
                                  use_pallas=True, presorted=pre,
                                  presorted_q=pq, precision=prec,
                                  packed=(tier == "packed"))
            dt = timed(f)
            d, i, ov = jax.device_get(f())
            d, i = np.asarray(d), np.asarray(i)
            row = {"ms": round(dt * 1e3, 3), "overflow_tiles": int(ov)}
            if tier == "highest":
                exact[k] = (d, i)
            else:
                d0, i0 = exact[k]
                agree = i[:, 0] == i0[:, 0]
                row["idx_agreement"] = round(float(agree.mean()), 6)
                both = np.isfinite(d[:, 0]) & np.isfinite(d0[:, 0])
                delta = np.abs(d[:, 0] - d0[:, 0])[both & ~agree]
                row["n_disagree"] = int((~agree).sum())
                row["n_match_flip"] = int(
                    (np.isfinite(d[:, 0]) != np.isfinite(d0[:, 0])).sum())
                if delta.size:
                    row["disagree_d2_delta_max"] = float(delta.max())
                    row["disagree_d2_delta_p50"] = float(
                        np.median(delta))
                row["speedup_vs_exact"] = round(
                    report["tiers"][f"k{k}_highest"]["ms"] / row["ms"], 2)
            report["tiers"][f"k{k}_{tier}"] = row
            print(json.dumps({f"k{k}_{tier}": row}), flush=True)

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
