"""Real-data registration-quality regression test (VERDICT r1 item 2).

The reference example config maps with an IdentityErrorMinimizer (trusted
odometry, ``/root/reference/examples/config.yaml:62-63``), so its trajectory
ATE is 0 by construction and says nothing about the corrector.  This test
exercises the flagship correction path
(``/root/reference/norlab_icp_mapper/Mapper.cpp:208-223``) on the bundled
REAL scans: odometry priors are perturbed with seeded SE(3) noise and the
point-to-plane Gauss-Newton solve must register each scan back to the map.

Runs a 6-scan subset for CI speed; the full 14-scan run is
``baselines/validate_p2plane.py`` (golden artifacts in ``baselines/golden/``:
recovered ATE 0.0115 m vs prior 0.1634 m on the full sequence —
``p2plane_summary.json``).
"""
import os

import numpy as np
import pytest

DATA = "/root/reference/examples/data"
HERE = os.path.dirname(os.path.abspath(__file__))
CONFIG = os.path.join(HERE, "..", "examples", "config_p2plane.yaml")

N_SCANS = 6
SIGMA_T = 0.10  # m per-axis translation noise
SIGMA_R = np.deg2rad(1.5)  # rad per-axis rotation noise
ATE_BOUND_M = 0.06  # documented bound: recovered ATE on the 6-scan subset
MIN_IMPROVEMENT = 2.5  # recovered ATE must beat the perturbed priors' ATE


pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(DATA, "scans")),
    reason="bundled example data not present")


def _load(n):
    from norlab_icp_mapper_tpu import PointBatch
    from norlab_icp_mapper_tpu.io import read_vtk, read_trajectory_csv

    scan_files = sorted(
        f for f in os.listdir(os.path.join(DATA, "scans"))
        if f.endswith(".vtk"))[:n]
    rows = read_trajectory_csv(os.path.join(DATA, "icp_odom.csv"))[:n]
    scans, hints = [], []
    for f in scan_files:
        pos, desc = read_vtk(os.path.join(DATA, "scans", f))
        scans.append(PointBatch.from_numpy(pos, desc))
        hints.append(pos.shape[0])
    poses = [np.asarray(p, np.float32) for p, _ in rows]
    stamps = [s for _, s in rows]
    return scans, hints, poses, stamps


def _perturb(poses, rng):
    """Right-multiply all but the first (map anchor) pose by a random small
    SE(3) offset — identical scheme to baselines/validate_p2plane.py."""
    from norlab_icp_mapper_tpu import se3
    import jax.numpy as jnp

    out = [poses[0]]
    for p in poses[1:]:
        xi = np.concatenate([rng.normal(0, SIGMA_T, 3),
                             rng.normal(0, SIGMA_R, 3)]).astype(np.float32)
        dT = np.asarray(se3.exp_se3(jnp.asarray(xi)), np.float32)
        out.append(dT @ p)
    return out


def test_p2plane_corrects_real_trajectory():
    from norlab_icp_mapper_tpu import Mapper
    from norlab_icp_mapper_tpu.utils.metrics import ate

    scans, hints, clean_poses, stamps = _load(N_SCANS)
    noisy_poses = _perturb(clean_poses, np.random.default_rng(7))

    mapper = Mapper(CONFIG, is_3d=True, is_online=False, is_mapping=True)
    for batch, hint, pose, stamp in zip(scans, hints, noisy_poses, stamps):
        filtered = mapper.apply_input_filters(batch)
        mapper.process_input(filtered, pose, stamp, scan_valid_hint=hint)
    mapper.drain()
    rec_poses = mapper.get_trajectory().poses

    clean_xyz = np.stack([p[:3, 3] for p in clean_poses])
    noisy_xyz = np.stack([p[:3, 3] for p in noisy_poses])
    rec_xyz = np.stack([p[:3, 3] for p in rec_poses])

    prior_ate = ate(noisy_xyz, clean_xyz)
    recovered_ate = ate(rec_xyz, clean_xyz)

    assert prior_ate > 0.05, "perturbation should be meaningful"
    assert recovered_ate < ATE_BOUND_M, (
        f"P2Plane failed to correct the trajectory: recovered ATE "
        f"{recovered_ate:.4f} m (prior {prior_ate:.4f} m)")
    assert recovered_ate * MIN_IMPROVEMENT < prior_ate, (
        f"expected >= {MIN_IMPROVEMENT}x improvement, got "
        f"{prior_ate / max(recovered_ate, 1e-9):.2f}x")
