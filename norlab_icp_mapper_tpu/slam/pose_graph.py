"""Keyframe pose-graph refinement (Gauss-Newton on SE(3)/SE(2)).

The reference has no backend optimizer — its trajectory is whatever ICP
produced online.  The north star (BASELINE.json) adds "a pose-graph
refinement pass over the keyframe trajectory": given keyframe poses and
relative-pose constraints (sequential odometry + loop closures from
re-registering keyframe pairs), minimize

    sum_e w_e * || log( Z_e^-1 * (T_i^-1 * T_j) ) ||^2

over all node poses (node 0 gauge-fixed).  Small graphs (10^2..10^3
keyframes) solve densely on-chip: the Jacobian comes from ``jax.jacfwd``
over the stacked residual, one GN step is a damped solve, iterated a fixed
number of times under jit.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import se3

__all__ = ["optimize_pose_graph", "sequential_edges", "detect_loop_closures"]


def _exp(xi, dim):
    return se3.exp_se3(xi) if dim == 3 else se3.exp_se2(xi)


def _log(T, dim):
    if dim == 3:
        return se3.log_se3(T)
    # SE(2) log
    R = T[:2, :2]
    t = T[:2, 2]
    w = jnp.arctan2(R[1, 0], R[0, 0])
    small = jnp.abs(w) < 1e-5
    A = jnp.where(small, 1.0 - w * w / 6.0, jnp.sin(w) / jnp.where(small, 1.0, w))
    B = jnp.where(small, w / 2.0, (1.0 - jnp.cos(w)) / jnp.where(small, 1.0, w))
    det = A * A + B * B
    Vinv = jnp.array([[A, B], [-B, A]]) / jnp.maximum(det, 1e-12)
    v = Vinv @ t
    return jnp.concatenate([v, w[None]])


@functools.partial(jax.jit, static_argnames=("dim", "iters"))
def _solve(poses0, ei, ej, Z, w, *, dim, iters):
    n = poses0.shape[0]
    dof = 6 if dim == 3 else 3

    def residuals(xi_flat):
        xi = xi_flat.reshape(n, dof)
        Ts = jax.vmap(lambda x, T: _exp(x, dim) @ T)(xi, poses0)
        Ti = Ts[ei]
        Tj = Ts[ej]
        rel = jax.vmap(se3.inverse)(Ti) @ Tj
        err = jax.vmap(se3.inverse)(Z) @ rel
        r = jax.vmap(lambda e: _log(e, dim))(err)  # [E, dof]
        return (r * jnp.sqrt(w)[:, None]).reshape(-1)

    def gn_step(xi_flat, _):
        r = residuals(xi_flat)
        J = jax.jacfwd(residuals)(xi_flat)  # [E*dof, n*dof]
        # gauge fix: freeze node 0
        mask = jnp.concatenate(
            [jnp.zeros((dof,)), jnp.ones(((n - 1) * dof,))])
        J = J * mask[None, :]
        JtJ = J.T @ J
        lam = 1e-6 + 1e-4 * jnp.trace(JtJ) / (n * dof)
        JtJ = JtJ + lam * jnp.eye(n * dof, dtype=JtJ.dtype)
        dx = -jnp.linalg.solve(JtJ, J.T @ r)
        return xi_flat + dx * mask, jnp.sum(r * r)

    xi0 = jnp.zeros((n * dof,), jnp.float32)
    xi, costs = jax.lax.scan(gn_step, xi0, None, length=iters)
    xi = xi.reshape(n, dof)
    out = jax.vmap(lambda x, T: _exp(x, dim) @ T)(xi, poses0)
    return out, costs


def optimize_pose_graph(
    poses: np.ndarray,  # [N, dim+1, dim+1]
    edges_i: Sequence[int],
    edges_j: Sequence[int],
    measurements: np.ndarray,  # [E, dim+1, dim+1]  Z: T_i^-1 T_j expected
    weights: Optional[Sequence[float]] = None,
    iters: int = 10,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (optimized poses, per-iteration costs)."""
    poses = np.asarray(poses, np.float32)
    dim = poses.shape[-1] - 1
    E = len(edges_i)
    w = np.ones((E,), np.float32) if weights is None else \
        np.asarray(weights, np.float32)
    out, costs = _solve(jnp.asarray(poses),
                        jnp.asarray(np.asarray(edges_i, np.int32)),
                        jnp.asarray(np.asarray(edges_j, np.int32)),
                        jnp.asarray(np.asarray(measurements, np.float32)),
                        jnp.asarray(w), dim=dim, iters=iters)
    return np.asarray(out), np.asarray(costs)


def sequential_edges(poses: np.ndarray):
    """Odometry edges between consecutive keyframes (Z from the poses)."""
    n = poses.shape[0]
    ei = list(range(n - 1))
    ej = list(range(1, n))
    Z = np.stack([np.linalg.inv(poses[i]) @ poses[i + 1]
                  for i in range(n - 1)]).astype(np.float32)
    return ei, ej, Z


def detect_loop_closures(
    keyframe_scans, poses: np.ndarray, icp_engine,
    min_index_gap: int = 10, max_dist: float = 5.0,
    min_overlap: float = 0.5,
):
    """Candidate loop closures: keyframe pairs spatially close but far in
    time; each candidate is verified by re-registering the scans with the
    given ICP engine.  Returns (ei, ej, Z, weights)."""
    from ..points import PointBatch

    n = poses.shape[0]
    d = poses.shape[-1] - 1
    pos = poses[:, :d, d]
    ei, ej, Z, w = [], [], [], []
    for i in range(n):
        for j in range(i + min_index_gap, n):
            if np.linalg.norm(pos[i] - pos[j]) > max_dist:
                continue
            ref = keyframe_scans[i]
            if not isinstance(ref, PointBatch):
                ref = PointBatch.from_numpy(ref)
            icp_engine.set_map(ref)
            reading = keyframe_scans[j]
            if not isinstance(reading, PointBatch):
                reading = PointBatch.from_numpy(reading)
            # initial guess: current relative pose; reading expressed in
            # frame i via that guess, ICP refines the residual error
            rel0 = np.linalg.inv(poses[i]) @ poses[j]
            moved = se3.apply(jnp.asarray(rel0), reading)
            result = icp_engine(moved)
            if float(result.overlap) < min_overlap:
                continue
            corr = np.asarray(result.correction)
            ei.append(i)
            ej.append(j)
            Z.append((corr @ rel0).astype(np.float32))
            w.append(float(result.overlap))
    if not Z:
        return [], [], np.zeros((0, d + 1, d + 1), np.float32), []
    return ei, ej, np.stack(Z), w
