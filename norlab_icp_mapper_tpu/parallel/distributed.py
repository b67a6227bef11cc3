"""Distributed scan-to-map registration over a device mesh.

The reference is single-process (SURVEY.md section 2.10); its spatial-scaling
story is the rolling window.  Here the map's cell blocks shard across a
``jax.sharding.Mesh`` axis (``"cells"``) and scan-to-map alignment runs under
``shard_map``:

  - the (small) reading scan is replicated to every shard,
  - each shard finds the 1-NN of every reading point inside its map shard,
  - a ``pmin`` over the mesh picks the global winner per reading point,
  - each shard accumulates the Gauss-Newton normal equations ONLY for the
    points it won, and a ``psum`` reduces the 6x6 ``JtJ`` + 6 ``Jtr`` over
    ICI (the Schur-complement-style reduction from BASELINE.json),
  - the solve + SE(3) update is replicated (36 + 6 floats — negligible).

Communication per iteration: one f32[N] pmin + one f32[N] psum (tie claims)
+ one (6x6 + 6) psum — bandwidth-trivial; the NN search stays fully local to
each shard.  This is the framework's "context parallelism" (map-space
parallelism, SURVEY.md section 5).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .. import se3

__all__ = ["make_mesh", "DistributedICP", "shard_points"]


def make_mesh(n_devices: Optional[int] = None, axis: str = "cells") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_points(positions: np.ndarray, normals: np.ndarray,
                 mask: np.ndarray, n_shards: int, cell_size: float = 20.0):
    """Partition map points into ``n_shards`` equal-capacity spatial shards.

    Points are bucketed by cell row (floor(x / cell_size)) and cells are
    round-robined across shards — the host-side analog of the Map's cell
    grid, keeping each shard's points spatially coherent so its NN search
    stays cheap.  Output arrays have shape [n_shards, cap, ...].
    """
    n = positions.shape[0]
    rows = np.floor(positions[:, 0] / cell_size).astype(np.int64)
    shard_of_point = np.abs(rows) % n_shards
    shard_of_point = np.where(mask, shard_of_point, -1)
    cap = 0
    groups = []
    for s in range(n_shards):
        idx = np.nonzero(shard_of_point == s)[0]
        groups.append(idx)
        cap = max(cap, len(idx))
    cap = max(256, int(2 ** np.ceil(np.log2(max(cap, 1)))))
    D = positions.shape[1]
    out_pos = np.zeros((n_shards, cap, D), np.float32)
    out_nrm = np.zeros((n_shards, cap, D), np.float32)
    out_msk = np.zeros((n_shards, cap), bool)
    for s, idx in enumerate(groups):
        out_pos[s, :len(idx)] = positions[idx]
        out_nrm[s, :len(idx)] = normals[idx]
        out_msk[s, :len(idx)] = True
    return out_pos, out_nrm, out_msk


class DistributedICP:
    """Point-to-plane ICP with the map sharded over a mesh axis.

    ``solve(reading..., map shards...)`` returns the correction transform,
    like the single-device engine. Matcher is 1-NN with ``max_dist`` gating;
    convergence is a fixed iteration count (counter checker) — the common
    production configuration for scan-to-map with a good prior.
    """

    def __init__(self, mesh: Mesh, max_dist: float = 2.0, max_iter: int = 10,
                 axis: str = "cells", ref_tile: int = 1024):
        self.mesh = mesh
        self.axis = axis
        self.max_dist = float(max_dist)
        self.max_iter = int(max_iter)
        self.ref_tile = int(ref_tile)
        self._compiled = {}

    def solve(self, read_pos, read_mask, map_pos, map_norm, map_mask):
        """``map_*`` have leading shard dim [S, cap, ...]; reading is
        replicated [N, ...]. Returns (correction, overlap, rms)."""
        key = (read_pos.shape, map_pos.shape)
        if key not in self._compiled:
            self._compiled[key] = self._build(read_pos.shape, map_pos.shape)
        return self._compiled[key](read_pos, read_mask, map_pos, map_norm,
                                   map_mask)

    def _build(self, read_shape, map_shape):
        mesh, axis = self.mesh, self.axis
        max_dist2 = self.max_dist * self.max_dist
        max_iter = self.max_iter
        ref_tile = self.ref_tile
        dim = read_shape[1]
        dof = 6 if dim == 3 else 3

        def local_nn(p, ref_pos, ref_mask):
            """1-NN of p [N,D] in this shard's block [M,D] (tiled scan)."""
            m = ref_pos.shape[0]
            n_tiles = max(1, m // ref_tile)
            ref_tiles = ref_pos.reshape(n_tiles, -1, dim)
            msk_tiles = ref_mask.reshape(n_tiles, -1)
            p2 = jnp.sum(p * p, axis=1, keepdims=True)

            def step(carry, inp):
                best_d, best_i = carry
                tile_idx, r, rm = inp
                r2 = jnp.sum(r * r, axis=1)
                cross = jnp.dot(p, r.T, precision=jax.lax.Precision.HIGHEST)
                d2 = jnp.maximum(p2 + r2[None, :] - 2.0 * cross, 0.0)
                d2 = jnp.where(rm[None, :], d2, jnp.inf)
                tmin = jnp.min(d2, axis=1)
                targ = jnp.argmin(d2, axis=1).astype(jnp.int32)
                gidx = tile_idx * ref_tiles.shape[1] + targ
                upd = tmin < best_d
                return (jnp.where(upd, tmin, best_d),
                        jnp.where(upd, gidx, best_i)), None

            init = (jnp.full((p.shape[0],), jnp.inf, jnp.float32),
                    jnp.full((p.shape[0],), -1, jnp.int32))
            # the carry becomes device-varying once it mixes with the local
            # map shard; mark it so shard_map's vma check accepts the scan
            init = jax.tree.map(
                lambda x: jax.lax.pcast(x, (axis,), to="varying"), init)
            (d2, idx), _ = jax.lax.scan(
                step, init,
                (jnp.arange(n_tiles, dtype=jnp.int32), ref_tiles, msk_tiles))
            return d2, idx

        def shard_fn(read_pos, read_mask, map_pos, map_norm, map_mask):
            # inside shard_map: map_* are this device's [1, cap, ...] block
            map_pos_l = map_pos[0]
            map_norm_l = map_norm[0]
            map_mask_l = map_mask[0]
            n_read = jnp.maximum(jnp.sum(read_mask.astype(jnp.float32)), 1.0)

            def body(carry):
                T, it, _, _ = carry
                p = se3.apply_points(T, read_pos)
                d2, idx = local_nn(p, map_pos_l, map_mask_l)
                d2 = jnp.where(read_mask, d2, jnp.inf)
                # global winner per reading point over the mesh axis
                gmin = jax.lax.pmin(d2, axis)
                mine = (d2 <= gmin) & jnp.isfinite(gmin) & (gmin <= max_dist2)
                # exact tie across shards: split the weight
                claims = jax.lax.psum(mine.astype(jnp.float32), axis)
                w = jnp.where(mine, 1.0 / jnp.maximum(claims, 1.0), 0.0)
                q = map_pos_l[jnp.maximum(idx, 0)]
                qn = map_norm_l[jnp.maximum(idx, 0)]
                r = jnp.sum(qn * (p - q), axis=1)
                if dim == 3:
                    J = jnp.concatenate([qn, jnp.cross(p, qn)], axis=1)
                else:
                    cross2 = p[:, 0] * qn[:, 1] - p[:, 1] * qn[:, 0]
                    J = jnp.concatenate([qn, cross2[:, None]], axis=1)
                Jw = J * w[:, None]
                JtJ = jax.lax.psum(
                    jnp.dot(Jw.T, J, precision=jax.lax.Precision.HIGHEST),
                    axis)
                Jtr = jax.lax.psum(Jw.T @ r, axis)
                wsum = jax.lax.psum(jnp.sum(w), axis)
                # relative damping — see icp/engine.py minimize()
                lam = 1e-3 * jnp.trace(JtJ) / dof + 1e-6
                JtJ = JtJ + lam * jnp.eye(dof, dtype=jnp.float32)
                dx = -jnp.linalg.solve(JtJ, Jtr)
                dT = se3.exp_se3(dx) if dim == 3 else se3.exp_se2(dx)
                overlap = jax.lax.psum(
                    jnp.sum(mine.astype(jnp.float32) *
                            (claims > 0).astype(jnp.float32)
                            / jnp.maximum(claims, 1.0)), axis) / n_read
                rms = jnp.sqrt(jax.lax.psum(jnp.sum(w * r * r), axis)
                               / jnp.maximum(wsum, 1e-9))
                return (dT @ T, it + 1, overlap, rms)

            def cond(carry):
                return carry[1] < max_iter

            T0 = (jnp.eye(dim + 1, dtype=jnp.float32), jnp.int32(0),
                  jnp.float32(0.0), jnp.float32(0.0))
            T, _, overlap, rms = jax.lax.while_loop(cond, body, T0)
            return T, overlap, rms

        fn = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P()))
        return jax.jit(fn)
