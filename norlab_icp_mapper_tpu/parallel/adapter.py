"""ShardedICPAdapter: plug the distributed solver into the Mapper facade.

Implements the engine interface the Mapper/Map expect (``set_map``,
``__call__``, ``has_map``) on top of ``DistributedICP``: every time the map
changes, its points re-shard across the mesh's ``cells`` axis
(``shard_points``); registration then runs shard-local NN + psum'd normal
equations.  Map maintenance (merge, filters, rolling window) stays on the
default device — the registration hot loop is what scales with map size.

Usage:
    mesh = make_mesh()
    mapper = Mapper(config, is_3d=True)
    mapper.icp = mapper.map.icp = ShardedICPAdapter(mesh, config["icp"])
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .distributed import DistributedICP, shard_points
from ..filters.core import FilterChain
from ..icp.engine import ICPEngine, ICPResult

__all__ = ["ShardedICPAdapter"]


class ShardedICPAdapter:
    def __init__(self, mesh, icp_config: Optional[Dict[str, Any]] = None,
                 dim: int = 3, cell_size: float = 20.0):
        # reuse the single-device engine's config parsing for filters/params
        self._cfg = ICPEngine(icp_config, dim=dim)
        self.dim = dim
        self.mesh = mesh
        self.cell_size = cell_size
        max_dist = self._cfg.match_max_dist
        if not np.isfinite(max_dist):
            max_dist = 1e6
        self._solver = DistributedICP(mesh, max_dist=max_dist,
                                      max_iter=self._cfg.max_iter)
        self._shards = None

    # engine interface ----------------------------------------------------
    def load_config(self, cfg):
        self._cfg.load_config(cfg)

    def set_default(self):
        self._cfg.set_default()

    @property
    def reading_filters(self) -> FilterChain:
        return self._cfg.reading_filters

    def set_map(self, ref):
        if len(self._cfg.reference_filters):
            ref = self._cfg.reference_filters.apply(ref)
        if "normals" not in ref.descriptors:
            raise ValueError(
                "ShardedICPAdapter (point-to-plane) requires 'normals' on "
                "the map; add SurfaceNormalDataPointsFilter to the post "
                "filters or referenceDataPointsFilters")
        data = ref.to_numpy()
        n_shards = int(self.mesh.devices.size)
        mp, mn, mm = shard_points(
            data["positions"], data["normals"],
            np.ones(data["positions"].shape[0], bool), n_shards,
            cell_size=self.cell_size)
        self._shards = (jnp.asarray(mp), jnp.asarray(mn), jnp.asarray(mm))

    def has_map(self) -> bool:
        return self._shards is not None

    def clear_map(self):
        self._shards = None

    def __call__(self, reading, key=None) -> ICPResult:
        if self._shards is None:
            raise RuntimeError("ShardedICPAdapter: set_map() before calling")
        if len(self._cfg.reading_filters):
            reading = self._cfg.reading_filters.apply(reading, key)
        mp, mn, mm = self._shards
        T, overlap, rms = self._solver.solve(
            reading.positions, reading.mask, mp, mn, mm)
        return ICPResult(T, overlap, jnp.int32(self._cfg.max_iter), rms)
