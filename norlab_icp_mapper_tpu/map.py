"""Map: local point cloud, scan-merge pipeline, rolling-window cell logic.

Parity with reference ``Map.{h,cpp}``:

  - local cloud ownership + merge pipeline (``Map.cpp:502-534``): first scan
    goes through ``modules[0].create_map`` then the rest update; afterwards
    every module updates; post filters run in the *sensor frame*
    (``Map.cpp:523-525``); finally the ICP engine gets the new map.
  - rolling window of 20 m cells around the robot (``Map.cpp:246-460``):
    per-axis hysteresis of 2 cells, slabs of cells padded by BUFFER_SIZE=2
    load/unload as the robot moves; evicted cells go to a CellManager keyed
    ``"row_col_aisle"`` (``Map.cpp:87,209``).
  - global export/import (``Map.cpp:552-588``).

TPU-native split: the local cloud is a fixed-capacity ``PointBatch`` on
device; merging, post-filtering, and the in-window partition mask are XLA
passes; cell binning/eviction is host-side numpy (it is IO/bookkeeping, the
reference runs it on a background thread for the same reason —
``Map.cpp:29-57``).  In online mode cell updates are queued and drained by a
single worker thread, mirroring the reference's ``updateThread``.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from . import se3
from .points import PointBatch, bucket_capacity
from .cell_manager import CellManager, RAMCellManager, HardDriveCellManager

__all__ = ["Map", "bin_points_to_cells", "collect_cells_in_bounds"]

CELL_SIZE = 20.0  # m (reference Map.h:31)
BUFFER_SIZE = 2  # cells (reference Map.h:32)
DEFAULT_SENSOR_MAX_RANGE = 200.0  # m (reference Map.h:33)

# grid sentinels (reference Map.cpp:462-470)
_MIN_GRID = -(2 ** 31)
_MAX_GRID = 2 ** 31 - 2


def _to_grid(w: float) -> int:
    return int(np.floor(w / CELL_SIZE))


def _to_inferior_grid(w: float, rng: float) -> int:
    # reference Map.cpp:472-475
    return int(np.ceil((w - rng) / CELL_SIZE - 1.0))


def _to_superior_grid(w: float, rng: float) -> int:
    # reference Map.cpp:477-480
    return int(np.floor((w + rng) / CELL_SIZE))


def bin_points_to_cells(evict: Dict[str, np.ndarray], cell_manager,
                        dim: int) -> None:
    """Bin evicted points into 20 m cells and save each to the cell manager
    (vectorized form of the reference's per-cell growable binning,
    ``Map.cpp:202-222``).  Shared by the single-chip ``Map`` and the sharded
    map's eviction spill path.

    A save MERGES with existing saved content.  This is required only by the
    sharded path, whose bounded eviction buffers can spill the same cell
    across several rounds (overflow retry) before a restore removes it; on
    the single-chip path loads remove the saved copy (``_load_cells``), so a
    re-save never finds stale content and the merge is equivalent to the
    reference's ``saveCell`` overwrite (``RAMCellManager.cpp:13-16``)."""
    ev_pos = evict["positions"]
    if ev_pos.shape[0] == 0:
        return
    cell_idx = np.floor(ev_pos / CELL_SIZE).astype(np.int64)
    if dim == 2:
        cell_idx = np.concatenate(
            [cell_idx, np.zeros((cell_idx.shape[0], 1), np.int64)], axis=1)
    order = np.lexsort((cell_idx[:, 2], cell_idx[:, 1], cell_idx[:, 0]))
    sorted_cells = cell_idx[order]
    boundaries = np.nonzero(
        np.any(np.diff(sorted_cells, axis=0) != 0, axis=1))[0] + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [ev_pos.shape[0]]])
    for s, e in zip(starts, ends):
        i, j, k = (int(v) for v in sorted_cells[s])
        rows = order[s:e]
        cell = {name: arr[rows] for name, arr in evict.items()}
        cid = f"{i}_{j}_{k}"
        existing = cell_manager.retrieve_cell(cid)
        if existing is not None and existing["positions"].shape[0] > 0:
            merged = {}
            for name in cell:
                if name in existing:
                    merged[name] = np.concatenate(
                        [existing[name], cell[name]])
                else:
                    merged[name] = cell[name]
            cell = merged
        cell_manager.save_cell(cid, cell)


def collect_cells_in_bounds(cell_manager, bounds, dim: int,
                            remove: bool = False):
    """Gather every saved cell whose grid coordinates fall inside
    ``bounds = (sr, er, sc, ec, sa, ea)`` into one host dict.  With
    ``remove=True`` the collected cells are deleted from the manager (the
    sharded restore path keeps the invariant: a point is device-resident OR
    in exactly one saved cell, never both).  Returns ``(data | None, ids)``.
    """
    sr, er, sc, ec, sa, ea = bounds
    chunks, ids = [], []
    for cid in list(cell_manager.get_all_cell_ids()):
        i, j, k = (int(v) for v in cid.split("_"))
        if sr <= i <= er and sc <= j <= ec and (dim == 2 or sa <= k <= ea):
            cell = cell_manager.retrieve_cell(cid)
            if cell is not None and cell["positions"].shape[0] > 0:
                chunks.append(cell)
            ids.append(cid)
            if remove:
                cell_manager.remove_cell(cid)
    if not chunks:
        return None, ids
    pos = np.concatenate([c["positions"] for c in chunks])
    names = sorted({n for c in chunks for n in c if n != "positions"})
    out = {"positions": pos}
    for n in names:
        parts = []
        for c in chunks:
            if n in c:
                a = c[n]
                parts.append(a if a.ndim > 1 else a[:, None])
            else:
                kdim = next(
                    (cc[n].shape[1] if cc[n].ndim > 1 else 1)
                    for cc in chunks if n in cc)
                parts.append(
                    np.zeros((c["positions"].shape[0], kdim), np.float32))
        out[n] = np.concatenate(parts)
    return out, ids


class Map:
    def __init__(self, is_3d: bool, is_online: bool,
                 save_cells_on_hard_drive: bool, icp):
        self.is_3d = is_3d
        self.dim = 3 if is_3d else 2
        self.is_online = is_online
        self.icp = icp
        self.sensor_max_range = DEFAULT_SENSOR_MAX_RANGE
        self.cell_manager: CellManager = (
            HardDriveCellManager() if save_cells_on_hard_drive else RAMCellManager())
        self.modules: List = []
        self.local: Optional[PointBatch] = None
        self._known_count: Optional[int] = None  # host mirror of local.count
        self.loaded_cell_ids: set = set()
        self.first_pose_update = True
        self.new_local_available = False
        self._window = None  # (inf_r, sup_r, inf_c, sup_c, inf_a, sup_a)
        self._lock = threading.RLock()
        self._update_queue: "queue.Queue" = queue.Queue()
        self._update_thread: Optional[threading.Thread] = None
        self._thread_running = False
        if is_online:
            # reference Map.cpp:29-57 — background drain of cell IO so
            # registration never blocks on load/unload
            self._thread_running = True
            self._update_thread = threading.Thread(
                target=self._drain_updates, daemon=True)
            self._update_thread.start()

    # ------------------------------------------------------------ lifecycle
    def shutdown(self):
        if self._update_thread is not None:
            self._thread_running = False
            self._update_queue.put(None)
            self._update_thread.join(timeout=5)
            self._update_thread = None

    def _drain_updates(self):
        while self._thread_running:
            item = self._update_queue.get()
            try:
                if item is not None:
                    self._apply_update(item)
            finally:
                self._update_queue.task_done()

    def wait_for_updates(self):
        """Block until queued cell updates are applied (test/shutdown aid)."""
        self._update_queue.join()

    # ------------------------------------------------------------ accessors
    def add_mapper_module(self, module):
        self.modules.append(module)

    def set_sensor_max_range(self, value: float):
        self.sensor_max_range = float(value)

    def get_sensor_max_range(self) -> float:
        return self.sensor_max_range

    def is_local_point_cloud_empty(self) -> bool:
        with self._lock:
            if self.local is None:
                return True
            if self._known_count is not None:
                return self._known_count == 0
            # fall back to one device sync, then cache
            self._known_count = int(jax.device_get(self.local.count()))
            return self._known_count == 0

    def get_local_point_cloud(self) -> Optional[PointBatch]:
        with self._lock:
            return self.local

    def get_new_local_point_cloud(self):
        """Consume-once local map (reference ``Map.cpp:536-550``)."""
        with self._lock:
            if self.new_local_available and self.local is not None:
                self.new_local_available = False
                return self.local
            return None

    # --------------------------------------------------------- merge pipeline
    def merge_headroom_scans(self) -> int:
        """Free-slot headroom the module chain needs, in scans (see
        ``MapperModule.INSERTS``)."""
        return max(1, sum(getattr(m, "INSERTS", 0) for m in self.modules))

    def growth_bounded_by_decimation(self) -> bool:
        """True when an active OctreeMapperModule reclaims inserted scan
        points every merge — permanent growth is then only the NEW-voxel
        count and the fused path sizes its headroom adaptively."""
        return any(getattr(m, "NAME", "") == "OctreeMapperModule"
                   and float(m.params.get("maxSizeByNode", 0)) > 0
                   for m in self.modules)

    def _merge_fns(self, post_filters):
        """Jitted create/update merge pipelines.

        The whole merge — module chain, sensor-frame post filters, frame
        transforms — compiles as ONE XLA program per shape bucket instead of
        hundreds of eager op dispatches (critical on remote-compile TPU
        backends).  All passes are fixed-capacity: the caller pre-sizes the
        local buffer with scan headroom and modules ``insert`` into free
        slots, so the output capacity equals the input capacity."""
        cache_key = id(post_filters)
        if getattr(self, "_merge_cache_key", None) != cache_key:
            modules = self.modules

            def _post(local, pose, key):
                if post_filters is not None and len(post_filters):
                    # post filters run in sensor frame (reference Map.cpp:523-525)
                    pose_inv = se3.inverse(pose)
                    local = se3.apply(pose_inv, local)
                    local = post_filters._apply_impl(local, key)
                    local = se3.apply(pose, local)
                return local

            def create_fn(base, scan, pose, key):
                # reference Map.cpp:505-515: modules[0].createMap then the
                # rest update; `base` is the pre-sized empty local buffer
                from .points import insert as _insert
                it = iter(modules)
                local = _insert(base, next(it).create_map(scan, pose))
                for m in it:
                    local = m.update_map(scan, local, pose)
                return _post(local, pose, key)

            def update_fn(scan, local, pose, key):
                for m in modules:
                    local = m.update_map(scan, local, pose)
                return _post(local, pose, key)

            self._merge_cache_key = cache_key
            self._merge_create = jax.jit(create_fn)
            self._merge_update = jax.jit(update_fn)
        return self._merge_create, self._merge_update

    def update_local_point_cloud(self, scan: PointBatch, pose: np.ndarray,
                                 post_filters,
                                 key: Optional[jax.Array] = None,
                                 scan_valid_hint: Optional[int] = None) -> None:
        """Reference ``Map.cpp:502-534``.

        ``scan_valid_hint`` is an upper bound on the scan's valid-point
        count (the loader knows it before padding); it sizes the map
        buffer's free-slot headroom tighter than ``scan.capacity`` would.
        """
        pose_j = jax.numpy.asarray(pose)
        if key is None:
            key = jax.random.PRNGKey(0)
        hint = int(scan_valid_hint) if scan_valid_hint else scan.capacity
        headroom = self.merge_headroom_scans() * hint
        create_fn, update_fn = self._merge_fns(post_filters)
        with self._lock:
            if self.is_local_point_cloud_empty():
                cap = bucket_capacity(hint + headroom)
                base = PointBatch.empty(cap, scan.dim)
                local = create_fn(base, scan, pose_j, key)
            else:
                if self._known_count is None:
                    self._known_count = int(jax.device_get(self.local.count()))
                cap = bucket_capacity(self._known_count + headroom)
                local = self.local.pad_to(cap) \
                    if cap > self.local.capacity else self.local
                local = update_fn(scan, local, pose_j, key)
            self._known_count = int(jax.device_get(local.count()))
            self.local = local
            self.icp.set_map(local)
            self.new_local_available = True

    # --------------------------------------------------------- rolling window
    def update_pose(self, pose: np.ndarray, defer: bool = False):
        """Reference ``Map.cpp:246-460`` — window shift with 2-cell hysteresis.

        With ``defer=True`` the window bookkeeping advances but the cell
        load/unload updates are *returned* instead of applied — the fused
        pipelined mapper applies them at its next sync point (the same
        decoupling the reference gets from its update thread,
        ``Map.cpp:29-57``).
        """
        deferred: List = [] if defer else None
        pose = np.asarray(pose)
        d = self.dim
        p = pose[:d, d]
        rng = self.sensor_max_range
        inf = [_to_inferior_grid(float(p[a]), rng) for a in range(d)]
        sup = [_to_superior_grid(float(p[a]), rng) for a in range(d)]
        if not self.is_3d:
            inf += [0]
            sup += [0]

        if self.first_pose_update:
            self._window = [inf[0], sup[0], inf[1], sup[1], inf[2], sup[2]]
            self.cell_manager.clear_all_cells()
            with self._lock:
                self.loaded_cell_ids = set()
            # partition everything into cells, then restore the window
            self._unload_cells(_MIN_GRID, _MAX_GRID, _MIN_GRID, _MAX_GRID,
                               _MIN_GRID, _MAX_GRID)
            B = BUFFER_SIZE
            self._load_cells(inf[0] - B, sup[0] + B, inf[1] - B, sup[1] + B,
                             inf[2] - B, sup[2] + B)
            self.first_pose_update = False
            return deferred

        w = self._window
        B = BUFFER_SIZE
        # per-axis, per-edge shifts; axes: 0=row(x), 1=column(y), 2=aisle(z)
        n_axes = 3 if self.is_3d else 2
        for axis in range(n_axes):
            lo_i, hi_i = 2 * axis, 2 * axis + 1
            new_lo, new_hi = inf[axis], sup[axis]
            # inferior edge (reference Map.cpp:277-305 pattern)
            if abs(new_lo - w[lo_i]) >= 2:
                if new_lo < w[lo_i]:  # window grew: load entering slab
                    nb = w[lo_i] - new_lo
                    self._schedule_slab(axis, new_lo - B, new_lo - B + nb - 1,
                                        w, load=True, deferred=deferred)
                else:  # window shrank: unload leaving slab
                    nb = new_lo - w[lo_i]
                    self._schedule_slab(axis, w[lo_i] - B, w[lo_i] - B + nb - 1,
                                        w, load=False, deferred=deferred)
                w[lo_i] = new_lo
            # superior edge (reference Map.cpp:308-335 pattern)
            if abs(new_hi - w[hi_i]) >= 2:
                if new_hi < w[hi_i]:
                    nb = w[hi_i] - new_hi
                    self._schedule_slab(axis, w[hi_i] + B - nb + 1, w[hi_i] + B,
                                        w, load=False, deferred=deferred)
                else:
                    nb = new_hi - w[hi_i]
                    self._schedule_slab(axis, new_hi + B - nb + 1, new_hi + B,
                                        w, load=True, deferred=deferred)
                w[hi_i] = new_hi
        return deferred

    def _schedule_slab(self, axis: int, start: int, end: int, w, load: bool,
                       deferred=None):
        B = BUFFER_SIZE
        bounds = [w[0] - B, w[1] + B, w[2] - B, w[3] + B, w[4] - B, w[5] + B]
        bounds[2 * axis] = start
        bounds[2 * axis + 1] = end
        if not self.is_3d:
            bounds[4], bounds[5] = 0, 0
        update = (load, tuple(bounds))
        if deferred is not None:
            deferred.append(update)
        elif self.is_online:
            self._update_queue.put(update)
        else:
            self._apply_update(update)

    def _apply_update(self, update):
        load, b = update
        if load:
            self._load_cells(*b)
        else:
            self._unload_cells(*b)

    # ------------------------------------------------------------- cell IO
    def _cell_id(self, i: int, j: int, k: int) -> str:
        return f"{i}_{j}_{k}"

    def _iter_cells(self, sr, er, sc, ec, sa, ea):
        if not self.is_3d:
            sa, ea = 0, 0
        for i in range(sr, er + 1):
            for j in range(sc, ec + 1):
                for k in range(sa, ea + 1):
                    yield i, j, k

    def _load_cells(self, sr, er, sc, ec, sa, ea):
        """Reference ``Map.cpp:71-128``."""
        chunks: List[Dict[str, np.ndarray]] = []
        ids = []
        # clamp enumeration to cells that actually exist (the reference
        # enumerates the requested range; for the full-grid first-update
        # range that is infeasible — intersect with the saved-cell set).
        # ``loaded_cell_ids`` records only cells whose saved content is now
        # merged into the local cloud — the one invariant its consumers
        # (get_global_point_cloud exclusion, _unload discard) rely on — so
        # both enumeration branches bookkeep identically (VERDICT r1).
        saved = set(self.cell_manager.get_all_cell_ids())
        span = (er - sr + 1) * (ec - sc + 1) * ((ea - sa + 1) if self.is_3d else 1)
        if span > len(saved) * 4 + 64:
            candidates = []
            for cid in saved:
                i, j, k = (int(v) for v in cid.split("_"))
                if sr <= i <= er and sc <= j <= ec and (
                        not self.is_3d or sa <= k <= ea):
                    candidates.append((i, j, k))
        else:
            candidates = list(self._iter_cells(sr, er, sc, ec, sa, ea))
        for (i, j, k) in candidates:
            cid = self._cell_id(i, j, k)
            if cid in saved:
                cell = self.cell_manager.retrieve_cell(cid)
                # remove-on-load: the retrieved content becomes device
                # resident, so the saved copy leaves the store.  This keeps
                # the invariant "a point is device-resident OR in exactly
                # one saved cell" (the sharded path's discipline) and
                # reproduces the reference's observable overwrite semantics
                # (``RAMCellManager.cpp:13-16`` saveCell overwrites;
                # ``Map.cpp:105,117-124`` excludes loaded cells from the
                # global view) — without it, re-unloading a revisited cell
                # merged onto the stale saved copy and the map DOUBLED on
                # every leave-return cycle.
                self.cell_manager.remove_cell(cid)
                if cell is not None and cell["positions"].shape[0] > 0:
                    chunks.append(cell)
                ids.append(cid)
        with self._lock:
            if chunks:
                pos = np.concatenate([c["positions"] for c in chunks])
                names = sorted({n for c in chunks for n in c if n != "positions"})
                desc = {}
                for n in names:
                    parts = []
                    for c in chunks:
                        if n in c:
                            parts.append(c[n])
                        else:
                            kdim = next(cc[n].shape[1] for cc in chunks if n in cc)
                            parts.append(
                                np.zeros((c["positions"].shape[0], kdim), np.float32))
                    desc[n] = np.concatenate(parts)
                incoming = PointBatch.from_numpy(pos[:, :self.dim], desc)
                if self.is_local_point_cloud_empty():
                    self.local = incoming
                    self._known_count = pos.shape[0]
                else:
                    from .points import concatenate as _concat
                    n_total = (self._known_count or 0) + pos.shape[0]
                    self.local = _concat(self.local, incoming,
                                         capacity=bucket_capacity(n_total))
                    self._known_count = n_total
                self.icp.set_map(self.local)
                self.new_local_available = True
            self.loaded_cell_ids.update(ids)

    def _unload_cells(self, sr, er, sc, ec, sa, ea):
        """Reference ``Map.cpp:140-230`` — partition local cloud by world
        bounds of the cell range, evict the inside portion binned per cell."""
        if not self.is_3d:
            sa, ea = 0, 0
        with self._lock:
            if self.local is None:
                return
            data = self.local.to_numpy()
        pos = data["positions"]
        if pos.shape[0] == 0:
            return
        lo = np.array([sr, sc, sa][: self.dim], np.float64) * CELL_SIZE
        hi = (np.array([er, ec, ea][: self.dim], np.float64) + 1.0) * CELL_SIZE
        inside = np.all((pos >= lo) & (pos < hi), axis=1)

        keep = {k: v[~inside] for k, v in data.items()}
        evict = {k: v[inside] for k, v in data.items()}

        with self._lock:
            desc_keep = {k: v for k, v in keep.items() if k != "positions"}
            self.local = PointBatch.from_numpy(keep["positions"], desc_keep)
            self._known_count = keep["positions"].shape[0]
            self.icp.set_map(self.local)
            for (i, j, k) in self._iter_cells(sr, er, sc, ec, sa, ea) \
                    if (er - sr) < 10**6 else []:
                self.loaded_cell_ids.discard(self._cell_id(i, j, k))
            if (er - sr) >= 10**6:  # full-grid unload: everything leaves
                self.loaded_cell_ids = set()
            self.new_local_available = True

        bin_points_to_cells(evict, self.cell_manager, self.dim)

    # -------------------------------------------------------- global import/export
    def get_global_point_cloud(self) -> Dict[str, np.ndarray]:
        """Local cloud + all saved cells not currently loaded
        (reference ``Map.cpp:552-573``). Host-side compact arrays."""
        with self._lock:
            parts = []
            if self.local is not None:
                parts.append(self.local.to_numpy())
            loaded = set(self.loaded_cell_ids)
        for cid in self.cell_manager.get_all_cell_ids():
            if cid not in loaded:
                cell = self.cell_manager.retrieve_cell(cid)
                if cell is not None and cell["positions"].shape[0] > 0:
                    parts.append(cell)
        if not parts:
            return {"positions": np.zeros((0, self.dim), np.float32)}
        names = sorted({n for p in parts for n in p})
        out = {}
        for n in names:
            arrs = []
            for p in parts:
                npts = p["positions"].shape[0]
                if n in p:
                    a = p[n]
                    arrs.append(a if a.ndim > 1 else a[:, None])
                else:
                    kdim = next(
                        (pp[n].shape[1] if pp[n].ndim > 1 else 1)
                        for pp in parts if n in pp)
                    arrs.append(np.zeros((npts, kdim), np.float32))
            out[n] = np.concatenate(arrs)
        return out

    def set_global_point_cloud(self, cloud) -> None:
        """Reference ``Map.cpp:575-588``: replace local cloud, re-arm the
        first-pose partition."""
        if isinstance(cloud, PointBatch):
            batch = cloud
        else:
            desc = {k: v for k, v in cloud.items() if k != "positions"}
            batch = PointBatch.from_numpy(
                np.asarray(cloud["positions"])[:, : self.dim], desc)
        with self._lock:
            self.local = batch
            self._known_count = None  # unknown until next sync
            self.icp.set_map(batch)
            self.first_pose_update = True
