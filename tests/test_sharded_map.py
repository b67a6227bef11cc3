"""Device-resident sharded map (VERDICT r1 item 3).

The map lives as mesh-sharded HBM blocks; the whole per-scan step
(registration + insert gate + voxel decimation + halo-exchange normals)
is ONE shard_map program.  Tests (on the 8-device virtual CPU mesh):

  - e2e: noisy odometry corrected, map grows and stays voxel-unique
  - zero host round-trips per scan: process_input never calls
    jax.device_get / PointBatch.to_numpy after bootstrap
  - layout invariance: the set of occupied voxels matches a 1-shard run
    exactly (insert gate is pmin-global, voxels never straddle shards)
"""
import numpy as np
import pytest
import jax

from norlab_icp_mapper_tpu import PointBatch
from norlab_icp_mapper_tpu.parallel import (
    make_mesh, ShardedMapConfig, ShardedMapper)


def make_world(rng, n=1200):
    floor = np.stack([rng.uniform(0, 40, n), rng.uniform(-6, 6, n),
                      np.zeros(n)], 1)
    wall1 = np.stack([rng.uniform(0, 40, n), np.full(n, -6.0),
                      rng.uniform(0, 4, n)], 1)
    wall2 = np.stack([rng.uniform(0, 40, n), np.full(n, 6.0),
                      rng.uniform(0, 4, n)], 1)
    # cross walls every 5 m constrain the along-corridor direction (a bare
    # corridor leaves x in the point-to-plane null space)
    cross = []
    m = n // 8
    for xc in np.arange(0.0, 41.0, 5.0):
        cross.append(np.stack([np.full(m, xc), rng.uniform(-6, -3, m),
                               rng.uniform(0, 4, m)], 1))
        cross.append(np.stack([np.full(m, xc), rng.uniform(3, 6, m),
                               rng.uniform(0, 4, m)], 1))
    return np.concatenate([floor, wall1, wall2] + cross).astype(np.float32)


def scan_at(world, pose, radius=10.0, cap=2048):
    d = np.linalg.norm(world - pose[:3, 3], axis=1)
    pts = world[d < radius]
    R, t = pose[:3, :3], pose[:3, 3]
    local = ((pts - t) @ R).astype(np.float32)
    return PointBatch.from_numpy(local[:cap])


def pose_at(x):
    p = np.eye(4, dtype=np.float32)
    p[0, 3] = x
    return p


def cfg(**kw):
    base = dict(dim=3, cell_size=4.8, voxel_size=0.3,
                min_dist_new_point=0.0, normal_radius=1.5,
                normal_min_knn=4, match_max_dist=1.0, max_iter=8,
                minimizer="PointToPlaneErrorMinimizer",
                update_condition="delay", update_value=0.05,
                halo_capacity=2048, sampling_method=0,
                window_enabled=False)
    base.update(kw)
    return ShardedMapConfig(**base)


def drive(mapper, world, xs, noise=None):
    for i, x in enumerate(xs):
        pose = pose_at(x)
        est = pose.copy()
        if noise is not None and i > 0:
            est[:3, 3] += noise[i]
        scan = scan_at(world, pose)
        mapper.process_input(scan, est, stamp_s=float(i) * 0.1)
    return mapper


def test_sharded_e2e_corrects_and_grows(rng):
    world = make_world(rng)
    mesh = make_mesh()
    noise = rng.normal(0, 0.15, size=(8, 3)).astype(np.float32)
    mapper = ShardedMapper(mesh, cfg(max_iter=12))
    drive(mapper, world, np.arange(2.0, 18.0, 2.0), noise=noise)
    m = mapper.drain()
    assert m["count"] > 500
    assert m["insert_overflow"] == 0
    assert m["halo_overflow"] == 0
    # recovered pose beats the noisy prior decisively
    final_true = pose_at(16.0)
    err = np.linalg.norm(mapper.get_pose()[:3, 3] - final_true[:3, 3])
    prior = np.linalg.norm(noise[-1])
    assert err < 0.6 * prior, (err, prior)
    # voxel uniqueness held globally.  Points within an ulp of a voxel
    # FACE can key differently between the device program (XLA lowers
    # /voxel to a reciprocal multiply) and numpy's true division — e.g. a
    # wall point at exactly y=-6.0000005 keys to voxel -21 on device and
    # -20 under f32 numpy division — so the host-side uniqueness check
    # only counts face-interior points.
    out = mapper.get_map()
    scaled = out["positions"].astype(np.float64) / 0.3
    vox = np.floor(scaled).astype(np.int64)
    frac = scaled - vox
    interior = np.all((frac > 1e-5) & (frac < 1 - 1e-5), axis=1)
    # the synthetic world puts whole walls exactly on voxel faces (y=+-6,
    # z=0, cross walls at 5 m multiples), so only ~3/4 of points are
    # face-interior; the check must still cover a solid majority
    assert interior.mean() > 0.5
    vox_i = vox[interior]
    uniq = np.unique(vox_i, axis=0)
    assert uniq.shape[0] == vox_i.shape[0]
    # normals populated (including across shard boundaries)
    nn = np.linalg.norm(out["normals"], axis=1)
    assert (nn > 0.5).mean() > 0.8


def test_no_host_roundtrip_per_scan(rng, monkeypatch):
    world = make_world(rng)
    mapper = ShardedMapper(make_mesh(), cfg())
    # bootstrap is allowed one host pass
    mapper.process_input(scan_at(world, pose_at(2.0)), pose_at(2.0), 0.0)

    sizes = []
    real_get = jax.device_get

    def spy(x):
        sizes.append(sum(np.asarray(v).nbytes
                         for v in jax.tree.leaves(real_get(x))))
        return real_get(x)

    monkeypatch.setattr(jax, "device_get", spy)
    monkeypatch.setattr(PointBatch, "to_numpy",
                        lambda self: (_ for _ in ()).throw(
                            AssertionError("to_numpy in the scan loop")))
    for i, x in enumerate(np.arange(4.0, 22.0, 2.0)):
        mapper.process_input(scan_at(world, pose_at(x)), pose_at(x),
                             0.1 * (i + 1))
    # only scalar mirror reads allowed (capacity-bound harvest), never
    # anything map-sized
    assert all(s <= 64 for s in sizes), sizes


def make_long_corridor(rng, length=160.0, n_per_m=12):
    n = int(length * n_per_m)
    floor = np.stack([rng.uniform(0, length, n), rng.uniform(-5, 5, n),
                      np.zeros(n)], 1)
    wall1 = np.stack([rng.uniform(0, length, n), np.full(n, -5.0),
                      rng.uniform(0, 3, n)], 1)
    wall2 = np.stack([rng.uniform(0, length, n), np.full(n, 5.0),
                      rng.uniform(0, 3, n)], 1)
    return np.concatenate([floor, wall1, wall2]).astype(np.float32)


def test_window_eviction_bounded_and_lossless(rng):
    """VERDICT r2 item 1 'done' criterion: traverse >> window, per-shard
    HBM stays bounded (capacity ceiling vs the unwindowed run), evicted
    cells spill to the CellManager and restore losslessly on re-entry, and
    the final occupied-voxel set matches the no-window run exactly
    (Identity minimizer: both runs see identical inserts)."""
    world = make_long_corridor(rng)
    xs = list(np.arange(2.0, 158.0, 4.0))
    xs_full = xs + xs[::-1]  # out and back: evict, then restore

    def run(window: bool):
        mapper = ShardedMapper(make_mesh(), cfg(
            minimizer="IdentityErrorMinimizer", window_enabled=window,
            sensor_max_range=8.0, evict_capacity=8192))
        peak_cells = 0
        for i, x in enumerate(xs_full):
            pose = pose_at(x)
            mapper.process_input(scan_at(world, pose, radius=8.0), pose,
                                 stamp_s=0.1 * i)
            peak_cells = max(peak_cells,
                             len(mapper.cell_manager.get_all_cell_ids()))
        m = mapper.drain()
        return mapper, m, peak_cells

    win, m_win, peak_cells = run(True)
    ref, m_ref, _ = run(False)

    # eviction actually happened and nothing overflowed or got lost
    assert peak_cells > 0, "window never evicted — test geometry too small"
    assert win.overflow_totals["evict"] == 0
    assert m_win["insert_overflow"] == 0 and m_win["halo_overflow"] == 0
    # bounded HBM: the windowed run's device-resident share stays below
    # the full map, and its block capacity never exceeds the unwindowed one
    assert win.capacity() <= ref.capacity()
    assert m_win["count"] < m_ref["count"]
    # lossless spill/restore: global map (device + cells) voxel-set parity
    for out in (win.get_map(), ref.get_map()):
        assert out["positions"].shape[0] > 0
    vox_w = {tuple(v) for v in np.floor(
        win.get_map()["positions"] / 0.3).astype(np.int64)}
    vox_r = {tuple(v) for v in np.floor(
        ref.get_map()["positions"] / 0.3).astype(np.int64)}
    assert vox_w == vox_r, (len(vox_w - vox_r), len(vox_r - vox_w),
                            len(vox_r))


def test_checkpoint_kill_and_resume_bitwise(rng, tmp_path):
    """Sharded checkpoint (VERDICT r2 item 7): raw shard blocks restore
    verbatim, so the resumed run's subsequent poses are bitwise-identical
    to the uninterrupted one."""
    world = make_world(rng)
    noise = rng.normal(0, 0.1, size=(16, 3)).astype(np.float32)

    def feed(mapper, i, x):
        pose = pose_at(x)
        est = pose.copy()
        est[:3, 3] += noise[i]
        mapper.process_input(scan_at(world, pose), est,
                             timestamp_ns=int(i * 1e8))
        return mapper.pose

    base = ShardedMapper(make_mesh(), cfg(window_enabled=True,
                                          sensor_max_range=8.0))
    xs = list(np.arange(2.0, 18.0, 2.0))
    for i, x in enumerate(xs[:5]):
        feed(base, i, x)
    path = str(tmp_path / "sharded_ckpt.npz")
    base.save_checkpoint(path)

    cont_poses = [np.asarray(jax.device_get(feed(base, 5 + j, x)))
                  for j, x in enumerate(xs[5:])]

    resumed = ShardedMapper.load_checkpoint(
        path, make_mesh(), cfg(window_enabled=True, sensor_max_range=8.0))
    # trajectory round-trips exactly (poses + integer-ns stamps)
    assert resumed.trajectory.timestamps == base.trajectory.timestamps[:5]
    res_poses = [np.asarray(jax.device_get(feed(resumed, 5 + j, x)))
                 for j, x in enumerate(xs[5:])]
    for a, b in zip(cont_poses, res_poses):
        assert np.array_equal(a, b), np.abs(a - b).max()


def test_growth_preserves_sharding(rng):
    """VERDICT r2 weak #4: capacity growth must keep every state leaf on
    the cells sharding (a silent re-layout would serialize the pod path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    world = make_world(rng)
    mapper = ShardedMapper(make_mesh(), cfg())
    mapper.bootstrap(scan_at(world, pose_at(2.0)), pose_at(2.0),
                     capacity=1024)
    cap0 = mapper.capacity()
    for i, x in enumerate(np.arange(4.0, 20.0, 2.0)):
        mapper.process_input(scan_at(world, pose_at(x)), pose_at(x),
                             stamp_s=0.1 * (i + 1))
    assert mapper.capacity() > cap0, "never grew — lower the start capacity"
    want = NamedSharding(mapper.step.mesh, P("cells"))
    for k, v in mapper.state.items():
        assert v.sharding.is_equivalent_to(want, v.ndim), (k, v.sharding)
    mapper._assert_sharded()


def test_rebalance_restores_load_balance(rng):
    """Bucket-table rebalance (VERDICT r2 weak #5): bootstrap on a single
    cell (all weight on one shard), then spread out — the harvested
    balance degrades, the table rebuilds from the measured histogram, and
    the reassigned buckets' points shuffle device-side without loss."""
    world = make_world(rng)
    # the 20 m test world spans ~10 ground cells at the default 4.8 m —
    # too coarse for any assignment to balance 8 shards; 1.2 m cells give
    # the granularity a real map has at the default cell size
    mapper = ShardedMapper(make_mesh(), cfg(
        minimizer="IdentityErrorMinimizer", cell_size=1.2))
    mapper.REBALANCE_MIN_POINTS = 500
    mapper.REBALANCE_COOLDOWN = 2
    mapper.process_input(scan_at(world, pose_at(2.0)), pose_at(2.0), 0.0)
    # force a pathological table: every bucket on shard 0 — all inserts
    # pile onto one shard until the rebalance machinery kicks in
    mapper.table_np = np.zeros_like(mapper.table_np)
    mapper.table = jax.numpy.asarray(mapper.table_np)
    for i, x in enumerate(np.arange(4.0, 20.0, 2.0)):
        mapper.process_input(scan_at(world, pose_at(x)), pose_at(x),
                             stamp_s=0.1 * (i + 1))
    m = mapper.drain()
    assert m["count"] > 500
    assert mapper._last_rebalance_scan > 0, "rebalance never triggered"
    assert mapper.balance is not None and mapper.balance >= 0.93, \
        mapper.balance
    assert mapper.overflow_totals.get("rebalance", 0) == 0
    # the shuffle lost nothing: voxel uniqueness still holds (up to a
    # handful of exact-boundary points — the synthetic walls sit at
    # coordinates like x=15.0 where floor(x/0.3) differs between the fused
    # program's f32 rounding and this host check's)
    out = mapper.get_map()
    vox = np.floor(out["positions"] / np.float32(0.3)).astype(np.int64)
    n_dup = vox.shape[0] - np.unique(vox, axis=0).shape[0]
    assert n_dup <= max(8, vox.shape[0] // 200), n_dup


def test_sharded_2d(rng):
    """ShardedMapConfig(dim=2) end to end (VERDICT r2 weak #9): SE(2)
    distributed solve + merge on a 2-D world."""
    n = 900
    # square room walls in 2-D
    t = rng.uniform(0, 30, n).astype(np.float32)
    side = rng.integers(0, 4, n)
    x = np.where(side == 0, t, np.where(side == 1, t, np.where(
        side == 2, 0.0, 30.0)))
    y = np.where(side == 0, 0.0, np.where(side == 1, 12.0, np.where(
        side == 2, t * 0.4, t * 0.4)))
    world = np.stack([x, y], 1).astype(np.float32)

    def pose2(px):
        T = np.eye(3, dtype=np.float32)
        T[0, 2] = px
        T[1, 2] = 6.0
        return T

    def scan2(pose):
        d = np.linalg.norm(world - pose[:2, 2], axis=1)
        pts = world[d < 10.0]
        local = (pts - pose[:2, 2]) @ pose[:2, :2]
        return PointBatch.from_numpy(local.astype(np.float32)[:1024])

    mapper = ShardedMapper(make_mesh(), cfg(
        dim=2, max_iter=10, normal_radius=2.0, voxel_size=0.2,
        window_enabled=True, sensor_max_range=10.0))
    noise = rng.normal(0, 0.1, size=(10, 2)).astype(np.float32)
    for i, px in enumerate(np.arange(2.0, 26.0, 3.0)):
        pose = pose2(px)
        est = pose.copy()
        if i > 0:
            est[:2, 2] += noise[i]
        mapper.process_input(scan2(pose), est, stamp_s=0.1 * i)
    m = mapper.drain()
    assert m["count"] > 200
    final_true = pose2(23.0)
    err = np.linalg.norm(mapper.get_pose()[:2, 2] - final_true[:2, 2])
    prior = np.linalg.norm(noise[8])
    assert err < 0.7 * prior, (err, prior)
    out = mapper.get_map()
    assert out["positions"].shape[1] == 2


def test_shard_layout_invariance(rng):
    """The merge path (insert gate + voxel decimation) must produce the
    same occupied-voxel set regardless of the shard count.  Identity
    minimizer: the registration correction is exactly identity in both
    layouts, so any divergence would be a sharding bug (with a real solve,
    psum reduction order perturbs the correction at the 1e-5 level and
    points on voxel edges flip — registration fp, not sharding)."""
    world = make_world(rng)
    xs = np.arange(2.0, 14.0, 2.0)

    maps = []
    for n_dev in (1, 8):
        mapper = ShardedMapper(make_mesh(n_dev),
                               cfg(minimizer="IdentityErrorMinimizer"))
        drive(mapper, world, xs)
        mapper.drain()
        out = mapper.get_map()
        vox = np.floor(out["positions"] / 0.3).astype(np.int64)
        maps.append({tuple(v) for v in vox})
    assert maps[0] == maps[1], (
        len(maps[0] - maps[1]), len(maps[1] - maps[0]), len(maps[0]))
