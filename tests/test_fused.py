"""Fused per-scan program vs stepwise path: equivalence + pipelining.

The offline Mapper runs the whole per-scan chain as one donated-state XLA
program (``fused.py``); the stepwise path (``NIM_NO_FUSED`` / online mode)
dispatches stage by stage.  Both must produce the same maps, trajectories,
and update-condition gating.
"""
import numpy as np
import pytest

from norlab_icp_mapper_tpu import Mapper, PointBatch

from test_mapper_e2e import BASE_CONFIG, make_world, drive, pose_at, scan_at


def _run(cfg, world, xs, rng, fused: bool, monkeypatch, noise=0.0):
    if not fused:
        monkeypatch.setenv("NIM_NO_FUSED", "1")
    else:
        monkeypatch.delenv("NIM_NO_FUSED", raising=False)
    mapper = Mapper(cfg, is_3d=True)
    assert mapper._use_fused == fused
    r = np.random.default_rng(7) if noise else None
    drive(mapper, world, xs, noise=noise, rng=r)
    cloud = mapper.get_map()
    traj = np.stack(mapper.get_trajectory().poses)
    return cloud, traj, mapper


def _sorted(pos):
    return pos[np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))]


@pytest.mark.parametrize("cond", [
    {"type": "distance", "value": 0.0},
    {"type": "distance", "value": 3.0},   # exercises the merge-skip branch
    {"type": "delay", "value": 0.25},
    {"type": "overlap", "value": 0.95},
])
def test_fused_matches_stepwise(rng, monkeypatch, cond):
    world = make_world(rng, n=600)
    cfg = {**BASE_CONFIG,
           "mapper": {**BASE_CONFIG["mapper"], "updateCondition": cond}}
    xs = [2.0, 3.0, 4.0, 5.0]
    c_fused, t_fused, _ = _run(cfg, world, xs, rng, True, monkeypatch)
    c_step, t_step, _ = _run(cfg, world, xs, rng, False, monkeypatch)
    np.testing.assert_allclose(t_fused, t_step, atol=1e-4)
    assert c_fused["positions"].shape == c_step["positions"].shape
    np.testing.assert_allclose(_sorted(c_fused["positions"]),
                               _sorted(c_step["positions"]), atol=1e-4)


def test_fused_matches_stepwise_noisy_odometry(rng, monkeypatch):
    """With real ICP corrections in play (not identity)."""
    world = make_world(rng, n=900)
    xs = [2.0, 2.6, 3.2, 3.8]
    c_fused, t_fused, _ = _run(BASE_CONFIG, world, xs, rng, True,
                               monkeypatch, noise=0.05)
    c_step, t_step, _ = _run(BASE_CONFIG, world, xs, rng, False,
                             monkeypatch, noise=0.05)
    np.testing.assert_allclose(t_fused, t_step, atol=1e-3)
    assert c_fused["positions"].shape == c_step["positions"].shape


def test_fused_localization_toggle(rng, monkeypatch):
    monkeypatch.delenv("NIM_NO_FUSED", raising=False)
    world = make_world(rng)
    mapper = Mapper(BASE_CONFIG, is_3d=True)
    drive(mapper, world, [2.0, 4.0])
    n_before = mapper.get_map()["positions"].shape[0]
    mapper.set_is_mapping(False)  # traced flag: no recompile, no merge
    drive(mapper, world, [6.0, 8.0])
    assert mapper.get_map()["positions"].shape[0] == n_before
    mapper.set_is_mapping(True)
    drive(mapper, world, [9.0])
    assert mapper.get_map()["positions"].shape[0] > n_before


def test_fused_capacity_growth(rng, monkeypatch):
    """Map outgrows its initial buffer: host pads at a bucket boundary."""
    monkeypatch.delenv("NIM_NO_FUSED", raising=False)
    world = make_world(rng, n=3000)
    mapper = Mapper(BASE_CONFIG, is_3d=True)
    # overlapping views accumulate > initial capacity of the first scan
    drive(mapper, world, [2.0, 5.0, 8.0, 11.0, 14.0])
    cloud = mapper.get_map()
    assert cloud["positions"].shape[0] > 1000
    # every surviving point is a real world point (no garbage slots leaked)
    from scipy.spatial import cKDTree
    d, _ = cKDTree(world).query(cloud["positions"])
    assert float(d.max()) < 0.2
