"""maxPointByNode > 1 octree semantics (VERDICT r2 item 10): lpm's rule —
a node subdivides while it holds MORE than maxPointByNode points AND is
larger than maxSizeByNode — so sparse regions coarsen (<=K points within a
2^l-voxel cell collapse to ONE representative) while dense voxels keep one
representative each (the size floor).
"""
import numpy as np
import jax.numpy as jnp

from norlab_icp_mapper_tpu.ops.voxel import voxel_select


def run(points, K, vox=1.0, method=0, levels=10):
    pts = jnp.asarray(np.asarray(points, np.float32))
    keep, _ = voxel_select(pts, jnp.ones(len(points), bool), vox,
                           method=method, max_point_by_node=K,
                           max_coarsen_levels=levels)
    return np.asarray(keep)


def test_sparse_cluster_coarsens():
    # 3 points in 3 different base voxels, all inside one level-2 (4x4x4)
    # cell aligned at the origin; K=3 -> ONE representative
    pts = [[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [0.5, 2.5, 0.5]]
    keep = run(pts, K=3)
    assert keep.sum() == 1, keep
    # with K=1 every base voxel keeps its point
    keep1 = run(pts, K=1)
    assert keep1.sum() == 3


def test_dense_voxel_hits_size_floor():
    # 5 points in ONE base voxel: count > K at level 0 -> the size floor
    # keeps exactly one representative (same as K=1)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.1, 0.9, (5, 3))
    assert run(pts, K=3).sum() == 1


def test_mixed_density():
    rng = np.random.default_rng(1)
    dense = rng.uniform(10.1, 10.9, (20, 3))       # one voxel, 20 pts
    sparse = np.array([[40.2, 0.5, 0.5], [41.7, 1.2, 0.5],
                       [42.8, 2.9, 1.5], [43.4, 3.3, 2.2]])  # one 4^3 cell
    far = np.array([[100.5, 100.5, 0.5]])
    keep = run(np.concatenate([dense, sparse, far]), K=4)
    assert keep[:20].sum() == 1      # dense voxel -> 1 (floor)
    assert keep[20:24].sum() == 1    # 4 sparse pts <= K coarsen to 1
    assert keep[24:].sum() == 1      # singleton survives


def test_level_cap_bounds_coarsening():
    # two points 2 voxels apart: coarsen at level>=1; with the cap at 0
    # levels they stay separate
    pts = [[0.5, 0.5, 0.5], [1.5, 0.5, 0.5]]
    assert run(pts, K=2, levels=0).sum() == 2
    assert run(pts, K=2, levels=3).sum() == 1


def test_centroid_method_with_k():
    pts = np.array([[0.25, 0.5, 0.5], [1.75, 0.5, 0.5]])
    pts_j = jnp.asarray(pts.astype(np.float32))
    keep, centroid = voxel_select(pts_j, jnp.ones(2, bool), 1.0, method=2,
                                  max_point_by_node=2)
    keep = np.asarray(keep)
    assert keep.sum() == 1
    got = np.asarray(centroid)[keep][0]
    np.testing.assert_allclose(got, pts.mean(axis=0), atol=1e-6)


def test_random_method_uniform_over_leaf():
    """ADVICE r3: samplingMethod=1 with K>1 must pick a uniformly random
    point of the LEAF, not just of its morton-lowest base voxel."""
    import jax
    # one level-1 (2x2x2) leaf: 1 point in the morton-lowest voxel,
    # 3 points in a higher voxel; K=4 -> one representative per leaf
    pts = jnp.asarray(np.array([[0.5, 0.5, 0.5],
                                [1.5, 1.5, 1.5],
                                [1.2, 1.7, 1.4],
                                [1.8, 1.1, 1.6]], np.float32))
    chosen = np.zeros(4)
    for s in range(64):
        keep, _ = voxel_select(pts, jnp.ones(4, bool), 1.0, method=1,
                               key=jax.random.PRNGKey(s),
                               max_point_by_node=4, max_coarsen_levels=4)
        k = np.asarray(keep)
        assert k.sum() == 1, k
        chosen += k
    # uniform-ish: every point wins sometimes; the old behavior picked
    # point 0 (alone in the lowest voxel) every time
    assert (chosen > 0).all(), chosen
    assert chosen[0] < 40, chosen  # not the perpetual winner
