import numpy as np
import jax.numpy as jnp

from norlab_icp_mapper_tpu.ops.nn import _knn_xla
from norlab_icp_mapper_tpu.ops.gridhash import build_grid, grid_hash_knn


def test_matches_bruteforce_within_radius(rng):
    q = jnp.asarray(rng.uniform(-10, 10, size=(500, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(-10, 10, size=(2000, 3)).astype(np.float32))
    radius = 2.0
    table, overflow = build_grid(r, jnp.ones(2000, bool), radius,
                                 H=1 << 12, C=128)
    assert int(overflow) == 0
    d_g, i_g = grid_hash_knn(q, r, table, radius, k=3, H=1 << 12, C=128,
                             q_tile=256)
    d_b, i_b = _knn_xla(q, r, k=3, max_radius=jnp.float32(radius))
    np.testing.assert_array_equal(np.asarray(i_g), np.asarray(i_b))
    both = np.isfinite(np.asarray(d_b))
    # gridhash computes (q-r)^2 directly; oracle uses the expanded form —
    # tiny f32 differences expected
    np.testing.assert_allclose(np.asarray(d_g)[both], np.asarray(d_b)[both],
                               rtol=1e-3, atol=1e-4)


def test_ref_mask_and_query_mask(rng):
    q = jnp.zeros((2, 3), jnp.float32)
    r = jnp.asarray(np.array([[0.1, 0, 0], [0.2, 0, 0]], np.float32))
    rmask = jnp.asarray([False, True])
    table, _ = build_grid(r, rmask, 1.0, H=1 << 8, C=8)
    qmask = jnp.asarray([True, False])
    d, i = grid_hash_knn(q, r, table, 1.0, query_mask=qmask, k=1,
                         H=1 << 8, C=8, q_tile=256)
    assert int(i[0, 0]) == 1  # masked ref excluded
    assert int(i[1, 0]) == -1  # masked query


def test_no_match_beyond_radius(rng):
    q = jnp.asarray(np.array([[100.0, 100, 100]], np.float32))
    r = jnp.zeros((5, 3), jnp.float32)
    table, _ = build_grid(r, jnp.ones(5, bool), 1.0, H=1 << 8, C=8)
    d, i = grid_hash_knn(q, r, table, 1.0, k=1, H=1 << 8, C=8, q_tile=256)
    assert int(i[0, 0]) == -1 and np.isinf(float(d[0, 0]))


def test_overflow_reported(rng):
    # 100 points in one cell, C=8 -> overflow
    r = jnp.asarray(rng.uniform(0, 0.5, size=(100, 3)).astype(np.float32))
    table, overflow = build_grid(r, jnp.ones(100, bool), 1.0, H=1 << 8, C=8)
    assert int(overflow) == 100 - 8


def test_2d_mode(rng):
    q = jnp.asarray(rng.uniform(-5, 5, size=(100, 2)).astype(np.float32))
    r = jnp.asarray(rng.uniform(-5, 5, size=(400, 2)).astype(np.float32))
    table, ov = build_grid(r, jnp.ones(400, bool), 1.5, H=1 << 10, C=64)
    assert int(ov) == 0
    d_g, i_g = grid_hash_knn(q, r, table, 1.5, k=2, H=1 << 10, C=64,
                             q_tile=128)
    d_b, i_b = _knn_xla(q, r, k=2, max_radius=jnp.float32(1.5))
    np.testing.assert_array_equal(np.asarray(i_g), np.asarray(i_b))
