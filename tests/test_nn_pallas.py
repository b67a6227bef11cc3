"""Pallas KNN kernel vs the XLA oracle (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from norlab_icp_mapper_tpu.ops.nn import knn


def knn_pallas_interp(*args, **kw):
    """Run the Pallas kernel in interpreter mode (CPU tests)."""
    from jax.experimental.pallas import tpu as pltpu
    from norlab_icp_mapper_tpu.ops import nn_pallas
    with pltpu.force_tpu_interpret_mode():
        return nn_pallas.knn_pallas(*args, **kw)


@pytest.mark.parametrize("k", [1, 4])
def test_pallas_matches_oracle(rng, k):
    q = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32) * 5)
    r = jnp.asarray(rng.normal(size=(700, 3)).astype(np.float32) * 5)
    d_ref, i_ref = knn(q, r, k=k)
    d_pal, i_pal = knn_pallas_interp(q, r, k=k, tq=256, tr=256)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_pallas_masks_and_radius(rng):
    q = jnp.asarray(np.array([[0, 0, 0], [10, 10, 10]], np.float32))
    r = jnp.asarray(np.array([[0.1, 0, 0], [0.2, 0, 0], [5, 5, 5]], np.float32))
    rmask = jnp.asarray([False, True, True])
    d, i = knn_pallas_interp(q, r, ref_mask=rmask, k=1, max_radius=1.0,
                             tq=256, tr=256)
    assert int(i[0, 0]) == 1  # nearest unmasked
    assert int(i[1, 0]) == -1 and np.isinf(float(d[1, 0]))  # beyond radius


def test_pallas_query_mask(rng):
    q = jnp.zeros((4, 3), jnp.float32)
    r = jnp.zeros((4, 3), jnp.float32)
    qmask = jnp.asarray([True, False, True, False])
    d, i = knn_pallas_interp(q, r, query_mask=qmask, k=1, tq=256, tr=256)
    assert int(i[1, 0]) == -1 and int(i[3, 0]) == -1
    assert int(i[0, 0]) >= 0
