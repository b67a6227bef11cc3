import numpy as np
import jax.numpy as jnp

from norlab_icp_mapper_tpu.points import (
    PointBatch, bucket_capacity, concatenate, insert)


def test_bucket_capacity():
    assert bucket_capacity(1) == 256
    assert bucket_capacity(256) == 256
    assert bucket_capacity(257) == 320  # quarter-pow2 steps, <=25% waste
    assert bucket_capacity(41400) == 49152
    assert bucket_capacity(120990) == 131072
    assert bucket_capacity(163000) == 163840
    for n in (300, 5000, 41400, 120990, 163000):
        c = bucket_capacity(n)
        assert c >= n and (c - n) <= n // 4 + 256


def test_from_numpy_roundtrip(rng):
    pos = rng.normal(size=(100, 3)).astype(np.float32)
    desc = {"intensity": rng.normal(size=(100, 1)).astype(np.float32)}
    b = PointBatch.from_numpy(pos, desc)
    assert b.capacity == 256
    assert int(b.count()) == 100
    out = b.to_numpy()
    np.testing.assert_allclose(out["positions"], pos)
    np.testing.assert_allclose(out["intensity"], desc["intensity"])


def test_mask_and_compact(rng):
    pos = rng.normal(size=(10, 3)).astype(np.float32)
    b = PointBatch.from_numpy(pos)
    keep = jnp.zeros((b.capacity,), bool).at[:10].set(
        jnp.asarray([True, False] * 5))
    b2 = b.with_mask(keep)
    assert int(b2.count()) == 5
    c = b2.compact()
    out = c.to_numpy()["positions"]
    np.testing.assert_allclose(out, pos[::2])
    # compacted points occupy the first slots
    assert bool(c.mask[:5].all()) and not bool(c.mask[5:].any())


def test_concatenate_orders_a_then_b(rng):
    a = PointBatch.from_numpy(rng.normal(size=(5, 3)).astype(np.float32))
    bpos = rng.normal(size=(7, 3)).astype(np.float32)
    b = PointBatch.from_numpy(bpos, {"probabilityDynamic": np.full((7, 1), 0.6, np.float32)})
    c = concatenate(a, b)
    assert int(c.count()) == 12
    out = c.to_numpy()
    np.testing.assert_allclose(out["positions"][5:], bpos)
    # descriptor union zero-fills the side that lacks it
    np.testing.assert_allclose(out["probabilityDynamic"][:5], 0.0)
    np.testing.assert_allclose(out["probabilityDynamic"][5:], 0.6)


def test_insert_fixed_capacity(rng):
    """insert keeps dst capacity, appends src valid points after dst's."""
    apos = rng.normal(size=(5, 3)).astype(np.float32)
    a = PointBatch.from_numpy(apos, capacity=256)
    # punch a hole in a's mask: insert must compact around it
    a = a.replace(mask=a.mask.at[2].set(False))
    bpos = rng.normal(size=(7, 3)).astype(np.float32)
    b = PointBatch.from_numpy(
        bpos, {"probabilityDynamic": np.full((7, 1), 0.6, np.float32)},
        capacity=64)
    b = b.replace(mask=b.mask.at[0].set(False))
    c = insert(a, b)
    assert c.capacity == 256
    out = c.to_numpy()
    expect_a = apos[[0, 1, 3, 4]]
    np.testing.assert_allclose(out["positions"][:4], expect_a)
    np.testing.assert_allclose(out["positions"][4:], bpos[1:])
    np.testing.assert_allclose(out["probabilityDynamic"][:4], 0.0)
    np.testing.assert_allclose(out["probabilityDynamic"][4:], 0.6)


def test_insert_overflow_drops_excess(rng):
    a = PointBatch.from_numpy(rng.normal(size=(250, 3)).astype(np.float32),
                              capacity=256)
    b = PointBatch.from_numpy(rng.normal(size=(20, 3)).astype(np.float32))
    c = insert(a, b)
    assert c.capacity == 256
    assert int(c.count()) == 256  # 250 + first 6 of b fit; rest dropped


def test_pad_to_grows(rng):
    b = PointBatch.from_numpy(rng.normal(size=(10, 3)).astype(np.float32))
    big = b.pad_to(1024)
    assert big.capacity == 1024
    assert int(big.count()) == 10
