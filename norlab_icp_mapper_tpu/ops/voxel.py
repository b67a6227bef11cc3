"""Voxel-grid bucketing utilities (sort-based, static-shape).

TPU-native replacement for libpointmatcher's octree build used by the
reference's ``OctreeMapperModule`` (``OctreeMapperModule.cpp:35-39``) and
``OctreeGridDataPointsFilter``: a pointer-chasing octree subdivides until
leaves are smaller than ``maxSizeByNode`` — functionally a (near-)uniform
spatial decimation.  Here that is a uniform voxel grid: integer voxel keys
packed into int64, a stable sort groups voxel members, segment boundaries
mark representatives.  Everything is fixed-shape; invalid points get a
sentinel key that sorts last.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["voxel_keys", "voxel_select"]

_OFFSET = 1 << 20  # supports |coord/vox| < 2^20 per axis
_SENTINEL = jnp.iinfo(jnp.int64).max


def voxel_keys(positions: jax.Array, mask: jax.Array, voxel_size) -> jax.Array:
    """int64 voxel key per point; invalid points get a max-sentinel key.

    Works for dim 2 or 3 (21 bits per axis, packed).
    """
    dim = positions.shape[1]
    ij = jnp.floor(positions / voxel_size).astype(jnp.int64) + _OFFSET
    ij = jnp.clip(ij, 0, (1 << 21) - 1)
    key = ij[:, 0]
    for a in range(1, dim):
        key = (key << 21) | ij[:, a]
    return jnp.where(mask, key, _SENTINEL)


def voxel_select(
    positions: jax.Array,  # f32[N, D]
    mask: jax.Array,  # bool[N]
    voxel_size,
    method: int = 0,  # 0=first point, 1=random, 2=centroid, 3=medoid
    key: Optional[jax.Array] = None,  # PRNG key for method=1
) -> Tuple[jax.Array, jax.Array]:
    """One representative per occupied voxel.

    Returns ``(keep_mask bool[N], centroid f32[N, D])``.  ``keep_mask`` marks
    representative points; ``centroid`` carries the per-point voxel centroid
    (meaningful only where keep_mask, used by samplingMethod=2).  Matches the
    sampling modes of lpm's octree filter: 0 = first point, 1 = random point,
    2 = centroid, 3 = medoid.
    """
    n = positions.shape[0]
    vkeys = voxel_keys(positions, mask, voxel_size)

    if method == 1:
        if key is None:
            key = jax.random.PRNGKey(0)
        prio = jax.random.uniform(key, (n,))
    else:
        prio = jnp.zeros((n,), jnp.float32)

    # sort by (voxel key, priority, original index): stable argsort over
    # voxel keys preserves original order; random mode perturbs via prio.
    order = jnp.lexsort((jnp.arange(n), prio, vkeys))
    sk = vkeys[order]
    is_first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    is_first = is_first & (sk != _SENTINEL)

    if method in (0, 1):
        keep = jnp.zeros((n,), bool).at[order].set(is_first)
        return keep, positions

    # centroid / medoid need per-voxel means
    seg_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # [N] over sorted order
    seg_id = jnp.maximum(seg_id, 0)
    sorted_pos = positions[order]
    sorted_valid = (sk != _SENTINEL).astype(jnp.float32)[:, None]
    sums = jax.ops.segment_sum(sorted_pos * sorted_valid, seg_id, num_segments=n)
    cnts = jax.ops.segment_sum(sorted_valid, seg_id, num_segments=n)
    means_per_seg = sums / jnp.maximum(cnts, 1.0)
    sorted_centroid = means_per_seg[seg_id]

    if method == 2:
        keep_sorted = is_first
    else:  # medoid: point closest to its voxel centroid
        d2 = jnp.sum((sorted_pos - sorted_centroid) ** 2, axis=1)
        d2 = jnp.where(sk != _SENTINEL, d2, jnp.inf)
        seg_min = jax.ops.segment_min(d2, seg_id, num_segments=n)
        is_min = d2 <= seg_min[seg_id]
        # break ties: first minimal element in each segment
        first_min_rank = jax.ops.segment_min(
            jnp.where(is_min, jnp.arange(n), n), seg_id, num_segments=n)
        keep_sorted = (jnp.arange(n) == first_min_rank[seg_id]) & (sk != _SENTINEL)

    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    centroid = jnp.zeros_like(positions).at[order].set(sorted_centroid)
    return keep, centroid
