"""Sorted-sweep windowed KNN: radius-capped search at a fraction of the
brute-force pair count, TPU-friendly (no gathers of irregular buckets).

Idea: sort reference AND query points along one axis (x).  A query tile's
candidates then live in the contiguous ref range whose x lies within
``[tile_min - r, tile_max + r]`` — found with two ``searchsorted``.  Each
query tile slices a fixed-width window ``W`` of the sorted refs
(``dynamic_slice``; static shape) and runs the Pallas brute-force kernel on
(tile, window).  Pair work drops from N*M to N*W — typically 8-30x less for
lidar maps spanning 100+ m with a 2 m matcher radius.

Exactness: guaranteed when every tile's true candidate span fits in ``W``.
The third return value ``overflow`` counts live query tiles whose true
candidate span exceeded ``W`` — those tiles degrade to nearest-within-window
(still radius-verified).  Callers must surface it (SURVEY "no silent caps");
``ops.nn.radius_knn`` forwards it to ``utils.tracing.record_overflow``.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nn_pallas import knn_pallas, BIG

__all__ = ["sweep_knn", "presort_ref"]


@jax.jit
def presort_ref(ref: jax.Array, ref_mask: jax.Array):
    """Sort refs by x, invalid refs to the end (x -> +BIG).  The sorted
    pack ``(ref_s, ref_mask_s, ref_xs, ref_order)`` feeds ``sweep_knn``'s
    ``presorted`` argument — the sort (+gather) is ~5 ms at map shapes and
    the reference cloud is static across GN iterations (and across scans
    until a merge), so hoisting it out of the solve loop is a direct
    per-iteration saving."""
    ref_x = jnp.where(ref_mask, ref[:, 0], BIG)
    ref_order = jnp.argsort(ref_x).astype(jnp.int32)
    return (ref[ref_order], ref_mask[ref_order], ref_x[ref_order],
            ref_order)


@functools.partial(jax.jit, static_argnames=("k", "q_tile", "W", "use_pallas"))
def sweep_knn(
    query: jax.Array,  # f32[N, D]
    ref: jax.Array,  # f32[M, D]
    query_mask: Optional[jax.Array] = None,
    ref_mask: Optional[jax.Array] = None,
    k: int = 1,
    max_radius=2.0,
    q_tile: int = 4096,
    W: int = 8192,
    use_pallas: bool = True,
    presorted=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Radius-capped KNN via the sorted sweep.

    Returns ``(dists2 [N, k], idx [N, k], overflow i32)`` — ``overflow`` is
    the number of live query tiles whose candidate span exceeded ``W``.
    ``presorted`` optionally supplies :func:`presort_ref`'s output (must
    have been built from the same ``ref``/``ref_mask``)."""
    n, dim = query.shape
    m = ref.shape[0]
    if query_mask is None:
        query_mask = jnp.ones((n,), bool)
    if ref_mask is None:
        ref_mask = jnp.ones((m,), bool)
    W = min(W, m)
    r = jnp.float32(max_radius)

    if presorted is not None:
        ref_s, ref_mask_s, ref_xs, ref_order = presorted
    else:
        ref_x = jnp.where(ref_mask, ref[:, 0], BIG)
        ref_order = jnp.argsort(ref_x)
        ref_s = ref[ref_order]
        ref_mask_s = ref_mask[ref_order]
        ref_xs = ref_x[ref_order]

    # sort queries by x; invalid queries to the end
    q_x = jnp.where(query_mask, query[:, 0], BIG)
    q_order = jnp.argsort(q_x)
    n_pad = -(-n // q_tile) * q_tile
    pad = n_pad - n
    q_s = jnp.pad(query[q_order], ((0, pad), (0, 0)), constant_values=BIG)
    qm_s = jnp.pad(query_mask[q_order], (0, pad))
    qx_s = jnp.pad(q_x[q_order], (0, pad), constant_values=BIG)

    n_tiles = n_pad // q_tile
    qx_tiles = qx_s.reshape(n_tiles, q_tile)
    tile_min = jnp.min(jnp.where(qm_s.reshape(n_tiles, q_tile), qx_tiles, BIG),
                       axis=1)
    tile_max = jnp.max(jnp.where(qm_s.reshape(n_tiles, q_tile), qx_tiles, -BIG),
                       axis=1)
    lo = jnp.searchsorted(ref_xs, tile_min - r).astype(jnp.int32)
    hi = jnp.searchsorted(ref_xs, tile_max + r).astype(jnp.int32)
    live = jnp.any(qm_s.reshape(n_tiles, q_tile), axis=1)
    overflow = jnp.sum((live & ((hi - lo) > W)).astype(jnp.int32))
    start = jnp.clip(lo, 0, jnp.maximum(m - W, 0))

    q_tiles = q_s.reshape(n_tiles, q_tile, dim)
    qm_tiles = qm_s.reshape(n_tiles, q_tile)

    def one_tile(args):
        qt, qmt, s0 = args

        def live(_):
            win = jax.lax.dynamic_slice(ref_s, (s0, 0), (W, dim))
            wm = jax.lax.dynamic_slice(ref_mask_s, (s0,), (W,))
            # note: points in the window but outside the tile's x-range are
            # legitimate candidates anyway — every pair is radius-verified
            if use_pallas:
                d, i = knn_pallas(qt, win, qmt, wm, k=k,
                                  max_radius=max_radius,
                                  tq=min(1024, q_tile), tr=min(512, W))
            else:
                from .nn import _knn_xla
                d, i = _knn_xla(qt, win, qmt, wm, k=k,
                                max_radius=jnp.float32(max_radius))
            # map window indices back to sorted-ref indices
            return d, jnp.where(i >= 0, i + s0, -1)

        def dead(_):
            return (jnp.full((q_tile, k), jnp.inf, jnp.float32),
                    jnp.full((q_tile, k), -1, jnp.int32))

        # capacity-padded clouds sort their invalid tail together: whole
        # query tiles are often masked out — skip their kernels entirely
        return jax.lax.cond(jnp.any(qmt), live, dead, None)

    d_t, i_t = jax.lax.map(one_tile, (q_tiles, qm_tiles, start))
    d_sorted = d_t.reshape(n_pad, k)[:n]
    i_sorted = i_t.reshape(n_pad, k)[:n]
    # sorted-ref indices -> original ref ids
    safe = jnp.maximum(i_sorted, 0)
    i_orig = jnp.where(i_sorted >= 0, ref_order[safe].astype(jnp.int32), -1)
    # un-sort the queries
    inv = jnp.zeros((n,), jnp.int32).at[q_order].set(
        jnp.arange(n, dtype=jnp.int32))
    d_out = d_sorted[inv]
    i_out = i_orig[inv]
    return d_out, i_out, overflow
