"""Radius-neighborhood PCA statistics: the MXU-native surface-normal engine.

The surface-normal pass (lpm ``SurfaceNormalDataPointsFilter``,
``examples/config.yaml:26-27``) is the single most expensive stage of the
reference's merge pipeline when reimplemented as k-NN + per-point PCA: a
top-k KNN kernel pays O(k) min-extraction passes over every candidate block
on the VPU.  But the normal itself only needs the *covariance of the
neighborhood*, not the identity of the k nearest points.  So instead of
top-k we accumulate, per query point, the zeroth/first/second moments of all
reference points within ``max_radius``:

    cnt_i   = sum_j  w_ij
    sx_i    = sum_j  w_ij * x_j
    sxx_i   = sum_j  w_ij * x_j x_j^T          w_ij = [ |x_j - q_i|^2 <= r^2 ]

As a Pallas kernel this is three MXU matmuls per (query tile, ref tile)
block: the pairwise-distance cross term and the moment accumulation
``M @ W`` where ``M`` stacks the moment rows of the reference tile and ``W``
is the 0/1 gate block.  Per-pair VPU work drops from ~4k ops (top-k rounds)
to ~2 ops (distance assembly + gate) — the pass becomes MXU/bandwidth bound.

Numerical note: ``cov = sxx/cnt - mean mean^T`` cancels catastrophically
when coordinates are far from the origin (error ~ eps * |x|^2).  Callers
should center the clouds first (``radius_pca`` does this with the query
cloud's masked mean); with local windows of a few hundred meters the
residual error is <1e-3 m^2, far below lidar surface variance.

Semantics vs lpm: lpm fits the PCA to the k nearest neighbors (radius-capped
when maxDist is set); this op fits it to *all* neighbors within the radius.
On a decimated map (points ~0.15 m apart, radius 2 m) both see the same
local surface; the radius form is smoother and has no k-NN tie noise.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nn_pallas import planarize, BIG

__all__ = ["radius_pca", "radius_pca_xla"]


def _n_moments(dim: int) -> int:
    # 1 (count) + D (sum) + D*(D+1)/2 (upper-triangular second moments)
    return 1 + dim + dim * (dim + 1) // 2


def _moment_rows(x: jax.Array, dim: int) -> jax.Array:
    """Stack moment rows for points given planar coords x [>=D, T]."""
    rows = [jnp.ones_like(x[0])]
    rows += [x[a] for a in range(dim)]
    rows += [x[a] * x[a] for a in range(dim)]
    for a in range(dim):
        for b in range(a + 1, dim):
            rows.append(x[a] * x[b])
    return jnp.stack(rows, axis=0)  # [n_moments, T]


def _unpack_stats(acc: jax.Array, dim: int):
    """acc [n_moments, N] -> (cnt [N], mean [N, D], cov [N, D, D])."""
    cnt = acc[0]
    safe = jnp.maximum(cnt, 1.0)
    mean = (acc[1:1 + dim] / safe).T  # [N, D]
    m2 = acc[1 + dim:1 + 2 * dim] / safe  # diag, [D, N]
    cov = jnp.zeros((acc.shape[1], dim, dim), jnp.float32)
    for a in range(dim):
        cov = cov.at[:, a, a].set(m2[a] - mean[:, a] * mean[:, a])
    r = 1 + 2 * dim
    for a in range(dim):
        for b in range(a + 1, dim):
            off = acc[r] / safe - mean[:, a] * mean[:, b]
            cov = cov.at[:, a, b].set(off)
            cov = cov.at[:, b, a].set(off)
            r += 1
    return cnt, mean, cov


# --------------------------------------------------------------------------
# XLA oracle (portable; used on CPU backends and as the test reference)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("ref_tile",))
def radius_pca_xla(query, ref, query_mask=None, ref_mask=None,
                   max_radius=1.0, ref_tile: int = 4096):
    """Per-query radius-neighborhood moments, tiled XLA implementation.

    Returns ``(cnt f32[N], mean f32[N, D], cov f32[N, D, D])``.  Queries with
    no neighbor in range get cnt=0, mean=0, cov=0.
    """
    n, dim = query.shape
    m = ref.shape[0]
    if query_mask is None:
        query_mask = jnp.ones((n,), bool)
    if ref_mask is None:
        ref_mask = jnp.ones((m,), bool)
    r2 = jnp.float32(max_radius) ** 2

    n_tiles = max(1, -(-m // ref_tile))
    m_pad = n_tiles * ref_tile
    pad = m_pad - m
    ref_p = jnp.pad(ref, ((0, pad), (0, 0)))
    rm_p = jnp.pad(ref_mask, (0, pad))
    ref_tiles = ref_p.reshape(n_tiles, ref_tile, dim)
    rm_tiles = rm_p.reshape(n_tiles, ref_tile)

    q2 = jnp.sum(query * query, axis=1)  # [N]
    nm = _n_moments(dim)

    def step(acc, inputs):
        r, rm = inputs
        r2s = jnp.sum(r * r, axis=1)  # [T]
        cross = jnp.dot(r, query.T,
                        precision=jax.lax.Precision.HIGHEST)  # [T, N]
        d2 = r2s[:, None] + q2[None, :] - 2.0 * cross
        w = ((d2 <= r2) & rm[:, None]).astype(jnp.float32)  # [T, N]
        M = _moment_rows(r.T, dim)  # [nm, T]
        acc = acc + jnp.dot(M, w, precision=jax.lax.Precision.HIGHEST)
        return acc, None

    acc0 = jnp.zeros((nm, n), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (ref_tiles, rm_tiles))
    acc = jnp.where(query_mask[None, :], acc, 0.0)
    return _unpack_stats(acc, dim)


# --------------------------------------------------------------------------
# Pallas TPU kernel
# --------------------------------------------------------------------------

def _pca_fused_kernel(start_ref, live_ref, q_ref, r_ref, acc_ref, *,
                      dim, r2, tq, tr, nm_pad):
    """Single-launch sweep PCA: grid (query tiles, window blocks) with the
    per-tile window start scalar-prefetched — same schedule as
    ``nn_sweep._fused_kernel`` (one launch for the whole pass instead of a
    per-tile ``lax.map`` of small kernels + ``dynamic_slice`` copies)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros((nm_pad, tq), jnp.float32)

    @pl.when(live_ref[i] != 0)
    def _compute():
        q = q_ref[:dim, :]  # [D, TQ]
        r = r_ref[:dim, :]  # [D, TR]
        # EXACT f32 distances on the VPU (subtract-first squares): for
        # D=3 the MXU cross-term pads its contraction to the array's 128
        # depth x 6 HIGHEST passes (roof 256 Gpair/s), while ~3 fused
        # multiply-adds/pair on the VPU roof at ~430 Gpair/s — faster AND
        # numerically ideal (no |q|^2/|r|^2 cancellation).
        d2 = jnp.zeros((tr, tq), jnp.float32)
        for d_ in range(dim):
            dd = r[d_][:, None] - q[d_][None, :]
            d2 = d2 + dd * dd
        w = (d2 <= r2).astype(jnp.float32)  # [TR, TQ]
        M = _moment_rows(r, dim)
        nm = M.shape[0]
        M = jnp.pad(M, ((0, nm_pad - nm), (0, 0)))
        acc_ref[:, :] += jax.lax.dot_general(
            M, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("r2", "dim", "tq", "tr",
                                             "w_blocks"))
def _pca_fused(start_blk, live, qp, rp, *, r2, dim, tq, tr, w_blocks):
    n_pad = qp.shape[1]
    nm_pad = 8 if dim == 2 else 16
    grid = (n_pad // tq, w_blocks)
    kern = functools.partial(_pca_fused_kernel, dim=dim, r2=r2, tq=tq,
                             tr=tr, nm_pad=nm_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tq), lambda i, j, s_, lv: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tr), lambda i, j, s_, lv: (0, s_[i] + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nm_pad, tq), lambda i, j, s_, lv: (0, i),
                               memory_space=pltpu.VMEM),
    )
    acc = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nm_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * w_blocks * tr * (dim + nm_pad) * 6,
            bytes_accessed=8 * (n_pad + (n_pad // tq) * w_blocks * tr) * 4
            + nm_pad * n_pad * 4,
            transcendentals=0,
        ),
    )(start_blk, live, qp, rp)
    return acc


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# sorted-sweep wrapper (the production entry point)
# --------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("max_radius", "q_tile", "W", "use_pallas",
                                    "self_neighborhood"))
def _radius_pca_sweep(query, ref, query_mask, ref_mask, max_radius,
                      q_tile: int = 2048, W: int = 4096,
                      use_pallas: bool = True,
                      self_neighborhood: bool = False):
    """Sorted-sweep radius PCA: sort both clouds by x, each query tile only
    sees the contiguous ref window within ``[tile_min - r, tile_max + r]``
    (same schedule as ``nn_sweep.sweep_knn``).  Returns
    ``(cnt, mean, cov, overflow_tiles)`` — ``overflow_tiles`` counts query
    tiles whose true candidate span exceeded ``W`` (their stats degrade to
    window-truncated; callers should log it, SURVEY "no silent caps")."""
    n, dim = query.shape
    m = ref.shape[0]
    W = min(W, m)
    max_radius = float(max_radius)  # static: baked into the Pallas kernel
    r = jnp.float32(max_radius)
    r2 = max_radius * max_radius

    ref_x = jnp.where(ref_mask, ref[:, 0], BIG)
    ref_order = jnp.argsort(ref_x)
    ref_s = ref[ref_order]
    ref_mask_s = ref_mask[ref_order]
    ref_xs = ref_x[ref_order]

    if self_neighborhood:
        # query IS ref (surface normals over one cloud): one argsort +
        # one gather serve both sides — sorts dominate the merge pipeline
        # at map scale, so this halves the pass's sort cost
        q_x, q_order = ref_x, ref_order
    else:
        q_x = jnp.where(query_mask, query[:, 0], BIG)
        q_order = jnp.argsort(q_x)
    n_pad = -(-n // q_tile) * q_tile
    pad = n_pad - n
    if self_neighborhood:  # reuse the sorted ref arrays (no second gather)
        q_sorted, qm_sorted, qx_sorted = ref_s, ref_mask_s, ref_xs
    else:
        q_sorted = query[q_order]
        qm_sorted = query_mask[q_order]
        qx_sorted = q_x[q_order]
    q_s = jnp.pad(q_sorted, ((0, pad), (0, 0)), constant_values=BIG)
    qm_s = jnp.pad(qm_sorted, (0, pad))
    qx_s = jnp.pad(qx_sorted, (0, pad), constant_values=BIG)

    n_tiles = n_pad // q_tile
    qx_tiles = qx_s.reshape(n_tiles, q_tile)
    qm_tiles = qm_s.reshape(n_tiles, q_tile)
    tile_min = jnp.min(jnp.where(qm_tiles, qx_tiles, BIG), axis=1)
    tile_max = jnp.max(jnp.where(qm_tiles, qx_tiles, -BIG), axis=1)
    lo = jnp.searchsorted(ref_xs, tile_min - r).astype(jnp.int32)
    hi = jnp.searchsorted(ref_xs, tile_max + r).astype(jnp.int32)
    live = jnp.any(qm_tiles, axis=1)
    overflow = jnp.sum((live & ((hi - lo) > W)).astype(jnp.int32))

    nm = _n_moments(dim)
    nm_pad = 8 if dim == 2 else 16

    if use_pallas:
        # single-launch sweep: scalar-prefetched window starts, no
        # per-tile dispatch / dynamic_slice window copies
        tr = 512
        m_pad = _round_up(max(m, tr), tr)
        w_blocks = -(-W // tr) + 1
        m_pad = max(m_pad, w_blocks * tr)
        rp = planarize(ref_s, ref_mask_s, m_pad)
        qp = planarize(q_s, qm_s, n_pad)
        start_blk = jnp.clip(lo // tr, 0, m_pad // tr - w_blocks)
        # kernel query tile == the sweep tile so start_blk/live index 1:1
        acc_pad = _pca_fused(start_blk, live.astype(jnp.int32), qp, rp,
                             r2=r2, dim=dim, tq=q_tile, tr=tr,
                             w_blocks=w_blocks)
        acc_sorted = acc_pad[:nm, :n]
    else:
        start = jnp.clip(lo, 0, jnp.maximum(m - W, 0))
        q_tiles = q_s.reshape(n_tiles, q_tile, dim)

        def one_tile(args):
            qt, qmt, s0 = args

            def live_fn(_):
                win = jax.lax.dynamic_slice(ref_s, (s0, 0), (W, dim))
                wm = jax.lax.dynamic_slice(ref_mask_s, (s0,), (W,))
                q2 = jnp.sum(qt * qt, axis=1)
                r2s = jnp.sum(win * win, axis=1)
                cross = jnp.dot(win, qt.T,
                                precision=jax.lax.Precision.HIGHEST)
                d2 = r2s[:, None] + q2[None, :] - 2.0 * cross
                w = ((d2 <= r2) & wm[:, None]
                     & qmt[None, :]).astype(jnp.float32)
                M = _moment_rows(win.T, dim)
                acc = jnp.dot(M, w, precision=jax.lax.Precision.HIGHEST)
                return jnp.pad(acc, ((0, nm_pad - nm), (0, 0)))

            def dead_fn(_):
                return jnp.zeros((nm_pad, q_tile), jnp.float32)

            return jax.lax.cond(jnp.any(qmt), live_fn, dead_fn, None)

        acc_t = jax.lax.map(one_tile, (q_tiles, qm_tiles, start))
        acc_sorted = jnp.moveaxis(acc_t, 1, 0).reshape(nm_pad,
                                                       n_pad)[:nm, :n]
    # un-sort queries
    inv = jnp.zeros((n,), jnp.int32).at[q_order].set(
        jnp.arange(n, dtype=jnp.int32))
    acc = acc_sorted[:, inv]
    acc = jnp.where(query_mask[None, :], acc, 0.0)
    cnt, mean, cov = _unpack_stats(acc, dim)
    return cnt, mean, cov, overflow


def radius_pca(query, ref, query_mask=None, ref_mask=None, max_radius=1.0,
               q_tile: int = 2048, W: int = 4096):
    """Per-backend radius-neighborhood PCA.

    Returns ``(cnt f32[N], mean f32[N, D], cov f32[N, D, D], overflow i32)``.
    Both clouds are centered on the query cloud's masked mean internally
    (see module docstring on cancellation); outputs are frame-local, i.e.
    ``mean`` is returned in the *original* frame.
    """
    n, dim = query.shape
    if query_mask is None:
        query_mask = jnp.ones((n,), bool)
    if ref_mask is None:
        ref_mask = jnp.ones((ref.shape[0],), bool)

    # center on the query cloud's masked mean (cancellation mitigation)
    qsum = jnp.sum(jnp.where(query_mask[:, None], query, 0.0), axis=0)
    qcnt = jnp.maximum(jnp.sum(query_mask.astype(jnp.float32)), 1.0)
    c = qsum / qcnt
    qc = query - c
    rc = ref - c

    from .nn import _use_pallas
    if _use_pallas():
        self_nn = query is ref and (query_mask is ref_mask)
        cnt, mean, cov, overflow = _radius_pca_sweep(
            qc, rc, query_mask, ref_mask, max_radius, q_tile=q_tile, W=W,
            use_pallas=True, self_neighborhood=self_nn)
    else:
        cnt, mean, cov = radius_pca_xla(qc, rc, query_mask, ref_mask,
                                        max_radius)
        overflow = jnp.int32(0)
    return cnt, mean + jnp.where(cnt[:, None] > 0, c[None, :], 0.0), cov, \
        overflow
