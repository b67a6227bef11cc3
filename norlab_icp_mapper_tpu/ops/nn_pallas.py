"""Pallas TPU kernel for tiled brute-force KNN.

Same contract as ``ops/nn.py`` (the XLA oracle), engineered for the TPU
memory hierarchy: the [TQ, TR] distance block lives in VMEM and the running
top-k per query is maintained by k rounds of min-extraction — no sort, no
HBM round-trips for intermediates (the XLA path materializes [N, T+k]
concat+top_k per tile in HBM, which dominates its runtime).

Layout: positions are fed PLANAR — ``[8, N]`` f32 with rows 0..D-1 holding
coordinates (sublane-padded to 8) — so the cross-term matmul
``R_tile^T @ Q_tile`` has its contraction on the (padded) sublane axis and
the [TR, TQ] block lands MXU/VPU-aligned with queries on lanes.  Invalid
points carry coordinates ``BIG`` (1e9), pushing their distances out of range
instead of needing a mask operand.

Grid: (query tiles, ref tiles), ref-major iteration accumulating into the
per-query-tile output block (revisited across the ref axis, standard matmul
accumulation pattern).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["knn_pallas", "planarize"]

BIG = 1.0e9  # coordinate sentinel for invalid points
_HUGE = 1.0e30  # distance sentinel inside the kernel


def planarize(points: jax.Array, mask: Optional[jax.Array],
              n_pad: int) -> jax.Array:
    """[N, D] + mask -> planar [8, n_pad] with invalid coords = BIG."""
    n, d = points.shape
    if mask is not None:
        pts = jnp.where(mask[:, None], points, BIG)
    else:
        pts = points
    out = jnp.full((8, n_pad), BIG, jnp.float32)
    out = out.at[:d, :n].set(pts.T)
    # zero the unused coordinate rows so they don't affect distances
    out = out.at[d:, :].set(0.0)
    # re-poison invalid/padded columns in the coordinate rows only
    return out


def _kernel(q_ref, r_ref, d_out, i_out, *, k, tq, tr, dim,
            precision=None):
    """Running top-k in SHIFTED distance space: the kernel ranks pairs by
    ``s = |r|^2 - 2 q.r`` — the true d2 minus the per-query constant
    ``|q|^2`` — which preserves per-query ordering while saving the q2
    broadcast-add, the >=0 clamp, and the invalid-sentinel select on every
    pair (the epilogue, not the MXU cross-term, is this kernel's roof; see
    baselines/speed_of_light.py).  The wrapper adds q2 back and resolves
    invalids on the tiny [N, k] output."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        d_out[:, :] = jnp.full((k, tq), _HUGE, jnp.float32)
        i_out[:, :] = jnp.full((k, tq), -1, jnp.int32)

    q = q_ref[:dim, :]  # [D, TQ]
    r = r_ref[:dim, :]  # [D, TR]
    r2 = jnp.sum(r * r, axis=0)  # [TR]; invalid refs carry ~BIG^2 (1e18)
    cross = jax.lax.dot_general(
        r, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision or jax.lax.Precision.HIGHEST,
    )  # [TR, TQ]; HIGHEST = full f32 (see nn.py).  The 6-pass HIGHEST
    # cross-term is the kernel's binding resource at k=1 (measured r4:
    # 1-pass DEFAULT runs 3.07x faster but its bf16 rounding misranks
    # neighbors at map coordinate scales — exactness wins)
    s = r2[:, None] - 2.0 * cross  # [TR, TQ] shifted distances

    base = j * tr

    if k == 1:
        # ~3 VPU ops/pair: the shifted-distance FMA, one min, one argmin
        m = jnp.min(s, axis=0)  # [TQ]
        a = jnp.argmin(s, axis=0).astype(jnp.int32) + base
        best = d_out[0, :]
        upd = m < best
        d_out[0, :] = jnp.where(upd, m, best)
        i_out[0, :] = jnp.where(upd, a, i_out[0, :])
        return

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tr, tq), 0) + base
    cat_d = jnp.concatenate([s, d_out[:, :]], axis=0)  # [TR+K, TQ]
    cat_i = jnp.concatenate([row_ids, i_out[:, :]], axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tr + k, tq), 0)

    d_rows = []
    i_rows = []
    for t in range(k):
        m = jnp.min(cat_d, axis=0)  # [TQ]
        a = jnp.argmin(cat_d, axis=0).astype(jnp.int32)  # [TQ]
        sel = rows == a[None, :]
        isel = jnp.sum(jnp.where(sel, cat_i, 0), axis=0)
        d_rows.append(m[None, :])
        i_rows.append(isel[None, :])
        if t + 1 < k:
            cat_d = jnp.where(sel, _HUGE, cat_d)

    d_out[:, :] = jnp.concatenate(d_rows, axis=0)
    i_out[:, :] = jnp.concatenate(i_rows, axis=0)


@functools.partial(jax.jit, static_argnames=("k", "tq", "tr", "dim",
                                             "precision"))
def _knn_planar(qp, rp, *, k, tq, tr, dim, precision=None):
    n_pad = qp.shape[1]
    m_pad = rp.shape[1]
    grid = (n_pad // tq, m_pad // tr)
    kern = functools.partial(_kernel, k=k, tq=tq, tr=tr, dim=dim,
                             precision=precision)
    d, i = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tq), lambda i_, j_: (0, i_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tr), lambda i_, j_: (0, j_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, tq), lambda i_, j_: (0, i_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tq), lambda i_, j_: (0, i_),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * (dim + (2 if k == 1 else 3 * k)),
            bytes_accessed=8 * (n_pad + m_pad) * 4 + 2 * k * n_pad * 4,
            transcendentals=0,
        ),
    )(qp, rp)
    return d, i


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def knn_pallas(
    query: jax.Array,  # f32[N, D]
    ref: jax.Array,  # f32[M, D]
    query_mask: Optional[jax.Array] = None,
    ref_mask: Optional[jax.Array] = None,
    k: int = 1,
    max_radius: Optional[float] = None,
    tq: int = 1024,
    tr: int = 1024,  # measured best on v5e (flat 67-80 ms across tiles at
                     # 49k x 164k; see baselines/speed_of_light.py)
    precision=None,  # None = HIGHEST (exact f32); lax.Precision.DEFAULT
                     # trades exactness for ~3x (diagnostics only)
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ``ops.nn.knn`` running as a Pallas kernel.

    Returns ``(dists2 f32[N, k], idx i32[N, k])``, inf/-1 for no-match.
    """
    n, dim = query.shape
    m = ref.shape[0]
    n_pad = _round_up(max(n, tq), tq)
    m_pad = _round_up(max(m, tr), tr)
    qp = planarize(query, query_mask, n_pad)
    rp = planarize(ref, ref_mask, m_pad)
    s, i = _knn_planar(qp, rp, k=k, tq=tq, tr=tr, dim=dim,
                       precision=precision)
    # the kernel returns SHIFTED distances s = d2 - |q|^2 (see _kernel);
    # add q2 back, clamp, and resolve invalid-ref sentinels here — O(N*k)
    # work instead of per-pair
    s = s[:, :n].T  # [N, k]
    i = i[:, :n].T
    q2 = jnp.sum(query * query, axis=1)  # [N]
    # invalid refs carry |r|^2 ~ 1e18 >> any real shifted distance (real
    # |s| < ~1e10 for coordinates up to 1e4); invalid QUERIES make s very
    # negative but are masked by query_mask below
    valid = (s < 1.0e15) & (i >= 0)
    d = jnp.maximum(s + q2[:, None], 0.0)
    if max_radius is not None:
        valid = valid & (d <= max_radius * max_radius)
    if query_mask is not None:
        valid = valid & query_mask[:, None]
    d = jnp.where(valid, d, jnp.inf)
    i = jnp.where(valid, i, -1)
    return d, i
