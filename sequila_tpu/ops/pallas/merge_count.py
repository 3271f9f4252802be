"""Packed-u32 Pallas merge-count: BITS count(*) over pre-sorted cached views.

The co-sort count kernel (ops/interval_join.py::counts_bits_fused) pays two
(n+m)-row multi-operand device sorts per query — ~40 ms each at whole-genome
scale.  But both join sides are registered tables whose (key, value)-sorted
views are cached (models/table.py::sorted_interval_view), so the only
per-query work fundamentally required is a *merge* of two sorted sequences.

This module does that merge with a Pallas TPU kernel:

- Every (key, value) tuple is packed into ONE uint32 whose unsigned order
  equals the lexicographic order: per merged key j the value range observed
  across both sides (shifted by the planner's ±lit deltas) is compacted to
  ``[base_j, base_j + span_j)`` with ``base`` the exclusive prefix sum of
  spans.  Feasible whenever the summed spans fit 32 bits — the human genome
  (~3.1 Gbp across contigs) fits with room to spare.  Per-key extrema come
  from cached per-table statistics (Table.per_key_minmax).
- The *smaller* (build) side streams through the grid as sorted query
  blocks; each block's candidate window in the sorted probe array is
  precomputed on the host from cached int64 composites (tiny — one
  np.searchsorted per block boundary) and fed as scalar-prefetch operands.
- Per chunk: one u32 slab DMA double-buffered ahead of a BLOCK x CHUNK
  broadcast compare on the VPU.  Total compare work is
  n x (window + CHUNK) ~ 3 G lane-ops for 2.4M x 7.7M — single-digit ms,
  vs ~80 ms for the two co-sorts.

Count identity (BITS, Layer & Quinlan 2012 — reference
sequila/sequila-core/src/physical_planner/joins/interval_join.rs:1098-1143
uses per-tree counting; the algebra here is the two-rank difference):

    total = sum_q #{b: start_b <= qe}  -  sum_q #{b: end_b < qs}
          = sum_b [ #{q: qs <= end_b }  -  #{q: qe < start_b } ]

so both passes rank *build* tuples inside a sorted *probe* array (qs-sorted
for the first term, qe-sorted for the second), and padding sentinels
(build PAD = 0xFFFFFFFF, probe PAD = 0xFFFFFFFE) contribute identically to
both passes and cancel.  Exact for non-degenerate probes and non-inverted
builds — the operator routes those away via cached min-diff statistics,
exactly like the co-sort fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256
CHUNK = 512

PADV = np.int32(2**31 - 1)
_BUILD_PAD = np.uint32(0xFFFFFFFF)
_PROBE_PAD = np.uint32(0xFFFFFFFE)
# headroom: both sentinels must sort above every real packed value
_SPAN_LIMIT = 2**32 - 2
# the limb reduction needs 64-bucket rank partials to stay int32-exact:
# ranks are bounded by the padded probe length, so 64 * m_pad < 2^31
_M_LIMIT = 1 << 25


def _make_kernel(strict: bool):
    def kernel(c_lo_ref, n_chunks_ref, a_ref, q_ref, out_ref, scratch, sems):
        g = pl.program_id(0)
        c0 = c_lo_ref[g]
        nch = n_chunks_ref[g]
        q = q_ref[0]  # [BLOCK] u32 sorted queries

        def get_dma(slot, c):
            # slab rides as (1, CHUNK): a leading buffer-index dim keeps the
            # scratch slice off the tiled (sublane, lane) dims of VMEM
            return pltpu.make_async_copy(
                a_ref.at[:, pl.ds((c0 + c) * CHUNK, CHUNK)],
                scratch.at[slot],
                sems.at[slot],
            )

        @pl.when(nch > 0)
        def _():
            get_dma(0, 0).start()

        def body(c, counts):
            slot = c % 2

            @pl.when(c + 1 < nch)
            def _():
                get_dma((c + 1) % 2, c + 1).start()

            get_dma(slot, c).wait()
            a = scratch[slot, 0]  # [CHUNK] u32
            if strict:
                less = a[None, :] < q[:, None]
            else:
                less = a[None, :] <= q[:, None]
            return counts + jnp.sum(less, axis=1, dtype=jnp.int32)

        counts = jax.lax.fori_loop(0, nch, body, jnp.zeros((BLOCK,), jnp.int32))
        # ranks below chunk c0 are a closed-form offset: the window
        # precomputation guarantees every element of chunks < c0 compares
        # below (or equal, per side) all of this block's queries
        out_ref[0] = counts + c0 * CHUNK

    return kernel


@functools.partial(jax.jit, static_argnames=("strict",))
def _merge_rank_sorted(a, q, c_lo, n_chunks, *, strict: bool):
    """Rank each sorted u32 query in the sorted u32 table ``a``.

    strict=True  -> #{a <  q}
    strict=False -> #{a <= q}
    Windows [c_lo, c_lo + n_chunks) per BLOCK of queries must cover every
    chunk whose elements can compare both ways against the block.
    """
    n = q.shape[0]
    grid = n // BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
            pl.BlockSpec((1, BLOCK), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK), lambda g, *_: (0, g), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, CHUNK), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(strict),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(c_lo, n_chunks, a[None, :], q[None, :])[0]


def _limb_partials(ranks):
    """Exact tiny-output reduction of a rank vector (values < 2^24).

    64-bucket partials stay below 2^30; their four 8-bit limb columns each
    sum below 2^26 over any practical bucket count — four int32 scalars the
    host recombines in int64.  One 16-int fetch replaces a megabyte of
    per-bucket partials over the 25-33 ms tunnel."""
    p = ranks.reshape(-1, 64).sum(axis=1)
    return jnp.stack([((p >> (8 * i)) & 0xFF).sum() for i in range(4)])


def limbs_to_total(limbs: np.ndarray) -> int:
    return int(sum(int(limbs[i]) << (8 * i) for i in range(4)))


@jax.jit
def _pack_view(k, v, c_tab, pad_sentinel):
    """Monotone (key, value) -> u32 packing of a cached sorted view.

    ``c_tab[k] = (base_k - lo_k + delta) mod 2^32`` folds the segment base,
    the per-key minimum and the planner's ±lit delta into one gather; the
    mod-2^32 add is exact because every true packed value fits 32 bits
    (the caller verified the span).  PAD rows map to the side's sentinel."""
    safe = jnp.clip(k, 0, c_tab.shape[0] - 1)
    packed = c_tab[safe] + v.astype(jnp.uint32)
    return jnp.where(k == PADV, pad_sentinel, packed)


@jax.jit
def merge_count_passes(
    bqs_k, bqs_v, c_bqs,  # build sorted by (k, end):   queries of pass 1
    pqs_k, pqs_v, c_pqs,  # probe sorted by (k, qs):    table of pass 1
    bqe_k, bqe_v, c_bqe,  # build sorted by (k, start): queries of pass 2
    pqe_k, pqe_v, c_pqe,  # probe sorted by (k, qe):    table of pass 2
    c_lo1, n_ch1, c_lo2, n_ch2,
):
    """Both BITS rank passes + limb reductions in one device program.

    Returns 8 int32s: pass-1 limbs (sum over build of #{qs <= end_b}) then
    pass-2 limbs (sum over build of #{qe < start_b}); the host combines
    ``total = limbs1 - limbs2`` in int64.  Build PAD rows rank m_pad in
    both passes and cancel; probe PAD slots (sentinel below the build
    sentinel, above every real pack) are counted by neither pass.
    """
    q1 = _pack_view(bqs_k, bqs_v, c_bqs, _BUILD_PAD)
    a1 = _pack_view(pqs_k, pqs_v, c_pqs, _PROBE_PAD)
    q2 = _pack_view(bqe_k, bqe_v, c_bqe, _BUILD_PAD)
    a2 = _pack_view(pqe_k, pqe_v, c_pqe, _PROBE_PAD)
    r1 = _merge_rank_sorted(a1, q1, c_lo1, n_ch1, strict=False)
    r2 = _merge_rank_sorted(a2, q2, c_lo2, n_ch2, strict=True)
    return jnp.concatenate([_limb_partials(r1), _limb_partials(r2)])


@jax.jit
def merge_probe_count_passes(
    pqe_k, pqe_v, c_qe,  # probe sorted by (k, qe):    queries of pass A
    bst_k, bst_v, c_bs,  # build sorted by (k, start): table of pass A
    pqs_k, pqs_v, c_qs,  # probe sorted by (k, qs):    queries of pass B
    ben_k, ben_v, c_be,  # build sorted by (k, end):   table of pass B
    ord_qe, ord_qs,      # sorted-view orders, PAD slots = m_pad (dropped)
    c_loA, n_chA, c_loB, n_chB,
):
    """Per-probe BITS counts over cached sorted views (CountOverlaps).

    The count(*) passes above rank *build* tuples in the sorted probe
    arrays (summing over build); the per-probe direction ranks *probe*
    tuples in the sorted build arrays with the SAME four packings:

        count_q = #{b: start_b <= qe_q} - #{b: end_b < qs_q}

    Build rows of smaller joint keys land in both terms (their packed
    start AND end sit in strictly lower u32 segments) and cancel; larger
    keys land in neither; same-key rows reduce to exact BITS.  Probe PAD
    queries rank the whole table in both passes and are sliced away; the
    build side's PAD rows pack to the table sentinel, above every real
    query, so they count in neither term.  Per-pass ranks scatter back to
    original probe row order through the views' permutations (disjoint
    slots — each real probe row appears exactly once per view; PAD slots
    carry the out-of-bounds index m_pad and drop).  Returns the padded
    vector — the caller slices [:num_rows] — so the compiled program is
    shared per capacity bucket, not per exact table size.
    """
    qA = _pack_view(pqe_k, pqe_v, c_qe, _BUILD_PAD)
    aA = _pack_view(bst_k, bst_v, c_bs, _PROBE_PAD)
    qB = _pack_view(pqs_k, pqs_v, c_qs, _BUILD_PAD)
    aB = _pack_view(ben_k, ben_v, c_be, _PROBE_PAD)
    rA = _merge_rank_sorted(aA, qA, c_loA, n_chA, strict=False)
    rB = _merge_rank_sorted(aB, qB, c_loB, n_chB, strict=True)
    m_pad = pqe_k.shape[0]
    # unique_indices is safe despite every PAD slot carrying the same
    # out-of-bounds index m_pad: mode='drop' discards those updates
    # BEFORE the scatter executes (XLA clamps/drops out-of-range indices
    # at lowering), so the promise only has to hold for the in-range
    # indices — the views' permutations, each real row exactly once.
    cA = jnp.zeros((m_pad,), jnp.int32).at[ord_qe].set(
        rA, mode="drop", unique_indices=True
    )
    cB = jnp.zeros((m_pad,), jnp.int32).at[ord_qs].set(
        rB, mode="drop", unique_indices=True
    )
    return cA - cB


def _joint_domain(remap_b, remap_q, nkeys, mn_b, mx_b, d_b, mn_q, mx_q, d_q):
    """Per-joint-key (lo, base) of one packed u32 domain spanning both
    sides' (shifted) value ranges, or None when the summed spans exceed
    the 32-bit budget."""
    lo = np.full(nkeys, np.iinfo(np.int64).max, np.int64)
    hi = np.full(nkeys, np.iinfo(np.int64).min, np.int64)
    np.minimum.at(lo, remap_b, mn_b + d_b)
    np.maximum.at(hi, remap_b, mx_b + d_b)
    np.minimum.at(lo, remap_q, mn_q + d_q)
    np.maximum.at(hi, remap_q, mx_q + d_q)
    span = np.maximum(hi - lo + 1, 0)  # keys absent from both -> 0
    total = int(span.sum())
    if total > _SPAN_LIMIT:
        return None
    base = np.zeros(nkeys, np.int64)
    np.cumsum(span[:-1], out=base[1:])
    return lo, base


def _c_tab(remap, lo, base, d):
    """Per-row u32 add table folding segment base, per-key minimum and the
    planner delta into one gather (mod-2^32 exact; see _pack_view)."""
    j = remap.astype(np.int64)
    return ((base[j] - lo[j] + d) & 0xFFFFFFFF).astype(np.uint32)


def plan_packing(remap_b, remap_q, views, deltas):
    """Per-key u32 segment bases for both passes, or None if infeasible.

    ``views`` = ((bmin_s, bmax_s), (bmin_e, bmax_e), (qmin_s, qmax_s),
    (qmin_e, qmax_e)) int64 per-LOCAL-code extrema (Table.per_key_minmax);
    ``deltas`` = (d_bs, d_be, d_qs, d_qe).  Returns per-side local-code
    C tables (np.uint32) for the four packed views, or None when a pass's
    summed spans exceed the 32-bit budget.
    """
    (bs_mn, bs_mx), (be_mn, be_mx), (qs_mn, qs_mx), (qe_mn, qe_mx) = views
    d_bs, d_be, d_qs, d_qe = deltas
    nkeys = int(max(remap_b.max(initial=-1), remap_q.max(initial=-1))) + 1

    # pass 1 packs (end_b + d_be) against (qs + d_qs)
    p1 = _joint_domain(remap_b, remap_q, nkeys, be_mn, be_mx, d_be, qs_mn, qs_mx, d_qs)
    # pass 2 packs (start_b + d_bs) against (qe + d_qe)
    p2 = _joint_domain(remap_b, remap_q, nkeys, bs_mn, bs_mx, d_bs, qe_mn, qe_mx, d_qe)
    if p1 is None or p2 is None:
        return None
    lo1, base1 = p1
    lo2, base2 = p2

    return (
        _c_tab(remap_b, lo1, base1, d_be),  # build (k, end)
        _c_tab(remap_q, lo1, base1, d_qs),  # probe (k, qs)
        _c_tab(remap_b, lo2, base2, d_bs),  # build (k, start)
        _c_tab(remap_q, lo2, base2, d_qe),  # probe (k, qe)
    )


@jax.jit
def merge_verb_rank4(
    pqe_k, pqe_v, pqs_k, pqs_v,  # probe views: (k, qe) and (k, qs)
    bst_k, bst_v, ben_k, ben_v,  # build views: (k, start) and (k, end)
    c_qe2, c_bs2,  # domain 2 (bs, qe):  ub_s = #{start_b <= qe}
    c_qs1, c_be1,  # domain 1 (be, qs):  lb_e = #{end_b  <  qs}
    c_qe3, c_be3,  # domain 3 (be, qe):  ub_e = #{end_b  <= qe}
    c_qs4, c_bs4,  # domain 4 (bs, qs):  lb_s = #{start_b <  qs}
    ord_qe, ord_qs,
    w_ubs_lo, w_ubs_n, w_lbe_lo, w_lbe_n,
    w_ube_lo, w_ube_n, w_lbs_lo, w_lbs_n,
):
    """Four per-probe rank passes for the coverage decomposition
    (ops/genomic.py::coverage's level-free algebra) over cached sorted
    views — no device sort.  Cross-key rows land in matched pass pairs
    and cancel in every consumer expression (total = ub_s - lb_e,
    nA = ub_e - lb_e, nB = ub_s - lb_s, and the prefix-sum differences
    esum[ub_e]-esum[lb_e] / psum[ub_s]-psum[lb_s] read same-key rank
    ranges by construction).  Returns (4, m_pad) int32 in probe row
    order: [ub_s, lb_e, ub_e, lb_s]; the caller slices [:, :num_rows].
    """
    ub_s = _merge_rank_sorted(
        _pack_view(bst_k, bst_v, c_bs2, _PROBE_PAD),
        _pack_view(pqe_k, pqe_v, c_qe2, _BUILD_PAD),
        w_ubs_lo, w_ubs_n, strict=False,
    )
    lb_e = _merge_rank_sorted(
        _pack_view(ben_k, ben_v, c_be1, _PROBE_PAD),
        _pack_view(pqs_k, pqs_v, c_qs1, _BUILD_PAD),
        w_lbe_lo, w_lbe_n, strict=True,
    )
    ub_e = _merge_rank_sorted(
        _pack_view(ben_k, ben_v, c_be3, _PROBE_PAD),
        _pack_view(pqe_k, pqe_v, c_qe3, _BUILD_PAD),
        w_ube_lo, w_ube_n, strict=False,
    )
    lb_s = _merge_rank_sorted(
        _pack_view(bst_k, bst_v, c_bs4, _PROBE_PAD),
        _pack_view(pqs_k, pqs_v, c_qs4, _BUILD_PAD),
        w_lbs_lo, w_lbs_n, strict=True,
    )
    m_pad = pqe_k.shape[0]

    def scat(r, o):
        # PAD slots share index m_pad but mode='drop' discards them before
        # the scatter, so unique_indices holds for what actually lands
        # (see merge_probe_count_passes)
        return jnp.zeros((m_pad,), jnp.int32).at[o].set(
            r, mode="drop", unique_indices=True
        )

    return jnp.stack([
        scat(ub_s, ord_qe), scat(lb_e, ord_qs),
        scat(ub_e, ord_qe), scat(lb_s, ord_qs),
    ])


def plan_verb_ranks(build, probe, cols_b, cols_q, *, want4: bool):
    """Device argument tuple for the verb-layer merge rank passes.

    ``cols_*`` are (key, start, end) column INDICES of registered Tables
    (build = the counted side, probe = the enriched side; no ±deltas at
    the verb layer).  want4=False returns ``merge_probe_count_passes``
    args (count_overlaps); want4=True returns ``merge_verb_rank4`` args
    (coverage).  None when the preconditions or the 32-bit span budget
    disqualify the packing — callers fall back to the co-sort kernels.
    """
    from sequila_tpu.models.table import merge_dictionaries

    kb, s_b, e_b = cols_b
    kq, s_q, e_q = cols_q
    if build.num_rows == 0 or probe.num_rows == 0:
        return None
    if build.column(kb).null_count or probe.column(kq).null_count:
        return None
    # degenerate probes / inverted builds break the BITS rank algebra
    if probe.min_i32_diff(e_q, s_q) < 0 or build.min_i32_diff(e_b, s_b) < 0:
        return None
    _, bvals, _ = build.dict_codes(kb)
    _, qvals, _ = probe.dict_codes(kq)
    if len(bvals) and len(qvals) and type(bvals[0]) is not type(qvals[0]):
        return None
    remap_b, remap_q = merge_dictionaries(bvals, qvals)
    nkeys = int(max(remap_b.max(initial=-1), remap_q.max(initial=-1))) + 1
    bs_mm = build.per_key_minmax(kb, s_b)
    be_mm = build.per_key_minmax(kb, e_b)
    qs_mm = probe.per_key_minmax(kq, s_q)
    qe_mm = probe.per_key_minmax(kq, e_q)

    def dom(b_mm, q_mm):
        return _joint_domain(
            remap_b, remap_q, nkeys, b_mm[0], b_mm[1], 0, q_mm[0], q_mm[1], 0
        )

    d2 = dom(bs_mm, qe_mm)
    d1 = dom(be_mm, qs_mm)
    if d1 is None or d2 is None:
        return None
    c_qe2 = _c_tab(remap_q, *d2, 0)
    c_bs2 = _c_tab(remap_b, *d2, 0)
    c_qs1 = _c_tab(remap_q, *d1, 0)
    c_be1 = _c_tab(remap_b, *d1, 0)

    pqe_k, pqe_v, pqe_kh, pqe_vh, _ = probe.sorted_interval_view(kq, e_q)
    pqs_k, pqs_v, pqs_kh, pqs_vh, _ = probe.sorted_interval_view(kq, s_q)
    bst_k, bst_v, _, _, _ = build.sorted_interval_view(kb, s_b)
    ben_k, ben_v, _, _, _ = build.sorted_interval_view(kb, e_b)
    comp_bs = build.sorted_view_composite(kb, s_b)
    comp_be = build.sorted_view_composite(kb, e_b)
    w_ubs = host_windows_joint(pqe_kh, pqe_vh, remap_q, remap_b, 0, 0, comp_bs)
    w_lbe = host_windows_joint(pqs_kh, pqs_vh, remap_q, remap_b, 0, 0, comp_be)

    cap = int(pqe_k.shape[0])

    def pad_order(order):
        out = np.full(cap, cap, np.int32)
        out[: len(order)] = order
        return out

    ord_qe = jnp.asarray(pad_order(probe.sorted_interval_order(kq, e_q)))
    ord_qs = jnp.asarray(pad_order(probe.sorted_interval_order(kq, s_q)))

    if not want4:
        return (
            pqe_k, pqe_v, jnp.asarray(c_qe2),
            bst_k, bst_v, jnp.asarray(c_bs2),
            pqs_k, pqs_v, jnp.asarray(c_qs1),
            ben_k, ben_v, jnp.asarray(c_be1),
            ord_qe, ord_qs,
            jnp.asarray(w_ubs[0]), jnp.asarray(w_ubs[1]),
            jnp.asarray(w_lbe[0]), jnp.asarray(w_lbe[1]),
        )

    d3 = dom(be_mm, qe_mm)
    d4 = dom(bs_mm, qs_mm)
    if d3 is None or d4 is None:
        return None
    c_qe3 = _c_tab(remap_q, *d3, 0)
    c_be3 = _c_tab(remap_b, *d3, 0)
    c_qs4 = _c_tab(remap_q, *d4, 0)
    c_bs4 = _c_tab(remap_b, *d4, 0)
    w_ube = host_windows_joint(pqe_kh, pqe_vh, remap_q, remap_b, 0, 0, comp_be)
    w_lbs = host_windows_joint(pqs_kh, pqs_vh, remap_q, remap_b, 0, 0, comp_bs)
    return (
        pqe_k, pqe_v, pqs_k, pqs_v,
        bst_k, bst_v, ben_k, ben_v,
        jnp.asarray(c_qe2), jnp.asarray(c_bs2),
        jnp.asarray(c_qs1), jnp.asarray(c_be1),
        jnp.asarray(c_qe3), jnp.asarray(c_be3),
        jnp.asarray(c_qs4), jnp.asarray(c_bs4),
        ord_qe, ord_qs,
        jnp.asarray(w_ubs[0]), jnp.asarray(w_ubs[1]),
        jnp.asarray(w_lbe[0]), jnp.asarray(w_lbe[1]),
        jnp.asarray(w_ube[0]), jnp.asarray(w_ube[1]),
        jnp.asarray(w_lbs[0]), jnp.asarray(w_lbs[1]),
    )


def coverage_from_ranks(ranks, qs, qe, psum, esum):
    """Host int64 finish of the coverage decomposition over merge ranks.

    ``ranks`` = (4, m) int32 [ub_s, lb_e, ub_e, lb_s] in probe row order
    (merge_verb_rank4); ``psum``/``esum`` = int64 exclusive prefix sums of
    the build's (k,start)-view starts / (k,end)-view ends.  Same algebra
    as ops/genomic.py::coverage's level-free branch."""
    ub_s = ranks[0].astype(np.int64)
    lb_e = ranks[1].astype(np.int64)
    ub_e = ranks[2].astype(np.int64)
    lb_s = ranks[3].astype(np.int64)
    total = ub_s - lb_e
    nA = ub_e - lb_e
    nB = ub_s - lb_s
    sumA_end = esum[ub_e] - esum[lb_e]
    sumB_start = psum[ub_s] - psum[lb_s]
    qe64 = np.asarray(qe).astype(np.int64)
    qs64 = np.asarray(qs).astype(np.int64)
    sum_min_end = sumA_end + qe64 * (total - nA)
    sum_max_start = sumB_start + qs64 * (total - nB)
    return total, sum_min_end - sum_max_start


def host_windows_joint(bk_h, bv_h, remap_b, remap_q, d_b, d_q, probe_comp):
    """Chunk windows for one pass, computed on the host in int64.

    Build block boundaries (rows 0 and BLOCK-1 of each block of the cached
    sorted build view) are transformed into the probe's LOCAL composite
    space — joint key K maps to the probe-local code range via the sorted
    ``remap_q`` — then ranked in the cached probe composite with two
    np.searchsorted calls.  Keys absent from the probe map to the local
    insertion code with value -inf, which ranks identically on both sides.
    """
    nq = len(remap_q)

    def bound_comp(kb, vb):
        pad = kb == PADV
        kj = remap_b[np.clip(kb, 0, max(len(remap_b) - 1, 0))]
        j = np.searchsorted(remap_q, kj)
        exact = (j < nq) & (remap_q[np.clip(j, 0, max(nq - 1, 0))] == kj)
        v64 = vb.astype(np.int64) + (d_b - d_q) + (1 << 31) + 2
        comp = j.astype(np.int64) * (1 << 33) + np.where(exact, v64, 0)
        return np.where(pad, np.int64(1) << 62, comp)

    lo = np.searchsorted(probe_comp, bound_comp(bk_h[0::BLOCK], bv_h[0::BLOCK]), "left")
    hi = np.searchsorted(
        probe_comp, bound_comp(bk_h[BLOCK - 1 :: BLOCK], bv_h[BLOCK - 1 :: BLOCK]),
        "right",
    )
    c_lo = (lo // CHUNK).astype(np.int32)
    c_hi = (-((-hi) // CHUNK)).astype(np.int32)
    return c_lo, np.maximum(c_hi - c_lo, 0).astype(np.int32)


# ---------------------------------------------------------------------------
# Merge-based level bounds: pair emission without device sorts
# ---------------------------------------------------------------------------


def plan_level_bounds(index, probe, r_key, qs_cd, qe_cd, bs_cd, be_cd,
                      remap_b, remap_q, views):
    """Per-level merge-rank plan for emission bounds, or None.

    Replaces the co-sort bounds pass of the device materialize path
    (ops/interval_join._bounds_sort — two (n + L*m)-row multi-operand
    device sorts; role-equivalent of the reference's per-row emission hot
    loop, reference joins/interval_join.rs:1580-1640) with 2L sort-free
    merge-rank kernels: each level slice
    of the build index is sorted by (key, start) AND — by the monotone-
    end level invariant — simultaneously by (key, end), so both bounds of
    every level rank the cached sorted probe views in an already-sorted
    packed-u32 array.  Exact for every query shape (degenerate stabbing
    probes, inverted build rows): the level-run identity needs no BITS
    subset argument, so this route is WIDER than the merge count path.

    ``index``: IntervalIndex over JOINT key codes, with the planner's
    ±lit bound deltas already applied to its stored starts/ends (the
    exec layer builds it that way) — so the index-side C tables carry
    delta 0 while the domains span the raw extrema + delta.  ``views`` =
    per-LOCAL-code extrema of the four raw columns (Table.per_key_minmax
    order: bs, be, qs, qe); ``*_cd`` = (column index, delta).  Returns an
    opaque plan consumed by ``merge_level_bounds``; None when the 32-bit
    span budget or the plan shape disqualifies packing.
    """
    nkeys = int(max(remap_b.max(initial=-1), remap_q.max(initial=-1))) + 1
    if nkeys <= 0 or index.n_rows == 0:
        return None
    bs_mm, be_mm, qs_mm, qe_mm = views
    d_bs, d_be, d_qs, d_qe = bs_cd[1], be_cd[1], qs_cd[1], qe_cd[1]
    # domain 2 packs build starts against probe ends; domain 1 packs
    # build ends against probe starts — same pairing as the count path
    d2 = _joint_domain(
        remap_b, remap_q, nkeys, bs_mm[0], bs_mm[1], d_bs, qe_mm[0], qe_mm[1], d_qe
    )
    d1 = _joint_domain(
        remap_b, remap_q, nkeys, be_mm[0], be_mm[1], d_be, qs_mm[0], qs_mm[1], d_qs
    )
    if d1 is None or d2 is None:
        return None
    ident = np.arange(nkeys, dtype=np.int32)
    # index level arrays store raw+delta values -> joint-key C tables with
    # delta 0; probe views store raw values -> local-code C tables with
    # the planner delta folded in
    c_bj2 = jnp.asarray(_c_tab(ident, *d2, 0))
    c_bj1 = jnp.asarray(_c_tab(ident, *d1, 0))
    c_qe = jnp.asarray(_c_tab(remap_q, *d2, d_qe))
    c_qs = jnp.asarray(_c_tab(remap_q, *d1, d_qs))

    pqe_k, pqe_v, pqe_kh, pqe_vh, _ = probe.sorted_interval_view(r_key, qe_cd[0])
    pqs_k, pqs_v, pqs_kh, pqs_vh, _ = probe.sorted_interval_view(r_key, qs_cd[0])
    m_pad = int(pqe_k.shape[0])
    if m_pad != int(pqs_k.shape[0]):
        return None

    def pad_order(order):
        out = np.full(m_pad, m_pad, np.int32)  # PAD slots scatter-drop
        out[: len(order)] = order
        return out

    ord_qe = jnp.asarray(pad_order(probe.sorted_interval_order(r_key, qe_cd[0])))
    ord_qs = jnp.asarray(pad_order(probe.sorted_interval_order(r_key, qs_cd[0])))

    levels = []
    for lv in range(index.num_levels):
        off = index.level_offsets[lv]
        pad = index.level_pad[lv]
        if index.level_sizes[lv] == 0:
            levels.append(None)
            continue
        cap = -(-pad // CHUNK) * CHUNK
        kh = np.full(cap, PADV, np.int32)
        sh = np.full(cap, PADV, np.int32)
        eh = np.full(cap, PADV, np.int32)
        kh[:pad] = index.keys_host[off : off + pad]
        sh[:pad] = index.starts_host[off : off + pad]
        eh[:pad] = index.ends_host[off : off + pad]
        # stored values are pre-shifted: table delta 0 in the windows
        w_ub = host_windows_joint(
            pqe_kh, pqe_vh, remap_q, ident, d_qe, 0, view_composite(kh, sh)
        )
        w_lb = host_windows_joint(
            pqs_kh, pqs_vh, remap_q, ident, d_qs, 0, view_composite(kh, eh)
        )
        levels.append((
            jnp.asarray(kh), jnp.asarray(sh), jnp.asarray(eh),
            jnp.asarray(w_ub[0]), jnp.asarray(w_ub[1]),
            jnp.asarray(w_lb[0]), jnp.asarray(w_lb[1]),
        ))
    return (
        levels, pqe_k, pqe_v, pqs_k, pqs_v, c_bj2, c_bj1, c_qe, c_qs,
        ord_qe, ord_qs, m_pad,
    )


@jax.jit
def _level_rank_pair(k_l, s_l, e_l, pqe_k, pqe_v, pqs_k, pqs_v,
                     c_bj2, c_bj1, c_qe, c_qs,
                     w_ub_lo, w_ub_n, w_lb_lo, w_lb_n):
    """One level's (ub, lb) rank pair over the packed domains."""
    a_s = _pack_view(k_l, s_l, c_bj2, _PROBE_PAD)
    q_e = _pack_view(pqe_k, pqe_v, c_qe, _BUILD_PAD)
    a_e = _pack_view(k_l, e_l, c_bj1, _PROBE_PAD)
    q_s = _pack_view(pqs_k, pqs_v, c_qs, _BUILD_PAD)
    ub = _merge_rank_sorted(a_s, q_e, w_ub_lo, w_ub_n, strict=False)
    lb = _merge_rank_sorted(a_e, q_s, w_lb_lo, w_lb_n, strict=True)
    return ub, lb


@jax.jit
def _scatter_bounds(ub_stack, lb_stack, ord_qe, ord_qs):
    """Scatter per-pass sorted-order ranks back to probe row order.

    PAD slots of the orders carry the out-of-bounds index m_pad and drop;
    every real probe row appears exactly once per view, so the scatter
    indices are disjoint (mode='drop' discards only the PAD slots)."""
    L, m_pad = ub_stack.shape
    z = jnp.zeros((m_pad, L), jnp.int32)
    ub = z.at[ord_qe].set(ub_stack.T, mode="drop", unique_indices=True)
    lb = z.at[ord_qs].set(lb_stack.T, mode="drop", unique_indices=True)
    return lb.T, ub.T


def merge_level_bounds(plan):
    """Run the plan: per-level [lb, ub) emission bounds, [L, m_pad] int32
    in PROBE ROW order — drop-in for ops/interval_join.overlap_bounds."""
    (levels, pqe_k, pqe_v, pqs_k, pqs_v, c_bj2, c_bj1, c_qe, c_qs,
     ord_qe, ord_qs, m_pad) = plan
    ubs, lbs = [], []
    zero = None
    for lv in levels:
        if lv is None:
            if zero is None:
                zero = jnp.zeros((m_pad,), jnp.int32)
            ubs.append(zero)
            lbs.append(zero)
            continue
        k_l, s_l, e_l, w_ub_lo, w_ub_n, w_lb_lo, w_lb_n = lv
        ub, lb = _level_rank_pair(
            k_l, s_l, e_l, pqe_k, pqe_v, pqs_k, pqs_v,
            c_bj2, c_bj1, c_qe, c_qs, w_ub_lo, w_ub_n, w_lb_lo, w_lb_n,
        )
        ubs.append(ub)
        lbs.append(lb)
    return _scatter_bounds(jnp.stack(ubs), jnp.stack(lbs), ord_qe, ord_qs)


def view_composite(k_h: np.ndarray, v_h: np.ndarray) -> np.ndarray:
    """int64 composite of a cached sorted view: code * 2^33 + value + 2^31 + 2.

    The +2 headroom keeps absent-key boundary probes (value slot 0) strictly
    below every real entry of the same code.  PAD rows (code 2^31-1) map to
    an explicit 2^62 sentinel: their natural composite would overflow int64
    and wrap negative, breaking the array's sortedness."""
    comp = k_h.astype(np.int64) * (1 << 33) + (
        v_h.astype(np.int64) + (1 << 31) + 2
    )
    return np.where(k_h == PADV, np.int64(1) << 62, comp)
