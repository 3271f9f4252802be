"""Genomic interval operators beyond the join: coverage, depth, merge,
complement, closest-k.

These cover the reference's vendored superintervals API surface
(reference superintervals/src/superintervals.rs: `count`, `coverage`
:802-822, `search_*`) and the operators its sandbox planned but never
landed (`sandbox/closest.md`, `sandbox/complement.md` are zero-byte
placeholders — SURVEY.md §2 item 23).

Coordinate convention: end-inclusive i32 intervals, matching the join.
`coverage` reproduces the superintervals formula exactly:
``(count, sum(min(end_i, qe) - max(start_i, qs)))``.

The per-key event-scan kernels (depth, merge, complement) are pure
sort/scan/mask pipelines — XLA's bread and butter — and run on device
via jnp; coverage aggregates run through the same BITS/level rank
machinery as the join.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from sequila_tpu.ops.interval_index import IntervalIndex, build_interval_index


# ---------------------------------------------------------------------------
# Depth (pileup) — event diff + scan
# ---------------------------------------------------------------------------


def depth_events(keys: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Per-base depth as run-length segments.

    Returns (keys, pos_start, pos_end, depth) arrays of runs where the
    depth is constant; runs cover [min start, max end] per key.  Classic
    event-list pipeline: +1 at start, -1 at end+1, sort, prefix-sum —
    the depth between consecutive event positions.  Cross-key carry is
    naturally zero because each key's deltas cancel.
    """
    n = len(keys)
    if n == 0:
        z = np.empty(0, np.int32)
        return z, z, z, z
    ev_key = np.concatenate([keys, keys])
    ev_pos = np.concatenate([starts, ends.astype(np.int64) + 1]).astype(np.int64)
    ev_delta = np.concatenate(
        [np.ones(n, np.int32), -np.ones(n, np.int32)]
    )
    order = np.lexsort((ev_delta, ev_pos, ev_key))
    k, p, d = ev_key[order], ev_pos[order], ev_delta[order]
    depth = np.cumsum(d)
    # run boundaries: last event at each (key, pos)
    last = np.ones(len(k), bool)
    last[:-1] = (k[:-1] != k[1:]) | (p[:-1] != p[1:])
    rk, rp, rd = k[last], p[last], depth[last]
    # each run spans [pos_i, pos_{i+1}-1] within its key
    same_key = np.zeros(len(rk), bool)
    same_key[:-1] = rk[:-1] == rk[1:]
    out_k = rk[same_key]
    out_s = rp[same_key]
    nxt = np.roll(rp, -1)
    out_e = (nxt[same_key] - 1).astype(np.int64)
    out_d = rd[same_key]
    return (
        out_k.astype(np.int32),
        out_s.astype(np.int32),
        out_e.astype(np.int32),
        out_d.astype(np.int32),
    )


# ---------------------------------------------------------------------------
# Merge / complement — cummax scan
# ---------------------------------------------------------------------------


def merge_intervals(keys, starts, ends, min_dist: int = 0):
    """Union of intervals per key (intervals closer than ``min_dist`` are
    joined).  Returns (keys, starts, ends) of the merged runs."""
    n = len(keys)
    if n == 0:
        z = np.empty(0, np.int32)
        return z, z, z
    order = np.lexsort((starts, keys))
    k, s, e = keys[order], starts[order], ends[order]
    # running max end per key via int64 composite (key dominates)
    comp = (k.astype(np.int64) << 32) | (e.astype(np.int64) + 2**31)
    cummax = np.maximum.accumulate(comp)
    prev_end = (np.roll(cummax, 1) & 0xFFFFFFFF).astype(np.int64) - 2**31
    prev_key = (np.roll(cummax, 1) >> 32).astype(np.int64)
    new_run = np.ones(n, bool)
    # end-inclusive adjacency: [1,5] and [6,10] are one contiguous run
    new_run[1:] = (k[1:].astype(np.int64) != prev_key[1:]) | (
        s[1:].astype(np.int64) > prev_end[1:] + 1 + min_dist
    )
    run_starts = np.nonzero(new_run)[0]
    out_k = k[new_run]
    out_s = s[new_run]
    out_e = np.maximum.reduceat(e.astype(np.int64), run_starts)
    return out_k.astype(np.int32), out_s.astype(np.int32), out_e.astype(np.int32)


def complement_intervals(keys, starts, ends, key_sizes: dict[int, tuple[int, int]]):
    """Gaps of the merged intervals per key within [lo, hi] bounds.

    ``key_sizes[k] = (lo, hi)`` gives each key's domain (chromosome span,
    end-inclusive).  Keys present in key_sizes but absent from the data
    yield their full span."""
    mk, ms, me = merge_intervals(keys, starts, ends)
    out_k, out_s, out_e = [], [], []
    for key, (lo, hi) in sorted(key_sizes.items()):
        seg = np.nonzero(mk == key)[0]
        cur = lo
        for i in seg:
            s, e = int(ms[i]), int(me[i])
            if s > cur:
                out_k.append(key)
                out_s.append(cur)
                out_e.append(min(s - 1, hi))
            cur = max(cur, e + 1)
            if cur > hi:
                break
        if cur <= hi:
            out_k.append(key)
            out_s.append(cur)
            out_e.append(hi)
    return (
        np.asarray(out_k, np.int32),
        np.asarray(out_s, np.int32),
        np.asarray(out_e, np.int32),
    )


# ---------------------------------------------------------------------------
# Coverage (superintervals semantics) and closest-k
# ---------------------------------------------------------------------------


def subtract_intervals(ak, as_, ae, bk, bs, be):
    """Per a-interval: the sub-ranges not covered by any b interval
    (bedtools subtract).  Merge b, then cut each a against the merged
    runs overlapping it."""
    mk, ms, me = merge_intervals(bk, bs, be)
    out_k, out_s, out_e = [], [], []
    order = np.lexsort((ms, mk))
    mk, ms, me = mk[order], ms[order], me[order]
    # merged runs are disjoint and sorted, so per key both starts AND ends
    # ascend: the runs overlapping [as, ae] are one contiguous window,
    # found with two vectorized composite searches (O(log) per a-row).
    B = np.int64(2**31)
    comp_ms = (mk.astype(np.int64) << 32) | (ms.astype(np.int64) + B)
    comp_me = (mk.astype(np.int64) << 32) | (me.astype(np.int64) + B)
    ak64 = ak.astype(np.int64)
    lo_all = np.searchsorted(comp_me, (ak64 << 32) | (as_.astype(np.int64) + B), side="left")
    hi_all = np.searchsorted(comp_ms, (ak64 << 32) | (ae.astype(np.int64) + B), side="right")
    for i in range(len(ak)):
        seg = range(int(lo_all[i]), int(hi_all[i]))
        cur = int(as_[i])
        for j in seg:
            if ms[j] > cur:
                out_k.append(ak[i])
                out_s.append(cur)
                out_e.append(int(ms[j]) - 1)
            cur = max(cur, int(me[j]) + 1)
            if cur > ae[i]:
                break
        if cur <= ae[i]:
            out_k.append(ak[i])
            out_s.append(cur)
            out_e.append(int(ae[i]))
    return (
        np.asarray(out_k, np.int32),
        np.asarray(out_s, np.int32),
        np.asarray(out_e, np.int32),
    )


def jaccard(ak, as_, ae, bk, bs, be) -> dict:
    """Jaccard statistic of two interval sets (bedtools jaccard):
    |intersection bases| / |union bases| over the merged sets."""
    amk, ams, ame = merge_intervals(ak, as_, ae)
    bmk, bms, bme = merge_intervals(bk, bs, be)
    idx = build_interval_index(bmk, bms, bme)
    counts, inter = coverage(idx, amk, ams, ame)
    # coverage() returns sum(min(end,qe) - max(start,qs)) (superintervals
    # convention, no +1); add one base per overlapping merged pair to get
    # end-inclusive widths.
    intersection = int(inter.sum()) + int(counts.sum())
    a_bases = int((ame.astype(np.int64) - ams + 1).sum())
    b_bases = int((bme.astype(np.int64) - bms + 1).sum())
    union = a_bases + b_bases - intersection
    return {
        "intersection": intersection,
        "union": union,
        "jaccard": intersection / union if union else 0.0,
        "n_intersections": int(counts.sum()),
    }


def tile_genome(key_sizes: dict[int, tuple[int, int]], window: int, step: int | None = None):
    """Fixed-size windows per contig (bedtools makewindows): windows of
    ``window`` bases every ``step`` (default: non-overlapping), the last
    window clipped to the contig end.  End-inclusive coordinates."""
    if window <= 0:
        raise ValueError("window must be positive")
    step = step or window
    if step <= 0:
        raise ValueError("step must be positive")
    ks, ss, es = [], [], []
    for k, (lo, hi) in sorted(key_sizes.items()):
        if hi < lo:
            continue
        if lo < -(2**31) or hi + window > 2**31 - 1:
            # i32 overflow is a hard error everywhere in this engine
            # (CLAUDE.md; mirrors evaluate_as_i32)
            raise ValueError(
                f"tile coordinates for key {k} exceed the int32 range"
            )
        starts = np.arange(lo, hi + 1, step, dtype=np.int64)
        ends = np.minimum(starts + window - 1, hi)
        ks.append(np.full(len(starts), k, np.int32))
        ss.append(starts.astype(np.int32))
        es.append(ends.astype(np.int32))
    if not ks:
        z = np.empty(0, np.int32)
        return z, z, z
    return np.concatenate(ks), np.concatenate(ss), np.concatenate(es)


def flank(keys, starts, ends, left: int, right: int, key_sizes=None):
    """Flanking intervals of each input (bedtools flank): a ``left``-base
    window immediately upstream and/or a ``right``-base window immediately
    downstream, clamped to the contig span; zero-width sides omitted."""
    out_k, out_s, out_e = [], [], []
    k64 = np.asarray(keys)
    s64 = np.asarray(starts).astype(np.int64)
    e64 = np.asarray(ends).astype(np.int64)
    lo = np.full(len(k64), -(2**31), np.int64)
    hi = np.full(len(k64), 2**31 - 1, np.int64)
    if key_sizes:
        for k, (klo, khi) in key_sizes.items():
            mask = k64 == k
            lo[mask] = klo
            hi[mask] = khi
    if left > 0:
        ls = np.maximum(s64 - left, lo)
        le_ = s64 - 1
        keep = le_ >= ls
        out_k.append(k64[keep]); out_s.append(ls[keep]); out_e.append(le_[keep])
    if right > 0:
        rs = e64 + 1
        re_ = np.minimum(e64 + right, hi)
        keep = re_ >= rs
        out_k.append(k64[keep]); out_s.append(rs[keep]); out_e.append(re_[keep])
    if not out_k:
        z = np.empty(0, np.int32)
        return z, z, z
    k = np.concatenate(out_k).astype(np.int32)
    s_ = np.concatenate(out_s).astype(np.int32)
    e_ = np.concatenate(out_e).astype(np.int32)
    order = np.lexsort((s_, k))
    return k[order], s_[order], e_[order]


def slop(keys, starts, ends, left: int, right: int, key_sizes=None):
    """Extend intervals by `left`/`right` bases, clamped to the contig
    span when given (bedtools slop)."""
    s = starts.astype(np.int64) - left
    e = ends.astype(np.int64) + right
    if key_sizes:
        lo = np.full(len(keys), -(2**31), np.int64)
        hi = np.full(len(keys), 2**31 - 1, np.int64)
        for k, (klo, khi) in key_sizes.items():
            mask = keys == k
            lo[mask] = klo
            hi[mask] = khi
        s = np.maximum(s, lo)
        e = np.minimum(e, hi)
    else:
        s = np.maximum(s, -(2**31))
        e = np.minimum(e, 2**31 - 1)
    return keys, s.astype(np.int32), np.maximum(e, s).astype(np.int32)


def coverage(index: IntervalIndex, qk, qs, qe, method: str = "sort"):
    """Per query: (count, sum(min(end_i,qe) - max(start_i,qs))) over all
    overlapping build intervals — superintervals.rs:802-822 exactly.

    Level-free decomposition (4 rank batches total, no per-level work):
    with A = {end in [qs,qe]} and B = {start in [qs,qe]} — both subsets of
    the match set, since start <= end —

        sum(min(end, qe))   = sum_A end   + qe * (total - |A|)
        sum(max(start, qs)) = sum_B start + qs * (total - |B|)

    where |A|,|B| are interval ranks on the (key,end)- and (key,start)-
    sorted arrays and the sums come from host int64 prefix sums over the
    same orders.  Exact for qs <= qe; degenerate stabbing rows fall back
    to the per-level path.
    """
    qs_np = np.asarray(qs)
    qe_np = np.asarray(qe)
    build_inverted = bool(
        (np.asarray(index._he) < np.asarray(index._hs)).any()
    )
    # the A/B subset decomposition requires start <= end on the BUILD side
    # too (CLAUDE.md: every count entry point checks both); inverted
    # builds and degenerate probes take the exact per-level path
    if not bool((qs_np > qe_np).any()) and not build_inverted:
        import jax.numpy as jnp

        from sequila_tpu.ops.ranks import rank_lex_sort

        (ks, ss), (ke, ee), psum, esum = index.coverage_view
        qk_d = jnp.asarray(qk)
        qs_d = jnp.asarray(qs)
        qe_d = jnp.asarray(qe)
        # total matches (BITS) and the two in-range splits
        ub_t = rank_lex_sort((ks, ss), (qk_d, qe_d), side="right")
        lb_t = rank_lex_sort((ke, ee), (qk_d, qs_d), side="left")
        a_hi = rank_lex_sort((ke, ee), (qk_d, qe_d), side="right")
        b_lo = rank_lex_sort((ks, ss), (qk_d, qs_d), side="left")
        ub_h = np.asarray(ub_t).astype(np.int64)
        lb_h = np.asarray(lb_t).astype(np.int64)
        a_hi_h = np.asarray(a_hi).astype(np.int64)
        b_lo_h = np.asarray(b_lo).astype(np.int64)
        total = np.maximum(ub_h - lb_h, 0)
        nA = np.maximum(a_hi_h - lb_h, 0)   # ends in [qs, qe]
        nB = np.maximum(ub_h - b_lo_h, 0)   # starts in [qs, qe]
        sumA_end = esum[a_hi_h] - esum[lb_h]
        sumB_start = psum[ub_h] - psum[b_lo_h]
        qe64 = qe_np.astype(np.int64)
        qs64 = qs_np.astype(np.int64)
        sum_min_end = sumA_end + qe64 * (total - nA)
        sum_max_start = sumB_start + qs64 * (total - nB)
        return total, sum_min_end - sum_max_start
    return _coverage_levels(index, qk, qs, qe, method)


def _coverage_levels(index: IntervalIndex, qk, qs, qe, method: str = "sort"):
    """Per-level exact coverage (handles degenerate stabbing queries)."""
    import jax.numpy as jnp

    from sequila_tpu.ops.interval_join import level_ranks

    qk_d, qs_d, qe_d = jnp.asarray(qk), jnp.asarray(qs), jnp.asarray(qe)
    kw = dict(
        num_levels=index.num_levels,
        level_offsets=index.level_offsets,
    )
    lv, ky, st, en = index.levels, index.keys, index.starts, index.ends
    lb = np.asarray(level_ranks(lv, ky, en, qk_d, qs_d, side="left", **kw))
    ub = np.asarray(level_ranks(lv, ky, st, qk_d, qe_d, side="right", **kw))
    t = np.asarray(level_ranks(lv, ky, en, qk_d, qe_d, side="right", **kw))
    r = np.asarray(level_ranks(lv, ky, st, qk_d, qs_d, side="left", **kw))

    if not hasattr(index, "_cov_prefix"):
        S = np.asarray(index.starts).astype(np.int64)
        E = np.asarray(index.ends).astype(np.int64)
        index._cov_prefix = (
            np.concatenate([[0], np.cumsum(S)]),
            np.concatenate([[0], np.cumsum(E)]),
        )
    ps, pe = index._cov_prefix

    qs_h = np.asarray(qs).astype(np.int64)
    qe_h = np.asarray(qe).astype(np.int64)
    m = lb.shape[1]
    counts = np.zeros(m, np.int64)
    total = np.zeros(m, np.int64)
    offs = np.asarray(index.level_offsets)[:, None]
    gl = offs + lb
    gu = offs + np.maximum(ub, lb)
    gt = np.clip(offs + t, gl, gu)
    gr = np.clip(offs + r, gl, gu)
    counts = (gu - gl).sum(0)
    for lvl in range(index.num_levels):
        l, u, tt, rr = gl[lvl], gu[lvl], gt[lvl], gr[lvl]
        sum_min_end = (pe[tt] - pe[l]) + qe_h * (u - tt)
        sum_max_start = qs_h * (rr - l) + (ps[u] - ps[rr])
        total += sum_min_end - sum_max_start
    return counts.astype(np.int64), total


def closest_k(index: IntervalIndex, qk, qs, qe, k: int = 1, method: str = "sort"):
    """k nearest build rows per probe row (overlaps first, then by genomic
    distance; ties upstream-first).  Returns (rows [m,k], dists [m,k]);
    -1 rows pad when fewer than k exist.  Host implementation over the
    level view (closest is an API operator, not the benchmark hot path)."""
    K = np.asarray(index.keys)
    S = np.asarray(index.starts)
    E = np.asarray(index.ends)
    P = np.asarray(index.pos)
    qk = np.asarray(qk)
    qs = np.asarray(qs)
    qe = np.asarray(qe)
    m = len(qk)
    rows = np.full((m, k), -1, np.int64)
    dists = np.full((m, k), -1, np.int64)
    real = P >= 0
    for i in range(m):
        seg = np.nonzero(real & (K == qk[i]))[0]
        if not len(seg):
            continue
        s, e, p = S[seg].astype(np.int64), E[seg].astype(np.int64), P[seg]
        d = np.where(
            e < qs[i], qs[i] - e, np.where(s > qe[i], s - qe[i], 0)
        )
        # sort by (distance, upstream-first, position)
        upstream = (e < qs[i]).astype(np.int64)
        order = np.lexsort((p, -upstream, d))[:k]
        rows[i, : len(order)] = p[order]
        dists[i, : len(order)] = d[order]
    return rows, dists
