"""Device-side collective shuffle: hash repartition via jax.lax.all_to_all.

The other modules in parallel/ partition on the host (the single-host
stand-in).  This module does the real thing the BASELINE calls the
"distributed shuffle for the interval-join build side": rows start
arbitrarily sharded over the mesh axis, every chip buckets its rows by
destination (key hash), and ONE `all_to_all` collective exchanges the
capacity-padded buckets over ICI — no host round trip.  The shuffled
shards are then counted in place with the sum-rank kernel (which needs no
sorted input and no level structure), so the whole partitioned count runs
as two device programs:

  phase A (sizing):   per-(chip,dest) bucket counts -> pmax -> static CAP
  phase B (shuffle + count): bucket, all_to_all, BITS sum-rank, psum

Capacity padding is the standard static-shape answer to raggedness; the
pmax in phase A makes it tight.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sequila_tpu.ops.interval_index import PAD_KEY, PAD_VAL, _bucket
from sequila_tpu.ops.interval_join import _sum_rank_partials, sat_sub_i32
from sequila_tpu.ops.ranks import rank_lex_sort


def _dest_sorted(keys, starts, ends, valid, nparts):
    """Sort local rows by destination; returns sorted columns + per-dest
    start offsets ([nparts + 1])."""
    dest = jnp.where(valid, keys % nparts, nparts).astype(jnp.int32)
    d_s, k_s, s_s, e_s = jax.lax.sort(
        (dest, keys, starts, ends), num_keys=1
    )
    offsets = jnp.searchsorted(
        d_s, jnp.arange(nparts + 1, dtype=jnp.int32), side="left", method="sort"
    ).astype(jnp.int32)
    return d_s, k_s, s_s, e_s, offsets


def _bucket_counts_fn(mesh: Mesh):
    nparts = mesh.shape["part"]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("part", None), P("part", None)),
        out_specs=P(),
    )
    def step(keys, valid):
        k = keys[0]
        v = valid[0]
        dest = jnp.where(v, k % nparts, nparts).astype(jnp.int32)
        d_s = jnp.sort(dest)
        offsets = jnp.searchsorted(
            d_s, jnp.arange(nparts + 1, dtype=jnp.int32), side="left",
            method="sort",
        ).astype(jnp.int32)
        counts = offsets[1:] - offsets[:-1]
        return jax.lax.pmax(jnp.max(counts), "part")

    return jax.jit(step)


def _shuffle_count_fn(mesh: Mesh, cap: int, chunks: int = 1):
    """Phase B: bucket + all_to_all both sides' columns, then count.

    chunks > 1 splits the probe side into independent slices, each with
    its own all_to_all + count.  The slices share no dataflow, so on real
    multi-chip hardware XLA's latency-hiding scheduler can overlap slice
    i+1's exchange (ICI) with slice i's sort/count (compute) — the
    double-buffered shuffle/compute pipeline.  Identical results for any
    chunk count (verified on the virtual mesh)."""
    nparts = mesh.shape["part"]

    def exchange(keys, starts, ends, valid, pad_end_degenerate):
        d_s, k_s, s_s, e_s, offsets = _dest_sorted(keys, starts, ends, valid, nparts)
        rows = k_s.shape[0]
        idx = jnp.arange(rows, dtype=jnp.int32)
        slot = idx - offsets[jnp.clip(d_s, 0, nparts)]
        in_cap = (slot < cap) & (d_s < nparts)
        # invalid rows get out-of-range targets; mode='drop' discards them
        dtgt = jnp.where(in_cap, d_s, nparts)
        stgt = jnp.where(in_cap, slot, cap)

        def scatter(vals, fill):
            buf = jnp.full((nparts, cap), fill, jnp.int32)
            return buf.at[dtgt, stgt].set(vals, mode="drop")

        send_k = scatter(k_s, PAD_KEY)
        send_s = scatter(s_s, PAD_VAL)
        send_e = scatter(e_s, PAD_VAL - 2 if pad_end_degenerate else PAD_VAL)
        recv_k = jax.lax.all_to_all(send_k, "part", 0, 0, tiled=True)
        recv_s = jax.lax.all_to_all(send_s, "part", 0, 0, tiled=True)
        recv_e = jax.lax.all_to_all(send_e, "part", 0, 0, tiled=True)
        return recv_k.reshape(-1), recv_s.reshape(-1), recv_e.reshape(-1)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(
            P("part", None), P("part", None), P("part", None), P("part", None),
            P("part", None), P("part", None), P("part", None), P("part", None),
        ),
        out_specs=P(),
    )
    def step(bk, bs, be, bv, qk, qs, qe, qv):
        rbk, rbs, rbe = exchange(bk[0], bs[0], be[0], bv[0], False)
        n = rbk.shape[0]
        rows = qk.shape[1]
        per = rows // chunks
        locals_ = []
        # unrolled: each slice's exchange+count is independent dataflow
        for c in range(chunks):
            lo, hi = c * per, rows if c == chunks - 1 else (c + 1) * per
            rqk, rqs, rqe = exchange(
                qk[0, lo:hi], qs[0, lo:hi], qe[0, lo:hi], qv[0, lo:hi], True
            )
            m = rqk.shape[0]
            # pad the probe slice to a 64-divisible total for the partials
            pad_to = -((-(n + m)) // 64) * 64 - n
            if pad_to > m:
                extra = pad_to - m
                rqk = jnp.concatenate([rqk, jnp.full((extra,), PAD_KEY, jnp.int32)])
                rqs = jnp.concatenate([rqs, jnp.full((extra,), PAD_VAL, jnp.int32)])
                rqe = jnp.concatenate([rqe, jnp.full((extra,), PAD_VAL - 2, jnp.int32)])
            pu = _sum_rank_partials(rbk, rbs, rqk, rqe, side="right")
            pl_ = _sum_rank_partials(rbk, rbe, rqk, rqs, side="left")
            locals_.append(jnp.concatenate([pu, -pl_]))
        return jax.lax.psum(jnp.concatenate(locals_), "part")

    return jax.jit(step)


@functools.lru_cache(maxsize=64)
def _shuffle_pairs_fns(mesh: Mesh, cap: int, pair_cap: int):
    """Phase B' kernels for the materializing shuffle join: exchange both
    tables (with row ids), per-shard sort + max-extension window emission
    entirely on device.

    ``base`` ([nparts] int32, sharded over 'part') shifts each shard's
    emitted candidate-slot window to [base, base + pair_cap): shards whose
    candidate count exceeds the static buffer drain over several calls of
    the SAME compiled kernel (chunked continuation — no recompile per
    growth step)."""
    nparts = mesh.shape["part"]
    PAD = jnp.int32(2**31 - 1)

    def exchange4(keys, starts, ends, rowid, valid):
        dest = jnp.where(valid, keys % nparts, nparts).astype(jnp.int32)
        d_s, k_s, s_s, e_s, i_s = jax.lax.sort(
            (dest, keys, starts, ends, rowid), num_keys=1
        )
        offsets = jnp.searchsorted(
            d_s, jnp.arange(nparts + 1, dtype=jnp.int32), side="left",
            method="sort",
        ).astype(jnp.int32)
        rows = k_s.shape[0]
        idx = jnp.arange(rows, dtype=jnp.int32)
        slot = idx - offsets[jnp.clip(d_s, 0, nparts)]
        in_cap = (slot < cap) & (d_s < nparts)
        dtgt = jnp.where(in_cap, d_s, nparts)
        stgt = jnp.where(in_cap, slot, cap)

        def scatter(vals, fill):
            buf = jnp.full((nparts, cap), fill, jnp.int32)
            return buf.at[dtgt, stgt].set(vals, mode="drop")

        outs = []
        for vals, fill in ((k_s, PAD), (s_s, PAD), (e_s, PAD), (i_s, -1)):
            outs.append(
                jax.lax.all_to_all(scatter(vals, fill), "part", 0, 0, tiled=True)
                .reshape(-1)
            )
        return outs

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("part", None),) * 10 + (P("part"),),
        out_specs=(P("part", None), P("part", None), P("part")),
    )
    def emit(bk, bs, be, bi, bv, qk, qs, qe, qi, qv, base):
        rbk, rbs, rbe, rbi = exchange4(bk[0], bs[0], be[0], bi[0], bv[0] >= 0)
        rqk, rqs, rqe, rqi = exchange4(qk[0], qs[0], qe[0], qi[0], qv[0] >= 0)
        # per-shard sort of the received build rows by (key, start)
        sk, ss, se, si = jax.lax.sort((rbk, rbs, rbe, rbi), num_keys=2)
        real = sk != PAD
        max_len = jnp.max(jnp.where(real, se - ss, 0))
        lo_q = sat_sub_i32(rqs, max_len)
        lb = rank_lex_sort((sk, ss), (rqk, lo_q), side="left")
        ub = rank_lex_sort((sk, ss), (rqk, rqe), side="right")
        # PAD probe slots share the PAD key with the build padding, so
        # their window would span every build-PAD row — zero them or the
        # candidate totals (drain sizing) explode and overflow int32
        widths = jnp.where(rqk == PAD, 0, jnp.maximum(ub - lb, 0))
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(widths, dtype=jnp.int32)]
        )
        total = offsets[-1]
        slots = jnp.arange(pair_cap, dtype=jnp.int32) + base[0]
        cell = (
            jnp.searchsorted(offsets, slots, side="right", method="sort")
            .astype(jnp.int32) - 1
        )
        cell = jnp.clip(cell, 0, rqk.shape[0] - 1)
        g = jnp.clip(lb[cell] + (slots - offsets[cell]), 0, sk.shape[0] - 1)
        match = (
            (slots < total)
            & (se[g] >= rqs[cell])
            & (sk[g] == rqk[cell])
            & (rqk[cell] != PAD)
        )
        out_b = jnp.where(match, si[g], -1)
        out_q = jnp.where(match, rqi[cell], -1)
        return out_b[None, :], out_q[None, :], widths.sum()[None]

    return jax.jit(emit)


def all_to_all_partitioned_pairs(mesh: Mesh, lk, ls, le, rk, rs, re,
                                 chunk_limit: int = 1 << 22):
    """Exact materializing join with the device-side shuffle: both tables
    exchanged by key hash via all_to_all (row ids ride along), each shard
    sorts its build rows and window-emits its pairs on device; the host
    only concatenates valid (build_row, probe_row) ids.

    The emit buffer is statically capped at ``chunk_limit`` candidate
    slots per shard; bigger shards drain through repeated calls of the
    same compiled kernel with advancing base offsets (at most TWO
    compilations total: the sizing pass + the final capacity — never one
    per growth step)."""
    nparts = mesh.shape["part"]
    BK, BS, BE, BV = _deal(lk, ls, le, nparts)
    QK, QS, QE, QV = _deal(rk, rs, re, nparts)
    dev = lambda a: jax.device_put(a, NamedSharding(mesh, P("part", None)))
    dev1 = lambda a: jax.device_put(a, NamedSharding(mesh, P("part")))
    cap_b = int(_bucket_counts_fn(mesh)(dev(BK), dev(BV >= 0)))
    cap_q = int(_bucket_counts_fn(mesh)(dev(QK), dev(QV >= 0)))
    cap = _bucket(max(cap_b, cap_q, 1), minimum=8)
    # candidate capacity: worst case every received build row matches
    # every received probe row's window — far too big to pre-size.  Phase
    # 1: run emit with a small cap to read each shard's exact candidate
    # total.  Phase 2: drain with a bounded static buffer + base offsets.
    pair_cap = 1024
    fn = _shuffle_pairs_fns(mesh, cap, pair_cap)
    args = (
        dev(BK), dev(BS), dev(BE), dev(BV), dev(BV),
        dev(QK), dev(QS), dev(QE), dev(QV), dev(QV),
    )
    zeros = np.zeros(nparts, np.int32)
    b, q, totals = fn(*args, dev1(zeros))
    from sequila_tpu.parallel.partitioned_join import fetch_global

    totals = fetch_global(totals).astype(np.int64)
    if totals.size and int(totals.min()) < 0:
        # widths.sum() wrapped int32: a single shard's candidate count
        # passed 2^31 — same contract as the emit-offset limit
        from sequila_tpu.errors import ExecutionError

        raise ExecutionError(
            "a shuffle shard's candidate window count exceeded 2^31 (the "
            "int32 emit arithmetic limit); raise target_partitions"
        )
    need = int(totals.max())
    out_b, out_q = [], []

    def collect(b, q):
        b = fetch_global(b).reshape(-1)
        q = fetch_global(q).reshape(-1)
        valid = (b >= 0) & (q >= 0)
        out_b.append(b[valid])
        out_q.append(q[valid])

    if need <= pair_cap:
        collect(b, q)
    else:
        pair_cap = _bucket(min(need, chunk_limit), minimum=1024)
        fn = _shuffle_pairs_fns(mesh, cap, pair_cap)
        base = np.zeros(nparts, np.int64)
        while (totals - base > 0).any():
            b, q, _ = fn(*args, dev1(base.astype(np.int32)))
            collect(b, q)
            base += pair_cap
    return (
        np.concatenate(out_b).astype(np.int64),
        np.concatenate(out_q).astype(np.int64),
    )


def _deal(k, s, e, nparts):
    """Round-robin deal with global row ids in the validity column."""
    n = len(k)
    rows = _bucket(max(-(-n // nparts), 1), minimum=8)
    K = np.full((nparts, rows), PAD_KEY, np.int32)
    S = np.full((nparts, rows), PAD_VAL, np.int32)
    E = np.full((nparts, rows), PAD_VAL, np.int32)
    I = np.full((nparts, rows), -1, np.int32)
    for p in range(nparts):
        sl = slice(p, n, nparts)
        cnt = len(k[sl])
        K[p, :cnt] = k[sl]
        S[p, :cnt] = s[sl]
        E[p, :cnt] = e[sl]
        I[p, :cnt] = np.arange(p, n, nparts)
    return K, S, E, I


def all_to_all_partitioned_count(
    mesh: Mesh, lk, ls, le, rk, rs, re, chunks: int = 1
) -> int:
    """Exact count with a REAL device-side shuffle of both tables.

    Rows are dealt round-robin across the 'part' axis (arbitrary initial
    placement, as if freshly scanned), shuffled by key hash on device via
    all_to_all, and counted shard-locally; only scalars cross the host
    boundary after the initial upload.  `qs > qe` degenerate rows must be
    pre-filtered by the caller (BITS zeroes them)."""
    nparts = mesh.shape["part"]

    def deal(k, s, e):
        n = len(k)
        rows = -(-n // nparts)
        rows = _bucket(max(rows, 1), minimum=8)
        K = np.full((nparts, rows), PAD_KEY, np.int32)
        S = np.full((nparts, rows), PAD_VAL, np.int32)
        E = np.full((nparts, rows), PAD_VAL, np.int32)
        V = np.zeros((nparts, rows), bool)
        for p in range(nparts):
            sl = slice(p, n, nparts)
            cnt = len(k[sl])
            K[p, :cnt] = k[sl]
            S[p, :cnt] = s[sl]
            E[p, :cnt] = e[sl]
            V[p, :cnt] = True
        return K, S, E, V

    BK, BS, BE, BV = deal(lk, ls, le)
    QK, QS, QE, QV = deal(rk, rs, re)
    dev = lambda a: jax.device_put(a, NamedSharding(mesh, P("part", None)))
    dBK, dBV = dev(BK), dev(BV)
    dQK, dQV = dev(QK), dev(QV)
    cap_b = int(_bucket_counts_fn(mesh)(dBK, dBV))
    cap_q = int(_bucket_counts_fn(mesh)(dQK, dQV))
    cap = _bucket(max(cap_b, cap_q, 1), minimum=8)
    fn = _shuffle_count_fn(mesh, cap, chunks)
    partials = fn(
        dBK, dev(BS), dev(BE), dBV, dQK, dev(QS), dev(QE), dQV
    )
    return int(np.asarray(partials).astype(np.int64).sum())
