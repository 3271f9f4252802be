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
from jax.experimental.shard_map import shard_map

from sequila_tpu.ops.interval_index import PAD_KEY, PAD_VAL, _bucket
from sequila_tpu.ops.interval_join import _sum_rank_partials


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


def _shuffle_count_fn(mesh: Mesh, cap: int):
    """Phase B: bucket + all_to_all both sides' columns, then count."""
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
        rqk, rqs, rqe = exchange(qk[0], qs[0], qe[0], qv[0], True)
        # pad the probe side to a 64-divisible total for the partials
        n = rbk.shape[0]
        m = rqk.shape[0]
        pad_to = -((-(n + m)) // 64) * 64 - n
        if pad_to > m:
            extra = pad_to - m
            rqk = jnp.concatenate([rqk, jnp.full((extra,), PAD_KEY, jnp.int32)])
            rqs = jnp.concatenate([rqs, jnp.full((extra,), PAD_VAL, jnp.int32)])
            rqe = jnp.concatenate([rqe, jnp.full((extra,), PAD_VAL - 2, jnp.int32)])
        pu = _sum_rank_partials(rbk, rbs, rqk, rqe, side="right")
        pl_ = _sum_rank_partials(rbk, rbe, rqk, rqs, side="left")
        local = jnp.concatenate([pu, -pl_])
        return jax.lax.psum(local, "part")

    return jax.jit(step)


def all_to_all_partitioned_count(mesh: Mesh, lk, ls, le, rk, rs, re) -> int:
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
    fn = _shuffle_count_fn(mesh, cap)
    partials = fn(
        dBK, dev(BS), dev(BE), dBV, dQK, dev(QS), dev(QE), dQV
    )
    return int(np.asarray(partials).astype(np.int64).sum())
