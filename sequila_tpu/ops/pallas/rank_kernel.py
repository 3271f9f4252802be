"""Pallas TPU kernel: batched lexicographic rank via merge windows.

The engine's default rank primitive co-sorts build and query tuples with
XLA's sort — O((n+m) log(n+m)).  When both sides are already sorted, the
information-theoretic cost is a linear merge; random-access binary search
does not map to TPU (Mosaic has no 1-D vector gather — verified), but a
*merge-window* formulation does, using only contiguous reads:

- the build arrays (keys, values; lexicographic) live fully in VMEM;
- the sorted queries are processed in grid blocks; two scalar binary
  searches (scalar VMEM reads) bound the block's window [lo, hi) of
  build entries that any query in the block can rank against;
- the window is swept in contiguous CHUNK-wide slabs, each compared
  against the whole query block on the VPU (a [BLOCK, CHUNK] compare),
  accumulating per-query counts.

Cost per block: O(BLOCK * window) VPU compares with perfectly coalesced
loads; for sorted probes windows partition the build side, so the total
is O(m * n / num_blocks) in the worst single block and O(BLOCK * n)
overall — HBM-traffic-free after the initial VMEM load.

Used by `rank_lex_pallas` (handles the sorting of queries + scatter-back)
and enabled for builds that fit VMEM; parity-tested against
rank_lex_sort.  Requires queries with keys < 2^31-1 (PAD convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256
CHUNK = 2048
# 2 build arrays + slack must fit VMEM (~16 MB): cap the build side.
MAX_VMEM_BUILD = 1 << 20


def _less_eq(ak, av, bk, bv, strict: bool):
    """Lexicographic (ak,av) < (bk,bv) (strict) or <= (non-strict)."""
    if strict:
        return (ak < bk) | ((ak == bk) & (av < bv))
    return (ak < bk) | ((ak == bk) & (av <= bv))


def _make_kernel(n_build: int, strict: bool):
    n_chunks_max = pl.cdiv(n_build, CHUNK)

    def kernel(a_keys_ref, a_vals_ref, bk_ref, bv_ref, out_ref):
        bk = bk_ref[:]  # [1, BLOCK] sorted query keys
        bv = bv_ref[:]

        first_k = bk[0, 0]
        first_v = bv[0, 0]
        last_k = bk[0, BLOCK - 1]
        last_v = bv[0, BLOCK - 1]

        def chunk_rank(qk, qv, lt_strict):
            """#chunk boundaries c with a[c*CHUNK] < (or <=) the query.

            Mosaic requires lane-aligned vector loads, so the search
            probes only CHUNK-aligned positions (each load a 128-wide
            slab whose lane 0 is the boundary element)."""

            def body(_, lohi):
                lo, hi = lohi
                # converged (lo == hi): stop — probing further would read
                # chunk boundary == n_chunks (out of bounds when there is
                # no PAD tail)
                mid = jnp.minimum((lo + hi) // 2, n_chunks_max - 1)
                idx = pl.multiple_of(mid * CHUNK, 128)
                ak = a_keys_ref[0, pl.ds(idx, 128)][0]
                av = a_vals_ref[0, pl.ds(idx, 128)][0]
                le = _less_eq(ak, av, qk, qv, strict=lt_strict)
                active = lo < hi
                return jax.lax.cond(
                    active & le, lambda: (mid + 1, hi),
                    lambda: jax.lax.cond(active, lambda: (lo, mid), lambda: (lo, hi)),
                )

            steps = max(1, int(np.ceil(np.log2(n_chunks_max + 1))))
            lo, _ = jax.lax.fori_loop(0, steps, body, (0, n_chunks_max))
            return lo

        # Sweep window in whole chunks, [c_lo, c_hi):
        # - boundaries below c_lo have a[c*CHUNK] < first query, so every
        #   element before c_lo*CHUNK is strictly < all queries in the
        #   block -> counted unconditionally (the `+ lo_al` below);
        # - boundaries at/after c_hi have a[c*CHUNK] > last query, so
        #   nothing at/after c_hi*CHUNK can ever count.
        c_lo = jnp.maximum(chunk_rank(first_k, first_v, lt_strict=True) - 1, 0)
        c_hi = chunk_rank(last_k, last_v, lt_strict=False)
        lo_al = c_lo * CHUNK

        def chunk_body(c, acc):
            start = pl.multiple_of((c_lo + c) * CHUNK, 128)
            ak = a_keys_ref[0, pl.ds(start, CHUNK)]
            av = a_vals_ref[0, pl.ds(start, CHUNK)]
            # n_build is CHUNK-padded and the sweep never passes the last
            # chunk, so no bounds mask is needed; PAD entries sort last
            # and are excluded by the window/compare themselves.
            less = _less_eq(
                ak[None, :], av[None, :], bk[0][:, None], bv[0][:, None],
                strict=strict,
            )
            return acc + jnp.sum(less, axis=1).astype(jnp.int32)

        counts = jax.lax.fori_loop(
            0, c_hi - c_lo, chunk_body, jnp.zeros((BLOCK,), jnp.int32)
        )
        out_ref[:] = (counts + lo_al)[None, :]

    return kernel


def _interpret() -> bool:
    """Compiled Pallas needs a real TPU; CPU tests run the interpreter."""
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("n_build", "strict"))
def _pallas_rank_sorted(a_keys, a_vals, q_keys, q_vals, *, n_build, strict):
    m = q_keys.shape[0]
    grid = pl.cdiv(m, BLOCK)
    return pl.pallas_call(
        _make_kernel(n_build, strict),
        interpret=_interpret(),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, n_build), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_build), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.int32),
    )(
        a_keys[None, :], a_vals[None, :], q_keys[None, :], q_vals[None, :]
    )[0]


def rank_lex_pallas(build_keys, query_keys, side: str = "left"):
    """Drop-in alternative to rank_lex_sort for 2-tuple keys.

    Sorts the build side and the queries on-device (XLA sort), runs the
    merge-window kernel, and scatters ranks back to query order.
    """
    from sequila_tpu.ops.ranks import rank_lex_sort

    bk, bv = build_keys
    qk, qv = query_keys
    n = bk.shape[0]
    if n == 0:
        return jnp.zeros(qk.shape, jnp.int32)
    m = qk.shape[0]
    if m == 0:
        return jnp.zeros((0,), jnp.int32)
    if n > MAX_VMEM_BUILD:
        # build side exceeds the VMEM residency budget: co-sort instead
        return rank_lex_sort(build_keys, query_keys, side=side)
    # pad sizes to multiples of BLOCK/CHUNK
    n_pad = int(-(-n // CHUNK) * CHUNK)
    m_pad = int(-(-m // BLOCK) * BLOCK)
    PAD = jnp.int32(2**31 - 1)
    bk = jnp.concatenate([bk, jnp.full((n_pad - n,), PAD, jnp.int32)])
    bv = jnp.concatenate([bv, jnp.full((n_pad - n,), PAD, jnp.int32)])
    qk_p = jnp.concatenate([qk, jnp.full((m_pad - m,), PAD, jnp.int32)])
    qv_p = jnp.concatenate([qv, jnp.full((m_pad - m,), PAD, jnp.int32)])
    a_keys, a_vals = jax.lax.sort((bk, bv), num_keys=2)
    idx = jnp.arange(m_pad, dtype=jnp.int32)
    sk, sv, sidx = jax.lax.sort((qk_p, qv_p, idx), num_keys=2)
    ranks_sorted = _pallas_rank_sorted(
        a_keys, a_vals, sk, sv, n_build=n_pad, strict=(side == "left")
    )
    # padding build entries (PAD) sort last; queries with PAD keys rank
    # against them, but callers never use ranks of pad queries.  Real
    # queries may still count build PAD entries if side='right' and the
    # query key equals PAD — excluded by the PAD convention.
    ranks = jnp.zeros((m_pad,), jnp.int32).at[sidx].set(ranks_sorted)
    # subtract nothing: ranks are against the padded build, but PAD
    # entries sort after every real tuple, so ranks of real queries are
    # unaffected.
    return ranks[:m]
