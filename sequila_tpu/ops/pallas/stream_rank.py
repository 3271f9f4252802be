"""Pallas TPU kernel: HBM-streaming merge-window ranks with double-buffered DMA.

The VMEM-resident merge-window kernel (rank_kernel.py) caps the build side
at ~1M rows.  This variant keeps the sorted build arrays in HBM and
streams each query block's window through VMEM with manually scheduled
double-buffered DMA (the guide's async-copy pattern):

- the per-block chunk windows [c_lo, c_lo + n_chunks) are precomputed
  OUTSIDE the kernel (one small co-sort rank of the G block-boundary
  queries) and fed in as scalar-prefetch operands, so the kernel can
  issue its first DMA before any compute;
- per chunk: one (2, CHUNK) slab DMA (keys and values interleaved on the
  leading axis), compared against the whole query block on the VPU while
  the next slab is in flight.

Exact for every input (same window math as rank_kernel.py, including
duplicate runs across chunk boundaries); no VMEM cap on the build side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sequila_tpu.ops.ranks import rank_lex_sort

BLOCK = 256
CHUNK = 2048


def _less(ak, av, bk, bv, strict: bool):
    if strict:
        return (ak < bk) | ((ak == bk) & (av < bv))
    return (ak < bk) | ((ak == bk) & (av <= bv))


def _make_kernel(strict: bool):
    def kernel(c_lo_ref, n_chunks_ref, a_ref, bk_ref, bv_ref, out_ref,
               scratch, sems):
        g = pl.program_id(0)
        c0 = c_lo_ref[g]
        nch = n_chunks_ref[g]
        bk = bk_ref[0]  # [BLOCK]
        bv = bv_ref[0]

        def get_dma(slot, c):
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
            ak = scratch[slot, 0]  # [CHUNK]
            av = scratch[slot, 1]
            less = _less(
                ak[None, :], av[None, :], bk[:, None], bv[:, None], strict
            )
            return counts + jnp.sum(less, axis=1).astype(jnp.int32)

        counts = jax.lax.fori_loop(
            0, nch, body, jnp.zeros((BLOCK,), jnp.int32)
        )
        out_ref[0] = counts + c0 * CHUNK

    return kernel


@functools.partial(jax.jit, static_argnames=("strict",))
def _stream_rank_sorted(a2, c_lo, n_chunks, q_keys, q_vals, *, strict):
    m = q_keys.shape[0]
    grid = m // BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # a2 stays in HBM
            pl.BlockSpec((1, BLOCK), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK), lambda g, *_: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK), lambda g, *_: (0, g), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(strict),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(c_lo, n_chunks, a2, q_keys[None, :], q_vals[None, :])[0]


@functools.partial(jax.jit, static_argnames=("d_bs", "d_be", "d_qs", "d_qe"))
def stream_count_partials(
    bk, bs_v, be_k, be_v, qk_s, qe_v, qk_e, qs_v,
    remap_b, remap_q,
    c_lo_u, n_chunks_u, c_lo_l, n_chunks_l,
    *, d_bs: int, d_be: int, d_qs: int, d_qe: int,
):
    """Sort-free count(*) over cached sorted views (see Table.sorted_
    interval_view): remap order-preserving dictionary codes into the joint
    space, adjust bounds by the planner's ±lit deltas, and stream both
    rank passes with the DMA kernel — NO device sort anywhere.  Windows
    (c_lo/n_chunks per query block) come precomputed from the host.

    Returns packed 64-bucket partials [ub-partials, -lb-partials]; the
    host sums in int64.  Degenerate (qs>qe) rows must be pre-excluded."""
    PAD = jnp.int32(2**31 - 1)

    def remap_keys(k, remap):
        safe = jnp.clip(k, 0, remap.shape[0] - 1)
        return jnp.where(k == PAD, PAD, remap[safe])

    def adjust_build(k, v, d):
        # build padding compares as (PAD, PAD): above every probe value
        return jnp.where(k == PAD, PAD, v + d)

    def adjust_probe(k, v, d):
        # probe padding compares as (PAD, PAD-1): counts all real build in
        # BOTH rank passes (and no build padding), so it cancels in ub-lb
        return jnp.where(k == PAD, PAD - 1, v + d)

    bku = remap_keys(bk, remap_b)
    bkl = remap_keys(be_k, remap_b)
    qku = remap_keys(qk_s, remap_q)
    qkl = remap_keys(qk_e, remap_q)
    a_u = jnp.stack([bku, adjust_build(bk, bs_v, d_bs)])
    a_l = jnp.stack([bkl, adjust_build(be_k, be_v, d_be)])
    qe_a = adjust_probe(qk_s, qe_v, d_qe)
    qs_a = adjust_probe(qk_e, qs_v, d_qs)
    ub = _stream_rank_sorted(a_u, c_lo_u, n_chunks_u, qku, qe_a, strict=False)
    lb = _stream_rank_sorted(a_l, c_lo_l, n_chunks_l, qkl, qs_a, strict=True)
    pu = ub.reshape(-1, 64).sum(axis=1)
    pl_ = lb.reshape(-1, 64).sum(axis=1)
    return jnp.concatenate([pu, -pl_])


def host_windows(bk_h, bv_h, qk_h, qv_h):
    """Per-block chunk windows computed on the host (int64 composites +
    np.searchsorted over the cached host copies) — no device sort."""
    B = np.int64(2**31)
    comp_b = (bk_h.astype(np.int64) << 32) | (bv_h.astype(np.int64) + B)
    firsts = slice(0, None, BLOCK)
    lasts = slice(BLOCK - 1, None, BLOCK)
    comp_qf = (qk_h[firsts].astype(np.int64) << 32) | (qv_h[firsts].astype(np.int64) + B)
    comp_ql = (qk_h[lasts].astype(np.int64) << 32) | (qv_h[lasts].astype(np.int64) + B)
    lo_rank = np.searchsorted(comp_b, comp_qf, side="left")
    hi_rank = np.searchsorted(comp_b, comp_ql, side="right")
    c_lo = (lo_rank // CHUNK).astype(np.int32)
    c_hi = (-((-hi_rank) // CHUNK)).astype(np.int32)
    return c_lo, np.maximum(c_hi - c_lo, 0).astype(np.int32)


def rank_lex_stream(build_keys, query_keys, side: str = "left"):
    """HBM-streaming drop-in for rank_lex_sort on 2-tuple keys.

    Sorts both sides on-device, block-bounds the windows with one small
    rank, streams the merge, scatters ranks back to query order."""
    bk, bv = build_keys
    qk, qv = query_keys
    n = bk.shape[0]
    m = qk.shape[0]
    if n == 0 or m == 0:
        return jnp.zeros((m,), jnp.int32)
    PAD = jnp.int32(2**31 - 1)
    n_pad = int(-(-n // CHUNK) * CHUNK)
    m_pad = int(-(-m // BLOCK) * BLOCK)
    bk_p = jnp.concatenate([bk, jnp.full((n_pad - n,), PAD, jnp.int32)])
    bv_p = jnp.concatenate([bv, jnp.full((n_pad - n,), PAD, jnp.int32)])
    a_k, a_v = jax.lax.sort((bk_p, bv_p), num_keys=2)
    a2 = jnp.stack([a_k, a_v])  # (2, n_pad): one DMA per chunk

    qk_p = jnp.concatenate([qk, jnp.full((m_pad - m,), PAD, jnp.int32)])
    qv_p = jnp.concatenate([qv, jnp.full((m_pad - m,), PAD, jnp.int32)])
    idx = jnp.arange(m_pad, dtype=jnp.int32)
    sk, sv, sidx = jax.lax.sort((qk_p, qv_p, idx), num_keys=2)

    # block windows from boundary-query ranks (small co-sort)
    firsts_k, lasts_k = sk[::BLOCK], sk[BLOCK - 1 :: BLOCK]
    firsts_v, lasts_v = sv[::BLOCK], sv[BLOCK - 1 :: BLOCK]
    lo_rank = rank_lex_sort((a_k, a_v), (firsts_k, firsts_v), side="left")
    hi_rank = rank_lex_sort((a_k, a_v), (lasts_k, lasts_v), side="right")
    c_lo = lo_rank // CHUNK
    c_hi = -((-hi_rank) // CHUNK)
    n_chunks = jnp.maximum(c_hi - c_lo, 0)

    ranks_sorted = _stream_rank_sorted(
        a2, c_lo, n_chunks, sk, sv, strict=(side == "left")
    )
    ranks = jnp.zeros((m_pad,), jnp.int32).at[sidx].set(ranks_sorted)
    return ranks[:m]
