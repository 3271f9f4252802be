"""Sanitizer stress driver for the native C++ library.

Exercises EVERY native entry point — the threaded index kernels
(count/emit/emit_at/nearest/coverage/closest_k), the parallel radix
argsort + searchsorted, run expansion, and the gather kernels including
the si_take_str_fill 16-byte-overrun fast path — with correctness checks
against NumPy, under whatever sanitizer the caller compiled in
(SEQUILA_NATIVE_SANITIZE + LD_PRELOAD, see tools/run_sanitizers.py).

Deliberately jax-free: TSan instruments every thread in the process, and
XLA's runtime threads would bury real reports from this library.  The
workload sizes force the multi-threaded paths (parallel_chunks engages
above its per-chunk thresholds).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sequila_tpu.native import loader
from sequila_tpu.ops.host_join import HostIntervalIndex


def main() -> int:
    lib = loader.load()
    if lib is None:
        print("native library unavailable (build failed?)", file=sys.stderr)
        return 2
    rng = np.random.default_rng(7)
    n, m = 400_000, 300_000  # large enough that every kernel threads
    bk = rng.integers(0, 24, n).astype(np.int32)
    bs = rng.integers(0, 3_000_000, n).astype(np.int32)
    be = bs + rng.integers(0, 5_000, n).astype(np.int32)
    qk = rng.integers(0, 25, m).astype(np.int32)
    qs = rng.integers(0, 3_000_000, m).astype(np.int32)
    qe = qs + rng.integers(0, 5_000, m).astype(np.int32)

    idx = loader.NativeIntervalIndex(bk, bs, be)
    ref = HostIntervalIndex(bk, bs, be)

    counts = idx.counts(qk, qs, qe)
    np.testing.assert_array_equal(counts, ref.counts(qk, qs, qe))
    print(f"counts OK (total={int(counts.sum()):,}, layout={idx.layout})")

    # the non-default layout must get sanitizer coverage too (the default
    # build above exercises the other one throughout this driver)
    other = "segment" if idx.layout == "eytzinger" else "eytzinger"
    prev_layout = os.environ.get("SEQUILA_NATIVE_LAYOUT")
    os.environ["SEQUILA_NATIVE_LAYOUT"] = other
    try:
        idx_other = loader.NativeIntervalIndex(bk, bs, be)
    finally:
        # restore (not clear): a user-forced layout must keep applying to
        # everything built later in this driver run
        if prev_layout is None:
            del os.environ["SEQUILA_NATIVE_LAYOUT"]
        else:
            os.environ["SEQUILA_NATIVE_LAYOUT"] = prev_layout
    np.testing.assert_array_equal(idx_other.counts(qk, qs, qe), counts)
    print(f"counts OK (layout={idx_other.layout})")
    del idx_other

    b, p = idx.pairs(qk[:50_000], qs[:50_000], qe[:50_000])
    rb, rp = ref.pairs(qk[:50_000], qs[:50_000], qe[:50_000])
    assert sorted(zip(p.tolist(), b.tolist())) == sorted(zip(rp.tolist(), rb.tolist()))
    print(f"pairs OK ({len(b):,})")

    offs = np.zeros(50_001, np.int64)
    np.cumsum(counts[:50_000], out=offs[1:])
    b2, p2 = idx.pairs_at(qk[:50_000], qs[:50_000], qe[:50_000], offs)
    np.testing.assert_array_equal(np.sort(b2), np.sort(b))
    np.testing.assert_array_equal(p2, p)
    print("pairs_at OK")

    # the sorted-walk emission branch (size-gated off at this build
    # size) must run under the sanitizers too: force it and require
    # byte-identical output
    prev_walk = os.environ.get("SEQUILA_EMIT_SORTED_WALK")
    os.environ["SEQUILA_EMIT_SORTED_WALK"] = "1"
    try:
        b3, p3 = idx.pairs_at(qk[:50_000], qs[:50_000], qe[:50_000], offs)
    finally:
        if prev_walk is None:
            del os.environ["SEQUILA_EMIT_SORTED_WALK"]
        else:
            os.environ["SEQUILA_EMIT_SORTED_WALK"] = prev_walk
    np.testing.assert_array_equal(b3, b2)
    np.testing.assert_array_equal(p3, p2)
    print("pairs_at (forced sorted walk) OK")

    nearest = idx.nearest(qk[:20_000], qs[:20_000], qe[:20_000])
    assert len(nearest) == 20_000
    cov_c, cov_b = idx.coverage(qk[:20_000], qs[:20_000], qe[:20_000])
    np.testing.assert_array_equal(cov_c, counts[:20_000])
    rows, dists = idx.closest_k(qk[:20_000], qs[:20_000], qe[:20_000], 3)
    assert rows.shape == (20_000, 3)
    print("nearest/coverage/closest_k OK")

    v = rng.integers(-(2**62), 2**62, 2_000_000)
    order = loader.argsort64(v)
    np.testing.assert_array_equal(v[order], np.sort(v))
    print("argsort64 OK")

    sv = np.sort(rng.integers(0, 2**40, 1_000_000))
    q = rng.integers(0, 2**40, 500_000)
    np.testing.assert_array_equal(
        loader.searchsorted64(sv, q, "left"), np.searchsorted(sv, q, "left")
    )
    np.testing.assert_array_equal(
        loader.searchsorted64(sv, q, "right"), np.searchsorted(sv, q, "right")
    )
    print("searchsorted64 OK")

    cnts = rng.integers(0, 7, 300_000).astype(np.int32)
    total = int(cnts.sum())
    g0 = rng.integers(0, n - 10, 300_000).astype(np.int32)
    pos = np.arange(n, dtype=np.int32)
    out = loader.expand_runs(g0, cnts, pos, total)
    want = np.concatenate(
        [np.arange(g, g + c, dtype=np.int32) for g, c in zip(g0, cnts) if c]
    ) if total else np.empty(0, np.int32)
    np.testing.assert_array_equal(out, want)
    rep = loader.repeat_counts(cnts.astype(np.int64), total)
    np.testing.assert_array_equal(rep, np.repeat(np.arange(300_000), cnts))
    print("expand_runs/repeat_counts OK")

    # gather kernels incl. the string fill's documented 16-byte overrun
    # contract (stays inside the caller's slack — ASan must stay quiet)
    import pyarrow as pa

    from sequila_tpu.models.table import Table

    strs = np.array(
        ["chr" + str(int(i)) for i in rng.integers(0, 999, 300_000)], dtype=object
    )
    long_strs = strs.copy()
    long_strs[:100] = "x" * 40  # rows above the 16-byte fast path
    t = Table(pa.table({
        "s": pa.array(strs), "l": pa.array(long_strs),
        "i32": pa.array(rng.integers(0, 2**31 - 1, 300_000), pa.int32()),
        "i64": pa.array(rng.integers(0, 2**62, 300_000), pa.int64()),
    }))
    rows = rng.integers(0, 300_000, 400_000)
    got = t.take(rows)
    np.testing.assert_array_equal(got.column_np("i64"), t.column_np("i64")[rows])
    np.testing.assert_array_equal(got.column_np("s"), strs[rows])
    np.testing.assert_array_equal(got.column_np("l"), long_strs[rows])
    print("gather32/64 + take_str OK")

    # subtract gap kernel (threaded two-pass, hint-grid binary search)
    from sequila_tpu.ops import genomic

    sak = rng.integers(0, 24, 200_000).astype(np.int32)
    sas = rng.integers(0, 3_000_000, 200_000).astype(np.int32)
    sae = (sas + rng.integers(-5, 5_000, 200_000)).astype(np.int32)
    # sparse subtrahend (40k of the 400k rows) so real gaps emit; the
    # full-density build would merge to near-total coverage (few gaps)
    merged = genomic.merged_subtrahend(bk[:40_000], bs[:40_000], be[:40_000])
    mk_, ms_, me_, comp_ms, comp_me = merged
    got_sub = loader.subtract_runs(comp_ms, comp_me, ms_, me_, sak, sas, sae)
    assert got_sub is not None
    prev_sub = loader.subtract_runs
    loader.subtract_runs = lambda *a, **k: None
    try:
        want_sub = genomic.subtract_intervals(
            sak, sas, sae, bk[:40_000], bs[:40_000], be[:40_000], merged=merged
        )
    finally:
        loader.subtract_runs = prev_sub
    for g, w in zip(got_sub, want_sub):
        np.testing.assert_array_equal(g, w)
    print(f"subtract_runs OK ({len(got_sub[0]):,} gaps)")

    print("SANITIZE DRIVER PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
