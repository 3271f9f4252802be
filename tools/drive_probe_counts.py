"""Per-probe merge-count backend on the real TPU: perf + parity.

Compares the three CountOverlaps backends at two scales:
  merge  — packed-u32 pallas rank passes over cached sorted views (new)
  cosort — chunked co-sort count_matches (SEQUILA_COUNT_BACKEND=cosort)
  host   — native C++ index (the tunnel cost model's usual winner)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import pyarrow as pa

from sequila_tpu.config import Algorithm, SequilaConfig
from sequila_tpu.exec.context import ExecContext
from sequila_tpu.exec.joins.interval_join import IntervalJoinExec
from sequila_tpu.exec.plan import ScanExec
from sequila_tpu.models.table import Table
from sequila_tpu.planner.expr import Column
from sequila_tpu.planner.intervals import ColInterval, ColIntervals

print("devices:", jax.devices())


def make(n, seed, keys=24, span=120_000_000):
    r = np.random.default_rng(seed)
    s = r.integers(0, span, n).astype(np.int64)
    return Table(pa.table({
        "contig": pa.array(np.char.add("chr", (r.integers(0, keys, n) + 1).astype("U2"))),
        "s": s,
        "e": s + r.integers(1, 10_000, n),
    }))


def join_of(lt, rt):
    return IntervalJoinExec(
        ScanExec("l", lt), ScanExec("r", rt),
        on=[(Column("contig", 0), Column("contig", 0))],
        filter_=None,
        intervals=ColIntervals(
            ColInterval(Column("s", 1), Column("e", 2)),
            ColInterval(Column("s", 1), Column("e", 2)),
        ),
        algorithm=Algorithm.COITREES,
    )


for n, m in ((500_000, 500_000), (7_700_000, 2_300_000)):
    lt, rt = make(n, 1), make(m, 2)
    join = join_of(lt, rt)
    ctx = ExecContext(SequilaConfig())

    # host reference (also the oracle)
    hidx, rcodes, rs, re = join._host_index(ctx, lt, rt)
    t0 = time.perf_counter()
    host_counts = hidx.counts(rcodes, rs, re)
    t_host = time.perf_counter() - t0

    # merge backend
    got = join._merge_probe_counts(ctx, lt, rt)
    assert got is not None, "merge probe backend must engage"
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        got = join._merge_probe_counts(ctx, lt, rt)
        ts.append(time.perf_counter() - t0)
    np.testing.assert_array_equal(got.astype(np.int64), host_counts)
    t_merge = min(ts)

    # co-sort device backend
    os.environ["SEQUILA_COUNT_BACKEND"] = "cosort"
    try:
        import sequila_tpu.exec.joins.interval_join as ij
        orig = ij.IntervalJoinExec._use_host
        ij.IntervalJoinExec._use_host = lambda *a, **k: False
        cs = join.per_probe_counts(ctx)  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            cs = join.per_probe_counts(ctx)
            ts.append(time.perf_counter() - t0)
        t_cosort = min(ts)
        np.testing.assert_array_equal(np.asarray(cs, np.int64), host_counts)
    finally:
        del os.environ["SEQUILA_COUNT_BACKEND"]
        ij.IntervalJoinExec._use_host = orig

    print(f"n={n:,} m={m:,}: merge {t_merge*1e3:.1f} ms | "
          f"cosort {t_cosort*1e3:.1f} ms | host-native {t_host*1e3:.1f} ms "
          f"(total={int(host_counts.sum()):,})")

print("PROBE COUNTS VERIFIED")
