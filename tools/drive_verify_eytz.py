"""Verify the Eytzinger-default native layout end-to-end on the real TPU.

1. canonical q1 join (expect 16 rows, reference integration_test.rs:42-65)
2. a host-routed count_overlaps at native-index scale, vs the NumPy oracle
3. 1M-probe count timing anchor (previous runs: ~118 ms co-sort, ~27 ms merge)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import pyarrow as pa

from sequila_tpu.session import SessionContext
from sequila_tpu.models.table import Table
from sequila_tpu.ops.oracle import oracle_counts
from sequila_tpu.native import loader

print("devices:", jax.devices())
assert "TPU" in str(jax.devices()[0]), "not running on the real TPU"

# --- 1. canonical fixture join ---
ctx = SessionContext()
ctx.sql("CREATE EXTERNAL TABLE reads STORED AS CSV"
        " LOCATION 'testing/data/interval/reads.csv'")
ctx.sql("CREATE EXTERNAL TABLE targets STORED AS CSV"
        " LOCATION 'testing/data/interval/targets.csv'")
out = ctx.sql(
    "SELECT * FROM reads JOIN targets ON reads.contig = targets.contig "
    "AND reads.pos_end >= targets.pos_start AND reads.pos_start <= targets.pos_end"
)
assert out.num_rows == 16, f"q1 expected 16 rows, got {out.num_rows}"
print("q1 join OK: 16 rows")

# --- 2. host-routed per-probe counts through the (eytzinger) native index ---
rng = np.random.default_rng(11)
n, m = 500_000, 500_000
bk = rng.integers(0, 24, n).astype(np.int32)
bs = rng.integers(0, 50_000_000, n).astype(np.int32)
be = bs + rng.integers(0, 8_000, n).astype(np.int32)
qk = rng.integers(0, 24, m).astype(np.int32)
qs = rng.integers(0, 50_000_000, m).astype(np.int32)
qe = qs + rng.integers(0, 8_000, m).astype(np.int32)
idx = loader.NativeIntervalIndex(bk, bs, be)
print("native layout:", idx.layout)
assert idx.layout == "eytzinger"
got = idx.counts(qk, qs, qe)
sl = slice(0, 20_000)
np.testing.assert_array_equal(
    got[sl], oracle_counts(bk, bs, be, qk[sl], qs[sl], qe[sl])
)
print(f"native counts OK (total={int(got.sum()):,})")

# SQL count_overlaps verb end-to-end (routes device/host by cost model)
build = Table(pa.table({
    "contig": np.char.add("chr", (bk % 4 + 1).astype("U2")),
    "pos_start": bs, "pos_end": be,
}))
probe = Table(pa.table({
    "contig": np.char.add("chr", (qk % 4 + 1).astype("U2")),
    "pos_start": qs, "pos_end": qe,
}))
ctx.register_table("b", build)
ctx.register_table("p", probe)
res = ctx.sql(
    "SELECT count(*) AS c FROM p JOIN b ON p.contig = b.contig AND "
    "p.pos_end >= b.pos_start AND p.pos_start <= b.pos_end"
)
folded_idx = loader.NativeIntervalIndex(
    (bk % 4).astype(np.int32), bs, be
)
expect = int(folded_idx.counts((qk % 4).astype(np.int32), qs, qe).sum())
got_c = res.column_np("c")[0]
assert got_c == expect, f"SQL count {got_c} != native {expect}"
print(f"SQL join count OK ({got_c:,})")

# --- 3. timing anchor: 1M-probe count on the TPU ---
n, m = 100_000, 1_000_000
bk2 = rng.integers(0, 4, n).astype(np.int32)
bs2 = rng.integers(0, 10_000_000, n).astype(np.int32)
be2 = bs2 + rng.integers(0, 5_000, n).astype(np.int32)
qk2 = rng.integers(0, 4, m).astype(np.int32)
qs2 = rng.integers(0, 10_000_000, m).astype(np.int32)
qe2 = qs2 + rng.integers(0, 5_000, m).astype(np.int32)
t1 = Table(pa.table({"k": bk2, "s": bs2, "e": be2}))
t2 = Table(pa.table({"k": qk2, "s": qs2, "e": qe2}))
ctx.register_table("anchor_b", t1)
ctx.register_table("anchor_p", t2)
q = ("SELECT count(*) AS c FROM anchor_p p JOIN anchor_b b ON p.k = b.k "
     "AND p.e >= b.s AND p.s <= b.e")
ctx.sql(q)  # warm/compile
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    r = ctx.sql(q)
    ts.append(time.perf_counter() - t0)
print(f"1M-probe count anchor: best {min(ts)*1e3:.1f} ms "
      f"(median {sorted(ts)[2]*1e3:.1f} ms), count={r.column_np('c')[0]:,}")
print("VERIFY PASSED")
