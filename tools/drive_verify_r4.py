"""Round-4 verification drive: real-TPU end-to-end through the public API.

Exercises the changed partitioned-materialization ordering path
(interval_join.py: stable probe-row radix instead of np.lexsort) plus the
canonical 16-row reference smoke query."""

import time

import jax

print("devices:", jax.devices())
assert "TPU" in str(jax.devices()[0]).upper() or "tpu" in str(
    jax.devices()[0]
), f"not on TPU: {jax.devices()}"

import numpy as np
import pyarrow as pa

from sequila_tpu.session import SessionContext

# --- canonical reference smoke: equi+overlap join, cardinality 16 ---------
ctx = SessionContext()
ctx.sql(
    "CREATE EXTERNAL TABLE reads STORED AS CSV LOCATION "
    "'testing/data/interval/reads.csv'"
)
ctx.sql(
    "CREATE EXTERNAL TABLE targets STORED AS CSV LOCATION "
    "'testing/data/interval/targets.csv'"
)
q = (
    "SELECT count(1) FROM reads JOIN targets ON reads.contig = targets.contig "
    "AND reads.pos_end >= targets.pos_start AND reads.pos_start <= targets.pos_end"
)
got = int(ctx.sql(q).column_np(0)[0])
assert got == 16, f"canonical count {got} != 16"
print("canonical 16-row smoke OK")

# --- partitioned materialization on the real chip --------------------------
rng = np.random.default_rng(7)
n = m = 200_000
span = 40_000_000


def mk(k, s, e):
    return pa.table(
        {
            "contig": np.array([f"chr{i}" for i in k]),
            "pos_start": s.astype(np.int64),
            "pos_end": e.astype(np.int64),
        }
    )


lk = rng.integers(0, 8, n).astype(np.int32)
rk = rng.integers(0, 8, m).astype(np.int32)
ls = rng.integers(0, span, n).astype(np.int32)
le = (ls + rng.integers(1, 2_000, n)).astype(np.int32)
rs = rng.integers(0, span, m).astype(np.int32)
re = (rs + rng.integers(1, 2_000, m)).astype(np.int32)

ctx2 = SessionContext()
ctx2.register_table("s1", mk(lk, ls, le))
ctx2.register_table("s2", mk(rk, rs, re))
sel = (
    "SELECT s2.pos_start, s2.pos_end, s1.pos_start, s1.pos_end "
    "FROM s1 JOIN s2 ON s1.contig = s2.contig "
    "AND s1.pos_end >= s2.pos_start AND s1.pos_start <= s2.pos_end"
)
t0 = time.perf_counter()
single = ctx2.sql(sel)
t_single = time.perf_counter() - t0
ctx2.sql("SET datafusion.execution.target_partitions = 4")
t0 = time.perf_counter()
part = ctx2.sql(sel)
t_part = time.perf_counter() - t0
assert part.num_rows == single.num_rows, (part.num_rows, single.num_rows)
# probe-order contract: partitioned output's probe starts must be grouped
# identically to single-chip when both are viewed as sorted multisets
a = np.sort(
    np.stack([single.column_np(i).astype(np.int64) for i in range(4)], 1), axis=0
)
b = np.sort(
    np.stack([part.column_np(i).astype(np.int64) for i in range(4)], 1), axis=0
)
np.testing.assert_array_equal(a, b)
print(
    f"partitioned materialize parity OK: {part.num_rows} rows "
    f"(single {t_single:.2f}s, partitioned {t_part:.2f}s)"
)
print("VERIFY PASSED")
