"""Round-4 verification drive B: streaming pipeline on the real TPU.

Exercises sql_batches on the DEVICE route (SEQUILA_HOST_THRESHOLD=0) and
the streamed COPY ... TO sinks, checking parity with whole-table sql()."""

import os

os.environ["SEQUILA_HOST_THRESHOLD"] = "0"  # force the device kernels

import time

import jax

print("devices:", jax.devices())
assert "TPU" in str(jax.devices()[0]).upper()

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sequila_tpu.session import SessionContext

rng = np.random.default_rng(3)
n = m = 120_000
ctx = SessionContext()


def mk(k, s, e):
    return pa.table(
        {
            "contig": np.array([f"chr{i}" for i in k]),
            "pos_start": s.astype(np.int64),
            "pos_end": e.astype(np.int64),
        }
    )


lk = rng.integers(0, 8, n)
rk = rng.integers(0, 8, m)
ls = rng.integers(0, 30_000_000, n)
rs = rng.integers(0, 30_000_000, m)
ctx.register_table("s1", mk(lk, ls, ls + rng.integers(1, 3_000, n)))
ctx.register_table("s2", mk(rk, rs, rs + rng.integers(1, 3_000, m)))
q = (
    "SELECT s2.pos_start, s2.pos_end, s1.pos_start, s1.pos_end "
    "FROM s1 JOIN s2 ON s1.contig = s2.contig "
    "AND s1.pos_end >= s2.pos_start AND s1.pos_start <= s2.pos_end"
)
whole = ctx.sql(q)
print(f"whole-table on TPU: {whole.num_rows} rows")
ctx.sql("SET sequila.max_output_batch_size = 20000")
t0 = time.perf_counter()
batches = list(ctx.sql_batches(q))
dt = time.perf_counter() - t0
assert len(batches) > 1, "device route should stream multiple batches"
got = pa.concat_tables([b.arrow for b in batches])
assert got.num_rows == whole.num_rows


def key(t):
    return sorted(zip(*[c.to_pylist() for c in t.columns]))


assert key(got) == key(whole.arrow)
print(f"device streaming parity OK: {len(batches)} batches in {dt:.2f}s")

out = "/tmp/drive_r4b.parquet"
res = ctx.sql(f"COPY ({q}) TO '{out}'")
assert int(res.column_np(0)[0]) == whole.num_rows
assert pq.read_table(out).num_rows == whole.num_rows
print("streamed COPY on TPU route OK")
print("VERIFY PASSED")
