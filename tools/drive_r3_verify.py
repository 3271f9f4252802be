"""Round-3 verify: materialization fast path + native gathers on real TPU."""
import time
import numpy as np
import jax
print("devices:", jax.devices())

import pyarrow as pa
from bench import gen_chain_table
from sequila_tpu.session import SessionContext

# 1. canonical fixture join (cardinality 16)
import os
reads = os.path.join("testing", "data", "interval", "reads.csv")
targets = os.path.join("testing", "data", "interval", "targets.csv")
ctx = SessionContext()
ctx.sql(f"CREATE EXTERNAL TABLE reads STORED AS CSV LOCATION '{reads}' OPTIONS ('format.has_header' 'true')")
ctx.sql(f"CREATE EXTERNAL TABLE targets STORED AS CSV LOCATION '{targets}' OPTIONS ('format.has_header' 'true')")
out = ctx.sql(
    "SELECT count(1) FROM reads a JOIN targets b ON a.contig = b.contig "
    "AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end"
)
got = int(out.column_np(0)[0])
assert got == 16, got
print("fixture join count = 16 OK")

# 2. materializing SELECT * at 15M rows through the new routed host path
ctx2 = SessionContext()
ctx2.register_table("s1", pa.table(gen_chain_table(20_000, 13)))
ctx2.register_table("s2", pa.table(gen_chain_table(300_000, 14)))
Q = ("SELECT * FROM s1 a JOIN s2 b ON a.contig = b.contig "
     "AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end")
out = ctx2.sql(Q)
n = out.num_rows
print("materialize rows:", n)
import gc
times = []
for _ in range(5):
    out = None; gc.collect()
    t0 = time.perf_counter(); out = ctx2.sql(Q); times.append(time.perf_counter() - t0)
print(f"materialize 15M: min {min(times):.3f}s -> {n/min(times)/1e6:.1f}M rows/s")

# 3. device count path still intact on the REAL TPU (headline query shape)
ctx3 = SessionContext()
ctx3.register_table("s1", pa.table(gen_chain_table(207_146, 1)))
ctx3.register_table("s2", pa.table(gen_chain_table(302_381, 2)))
QC = ("SELECT count(1) FROM s1 a JOIN s2 b ON a.contig = b.contig "
      "AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end")
total = int(ctx3.sql(QC).column_np(0)[0])
times = []
for _ in range(3):
    t0 = time.perf_counter()
    got = int(ctx3.sql(QC).column_np(0)[0])
    times.append(time.perf_counter() - t0)
    assert got == total
print(f"headline count on TPU: {total:,} rows, min {min(times)*1000:.1f} ms "
      f"-> {total/min(times)/1e9:.2f}B rows/s")

# 4. device materialize path (forced) still correct vs host result
os.environ["SEQUILA_HOST_THRESHOLD"] = "0"
ctx4 = SessionContext()
ctx4.register_table("s1", pa.table(gen_chain_table(3_000, 41)))
ctx4.register_table("s2", pa.table(gen_chain_table(10_000, 42)))
QM = ("SELECT a.pos_start, b.pos_end FROM s1 a JOIN s2 b ON a.contig = b.contig "
      "AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end")
dev_out = ctx4.sql(QM)
os.environ["SEQUILA_HOST_THRESHOLD"] = "100000000"
ctx5 = SessionContext()
ctx5.register_table("s1", pa.table(gen_chain_table(3_000, 41)))
ctx5.register_table("s2", pa.table(gen_chain_table(10_000, 42)))
host_out = ctx5.sql(QM)
# same pair multiset; intra-probe match order is not part of the contract
# (device emits level-minor, host emits start-ascending; the reference's
# own tests sort before comparing, integration_test.rs:114-115)
ds = sorted(map(tuple, zip(*[dev_out.column_np(i) for i in range(2)])))
hs = sorted(map(tuple, zip(*[host_out.column_np(i) for i in range(2)])))
assert ds == hs, "device vs host materialize mismatch"
print(f"device-vs-host materialize parity OK ({dev_out.num_rows:,} rows)")
print("VERIFY PASSED")
