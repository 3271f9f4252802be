import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import os, time
os.environ["SEQUILA_MAX_OUTPUT_BATCH_SIZE"] = "100000"  # chunk = 1000 probe rows
import jax
print("devices:", jax.devices())
import pyarrow as pa
import bench
from sequila_tpu.session import SessionContext

t1 = pa.table(bench.gen_chain_table(20_000, 41, median_len=20_000))
t2 = pa.table(bench.gen_chain_table(20_000, 42, median_len=20_000))
ctx = SessionContext()
ctx.register_table("s1", t1); ctx.register_table("s2", t2)
Q = ("SELECT * FROM s1 a JOIN s2 b ON a.contig = b.contig "
     "AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end")
full = ctx.sql(Q)
ctx.sql("SET sequila.interval_join_low_memory = true")
t0=time.perf_counter(); lm = ctx.sql(Q); t_lm=time.perf_counter()-t0
print("full rows", full.num_rows, "low_memory rows", lm.num_rows, f"low-mem {t_lm:.2f}s")
print("DBG", full.num_rows, lm.num_rows); assert full.num_rows == lm.num_rows
# value parity (sorted)
import pyarrow.compute as pc
def key(t):
    tt = t.arrow
    return sorted(zip(*[tt.column(i).to_pylist() for i in range(tt.num_columns)]))
assert key(full) == key(lm), "low-memory output mismatch"
print("low-memory chunked pipeline parity OK")
