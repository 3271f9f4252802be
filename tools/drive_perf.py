import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time
import jax; print(jax.devices())
import pyarrow as pa
import bench
from sequila_tpu.session import SessionContext
ctx = SessionContext()
ctx.register_table("s1", pa.table(bench.gen_chain_table(20_000, 13)))
ctx.register_table("s2", pa.table(bench.gen_chain_table(300_000, 14)))
Q = ("SELECT * FROM s1 a JOIN s2 b ON a.contig = b.contig "
     "AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end")
r = ctx.sql(Q); assert r.num_rows == 14729736
ts=[]
for _ in range(6):
    t0=time.perf_counter(); ctx.sql(Q); ts.append(time.perf_counter()-t0)
print("15M SELECT * hot:", [round(t,3) for t in ts], "best", round(min(ts),3))
