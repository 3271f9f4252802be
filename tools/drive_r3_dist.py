"""Drive the Partitioned-mode distribution paths (hash/shuffle/skew/auto)
on the real TPU — degenerate 1-chip mesh, full SQL surface."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
print("devices:", jax.devices())
import pyarrow as pa
from sequila_tpu.session import SessionContext

r = np.random.default_rng(5)
def one(rows, seed):
    rr = np.random.default_rng(seed)
    k = np.where(rr.random(rows) < 0.9, 0, rr.integers(1, 5, rows))
    st = rr.integers(0, 50_000, rows)
    return pa.table({
        "contig": [f"chr{i}" for i in k],
        "pos_start": st,
        "pos_end": st + rr.integers(0, 500, rows),
    })

Q = ("SELECT count(1) FROM s1 JOIN s2 ON s1.contig = s2.contig "
     "AND s1.pos_end >= s2.pos_start AND s1.pos_start <= s2.pos_end")
QM = ("SELECT s1.pos_start, s2.pos_end FROM s1 JOIN s2 ON s1.contig = s2.contig "
      "AND s1.pos_end >= s2.pos_start AND s1.pos_start <= s2.pos_end "
      "ORDER BY s1.pos_start, s2.pos_end")
ctx = SessionContext()
ctx.register_table("s1", one(2_000, 1))
ctx.register_table("s2", one(3_000, 2))
want_c = ctx.sql(Q).column_np(0)[0]
want_m = ctx.sql(QM).to_pylist()
ctx.sql("SET datafusion.execution.target_partitions = 8")
for dist in ("auto", "hash", "shuffle", "skew"):
    ctx.sql(f"SET sequila.partitioned_distribution = {dist}")
    got_c = ctx.sql(Q).column_np(0)[0]
    assert got_c == want_c, (dist, got_c, want_c)
    got_m = ctx.sql(QM).to_pylist()
    assert got_m == want_m, dist
    print(f"distribution={dist}: count {got_c} + materialize parity OK on TPU")
print("DIST DRIVE PASSED")
