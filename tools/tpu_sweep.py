"""Drive every device kernel path on the REAL TPU and compare against the
host path (which the CPU test-suite already proves correct)."""
import os, sys
os.environ["SEQUILA_HOST_THRESHOLD"] = "0"  # force device path
sys.path.insert(0, "/root/repo")
import numpy as np, pyarrow as pa
import jax
print("devices:", jax.devices())
from sequila_tpu.session import SessionContext
from sequila_tpu import dataframe as gdf
from sequila_tpu.models.table import Table

rng = np.random.default_rng(7)
def tbl(n, keys=4, span=50_000, ln=800, seed=0):
    r = np.random.default_rng(seed)
    return pa.table({
        "contig": [f"chr{k}" for k in r.integers(1, keys+1, n)],
        "pos_start": (s := r.integers(0, span, n)),
        "pos_end": s + r.integers(0, ln, n),
    })

ctx = SessionContext()
ctx.register_table("a", tbl(3000, seed=1))
ctx.register_table("b", tbl(4000, seed=2))
ctx.sql("SET sequila.prefer_interval_join = true")

def rows_of(t):
    cols = [t.column_np(i).tolist() for i in range(len(t.column_names))]
    return sorted(
        (tuple((v is None or v != v, str(v)) for v in r) for r in zip(*cols))
    )

checks = []
def check(name, query, algorithms=("coitrees",)):
    results = {}
    for alg in algorithms:
        ctx.sql(f"SET sequila.interval_join_algorithm = {alg}")
        os.environ["SEQUILA_HOST_THRESHOLD"] = "0"
        dev = rows_of(ctx.sql(query))
        os.environ["SEQUILA_HOST_THRESHOLD"] = "100000000"
        host = rows_of(ctx.sql(query))
        ok = dev == host
        results[alg] = ok
        checks.append((name, alg, ok, len(dev)))
    return results

J = ("SELECT * FROM a JOIN b ON a.contig = b.contig"
     " AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start")
check("inner SELECT *", J, ("coitrees", "intervaltree", "lapper", "superintervals"))
check("left outer", J.replace("JOIN", "LEFT JOIN"))
check("full outer", J.replace("JOIN", "FULL JOIN"))
check("nearest", J, ("coitreesnearest",))
check("strict ops", J.replace("<=", "<").replace(">=", ">"))
check("count group", "SELECT a.contig, count(1) AS n FROM a JOIN b ON a.contig = b.contig"
      " AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start GROUP BY a.contig ORDER BY a.contig")

# DataFrame device paths
os.environ["SEQUILA_HOST_THRESHOLD"] = "0"
A, B = Table(tbl(2000, seed=3)), Table(tbl(2500, seed=4))
dev_cov = gdf.coverage(A, B)
dev_cnt = gdf.count_overlaps(A, B)
os.environ["SEQUILA_HOST_THRESHOLD"] = "100000000"
host_cov = gdf.coverage(A, B)
host_cnt = gdf.count_overlaps(A, B)
checks.append(("coverage", "-", rows_of(dev_cov) == rows_of(host_cov), dev_cov.num_rows))
checks.append(("count_overlaps", "-", rows_of(dev_cnt) == rows_of(host_cnt), dev_cnt.num_rows))

bad = [c for c in checks if not c[2]]
for c in checks:
    print(("OK  " if c[2] else "FAIL"), c[0], c[1], f"rows={c[3]}")
print("SWEEP", "PASSED" if not bad else f"FAILED ({len(bad)})")
