"""Round-4 verification drive (verify skill): real-TPU smoke of the
public API after the merge-count backend change."""
import sys, time

sys.path.insert(0, "/root/repo")
import jax

print("devices:", jax.devices(), flush=True)
assert "TPU" in str(jax.devices()[0]), "must run on the real TPU"

import numpy as np
import pyarrow as pa

from sequila_tpu.session import SessionContext

# canonical fixture join (reference integration_test.rs:42-65): 16 rows
ctx = SessionContext()
ctx.sql(
    "CREATE EXTERNAL TABLE reads STORED AS CSV LOCATION "
    "'testing/data/interval/reads.csv' OPTIONS ('has_header' 'true')"
)
ctx.sql(
    "CREATE EXTERNAL TABLE targets STORED AS CSV LOCATION "
    "'testing/data/interval/targets.csv' OPTIONS ('has_header' 'true')"
)
ctx.sql("SET sequila.prefer_interval_join = true")
q = (
    "SELECT count(*) FROM reads a JOIN targets b ON a.contig = b.contig "
    "AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end"
)
got = ctx.sql(q).to_pylist()[0]["count(*)"]
print("fixture count:", got, flush=True)
assert got == 16, got

# 1M-probe count timing (previous verification anchor: ~118 ms on 2026-08-17)
rng = np.random.default_rng(5)
def gen(n, seed):
    r = np.random.default_rng(seed)
    s = r.integers(0, 50_000_000, n).astype(np.int64)
    return pa.table({
        "contig": np.array([f"chr{int(i)}" for i in r.integers(0, 23, n)]),
        "pos_start": s,
        "pos_end": s + r.integers(1, 20_000, n),
    })

ctx2 = SessionContext()
ctx2.register_table("s1", gen(100_000, 11))
ctx2.register_table("s2", gen(1_000_000, 12))
ctx2.sql("SET sequila.prefer_interval_join = true")
q2 = (
    "SELECT count(*) FROM s1 a JOIN s2 b ON a.contig = b.contig "
    "AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end"
)
first = ctx2.sql(q2).to_pylist()[0]["count(*)"]
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    r = ctx2.sql(q2).to_pylist()[0]["count(*)"]
    ts.append(time.perf_counter() - t0)
    assert r == first
print(f"1M-probe count: {first} rows, median {sorted(ts)[3]*1000:.1f} ms "
      f"(anchor 2026-08-17: 118 ms)", flush=True)
print("VERIFY DRIVE PASSED", flush=True)
