"""Real-TPU validation of the merge-count backend at whole-genome scale:
parity + steady-state timing vs the co-sort backend."""
import os, sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow as pa

from bench import gen_genome_table, QUERY
from sequila_tpu.session import SessionContext


def run(backend, iters=8):
    os.environ["SEQUILA_COUNT_BACKEND"] = backend
    ctx = SessionContext()
    ctx.register_table("s1", pa.table(gen_genome_table(2_350_965, 21)))
    ctx.register_table("s2", pa.table(gen_genome_table(7_684_066, 22)))
    ctx.sql("SET sequila.prefer_interval_join = true")
    q = (
        "SELECT count(*) FROM s1 a JOIN s2 b ON a.contig = b.contig "
        "AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end"
    )
    out = ctx.sql(q).to_pylist()[0]["count(*)"]
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = ctx.sql(q).to_pylist()[0]["count(*)"]
        ts.append(time.perf_counter() - t0)
        assert r == out
    best = min(ts)
    med = sorted(ts)[len(ts) // 2]
    print(
        f"{backend}: rows={out} best={best*1000:.1f}ms med={med*1000:.1f}ms "
        f"-> {out/med/1e9:.2f} B rows/s (med)", flush=True,
    )
    return out


a = run("merge")
b = run("cosort")
print("parity:", "ok" if a == b else "MISMATCH", flush=True)
sys.exit(0 if a == b else 1)
