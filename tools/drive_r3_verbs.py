"""Drive the cost-model-routed genomic verbs on the real TPU attachment:
parity between the host-routed (big inputs) and device-forced paths."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time
import numpy as np
import jax
print("devices:", jax.devices())
import pyarrow as pa
from bench import gen_genome_table
from sequila_tpu import dataframe as gdf
from sequila_tpu.models.table import Table

A = Table(pa.table(gen_genome_table(200_000, 61)))
B = Table(pa.table(gen_genome_table(200_000, 62)))

def snap(out):
    return (out.num_rows, out.arrow.slice(0, 50).to_pylist(),
            out.arrow.slice(max(out.num_rows - 50, 0), 50).to_pylist())

results = {}
for name, fn in [
    ("coverage", lambda: gdf.coverage(A, B)),
    ("overlap", lambda: gdf.overlap(A, B)),
    ("nearest", lambda: gdf.nearest(A, B)),
    ("closest_k1", lambda: gdf.closest(A, B, k=1)),
    ("window", lambda: gdf.window(A, B, window=5_000)),
]:
    fn()
    t0 = time.perf_counter(); out = fn(); dt = time.perf_counter() - t0
    results[name] = snap(out)
    print(f"{name} (routed): {out.num_rows:,} rows in {dt*1000:.0f} ms", flush=True)

# force the device path and compare results
os.environ["SEQUILA_HOST_THRESHOLD"] = "0"
A2 = Table(pa.table(gen_genome_table(200_000, 61)))
B2 = Table(pa.table(gen_genome_table(200_000, 62)))
for name, fn in [
    ("coverage", lambda: gdf.coverage(A2, B2)),
    ("overlap", lambda: gdf.overlap(A2, B2)),
    ("nearest", lambda: gdf.nearest(A2, B2)),
    ("closest_k1", lambda: gdf.closest(A2, B2, k=1)),
    ("window", lambda: gdf.window(A2, B2, window=5_000)),
]:
    t0 = time.perf_counter(); out = fn(); dt = time.perf_counter() - t0
    got = snap(out)
    assert got[0] == results[name][0], (name, got[0], results[name][0])
    if name in ("coverage",):  # row-aligned outputs compare exactly
        assert got[1] == results[name][1] and got[2] == results[name][2], name
    print(f"{name} (device): {out.num_rows:,} rows in {dt*1000:.0f} ms — parity OK", flush=True)
print("VERBS DRIVE PASSED")
