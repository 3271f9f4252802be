#!/usr/bin/env python
"""databio-style interval-join benchmark (the reference's headline workload).

Canonical query (reference benches/databio_benchmark.rs:205-216):

    SELECT count(*) FROM s1 a JOIN s2 b
    ON a.contig = b.contig
    AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end

The reference's anchor numbers (BASELINE.md): chainRn4_chr1 (207,146 rows)
x chainVicPac2_chr1 (302,381 rows) -> 154,374,873 output rows in 2.457 s
with the Coitrees algorithm on one CPU core ~= 63 M output rows/s.

The databio parquet files are not present in this image (zero egress), so
the bench generates synthetic chain-alignment-like tables with the same
row counts and a length distribution tuned to reproduce the anchor's
output cardinality within a few percent; the engine's exact count is
reported alongside.  Timing covers the full SQL query execution — key
dictionary encoding, i32 bound evaluation, index build, device transfer,
BITS count kernel — per iteration, matching how criterion times the
reference's SQL path (index rebuilt every iteration).

Output: ONE JSON line
  {"metric": ..., "value": N, "unit": "output_rows_per_sec", "vs_baseline": N}
"""

import argparse
import json
import sys
import time

import numpy as np

N_LEFT, N_RIGHT = 207_146, 302_381  # chainRn4_chr1 / chainVicPac2_chr1 rows
CHR1_SPAN = 245_000_000
BASELINE_ROWS_PER_SEC = 63_000_000.0  # 154.37 M rows / 2.457 s (BASELINE.md)


def gen_chain_table(n, seed, median_len=98_000, sigma=1.5):
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, CHR1_SPAN, n).astype(np.int64)
    lens = np.exp(rng.normal(np.log(median_len), sigma, n)).astype(np.int64)
    ends = np.minimum(starts + np.maximum(lens, 1), 2**31 - 2)
    contig = np.full(n, "chr1")
    return {
        "contig": contig,
        "pos_start": starts.astype(np.int64),
        "pos_end": ends.astype(np.int64),
    }


QUERY = (
    "SELECT count(1) FROM s1 a JOIN s2 b ON a.contig = b.contig "
    "AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end"
)


def run(algorithm="coitrees", iters=5, verbose=False):
    import pyarrow as pa

    from sequila_tpu.session import SessionContext

    ctx = SessionContext()
    ctx.register_table("s1", pa.table(gen_chain_table(N_LEFT, seed=1)))
    ctx.register_table("s2", pa.table(gen_chain_table(N_RIGHT, seed=2)))
    ctx.sql("SET sequila.prefer_interval_join = true")
    ctx.sql(f"SET sequila.interval_join_algorithm = {algorithm}")

    # Warmup: compile kernels for this shape bucket.
    total = int(ctx.sql(QUERY).column_np(0)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        got = int(ctx.sql(QUERY).column_np(0)[0])
        times.append(time.perf_counter() - t0)
        assert got == total
    t = min(times)
    if verbose:
        print(
            f"alg={algorithm}: {total:,} output rows, "
            f"min {t*1000:.1f} ms / median {sorted(times)[len(times)//2]*1000:.1f} ms "
            f"-> {total/t/1e6:.0f}M rows/s",
            file=sys.stderr,
        )
    return total, t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="run all algorithms")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    if args.full:
        for alg in (
            "coitrees", "intervaltree", "arrayintervaltree", "lapper",
            "superintervals",
        ):
            run(alg, iters=args.iters, verbose=True)

    total, t = run("coitrees", iters=args.iters, verbose=args.full)
    value = total / t
    print(
        json.dumps(
            {
                "metric": "interval_join_output_rows_per_sec",
                "value": round(value),
                "unit": "output_rows_per_sec",
                "vs_baseline": round(value / BASELINE_ROWS_PER_SEC, 3),
                "detail": {
                    "query": "databio count(*) chainRn4_chr1-like x chainVicPac2_chr1-like",
                    "output_rows": total,
                    "seconds": round(t, 4),
                    "baseline": "sequila-native Coitrees 154.37M rows / 2.457 s (BASELINE.md)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
