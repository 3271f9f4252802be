#!/usr/bin/env python
"""Benchmark regression gate (reference benchmark.yml's 150% alert).

Compares the current headline + full-suite numbers against the persisted
previous run (``bench_previous.json`` restored from the CI cache, falling
back to the committed ``bench_history.json``), fails on any metric
regressing past the threshold, then writes the merged state back to
``bench_previous.json`` for the cache-save step.

Gated metrics (VERDICT r2 #5 asked for more than the headline):
- headline output rows/s (higher is better)
- headline materialization rows/s (higher is better)
- every --full pairing's rows/s (higher is better)
- every --full genomic-verb wall time (lower is better)

Usage: bench_gate.py <bench_result.json> [BENCH_full.json]
"""

from __future__ import annotations

import json
import os
import sys

THRESHOLD = 1.5  # fail when worse than previous by this factor
PREV = "bench_previous.json"
COMMITTED = "bench_history.json"


def flatten(result: dict, full: dict | None) -> dict[str, tuple[float, bool]]:
    """metric -> (value, higher_is_better)."""
    out = {
        "headline_rows_per_sec": (float(result["value"]), True),
    }
    det = result.get("detail", {})
    if "materialize_rows_per_sec" in det:
        out["materialize_rows_per_sec"] = (
            float(det["materialize_rows_per_sec"]), True
        )
    if full:
        for name, row in full.get("pairings", {}).items():
            if "rows_per_sec" in row:
                out[f"pairing:{name}"] = (float(row["rows_per_sec"]), True)
        for name, row in full.get("genomic_ops", {}).items():
            out[f"genomic:{name}"] = (float(row["seconds"]), False)
        for name, row in full.get("algorithms", {}).items():
            out[f"algorithm:{name}"] = (float(row["rows_per_sec"]), True)
    return out


def main() -> int:
    result = json.load(open(sys.argv[1]))
    full = None
    if len(sys.argv) > 2 and os.path.exists(sys.argv[2]):
        full = json.load(open(sys.argv[2]))
    current = flatten(result, full)

    prev = None
    for path in (PREV, COMMITTED):
        if os.path.exists(path):
            prev = json.load(open(path))
            print(f"baseline: {path}")
            break
    failures = []
    if prev:
        for name, (val, hib) in current.items():
            if name not in prev or not val:
                continue
            old = float(prev[name][0] if isinstance(prev[name], list) else prev[name])
            if not old:
                continue
            ratio = (old / val) if hib else (val / old)
            status = "REGRESSION" if ratio > THRESHOLD else "ok"
            print(f"{name}: {old:.6g} -> {val:.6g} ({ratio*100:.0f}% {status})")
            if ratio > THRESHOLD:
                failures.append(name)
    else:
        print("no previous result; recording baseline")
    json.dump(
        {k: [v, hib] for k, (v, hib) in current.items()},
        open(PREV, "w"), indent=1, sort_keys=True,
    )
    if failures:
        print(f"FAILED: {len(failures)} metric(s) regressed past "
              f"{THRESHOLD*100:.0f}%: {failures}", file=sys.stderr)
        return 1
    print("gate passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
