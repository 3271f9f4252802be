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

Also asserts the BASELINE north-star scaling floor: ≥70% rows/s scaling
efficiency at 2 and 4 devices from BENCH_scaling.json (the 8-device point
oversubscribes the 4-core CI host and is informational only).

Usage: bench_gate.py <bench_result.json> [BENCH_full.json] [BENCH_scaling.json]
"""

from __future__ import annotations

import json
import os
import sys

THRESHOLD = 1.5  # fail when worse than previous by this factor
SCALING_FLOOR_PCT = 70.0  # BASELINE target: >=70% efficiency at 2/4 devices
PREV = "bench_previous.json"
COMMITTED = "bench_history.json"


def check_scaling_floor(path: str) -> list[str]:
    """BASELINE ≥70% scaling-efficiency assertion over the committed
    virtual-mesh artifact; returns failure strings (empty = pass)."""
    scaling = json.load(open(path))
    failures = []
    for n in ("2", "4"):
        row = scaling.get("devices", {}).get(n)
        if row is None:
            failures.append(f"scaling:{n}dev missing from {path}")
            continue
        eff = float(row["efficiency_pct"])
        ok = eff >= SCALING_FLOOR_PCT
        print(f"scaling:{n}dev efficiency {eff:.1f}% "
              f"(floor {SCALING_FLOOR_PCT:.0f}%: {'ok' if ok else 'FAIL'})")
        if not ok:
            failures.append(f"scaling:{n}dev={eff:.1f}%<{SCALING_FLOOR_PCT:.0f}%")
    return failures


# sections the full artifact MUST carry: a missing section is a gate
# FAILURE, not a silent skip — "section absent" and "section fine" must
# never be indistinguishable (the silent-truncation trap VERDICT r4
# flagged: the gate passed while validating none of the round's work)
REQUIRED_FULL_SECTIONS = (
    "algorithms", "pairings", "databio_pairings", "genomic_ops",
    "genomic_ops_genome", "copy_stream",
)


def flatten(
    result: dict, full: dict | None, failures: list[str]
) -> dict[str, tuple[float, bool]]:
    """metric -> (value, higher_is_better); missing required sections of
    the full artifact are appended to ``failures``."""
    out = {
        "headline_rows_per_sec": (float(result["value"]), True),
    }
    det = result.get("detail", {})
    if "materialize_rows_per_sec" in det:
        out["materialize_rows_per_sec"] = (
            float(det["materialize_rows_per_sec"]), True
        )
    if full:
        for section in REQUIRED_FULL_SECTIONS:
            if not full.get(section):
                failures.append(f"full-artifact section missing: {section}")
        for name, row in full.get("pairings", {}).items():
            if "rows_per_sec" in row:
                out[f"pairing:{name}"] = (float(row["rows_per_sec"]), True)
        for name, row in full.get("databio_pairings", {}).items():
            if "rows_per_sec" in row:
                out[f"databio:{name}"] = (float(row["rows_per_sec"]), True)
        for name, row in full.get("genomic_ops", {}).items():
            out[f"genomic:{name}"] = (float(row["seconds"]), False)
        for name, row in full.get("genomic_ops_genome", {}).items():
            out[f"genomic:{name}"] = (float(row["seconds"]), False)
        for name, row in full.get("algorithms", {}).items():
            out[f"algorithm:{name}"] = (float(row["rows_per_sec"]), True)
        for name, row in full.get("copy_stream", {}).items():
            out[f"stream:{name}"] = (float(row["rows_per_sec"]), True)
    return out


def main() -> int:
    result = json.load(open(sys.argv[1]))
    full = None
    full_missing = None
    if len(sys.argv) > 2:
        if os.path.exists(sys.argv[2]):
            full = json.load(open(sys.argv[2]))
        else:
            # a named-but-absent artifact is a FAILURE (a crashed --full
            # run must not look like a passing one), same rule as a
            # missing section
            full_missing = f"full artifact missing: {sys.argv[2]}"
    scaling_path = sys.argv[3] if len(sys.argv) > 3 else None
    if scaling_path is not None:
        # explicitly named: absence is a failure, same rule as the full
        # artifact (a crashed --scaling run must not look like a pass)
        scaling_failures = (
            check_scaling_floor(scaling_path)
            if os.path.exists(scaling_path)
            else [f"scaling artifact missing: {scaling_path}"]
        )
    else:
        scaling_path = "BENCH_scaling.json"
        scaling_failures = (
            check_scaling_floor(scaling_path)
            if os.path.exists(scaling_path)
            else []
        )
    failures: list[str] = []
    if full_missing:
        failures.append(full_missing)
    current = flatten(result, full, failures)

    prev = None
    for path in (PREV, COMMITTED):
        if os.path.exists(path):
            prev = json.load(open(path))
            print(f"baseline: {path}")
            break
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
    failures.extend(scaling_failures)
    if failures:
        print(f"FAILED: {len(failures)} metric(s) out of bounds "
              f"(>{THRESHOLD*100:.0f}% regression or scaling floor): "
              f"{failures}", file=sys.stderr)
        return 1
    print("gate passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
