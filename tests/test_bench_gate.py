"""tools/bench_gate.py contract: missing required full-artifact sections
are failures, never silent skips (the VERDICT r4 silent-truncation trap);
regressions past 150% fail; a complete, non-regressing artifact passes."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
GATE = REPO / "tools" / "bench_gate.py"


def _run(tmp_path, result, full):
    json.dump(result, open(tmp_path / "r.json", "w"))
    json.dump(full, open(tmp_path / "f.json", "w"))
    return subprocess.run(
        [sys.executable, str(GATE), "r.json", "f.json"],
        cwd=tmp_path, capture_output=True, text=True,
    )


def _full(**overrides):
    base = {
        "algorithms": {"coitrees": {"rows_per_sec": 1e9}},
        "pairings": {"p": {"rows_per_sec": 1e8}},
        "databio_pairings": {"d": {"rows_per_sec": 1e8}},
        "genomic_ops": {"g": {"seconds": 0.1}},
        "genomic_ops_genome": {"gg": {"seconds": 0.5}},
        "copy_stream": {"copy": {"rows_per_sec": 5e7}},
    }
    base.update(overrides)
    return base


RESULT = {"value": 5e9, "detail": {"materialize_rows_per_sec": 2e8}}


def test_missing_section_fails(tmp_path):
    full = _full()
    del full["copy_stream"]
    r = _run(tmp_path, RESULT, full)
    assert r.returncode == 1
    assert "copy_stream" in r.stderr


def test_empty_section_fails(tmp_path):
    r = _run(tmp_path, RESULT, _full(genomic_ops_genome={}))
    assert r.returncode == 1
    assert "genomic_ops_genome" in r.stderr


def test_complete_artifact_passes_and_records_baseline(tmp_path):
    r = _run(tmp_path, RESULT, _full())
    assert r.returncode == 0, r.stderr
    prev = json.load(open(tmp_path / "bench_previous.json"))
    assert "headline_rows_per_sec" in prev


def test_regression_past_threshold_fails(tmp_path):
    r = _run(tmp_path, RESULT, _full())
    assert r.returncode == 0
    worse = dict(RESULT, value=RESULT["value"] / 2)  # 200% regression
    r = _run(tmp_path, worse, _full())
    assert r.returncode == 1
    assert "headline_rows_per_sec" in r.stderr


def test_named_but_absent_full_artifact_fails(tmp_path):
    """A crashed --full run (file never written) must not gate-pass."""
    json.dump(RESULT, open(tmp_path / "r.json", "w"))
    r = subprocess.run(
        [sys.executable, str(GATE), "r.json", "BENCH_full.json"],
        cwd=tmp_path, capture_output=True, text=True,
    )
    assert r.returncode == 1
    assert "full artifact missing" in r.stderr


def test_named_but_absent_scaling_artifact_fails(tmp_path):
    json.dump(RESULT, open(tmp_path / "r.json", "w"))
    json.dump(_full(), open(tmp_path / "f.json", "w"))
    r = subprocess.run(
        [sys.executable, str(GATE), "r.json", "f.json", "BENCH_scaling.json"],
        cwd=tmp_path, capture_output=True, text=True,
    )
    assert r.returncode == 1
    assert "scaling artifact missing" in r.stderr
