"""Mesh-layer tests for the round-2 operators: nearest, per-probe counts,
coverage, and chunked low-memory pair emission on the virtual 8-device mesh.

The reference's Partitioned mode has no test coverage at all (SURVEY.md
§4); these extend the round-1 count/pairs parity to the remaining join
semantics (reference interval_join.rs:909-1020 nearest,
CoitreesCountOverlaps counts, superintervals.rs:802-822 coverage).
"""

import numpy as np
import pytest

from sequila_tpu.ops.oracle import oracle_counts, oracle_nearest, oracle_pairs
from sequila_tpu.parallel.mesh import make_mesh
from sequila_tpu.parallel.partitioned_join import (
    partitioned_coverage,
    partitioned_nearest,
    partitioned_pairs,
    partitioned_probe_counts,
)


def _tables(rng, n, m, num_keys=7, span=10_000, maxlen=500):
    lk = rng.integers(0, num_keys, n).astype(np.int32)
    ls = rng.integers(0, span, n).astype(np.int32)
    le = ls + rng.integers(0, maxlen, n).astype(np.int32)
    rk = rng.integers(0, num_keys + 2, m).astype(np.int32)
    rs = rng.integers(0, span, m).astype(np.int32)
    re = rs + rng.integers(0, maxlen, m).astype(np.int32)
    return lk, ls, le, rk, rs, re


@pytest.mark.parametrize("part", [2, 4])
def test_partitioned_nearest_semantics(rng, part):
    """Mesh nearest == oracle semantics (overlap class + distance; exact
    row id is not contractual when several candidates tie)."""
    mesh = make_mesh(8, part=part)
    lk, ls, le, rk, rs, re = _tables(rng, 300, 400, num_keys=4)
    got = partitioned_nearest(mesh, lk, ls, le, rk, rs, re)
    want = oracle_nearest(lk, ls, le, rk, rs, re)
    for i in range(len(rk)):
        if want[i] == -1:
            assert got[i] == -1, f"row {i}: expected NULL"
            continue
        g = int(got[i])
        assert g >= 0 and lk[g] == rk[i]
        w = int(want[i])
        overlap_w = ls[w] <= re[i] and le[w] >= rs[i]
        overlap_g = ls[g] <= re[i] and le[g] >= rs[i]
        assert overlap_g == overlap_w, f"row {i}: overlap class mismatch"
        if not overlap_w:
            def dist(j):
                return rs[i] - le[j] if le[j] < rs[i] else ls[j] - re[i]
            assert dist(g) == dist(w), f"row {i}: distance mismatch"


def test_partitioned_nearest_matches_single_chip(rng):
    """Bit-for-bit parity with the single-chip nearest kernel (same
    tie-breaking), CLAUDE.md host/device parity contract extended to the
    mesh."""
    import jax.numpy as jnp

    from sequila_tpu.ops.interval_index import build_interval_index
    from sequila_tpu.ops.interval_join import nearest_match

    mesh = make_mesh(8, part=2)
    lk, ls, le, rk, rs, re = _tables(rng, 200, 300, num_keys=3)
    got = partitioned_nearest(mesh, lk, ls, le, rk, rs, re)
    idx = build_interval_index(lk, ls, le)
    want = np.asarray(
        nearest_match(idx, jnp.asarray(rk), jnp.asarray(rs), jnp.asarray(re))
    ).astype(np.int64)
    # single-chip and per-part indexes have identical level structure per
    # key (levels depend only on same-key containment), so ties resolve
    # identically
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("part", [1, 2, 8])
def test_partitioned_probe_counts(rng, part):
    mesh = make_mesh(8, part=part)
    lk, ls, le, rk, rs, re = _tables(rng, 400, 600)
    got = partitioned_probe_counts(mesh, lk, ls, le, rk, rs, re)
    want = oracle_counts(lk, ls, le, rk, rs, re).astype(np.int64)
    np.testing.assert_array_equal(got, want)


def test_partitioned_probe_counts_degenerate_and_inverted(rng):
    """Degenerate probes (qs > qe stabbing) and inverted build intervals
    must stay exact on the mesh (the level path, not BITS)."""
    mesh = make_mesh(8, part=2)
    lk = np.array([0, 0, 1, 1, 0], np.int32)
    ls = np.array([10, 50, 10, 90, 70], np.int32)
    le = np.array([20, 40, 30, 80, 60], np.int32)  # rows 1,3,4 inverted
    rk = np.array([0, 0, 1, 1, 2], np.int32)
    rs = np.array([15, 45, 25, 85, 5], np.int32)
    re = np.array([12, 55, 15, 95, 50], np.int32)  # rows 0,2 degenerate
    got = partitioned_probe_counts(mesh, lk, ls, le, rk, rs, re)
    want = oracle_counts(lk, ls, le, rk, rs, re).astype(np.int64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("part", [2, 4])
def test_partitioned_coverage(rng, part):
    mesh = make_mesh(8, part=part)
    lk, ls, le, rk, rs, re = _tables(rng, 300, 400, num_keys=5)
    got_c, got_b = partitioned_coverage(mesh, lk, ls, le, rk, rs, re)
    # brute-force oracle: superintervals convention (no +1)
    want_c = np.zeros(len(rk), np.int64)
    want_b = np.zeros(len(rk), np.int64)
    for i in range(len(rk)):
        mask = (lk == rk[i]) & (ls <= re[i]) & (le >= rs[i])
        want_c[i] = mask.sum()
        want_b[i] = (
            np.minimum(le[mask].astype(np.int64), re[i])
            - np.maximum(ls[mask].astype(np.int64), rs[i])
        ).sum()
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_array_equal(got_b, want_b)


def test_chunked_emission_single_compile(rng):
    """A shard whose output exceeds the chunk cap by >10x must drain
    through ONE compiled emit kernel (no recompile per growth step) and
    produce exact pairs — VERDICT round-1 item 6."""
    import sequila_tpu.parallel.partitioned_join as pj

    mesh = make_mesh(8, part=2)
    # dense single-key join: 200 x 300 all-overlap -> 60k pairs on one part
    n, m = 200, 300
    lk = np.zeros(n, np.int32)
    ls = rng.integers(0, 100, n).astype(np.int32)
    le = ls + 10_000
    rk = np.zeros(m, np.int32)
    rs = rng.integers(0, 100, m).astype(np.int32)
    re = rs + 10_000
    pj.partitioned_emit_fn.cache_clear()
    before = pj.partitioned_emit_fn.cache_info().misses
    b, p = partitioned_pairs(mesh, lk, ls, le, rk, rs, re, chunk_limit=1024)
    made = pj.partitioned_emit_fn.cache_info().misses - before
    assert made == 1, f"expected one emit kernel, built {made}"
    ob, op = oracle_pairs(lk, ls, le, rk, rs, re)
    assert len(b) == len(ob)
    assert sorted(zip(p.tolist(), b.tolist())) == sorted(
        zip(op.tolist(), ob.tolist())
    )


@pytest.mark.parametrize("chunk_limit", [None, 4096])
def test_partitioned_pairs_chunked_matches_unchunked(rng, chunk_limit):
    mesh = make_mesh(8, part=4)
    lk, ls, le, rk, rs, re = _tables(rng, 300, 400, maxlen=2000)
    b, p = partitioned_pairs(mesh, lk, ls, le, rk, rs, re, chunk_limit=chunk_limit)
    ob, op = oracle_pairs(lk, ls, le, rk, rs, re)
    assert sorted(zip(p.tolist(), b.tolist())) == sorted(
        zip(op.tolist(), ob.tolist())
    )


def test_shuffle_pairs_chunked_two_compiles(rng):
    """Device-shuffle materialization with output >10x the chunk cap:
    drains via base-offset continuation with at most TWO emit kernels
    (sizing + final capacity), never one per growth step."""
    import sequila_tpu.parallel.shuffle as sh

    mesh = make_mesh(4, part=4)
    n = 150
    lk = np.zeros(n, np.int32)
    ls = np.arange(n, dtype=np.int32)
    le = ls + 10_000
    rk = np.zeros(n, np.int32)
    rs = np.arange(n, dtype=np.int32)
    re = rs + 10_000
    sh._shuffle_pairs_fns.cache_clear()
    before = sh._shuffle_pairs_fns.cache_info().misses
    b, q = sh.all_to_all_partitioned_pairs(
        mesh, lk, ls, le, rk, rs, re, chunk_limit=2048
    )
    made = sh._shuffle_pairs_fns.cache_info().misses - before
    assert made <= 2, f"expected <=2 emit kernels, built {made}"
    assert len(b) == n * n
    ob, op = oracle_pairs(lk, ls, le, rk, rs, re)
    assert sorted(zip(q.tolist(), b.tolist())) == sorted(
        zip(op.tolist(), ob.tolist())
    )


def test_strand_aware_partitioned_count(rng):
    """strand folding composes with the engine mesh (partitions > 1) —
    the composite key codes ride the partitioned paths unchanged."""
    import pyarrow as pa

    from sequila_tpu import dataframe as gdf
    from sequila_tpu.models.table import Table

    def stranded(n, seed):
        r = np.random.default_rng(seed)
        contigs = [f"chr{int(k)}" for k in r.integers(1, 4, n)]
        s = r.integers(0, 5000, n).astype(np.int64)
        e = s + r.integers(0, 300, n)
        strands = [["+", "-"][int(i)] for i in r.integers(0, 2, n)]
        return Table(pa.table({
            "contig": contigs, "pos_start": s, "pos_end": e,
            "strand": strands,
        }))

    a, b = stranded(300, 1), stranded(400, 2)
    single = gdf.count_overlaps(a, b, strand="same").column_np(-1)
    multi = gdf.count_overlaps(
        a, b, strand="same", partitions=4
    ).column_np(-1)
    assert single.tolist() == multi.tolist()
