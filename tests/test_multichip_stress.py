"""Scale-stress tests for the multichip paths (VERDICT round-1 item 7):
million-row inputs, 90% hot-key skew, capacity-bucket boundary crossings,
and the int32-partials guard actually firing.

The 1M-row cases are marked slow; they validate the mesh kernels at sizes
where capacity bucketing, chunked emission, and the partials reductions
actually engage (the round-1 suite topped out at 500x700 rows)."""

import numpy as np
import pytest

from sequila_tpu.ops.host_join import make_host_index
from sequila_tpu.ops.oracle import oracle_counts, oracle_pairs
from sequila_tpu.parallel.mesh import make_mesh
from sequila_tpu.parallel.partitioned_join import (
    partitioned_count,
    partitioned_pairs,
)


def _skewed(rng, n, m, hot=0.9, span=50_000_000, maxlen=20_000, keys=24):
    lk = np.where(rng.random(n) < hot, 0, rng.integers(1, keys, n)).astype(np.int32)
    ls = rng.integers(0, span, n).astype(np.int32)
    le = ls + rng.integers(0, maxlen, n).astype(np.int32)
    rk = np.where(rng.random(m) < hot, 0, rng.integers(1, keys, m)).astype(np.int32)
    rs = rng.integers(0, span, m).astype(np.int32)
    re = rs + rng.integers(0, maxlen, m).astype(np.int32)
    return lk, ls, le, rk, rs, re


@pytest.mark.slow
def test_partitioned_count_1m_rows_90pct_hot_key():
    """1M x 1M with 90% of rows on one contig: the chr1-skew scenario at a
    scale where per-part capacities and the 8-bucket psum partials engage.
    Host C++ BITS count is the cross-check (itself oracle-verified)."""
    rng = np.random.default_rng(7)
    lk, ls, le, rk, rs, re = _skewed(rng, 1_000_000, 1_000_000)
    want = int(make_host_index(lk, ls, le).counts(rk, rs, re).sum())
    assert want > 100_000_000  # the point: ~325M pairs, past any toy scale
    got = partitioned_count(make_mesh(8), lk, ls, le, rk, rs, re)
    assert got == want


@pytest.mark.slow
def test_skew_mesh_count_500k_hot_key():
    """Skew-aware range-split SPMD count at 500k x 500k with one dominant
    contig — the path that splits chr1 into sub-range shards."""
    from sequila_tpu.parallel.skew import plan_partitions, skew_partitioned_count_mesh

    rng = np.random.default_rng(11)
    lk, ls, le, rk, rs, re = _skewed(rng, 500_000, 500_000, hot=0.92)
    plan = plan_partitions(lk, rk, rs, npart=2)
    assert 0 in plan.splits, "hot contig must be range-split at this scale"
    want = int(make_host_index(lk, ls, le).counts(rk, rs, re).sum())
    got = skew_partitioned_count_mesh(
        make_mesh(8, part=2), lk, ls, le, rk, rs, re
    )
    assert got == want


@pytest.mark.parametrize("m", [2047, 2048, 2049, 2053])
def test_probe_capacity_bucket_boundaries(rng, m):
    """Probe counts straddling the per-chip capacity bucket boundary
    (bucket(ceil(m/nprobe)) flips at powers of two) must stay exact —
    both the padded tail and the just-overflowed extra bucket."""
    mesh = make_mesh(8, part=2)  # nprobe=4: per-chip = bucket(ceil(m/4))
    n = 300
    lk = np.zeros(n, np.int32)
    ls = rng.integers(0, 10_000, n).astype(np.int32)
    le = ls + rng.integers(0, 500, n).astype(np.int32)
    rk = np.zeros(m, np.int32)
    rs = rng.integers(0, 10_000, m).astype(np.int32)
    re = rs + rng.integers(0, 500, m).astype(np.int32)
    want = int(oracle_counts(lk, ls, le, rk, rs, re).sum())
    assert partitioned_count(mesh, lk, ls, le, rk, rs, re) == want


@pytest.mark.parametrize("chunk_limit", [1023, 1024, 1025])
def test_emit_chunk_cap_bucket_boundaries(rng, chunk_limit):
    """Chunked emission with chunk caps at/straddling the minimum bucket
    must produce the exact pair set (no slot lost at the seam)."""
    mesh = make_mesh(4, part=2)
    n, m = 120, 150
    lk = np.zeros(n, np.int32)
    ls = rng.integers(0, 50, n).astype(np.int32)
    le = ls + 5_000
    rk = np.zeros(m, np.int32)
    rs = rng.integers(0, 50, m).astype(np.int32)
    re = rs + 5_000
    b, p = partitioned_pairs(mesh, lk, ls, le, rk, rs, re, chunk_limit=chunk_limit)
    ob, op = oracle_pairs(lk, ls, le, rk, rs, re)
    assert len(b) == len(ob) == n * m
    assert sorted(zip(p.tolist(), b.tolist())) == sorted(
        zip(op.tolist(), ob.tolist())
    )


def test_bits_partials_guard_routes_to_level_path(rng, monkeypatch):
    """With the int32-partials guard lowered, the fused BITS fast path
    must decline and the exact chunked level path must produce the same
    count through the SQL engine."""
    import pyarrow as pa

    import sequila_tpu.exec.joins.interval_join as ij
    from sequila_tpu.session import SessionContext

    n, m = 3000, 4000
    lk = rng.integers(0, 4, n)
    ls = rng.integers(0, 20_000, n)
    le = ls + rng.integers(0, 1_000, n)
    rk = rng.integers(0, 4, m)
    rs = rng.integers(0, 20_000, m)
    re = rs + rng.integers(0, 1_000, m)
    want = int(
        oracle_counts(
            lk.astype(np.int32), ls.astype(np.int32), le.astype(np.int32),
            rk.astype(np.int32), rs.astype(np.int32), re.astype(np.int32),
        ).astype(np.int64).sum()
    )

    def q(ctx):
        return int(
            ctx.sql(
                "SELECT count(1) FROM s1 a JOIN s2 b ON a.contig = b.contig "
                "AND a.pos_end >= b.pos_start AND a.pos_start <= b.pos_end"
            ).column_np(0)[0]
        )

    monkeypatch.setenv("SEQUILA_HOST_THRESHOLD", "0")  # force device path
    ctx = SessionContext()
    ctx.register_table("s1", pa.table(
        {"contig": [f"c{k}" for k in lk], "pos_start": ls, "pos_end": le}))
    ctx.register_table("s2", pa.table(
        {"contig": [f"c{k}" for k in rk], "pos_start": rs, "pos_end": re}))
    assert q(ctx) == want  # fused BITS path
    monkeypatch.setattr(ij, "_BITS_PARTIALS_MAX", 64)  # guard fires
    assert q(ctx) == want  # exact chunked level path
