"""SQL-level Partitioned-mode tests: `SET datafusion.execution.
target_partitions = 8` must change the executed plan (EXPLAIN shows
mode=Partitioned) and every query shape must return exactly the
single-chip result — the engine-native analog of the reference's
PartitionMode::Partitioned (reference interval_join.rs:385-404, :459-510),
which the reference itself never tests (SURVEY.md §4).

Runs on the virtual 8-device CPU mesh (tests/conftest.py)."""

import numpy as np
import pyarrow as pa
import pytest

from sequila_tpu.session import SessionContext


def _chain_tables(seed=0, n=400, m=600, num_keys=5, span=10_000, maxlen=500):
    r = np.random.default_rng(seed)

    def one(n, s):
        rr = np.random.default_rng(s)
        k = rr.integers(0, num_keys, n)
        st = rr.integers(0, span, n)
        return pa.table(
            {
                "contig": [f"chr{i}" for i in k],
                "pos_start": st,
                "pos_end": st + rr.integers(0, maxlen, n),
            }
        )

    return one(n, seed * 2 + 1), one(m, seed * 2 + 2)


def _pair_ctx(partitions: int, seed=0, **kw) -> SessionContext:
    ctx = SessionContext()
    t1, t2 = _chain_tables(seed, **kw)
    ctx.register_table("s1", t1)
    ctx.register_table("s2", t2)
    if partitions > 1:
        ctx.sql(f"SET datafusion.execution.target_partitions = {partitions}")
    return ctx


def _both(query, setup=(), seed=0, **kw):
    outs = []
    for parts in (1, 8):
        ctx = _pair_ctx(parts, seed, **kw)
        for s in setup:
            ctx.sql(s)
        outs.append(ctx.sql(query).to_pylist())
    return outs


OVERLAP_ON = (
    "ON s1.contig = s2.contig AND s1.pos_end >= s2.pos_start "
    "AND s1.pos_start <= s2.pos_end"
)


def test_explain_shows_partitioned_mode():
    ctx = _pair_ctx(8)
    plan = ctx.sql(
        f"EXPLAIN SELECT count(1) FROM s1 JOIN s2 {OVERLAP_ON}"
    ).column_np(1)[0]
    assert "IntervalJoinExec: mode=Partitioned" in plan
    ctx.sql("SET datafusion.execution.target_partitions = 1")
    plan1 = ctx.sql(
        f"EXPLAIN SELECT count(1) FROM s1 JOIN s2 {OVERLAP_ON}"
    ).column_np(1)[0]
    assert "IntervalJoinExec: mode=CollectLeft" in plan1


def test_count_star_parity():
    single, part = _both(f"SELECT count(1) FROM s1 JOIN s2 {OVERLAP_ON}")
    assert single == part
    assert single[0]["count(1)"] > 0


@pytest.mark.parametrize(
    "alg", ["coitrees", "intervaltree", "lapper", "superintervals"]
)
def test_materialize_parity_all_algorithms(alg):
    q = (
        f"SELECT s1.pos_start, s2.pos_end FROM s1 JOIN s2 {OVERLAP_ON} "
        "ORDER BY s1.pos_start, s2.pos_end"
    )
    single, part = _both(
        q, setup=[f"SET sequila.interval_join_algorithm = {alg}"]
    )
    assert single == part


def test_select_star_parity():
    q = (
        f"SELECT * FROM s1 JOIN s2 {OVERLAP_ON} "
        "ORDER BY s1.contig, s1.pos_start, s1.pos_end, s2.pos_start, s2.pos_end"
    )
    single, part = _both(q, n=200, m=300)
    assert single == part


@pytest.mark.parametrize("jt", ["LEFT", "RIGHT", "FULL"])
def test_outer_join_parity(jt):
    q = (
        f"SELECT s1.pos_start, s2.pos_end FROM s1 {jt} JOIN s2 {OVERLAP_ON} "
        "ORDER BY s1.pos_start NULLS FIRST, s2.pos_end NULLS FIRST"
    )
    single, part = _both(q, n=150, m=200, num_keys=8)
    assert single == part


def test_strict_ops_parity():
    q = (
        "SELECT count(1) FROM s1 JOIN s2 ON s1.contig = s2.contig "
        "AND s1.pos_end > s2.pos_start AND s1.pos_start < s2.pos_end"
    )
    single, part = _both(q)
    assert single == part


def test_nearest_parity():
    q = (
        f"SELECT s1.pos_start, s2.pos_start, s2.pos_end "
        f"FROM s1 JOIN s2 {OVERLAP_ON} "
        "ORDER BY s2.pos_start, s2.pos_end, s1.pos_start NULLS FIRST"
    )
    single, part = _both(
        q,
        setup=["SET sequila.interval_join_algorithm = coitreesnearest"],
        n=100, m=250, num_keys=9,
    )
    assert single == part
    assert len(single) == 250  # one row per probe row


def test_grouped_count_parity():
    q = (
        f"SELECT s2.contig, count(1) AS c FROM s1 JOIN s2 {OVERLAP_ON} "
        "GROUP BY s2.contig ORDER BY s2.contig"
    )
    single, part = _both(q)
    assert single == part


def test_no_equi_key_nlj_stays_collect_left():
    """The NLJ rewrite path keeps CollectLeft like the reference's
    from_nested_loop_join (sequila_physical_planner.rs:127-148)."""
    ctx = _pair_ctx(8, n=60, m=80)
    plan = ctx.sql(
        "EXPLAIN SELECT count(1) FROM s1 JOIN s2 ON "
        "s1.pos_end >= s2.pos_start AND s1.pos_start <= s2.pos_end"
    ).column_np(1)[0]
    assert "IntervalJoinExec: mode=CollectLeft" in plan


def test_low_memory_partitioned_parity():
    """low_memory in Partitioned mode drains shards through the capped
    chunked emission; result identical."""
    q = (
        f"SELECT s1.pos_start, s2.pos_end FROM s1 JOIN s2 {OVERLAP_ON} "
        "ORDER BY s1.pos_start, s2.pos_end"
    )
    single, part = _both(
        q,
        setup=[
            "SET sequila.interval_join_low_memory = true",
            "SET sequila.max_output_batch_size = 512",
        ],
        n=200, m=300, maxlen=3000,
    )
    assert single == part


def test_filter_pushdown_partitioned():
    q = (
        f"SELECT count(1) FROM s1 JOIN s2 {OVERLAP_ON} "
        "WHERE s1.contig = 'chr1'"
    )
    single, part = _both(q)
    assert single == part


def test_explain_analyze_partitioned_runs():
    ctx = _pair_ctx(8)
    out = ctx.sql(
        f"EXPLAIN ANALYZE SELECT count(1) FROM s1 JOIN s2 {OVERLAP_ON}"
    ).column_np(1)[0]
    assert "mode=Partitioned" in out and "output_rows" in out


def test_reference_fixture_partitioned(tmp_path):
    """The reference's 16-row correctness anchor under Partitioned mode
    (integration_test.rs:40-65)."""
    from tests.test_integration_sql import (
        EXPECTED_EQUI,
        EQUI_QUERY,
        READS_CSV,
        TARGETS_CSV,
        rows_of,
    )

    reads = tmp_path / "reads.csv"
    targets = tmp_path / "targets.csv"
    reads.write_text(READS_CSV)
    targets.write_text(TARGETS_CSV)
    ctx = SessionContext()
    ctx.sql(
        f"CREATE EXTERNAL TABLE reads STORED AS CSV LOCATION '{reads}' "
        "OPTIONS ('has_header' 'true')"
    )
    ctx.sql(
        f"CREATE EXTERNAL TABLE targets STORED AS CSV LOCATION '{targets}' "
        "OPTIONS ('has_header' 'true')"
    )
    ctx.sql("SET datafusion.execution.target_partitions = 8")
    got = rows_of(ctx.sql(EQUI_QUERY))
    from tests.test_integration_sql import sorted_rows

    assert got == sorted_rows(EXPECTED_EQUI)


def test_skew_knob_count_parity():
    """SET sequila.partitioned_skew = true routes Partitioned-mode counts
    through the range-splitting skew path; result identical on a heavily
    skewed table (90% one contig)."""
    r = np.random.default_rng(3)

    def skewed(n, seed):
        rr = np.random.default_rng(seed)
        hot = rr.random(n) < 0.9
        k = np.where(hot, 0, rr.integers(1, 6, n))
        st = rr.integers(0, 50_000, n)
        return pa.table(
            {
                "contig": [f"chr{i}" for i in k],
                "pos_start": st,
                "pos_end": st + rr.integers(0, 2_000, n),
            }
        )

    q = (
        "SELECT count(1) FROM s1 JOIN s2 ON s1.contig = s2.contig "
        "AND s1.pos_end >= s2.pos_start AND s1.pos_start <= s2.pos_end"
    )
    outs = {}
    for name, setup in (
        ("single", []),
        ("partitioned", ["SET datafusion.execution.target_partitions = 8"]),
        ("skew", [
            "SET datafusion.execution.target_partitions = 8",
            "SET sequila.partitioned_skew = true",
        ]),
    ):
        ctx = SessionContext()
        ctx.register_table("s1", skewed(1500, 1))
        ctx.register_table("s2", skewed(2000, 2))
        for s in setup:
            ctx.sql(s)
        outs[name] = ctx.sql(q).to_pylist()
    assert outs["single"] == outs["partitioned"] == outs["skew"]


def test_skew_knob_degenerate_probes_fall_back():
    """Degenerate (qs > qe) probe rows must route AROUND the skew count
    (BITS zeroes them) and still be exact."""
    ctx = SessionContext()
    ctx.register_table("s1", pa.table(
        {"contig": ["c0"] * 4, "pos_start": [10, 50, 100, 12],
         "pos_end": [20, 60, 110, 18]}))
    ctx.register_table("s2", pa.table(
        {"contig": ["c0"] * 3, "pos_start": [15, 55, 105],
         "pos_end": [11, 52, 101]}))  # all degenerate stabbing probes
    q = (
        "SELECT count(1) FROM s1 JOIN s2 ON s1.contig = s2.contig "
        "AND s1.pos_end >= s2.pos_start AND s1.pos_start <= s2.pos_end"
    )
    want = ctx.sql(q).to_pylist()
    ctx.sql("SET datafusion.execution.target_partitions = 8")
    ctx.sql("SET sequila.partitioned_skew = true")
    assert ctx.sql(q).to_pylist() == want


# -- distribution routing (round 3): shuffle + skew as SQL execution paths --


@pytest.mark.parametrize("dist", ["hash", "shuffle", "skew"])
def test_count_parity_all_distributions(dist):
    single, part = _both(
        f"SELECT count(1) FROM s1 JOIN s2 {OVERLAP_ON}",
        setup=[f"SET sequila.partitioned_distribution = {dist}"],
    )
    assert single == part


@pytest.mark.parametrize("dist", ["hash", "shuffle", "skew"])
def test_materialize_parity_all_distributions(dist):
    q = (
        f"SELECT s1.pos_start, s2.pos_end FROM s1 JOIN s2 {OVERLAP_ON} "
        "ORDER BY s1.pos_start, s2.pos_end"
    )
    single, part = _both(
        q, setup=[f"SET sequila.partitioned_distribution = {dist}"],
        n=200, m=300,
    )
    assert single == part


@pytest.mark.parametrize("dist", ["shuffle", "skew"])
def test_skewed_data_parity(dist):
    """90%-hot-key data through the collective paths (the whole point of
    skew range splitting)."""
    q = (
        f"SELECT s1.pos_start, s2.pos_end FROM s1 JOIN s2 {OVERLAP_ON} "
        "ORDER BY s1.pos_start, s2.pos_end"
    )
    single, part = _both(
        q, setup=[f"SET sequila.partitioned_distribution = {dist}"],
        seed=7, n=300, m=500, num_keys=2, span=2_000,
    )
    assert single == part


def test_explain_shows_distribution():
    ctx = _pair_ctx(8)
    ctx.sql("SET sequila.partitioned_distribution = shuffle")
    plan = ctx.sql(
        f"EXPLAIN SELECT count(1) FROM s1 JOIN s2 {OVERLAP_ON}"
    ).column_np(1)[0]
    assert "mode=Partitioned(shuffle)" in plan
    ctx.sql("SET sequila.partitioned_distribution = auto")
    plan = ctx.sql(
        f"EXPLAIN SELECT count(1) FROM s1 JOIN s2 {OVERLAP_ON}"
    ).column_np(1)[0]
    assert "mode=Partitioned(auto)" in plan


def test_auto_routes_skewed_to_skew():
    """Auto distribution picks skew for a dominant key and records the
    choice in EXPLAIN ANALYZE metrics (distribution_skew=1)."""
    r = np.random.default_rng(3)
    n, m = 400, 900

    def one(rows, seed):
        rr = np.random.default_rng(seed)
        k = np.where(rr.random(rows) < 0.95, 0, 1)  # 95% on chr0
        st = rr.integers(0, 5_000, rows)
        return pa.table({
            "contig": [f"chr{i}" for i in k],
            "pos_start": st,
            "pos_end": st + rr.integers(0, 300, rows),
        })

    ctx = SessionContext()
    ctx.register_table("s1", one(n, 1))
    ctx.register_table("s2", one(m, 2))
    ctx.sql("SET datafusion.execution.target_partitions = 8")
    out = ctx.sql(
        f"EXPLAIN ANALYZE SELECT count(1) FROM s1 JOIN s2 {OVERLAP_ON}"
    ).column_np(1)[0]
    assert "distribution_skew=1" in out
    # parity against single-chip
    got = ctx.sql(f"SELECT count(1) FROM s1 JOIN s2 {OVERLAP_ON}").column_np(0)[0]
    ctx.sql("SET datafusion.execution.target_partitions = 1")
    want = ctx.sql(f"SELECT count(1) FROM s1 JOIN s2 {OVERLAP_ON}").column_np(0)[0]
    assert got == want


def test_nearest_skew_distribution_parity():
    """NEAREST through skew range splitting (VERDICT r3 item 7): a
    90%-hot-key dataset forced through distribution=skew must match the
    single-chip result row-for-row, and auto must actually route it to
    skew (distribution_skew in EXPLAIN ANALYZE)."""
    def one(rows, seed):
        rr = np.random.default_rng(seed)
        k = np.where(rr.random(rows) < 0.9, 0, rr.integers(1, 4, rows))
        st = rr.integers(0, 8_000, rows)
        return pa.table({
            "contig": [f"chr{i}" for i in k],
            "pos_start": st,
            "pos_end": st + rr.integers(0, 150, rows),
        })

    q = (
        f"SELECT s1.pos_start, s1.pos_end, s2.pos_start, s2.pos_end "
        f"FROM s1 JOIN s2 {OVERLAP_ON} "
        "ORDER BY s2.pos_start, s2.pos_end, s1.pos_start NULLS FIRST, "
        "s1.pos_end NULLS FIRST"
    )
    outs = []
    for parts, dist in ((1, "auto"), (8, "skew"), (8, "hash")):
        ctx = SessionContext()
        ctx.register_table("s1", one(250, 11))
        ctx.register_table("s2", one(700, 12))
        ctx.sql(f"SET datafusion.execution.target_partitions = {parts}")
        ctx.sql(f"SET sequila.partitioned_distribution = {dist}")
        ctx.sql("SET sequila.interval_join_algorithm = coitreesnearest")
        outs.append(ctx.sql(q).to_pylist())
        if parts == 8 and dist == "skew":
            ana = ctx.sql(f"EXPLAIN ANALYZE {q}").column_np(1)[0]
            assert "distribution_skew=1" in ana
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 700  # one row per probe row


def test_auto_degenerate_probes_fall_back_exact():
    """Degenerate (qs > qe) probe rows break the BITS shuffle/skew counts;
    auto must route them to an exact path (CLAUDE.md invariant)."""
    ctx = SessionContext()
    ctx.register_table("s1", pa.table({
        "contig": ["chr1"] * 4,
        "pos_start": [0, 100, 200, 300],
        "pos_end": [90, 190, 290, 390],
    }))
    # one degenerate stabbing probe (start > end) that still matches
    ctx.register_table("s2", pa.table({
        "contig": ["chr1", "chr1"],
        "pos_start": [50, 250],
        "pos_end": [60, 210],
    }))
    ctx.sql("SET datafusion.execution.target_partitions = 8")
    for dist in ("auto", "shuffle", "skew", "hash"):
        ctx.sql(f"SET sequila.partitioned_distribution = {dist}")
        got = ctx.sql(
            "SELECT count(1) FROM s1 JOIN s2 ON s1.contig = s2.contig "
            "AND s1.pos_start <= s2.pos_end AND s1.pos_end >= s2.pos_start"
        ).column_np(0)[0]
        assert got == 2, (dist, got)  # [0,90]x[50,60] and [200,290] stab [250,210]


def test_low_memory_shuffle_and_skew_parity():
    q = (
        f"SELECT s1.pos_start, s2.pos_end FROM s1 JOIN s2 {OVERLAP_ON} "
        "ORDER BY s1.pos_start, s2.pos_end"
    )
    for dist in ("shuffle", "skew"):
        single, part = _both(
            q,
            setup=[
                f"SET sequila.partitioned_distribution = {dist}",
                "SET sequila.interval_join_low_memory = true",
                "SET sequila.max_output_batch_size = 512",
            ],
            n=200, m=300, maxlen=3000,
        )
        assert single == part, dist
