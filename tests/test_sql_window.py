"""Window functions: fn() OVER ([PARTITION BY ..] [ORDER BY ..]).

Standard-SQL default-frame semantics (the reference inherits windowing
wholesale from DataFusion; see docs/SQL.md): ranking needs ORDER BY,
aggregates without ORDER BY cover the whole partition, with ORDER BY they
are running aggregates over RANGE peers, last_value's default frame ends
at the current peer group.
"""

import pyarrow as pa
import pytest

from sequila_tpu.errors import PlanError
from sequila_tpu.session import SessionContext


@pytest.fixture()
def ctx():
    c = SessionContext()
    c.register_table(
        "t",
        pa.table(
            {
                "g": ["a", "a", "a", "b", "b"],
                "x": [10, 30, 20, 5, 5],
                "v": [1.0, 2.0, 3.0, 4.0, 5.0],
            }
        ),
    )
    return c


class TestRanking:
    def test_row_number_partitioned(self, ctx):
        got = ctx.sql(
            "SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS rn "
            "FROM t ORDER BY g, x"
        ).to_pylist()
        assert [r["rn"] for r in got] == [1, 2, 3, 1, 2]

    def test_rank_and_dense_rank_ties(self, ctx):
        got = ctx.sql(
            "SELECT x, rank() OVER (ORDER BY x) AS r, "
            "dense_rank() OVER (ORDER BY x) AS dr FROM t ORDER BY x"
        ).to_pylist()
        assert [r["r"] for r in got] == [1, 1, 3, 4, 5]
        assert [r["dr"] for r in got] == [1, 1, 2, 3, 4]

    def test_row_number_desc(self, ctx):
        got = ctx.sql(
            "SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x DESC) AS rn "
            "FROM t ORDER BY g, x"
        ).to_pylist()
        assert [r["rn"] for r in got] == [3, 2, 1, 1, 2]

    def test_ntile(self, ctx):
        got = ctx.sql(
            "SELECT x, ntile(2) OVER (ORDER BY x) AS nt FROM t ORDER BY x"
        ).to_pylist()
        assert [r["nt"] for r in got] == [1, 1, 1, 2, 2]

    def test_ranking_requires_order_by(self, ctx):
        with pytest.raises(PlanError, match="ORDER BY"):
            ctx.sql("SELECT row_number() OVER () FROM t")


class TestWindowAggregates:
    def test_sum_whole_partition(self, ctx):
        got = ctx.sql(
            "SELECT g, v, sum(v) OVER (PARTITION BY g) AS s FROM t ORDER BY g, v"
        ).to_pylist()
        assert [r["s"] for r in got] == [6.0, 6.0, 6.0, 9.0, 9.0]

    def test_running_sum_range_peers(self, ctx):
        # g='b' rows tie on x: RANGE frame -> both peers share the total
        got = ctx.sql(
            "SELECT g, x, sum(v) OVER (PARTITION BY g ORDER BY x) AS run "
            "FROM t ORDER BY g, x"
        ).to_pylist()
        assert [r["run"] for r in got] == [1.0, 4.0, 6.0, 9.0, 9.0]

    def test_running_min(self, ctx):
        got = ctx.sql(
            "SELECT g, x, min(x) OVER (PARTITION BY g ORDER BY x DESC) AS rm "
            "FROM t ORDER BY g, x"
        ).to_pylist()
        # DESC order: running min after seeing larger x first
        assert [r["rm"] for r in got] == [10.0, 20.0, 30.0, 5.0, 5.0]

    def test_count_star_over_partition(self, ctx):
        got = ctx.sql(
            "SELECT g, count(*) OVER (PARTITION BY g) AS c FROM t ORDER BY g"
        ).to_pylist()
        assert [r["c"] for r in got] == [3, 3, 3, 2, 2]

    def test_running_avg(self, ctx):
        got = ctx.sql(
            "SELECT g, avg(v) OVER (PARTITION BY g ORDER BY x) AS ra "
            "FROM t ORDER BY g, x"
        ).to_pylist()
        assert [r["ra"] for r in got] == [1.0, 2.0, 2.0, 4.5, 4.5]


class TestNavigation:
    def test_lag_lead(self, ctx):
        got = ctx.sql(
            "SELECT x, lag(x) OVER (ORDER BY x) AS pl, "
            "lead(x, 1, -1) OVER (ORDER BY x) AS nl "
            "FROM t WHERE g = 'a' ORDER BY x"
        ).to_pylist()
        assert [r["pl"] for r in got] == [None, 10, 20]
        assert [r["nl"] for r in got] == [20, 30, -1]

    def test_lag_respects_partitions(self, ctx):
        got = ctx.sql(
            "SELECT g, x, lag(x) OVER (PARTITION BY g ORDER BY x) AS pl "
            "FROM t ORDER BY g, x"
        ).to_pylist()
        # partition boundary resets the lag to NULL
        assert [r["pl"] for r in got] == [None, 10, 20, None, 5]

    def test_first_last_value(self, ctx):
        got = ctx.sql(
            "SELECT g, x, first_value(x) OVER (PARTITION BY g ORDER BY x) AS fv, "
            "last_value(x) OVER (PARTITION BY g) AS lv FROM t ORDER BY g, x"
        ).to_pylist()
        assert [r["fv"] for r in got] == [10, 10, 10, 5, 5]
        # no ORDER BY in the spec -> whole-partition frame in input row
        # order (g='a' input rows end at x=20)
        assert [r["lv"] for r in got] == [20, 20, 20, 5, 5]

    def test_last_value_default_frame_gotcha(self, ctx):
        got = ctx.sql(
            "SELECT g, x, last_value(x) OVER (PARTITION BY g ORDER BY x) AS lv "
            "FROM t ORDER BY g, x"
        ).to_pylist()
        # with ORDER BY the default frame ends at the current peers
        assert [r["lv"] for r in got] == [10, 20, 30, 5, 5]


class TestWindowMisc:
    def test_window_in_expression(self, ctx):
        got = ctx.sql(
            "SELECT row_number() OVER (ORDER BY x) + 100 AS rn FROM t ORDER BY rn"
        ).to_pylist()
        assert [r["rn"] for r in got] == [101, 102, 103, 104, 105]

    def test_two_windows_one_query(self, ctx):
        got = ctx.sql(
            "SELECT x, row_number() OVER (ORDER BY x) AS rn, "
            "sum(v) OVER (PARTITION BY g) AS s FROM t ORDER BY x, rn"
        ).to_pylist()
        assert [r["rn"] for r in got] == [1, 2, 3, 4, 5]
        assert [r["s"] for r in got] == [9.0, 9.0, 6.0, 6.0, 6.0]

    def test_window_after_where(self, ctx):
        # windows evaluate after WHERE: filtered rows don't count
        got = ctx.sql(
            "SELECT count(*) OVER () AS c FROM t WHERE g = 'a'"
        ).to_pylist()
        assert [r["c"] for r in got] == [3, 3, 3]

    def test_order_by_window_alias(self, ctx):
        got = ctx.sql(
            "SELECT x, row_number() OVER (ORDER BY x DESC) AS rn FROM t "
            "ORDER BY rn LIMIT 2"
        ).to_pylist()
        assert [r["x"] for r in got] == [30, 20]

    def test_unsupported_window_function(self, ctx):
        with pytest.raises(PlanError, match="window function"):
            ctx.sql("SELECT made_up_fn() OVER (ORDER BY x) FROM t")

    def test_percent_rank_cume_dist_nth_value(self, ctx):
        out = ctx.sql(
            "SELECT x, percent_rank() OVER (ORDER BY x) AS p,"
            " cume_dist() OVER (ORDER BY x) AS c,"
            " nth_value(x, 2) OVER (ORDER BY x) AS nv"
            " FROM (VALUES (1), (2), (2), (4)) v(x) ORDER BY x"
        ).to_pylist()
        assert [list(r.values()) for r in out] == [
            [1, 0.0, 0.25, None],
            [2, 1 / 3, 0.75, 2],
            [2, 1 / 3, 0.75, 2],
            [4, 1.0, 1.0, 2],
        ]

    def test_window_over_aggregate_rejected(self, ctx):
        with pytest.raises(PlanError, match="aggregated"):
            ctx.sql(
                "SELECT g, sum(sum(v)) OVER (ORDER BY g) FROM t GROUP BY g"
            )

    def test_empty_input(self, ctx):
        got = ctx.sql(
            "SELECT row_number() OVER (ORDER BY x) AS rn FROM t WHERE x > 99"
        )
        assert got.num_rows == 0


class TestRowsFrames:
    """ROWS BETWEEN frames: sliding-window aggregates (prefix sums for
    sum/count/avg, sparse-table range extremes for min/max)."""

    @pytest.fixture()
    def fctx(self):
        c = SessionContext()
        c.register_table(
            "t",
            pa.table({"g": ["a"] * 6 + ["b"] * 3,
                      "x": list(range(6)) + [0, 1, 2],
                      "v": [1.0, 5.0, 2.0, 8.0, 3.0, 4.0, 10.0, 20.0, 30.0]}),
        )
        return c

    def test_sliding_sum(self, fctx):
        got = fctx.sql(
            "SELECT g, sum(v) OVER (PARTITION BY g ORDER BY x "
            "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s FROM t ORDER BY g, x"
        ).to_pylist()
        assert [r["s"] for r in got] == [6.0, 8.0, 15.0, 13.0, 15.0, 7.0, 30.0, 60.0, 50.0]

    def test_sliding_min(self, fctx):
        got = fctx.sql(
            "SELECT min(v) OVER (PARTITION BY g ORDER BY x "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m FROM t ORDER BY g, x"
        ).to_pylist()
        assert [r["m"] for r in got] == [1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 10.0, 10.0, 10.0]

    def test_sliding_max_following_only(self, fctx):
        got = fctx.sql(
            "SELECT max(v) OVER (PARTITION BY g ORDER BY x "
            "ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS m FROM t ORDER BY g, x"
        ).to_pylist()
        assert [r["m"] for r in got] == [5.0, 8.0, 8.0, 8.0, 4.0, 4.0, 30.0, 30.0, 30.0]

    def test_unbounded_rows_running(self, fctx):
        got = fctx.sql(
            "SELECT avg(v) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW) AS ra FROM t WHERE g = 'b' ORDER BY x"
        ).to_pylist()
        assert [r["ra"] for r in got] == [10.0, 15.0, 20.0]

    def test_rows_count(self, fctx):
        got = fctx.sql(
            "SELECT count(*) OVER (PARTITION BY g ORDER BY x "
            "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS c FROM t ORDER BY g, x"
        ).to_pylist()
        assert [r["c"] for r in got] == [2, 3, 3, 3, 3, 2, 2, 3, 2]

    def test_frame_on_ranking_ignored(self, fctx):
        # Frames have no effect on ranking functions (sqlite window-function
        # docs; DataFusion agrees) — the frame clause is accepted and ignored.
        got = fctx.sql(
            "SELECT row_number() OVER (ORDER BY x "
            "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS rn "
            "FROM t WHERE g = 'b' ORDER BY x"
        ).to_pylist()
        assert [r["rn"] for r in got] == [1, 2, 3]

    def test_frame_without_order_rejected(self, fctx):
        with pytest.raises(PlanError, match="ORDER BY"):
            fctx.sql(
                "SELECT sum(v) OVER (ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t"
            )

    def test_vs_numpy_oracle(self, fctx):
        import numpy as np

        rng = np.random.default_rng(5)
        n = 500
        g = rng.integers(0, 4, n)
        x = rng.permutation(n)
        v = rng.normal(size=n).round(3)
        c = SessionContext()
        c.register_table("r", pa.table({"g": g, "x": x, "v": v}))
        got = c.sql(
            "SELECT g, x, min(v) OVER (PARTITION BY g ORDER BY x "
            "ROWS BETWEEN 3 PRECEDING AND 2 FOLLOWING) AS m FROM r ORDER BY g, x"
        ).to_pylist()
        rows = sorted(zip(g, x, v))
        want = []
        for i, (gi, xi, vi) in enumerate(rows):
            seg = [r for r in rows if r[0] == gi]
            j = seg.index((gi, xi, vi))
            lo, hi = max(j - 3, 0), min(j + 2, len(seg) - 1)
            want.append(min(r[2] for r in seg[lo:hi + 1]))
        assert [r["m"] for r in got] == pytest.approx(want)


class TestRangeFrames:
    """RANGE BETWEEN value-based frames (the 'aggregate within N bp'
    idiom); differential-checked against sqlite3."""

    def _pair(self):
        import sqlite3

        rows = [("c1", 100, 2.0), ("c1", 150, 3.0), ("c1", 900, 5.0),
                ("c1", 1000, 7.0), ("c2", 120, 11.0)]
        c = SessionContext()
        c.register_table(
            "d",
            pa.table({"contig": [r[0] for r in rows],
                      "pos": [r[1] for r in rows],
                      "v": [r[2] for r in rows]}),
        )
        con = sqlite3.connect(":memory:")
        con.execute("CREATE TABLE d (contig TEXT, pos INT, v REAL)")
        con.executemany("INSERT INTO d VALUES (?,?,?)", rows)
        return c, con

    def _check(self, q):
        c, con = self._pair()
        mine = [tuple(r.values()) for r in c.sql(q).to_pylist()]
        assert mine == con.execute(q).fetchall(), q

    def test_symmetric_bp_window(self):
        self._check(
            "SELECT pos, sum(v) OVER (PARTITION BY contig ORDER BY pos "
            "RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING) AS s "
            "FROM d ORDER BY contig, pos"
        )

    def test_unbounded_to_current_includes_peers(self):
        self._check(
            "SELECT pos, count(*) OVER (ORDER BY pos RANGE BETWEEN "
            "UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM d ORDER BY pos"
        )

    def test_desc_range(self):
        self._check(
            "SELECT pos, sum(v) OVER (ORDER BY pos DESC RANGE BETWEEN "
            "200 PRECEDING AND CURRENT ROW) AS s FROM d ORDER BY pos"
        )

    def test_range_min(self):
        self._check(
            "SELECT pos, min(v) OVER (PARTITION BY contig ORDER BY pos "
            "RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS m "
            "FROM d ORDER BY contig, pos"
        )

    def test_range_requires_single_order_key(self):
        c, _ = self._pair()
        with pytest.raises(PlanError, match="one ORDER BY"):
            c.sql(
                "SELECT sum(v) OVER (ORDER BY contig, pos RANGE BETWEEN "
                "1 PRECEDING AND CURRENT ROW) FROM d"
            )


class TestPercentileAggregate:
    def test_approx_percentile_cont(self):
        import pyarrow as pa

        from sequila_tpu.session import SessionContext

        c = SessionContext()
        c.register_table(
            "q",
            pa.table({"g": ["a"] * 4 + ["b"],
                      "x": pa.array([1, 2, 3, 10, None], type=pa.int64())}),
        )
        out = c.sql(
            "SELECT g, approx_percentile_cont(x, 0.5) AS med,"
            " approx_percentile_cont(x, 0.25) AS q1"
            " FROM q GROUP BY g ORDER BY g"
        ).to_pylist()
        assert [list(r.values()) for r in out] == [
            ["a", 2.5, 1.75], ["b", None, None],
        ]

    def test_bad_fraction(self):
        import pyarrow as pa
        import pytest

        from sequila_tpu.errors import ExecutionError
        from sequila_tpu.session import SessionContext

        c = SessionContext()
        c.register_table("q", pa.table({"x": [1]}))
        with pytest.raises(ExecutionError, match="between 0 and 1"):
            c.sql("SELECT approx_percentile_cont(x, 1.5) FROM q")
