"""Date/timestamp SQL support (the DataFusion datetime subset).

Temporal columns ride as numpy datetime64 (NaT = NULL) through the
expression layer; comparisons coerce string literals, aggregates reduce
on the int64 view, and output assembly restores real arrow nulls.
"""

import datetime

import pyarrow as pa
import pytest

from sequila_tpu.errors import ExecutionError, PlanError
from sequila_tpu.session import SessionContext

d = datetime.date
ts = datetime.datetime


@pytest.fixture()
def ctx():
    c = SessionContext()
    c.register_table(
        "t",
        pa.table(
            {
                "d": pa.array(
                    [d(2024, 1, 1), d(2024, 6, 15), None], type=pa.date32()
                ),
                "ts": pa.array(
                    [ts(2024, 1, 1, 12), ts(2024, 6, 15, 8, 30), None],
                    type=pa.timestamp("us"),
                ),
                "v": [1, 2, 3],
            }
        ),
    )
    return c


class TestComparisons:
    def test_date_vs_string_literal(self, ctx):
        assert ctx.sql(
            "SELECT v FROM t WHERE d >= '2024-02-01'"
        ).to_pylist_column(0) == [2]

    def test_typed_date_literal(self, ctx):
        assert ctx.sql(
            "SELECT v FROM t WHERE d >= DATE '2024-02-01'"
        ).to_pylist_column(0) == [2]

    def test_between_strings(self, ctx):
        assert ctx.sql(
            "SELECT v FROM t WHERE ts BETWEEN '2024-01-01' AND '2024-03-01'"
        ).to_pylist_column(0) == [1]

    def test_null_date_is_unknown(self, ctx):
        # NaT comparison is UNKNOWN, so NOT(...) must also exclude it
        assert ctx.sql(
            "SELECT v FROM t WHERE NOT (d >= '2024-02-01')"
        ).to_pylist_column(0) == [1]


class TestOrderGroupAgg:
    def test_order_desc_nulls_last(self, ctx):
        assert ctx.sql(
            "SELECT v FROM t ORDER BY ts DESC NULLS LAST"
        ).to_pylist_column(0) == [2, 1, 3]

    def test_order_asc_nulls_first(self, ctx):
        assert ctx.sql(
            "SELECT v FROM t ORDER BY d ASC NULLS FIRST"
        ).to_pylist_column(0) == [3, 1, 2]

    def test_group_by_date_single_null_group(self, ctx):
        out = ctx.sql(
            "SELECT d, count(*) FROM t GROUP BY d ORDER BY d NULLS LAST"
        ).to_pylist()
        assert [list(r.values()) for r in out] == [
            [d(2024, 1, 1), 1], [d(2024, 6, 15), 1], [None, 1],
        ]

    def test_min_max(self, ctx):
        out = ctx.sql("SELECT min(d) AS a, max(ts) AS b FROM t").to_pylist()[0]
        assert out["a"] == d(2024, 1, 1)
        assert out["b"] == ts(2024, 6, 15, 8, 30)

    def test_sum_of_dates_rejected(self, ctx):
        with pytest.raises(ExecutionError, match="not supported"):
            ctx.sql("SELECT sum(d) FROM t")


class TestDateFunctions:
    def test_date_part_fields(self, ctx):
        out = ctx.sql(
            "SELECT date_part('year', ts) AS y, date_part('month', ts) AS m,"
            " date_part('day', ts) AS dd, date_part('hour', ts) AS h,"
            " date_part('minute', ts) AS mi, date_part('dow', d) AS w,"
            " date_part('doy', d) AS doy, date_part('quarter', d) AS q"
            " FROM t WHERE v = 2"
        ).to_pylist()[0]
        assert list(out.values()) == [2024, 6, 15, 8, 30, 6, 167, 2]

    def test_date_part_int_typed_and_null(self, ctx):
        arr = ctx.sql("SELECT date_part('year', d) AS y FROM t").arrow
        assert str(arr.column("y").type) == "int64"
        assert arr.column("y").to_pylist() == [2024, 2024, None]

    def test_extract_syntax(self, ctx):
        assert ctx.sql(
            "SELECT EXTRACT(YEAR FROM d) FROM t WHERE v = 1"
        ).to_pylist_column(0) == [2024]

    def test_epoch_float(self, ctx):
        got = ctx.sql(
            "SELECT date_part('epoch', ts) FROM t WHERE v = 1"
        ).to_pylist_column(0)[0]
        assert got == ts(2024, 1, 1, 12).replace(
            tzinfo=datetime.timezone.utc
        ).timestamp()

    def test_iso_week(self, ctx):
        # 2024-01-01 is a Monday -> ISO week 1; 2023-01-01 (Sunday) -> 52
        out = ctx.sql(
            "SELECT date_part('week', to_date('2024-01-01')) AS a,"
            " date_part('week', to_date('2023-01-01')) AS b"
        ).to_pylist()[0]
        assert list(out.values()) == [1, 52]

    def test_date_trunc(self, ctx):
        out = ctx.sql(
            "SELECT date_trunc('month', ts) AS m, date_trunc('week', d) AS w,"
            " date_trunc('quarter', ts) AS q FROM t WHERE v = 2"
        ).to_pylist()[0]
        assert out["m"] == ts(2024, 6, 1)
        assert out["w"] == ts(2024, 6, 10)  # Monday of that week
        assert out["q"] == ts(2024, 4, 1)

    def test_to_timestamp_to_date(self, ctx):
        out = ctx.sql(
            "SELECT to_timestamp(86400) AS a, to_date('2024-03-05') AS b"
        ).to_pylist()[0]
        assert out["a"] == ts(1970, 1, 2)
        assert out["b"] == d(2024, 3, 5)

    def test_now_and_current_date(self, ctx):
        out = ctx.sql(
            "SELECT now() IS NOT NULL AS a, current_date IS NOT NULL AS b,"
            " current_timestamp >= '2026-01-01' AS c"
        ).to_pylist()[0]
        assert list(out.values()) == [True, True, True]

    def test_cast_timestamp_to_date_and_varchar(self, ctx):
        out = ctx.sql(
            "SELECT CAST(ts AS DATE) AS a, CAST(d AS VARCHAR) AS b"
            " FROM t WHERE v = 1"
        ).to_pylist()[0]
        assert out["a"] == d(2024, 1, 1)
        assert out["b"] == "2024-01-01"


class TestIntervalArithmetic:
    def test_unit_token_form(self, ctx):
        got = ctx.sql(
            "SELECT ts + INTERVAL '1' DAY FROM t WHERE v = 1"
        ).to_pylist_column(0)
        assert got == [ts(2024, 1, 2, 12)]

    def test_string_pairs_form(self, ctx):
        got = ctx.sql(
            "SELECT ts - INTERVAL '2 hours 30 minutes' FROM t WHERE v = 2"
        ).to_pylist_column(0)
        assert got == [ts(2024, 6, 15, 6, 0)]

    def test_null_propagates(self, ctx):
        got = ctx.sql(
            "SELECT ts + INTERVAL '1' DAY FROM t WHERE v = 3"
        ).to_pylist_column(0)
        assert got == [None]

    def test_calendar_units_rejected(self, ctx):
        with pytest.raises(PlanError, match="calendar"):
            ctx.sql("SELECT ts + INTERVAL '1' MONTH FROM t")


class TestTemporalPack2:
    """from_unixtime/to_unixtime/make_date/to_char/date_bin — the rest of
    DataFusion's datetime library."""

    def test_unixtime_roundtrip(self):
        c = SessionContext()
        out = c.sql(
            "SELECT from_unixtime(0) AS f,"
            " to_unixtime(to_timestamp('2001-09-09 01:46:40')) AS u"
        ).to_pylist()[0]
        assert str(out["f"]).startswith("1970-01-01")
        assert out["u"] == 1_000_000_000

    def test_make_date_and_to_char(self):
        c = SessionContext()
        out = c.sql(
            "SELECT make_date(2024, 2, 29) AS d,"
            " to_char(make_date(2023, 3, 1), '%d-%m-%Y') AS s,"
            " date_format(to_timestamp('2023-03-01 12:34:56'), '%H:%M') AS f"
        ).to_pylist()[0]
        assert str(out["d"]) == "2024-02-29"
        assert out["s"] == "01-03-2023"
        assert out["f"] == "12:34"

    def test_make_date_invalid(self):
        c = SessionContext()
        with pytest.raises(ExecutionError):
            c.sql("SELECT make_date(2023, 2, 30)")

    def test_date_bin(self):
        c = SessionContext()
        out = c.sql(
            "SELECT date_bin(INTERVAL '15 minutes',"
            " to_timestamp('2023-01-01 12:37:21')) AS b,"
            " date_bin(INTERVAL '1 hour',"
            " to_timestamp('2023-01-01 12:37:00'),"
            " to_timestamp('2023-01-01 00:30:00')) AS o"
        ).to_pylist()[0]
        assert str(out["b"]) == "2023-01-01 12:30:00"
        assert str(out["o"]) == "2023-01-01 12:30:00"

    def test_date_bin_groups(self):
        c = SessionContext()
        c.sql(
            "CREATE TABLE ev AS SELECT"
            " to_timestamp('2023-01-01 00:00:00')"
            " + value * INTERVAL '20 minutes' AS ts,"
            " value AS v FROM generate_series(0, 5)"
        )
        out = c.sql(
            "SELECT date_bin(INTERVAL '1 hour', ts) AS h, count(*) AS n"
            " FROM ev GROUP BY 1 ORDER BY 1"
        ).to_pylist()
        assert [r["n"] for r in out] == [3, 3]

    def test_aliases_and_local_time(self):
        c = SessionContext()
        out = c.sql(
            "SELECT datepart('month', to_date('2023-03-15')) AS m,"
            " datetrunc('year', to_date('2023-03-15')) AS y,"
            " to_local_time(to_timestamp('2023-01-01 05:00:00')) AS lt,"
            " today() AS td, current_time AS ct"
        ).to_pylist()[0]
        assert out["m"] == 3
        assert str(out["y"]).startswith("2023-01-01")
        assert str(out["lt"]) == "2023-01-01 05:00:00"
        assert str(out["td"]) == str(out["td"])[:10]
        assert len(str(out["ct"]).split(":")) == 3
