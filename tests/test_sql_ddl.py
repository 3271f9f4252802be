"""Session DDL/DML surface: CREATE [OR REPLACE] VIEW, DROP VIEW,
INSERT INTO (VALUES | SELECT), DESCRIBE, JSON external tables.

The reference inherits all of these from DataFusion / datafusion-cli;
none are exercised in its own tests, but a DataFusion user expects them.
"""

import json
import os

import pyarrow as pa
import pytest

from sequila_tpu.errors import PlanError
from sequila_tpu.session import SessionContext


@pytest.fixture()
def ctx():
    c = SessionContext()
    c.register_table(
        "reads",
        pa.table({"contig": ["c1", "c1", "c2"], "s": [0, 100, 50], "e": [50, 150, 99]}),
    )
    return c


class TestViews:
    def test_create_query_drop(self, ctx):
        ctx.sql("CREATE VIEW lr AS SELECT contig, s, e FROM reads WHERE s > 0")
        assert ctx.sql("SELECT count(*) FROM lr").column_np(0)[0] == 2
        ctx.sql("DROP VIEW lr")
        with pytest.raises(PlanError):
            ctx.sql("SELECT * FROM lr")

    def test_view_alias_qualification(self, ctx):
        ctx.sql("CREATE VIEW v AS SELECT contig, s FROM reads")
        got = ctx.sql("SELECT v.contig FROM v WHERE v.s = 100")
        assert got.to_pylist_column(0) == ["c1"]

    def test_view_in_interval_join(self, ctx):
        ctx.register_table("targets", pa.table({"contig": ["c1"], "s": [40], "e": [60]}))
        ctx.sql("CREATE VIEW lr AS SELECT * FROM reads")
        got = ctx.sql(
            "SELECT count(*) FROM lr a JOIN targets b ON a.contig = b.contig "
            "AND a.s <= b.e AND a.e >= b.s"
        )
        assert got.column_np(0)[0] == 1

    def test_nested_views(self, ctx):
        ctx.sql("CREATE VIEW v1 AS SELECT s * 2 AS y FROM reads")
        ctx.sql("CREATE VIEW v2 AS SELECT y + 1 AS z FROM v1")
        assert ctx.sql("SELECT max(z) FROM v2").column_np(0)[0] == 201

    def test_or_replace_and_duplicate(self, ctx):
        ctx.sql("CREATE VIEW v AS SELECT contig FROM reads")
        with pytest.raises(PlanError, match="exists"):
            ctx.sql("CREATE VIEW v AS SELECT s FROM reads")
        ctx.sql("CREATE OR REPLACE VIEW v AS SELECT s FROM reads")
        assert ctx.sql("SELECT count(*) FROM v").column_np(0)[0] == 3

    def test_recursive_view_rejected(self, ctx):
        ctx.sql("CREATE VIEW v AS SELECT contig FROM reads")
        ctx.sql("CREATE OR REPLACE VIEW v AS SELECT contig FROM v")
        with pytest.raises(PlanError, match="recursive"):
            ctx.sql("SELECT * FROM v")

    def test_drop_view_if_exists(self, ctx):
        ctx.sql("DROP VIEW IF EXISTS nosuch")
        with pytest.raises(PlanError):
            ctx.sql("DROP VIEW nosuch")


class TestInsert:
    def test_insert_values(self, ctx):
        ctx.sql("INSERT INTO reads VALUES ('c3', 1, 2), ('c3', 5, 9)")
        assert ctx.sql("SELECT count(*) FROM reads").column_np(0)[0] == 5

    def test_insert_select(self, ctx):
        ctx.sql("INSERT INTO reads SELECT contig, s, e FROM reads WHERE contig = 'c2'")
        assert ctx.sql("SELECT count(*) FROM reads").column_np(0)[0] == 4

    def test_insert_arity_mismatch(self, ctx):
        with pytest.raises(PlanError, match="values"):
            ctx.sql("INSERT INTO reads VALUES ('c3', 1)")

    def test_insert_unknown_table(self, ctx):
        with pytest.raises(PlanError, match="not found"):
            ctx.sql("INSERT INTO nosuch VALUES (1)")

    def test_inserted_rows_join(self, ctx):
        # device caches must not leak stale data after INSERT
        ctx.register_table("targets", pa.table({"contig": ["c3"], "s": [0], "e": [10]}))
        q = ("SELECT count(*) FROM reads a JOIN targets b ON a.contig = b.contig "
             "AND a.s <= b.e AND a.e >= b.s")
        assert ctx.sql(q).column_np(0)[0] == 0
        ctx.sql("INSERT INTO reads VALUES ('c3', 1, 2)")
        assert ctx.sql(q).column_np(0)[0] == 1


class TestDescribeAndJson:
    def test_describe(self, ctx):
        got = ctx.sql("DESCRIBE reads").to_pylist()
        assert [r["column_name"] for r in got] == ["contig", "s", "e"]
        assert got[1]["data_type"] == "int64"

    def test_json_external_table(self, ctx, tmp_path):
        pth = os.path.join(tmp_path, "x.json")
        with open(pth, "w") as f:
            for row in [{"contig": "c1", "s": 1, "e": 5},
                        {"contig": "c2", "s": 2, "e": 9}]:
                f.write(json.dumps(row) + "\n")
        ctx.sql(f"CREATE EXTERNAL TABLE j STORED AS JSON LOCATION '{pth}'")
        got = ctx.sql("SELECT contig FROM j ORDER BY s")
        assert got.to_pylist_column(0) == ["c1", "c2"]


class TestInsertReviewFixes:
    """Review round 3: INSERT column lists honored, ragged rows rejected,
    arrow errors wrapped, truncated column list can't hang the parser."""

    @pytest.fixture()
    def ictx(self):
        c = SessionContext()
        c.register_table(
            "t", pa.table({"contig": ["c1"], "s": [1], "e": [2]})
        )
        return c

    def test_column_list_reorders(self, ictx):
        ictx.sql("INSERT INTO t (e, s, contig) VALUES (99, 50, 'z')")
        got = ictx.sql("SELECT * FROM t WHERE contig = 'z'").to_pylist()
        assert got == [{"contig": "z", "s": 50, "e": 99}]

    def test_partial_column_list_fills_null(self, ictx):
        ictx.sql("INSERT INTO t (contig) VALUES ('only')")
        got = ictx.sql("SELECT * FROM t WHERE contig = 'only'").to_pylist()
        assert got == [{"contig": "only", "s": None, "e": None}]

    def test_ragged_rows_rejected(self, ictx):
        with pytest.raises(PlanError, match="row 2"):
            ictx.sql("INSERT INTO t VALUES ('b', 2, 3), ('c', 3, 4, 5)")

    def test_unknown_column_rejected(self, ictx):
        with pytest.raises(PlanError, match="nosuch"):
            ictx.sql("INSERT INTO t (nosuch) VALUES (1)")

    def test_type_mismatch_is_planerror(self, ictx):
        with pytest.raises(PlanError, match="type mismatch"):
            ictx.sql("INSERT INTO t VALUES (1, 'a', 'b')")

    def test_truncated_column_list_no_hang(self, ictx):
        with pytest.raises(PlanError, match="unterminated"):
            ictx.sql("INSERT INTO t (")

    def test_insert_select_column_list(self, ictx):
        ictx.sql(
            "INSERT INTO t (s, e, contig) SELECT s, e, contig FROM t"
        )
        assert ictx.sql("SELECT count(*) FROM t").column_np(0)[0] == 2


class TestAliasOrdinalReviewFixes:
    """Review round 3: GROUP BY prefers input columns over aliases
    (alias-shadowed ungrouped items are rejected like Postgres), and
    ordinals work under SELECT *."""

    @pytest.fixture()
    def gctx(self):
        c = SessionContext()
        c.register_table("t", pa.table({"g": ["a", "a", "b"], "x": [1, 2, 2]}))
        return c

    def test_alias_shadow_rejected(self, gctx):
        with pytest.raises(PlanError, match="GROUP BY or an aggregate"):
            gctx.sql("SELECT x AS g, count(*) FROM t GROUP BY g")

    def test_alias_without_conflict_still_resolves(self, gctx):
        got = gctx.sql(
            "SELECT g AS grp, count(*) FROM t GROUP BY grp ORDER BY grp"
        ).to_pylist()
        assert got == [{"grp": "a", "count(*)": 2}, {"grp": "b", "count(*)": 1}]

    def test_star_ordinals(self, gctx):
        got = gctx.sql("SELECT * FROM t ORDER BY 2 DESC, 1").to_pylist()
        assert [r["x"] for r in got] == [2, 2, 1]
        got2 = gctx.sql("SELECT * FROM t GROUP BY 1, 2 ORDER BY 1, 2").to_pylist()
        assert len(got2) == 3


class TestIntervalMapArchive:
    def test_savez_archive_is_clean(self, tmp_path):
        import numpy as np

        from sequila_tpu.intervalmap import IntervalMap

        m = IntervalMap()
        m.add(1, 5, "A")
        m.build()
        p = str(tmp_path / "i")
        m.save(p)
        with np.load(p + ".npz", allow_pickle=True) as z:
            assert z.files == ["starts", "ends", "data"]


class TestShowStatements:
    """SHOW COLUMNS / SHOW ALL / SHOW <var> (DataFusion's SHOW surface)."""

    def _ctx(self):
        import pyarrow as pa

        from sequila_tpu.session import SessionContext

        c = SessionContext()
        c.register_table("t", pa.table({"a": [1], "b": ["x"]}))
        return c

    def test_show_columns(self):
        out = self._ctx().sql("SHOW COLUMNS FROM t").to_pylist()
        assert [r["column_name"] for r in out] == ["a", "b"]

    def test_show_all_has_engine_knobs(self):
        rows = {r["name"]: r["value"] for r in self._ctx().sql("SHOW ALL").to_pylist()}
        assert rows["sequila.prefer_interval_join"] == "true"
        assert rows["datafusion.execution.target_partitions"] == "1"

    def test_show_one_and_suffix_match(self):
        c = self._ctx()
        c.sql("SET sequila.interval_join_algorithm = lapper")
        out = c.sql("SHOW sequila.interval_join_algorithm").to_pylist()
        assert out == [
            {"name": "sequila.interval_join_algorithm", "value": "Lapper"}
        ]
        out = c.sql("SHOW target_partitions").to_pylist()
        assert out[0]["name"] == "datafusion.execution.target_partitions"

    def test_show_unknown_raises(self):
        import pytest

        from sequila_tpu.errors import PlanError

        with pytest.raises(PlanError, match="bogus"):
            self._ctx().sql("SHOW bogus.option")

    def test_version_function(self):
        out = self._ctx().sql("SELECT version()").to_pylist_column(0)
        assert out[0].startswith("sequila-tpu ")


class TestCreateTableDefsAndPrepare:
    """Empty typed CREATE TABLE, IF NOT EXISTS, PREPARE/EXECUTE."""

    def test_create_empty_typed_table(self):
        c = SessionContext()
        c.sql("CREATE TABLE e (x INTEGER, y TEXT)")
        t = c.sql("SELECT * FROM e")
        assert t.column_names == ["x", "y"] and t.num_rows == 0
        c.sql("INSERT INTO e VALUES (1, 'a')")
        assert c.sql("SELECT count(*) FROM e").to_pylist_column(0) == [1]

    def test_if_not_exists_skips(self):
        c = SessionContext()
        c.sql("CREATE TABLE e AS VALUES (1)")
        c.sql("CREATE TABLE IF NOT EXISTS e (z INTEGER)")
        c.sql("CREATE TABLE IF NOT EXISTS e AS VALUES (2), (3)")
        assert c.sql("SELECT count(*) FROM e").to_pylist_column(0) == [1]
        c.sql("CREATE TABLE IF NOT EXISTS f AS SELECT * FROM e")
        assert c.sql("SELECT count(*) FROM f").to_pylist_column(0) == [1]

    def test_prepare_execute_deallocate(self):
        c = SessionContext()
        c.sql("CREATE TABLE t AS VALUES ('a', 1), ('b', 2), ('c', 3)")
        c.sql("PREPARE q AS SELECT column1 FROM t WHERE column2 > $1"
              " ORDER BY column1")
        assert c.sql("EXECUTE q(1)").to_pylist_column(0) == ["b", "c"]
        assert c.sql("EXECUTE q(2)").to_pylist_column(0) == ["c"]
        c.sql("PREPARE q2 (INT, TEXT) AS SELECT count(*) FROM t"
              " WHERE column2 = $1 OR column1 = $2")
        assert c.sql("EXECUTE q2(1, 'c')").to_pylist_column(0) == [2]
        c.sql("DEALLOCATE q")
        with pytest.raises(PlanError):
            c.sql("EXECUTE q(1)")
        with pytest.raises(PlanError):
            c.sql("EXECUTE q2(1)")  # arity mismatch vs declared types
        with pytest.raises(PlanError):
            c.sql("SELECT * FROM t WHERE column2 = $1")  # unbound


class TestInformationSchema:
    """information_schema virtual tables (datafusion-cli enables these)."""

    def _ctx(self):
        c = SessionContext()
        c.sql("CREATE TABLE t AS VALUES (1, 'a'), (2, 'b')")
        c.sql("CREATE VIEW v AS SELECT column1 FROM t")
        return c

    def test_tables(self):
        c = self._ctx()
        out = c.sql(
            "SELECT table_name, table_type FROM information_schema.tables"
            " ORDER BY table_name"
        ).to_pylist()
        assert out == [
            {"table_name": "t", "table_type": "BASE TABLE"},
            {"table_name": "v", "table_type": "VIEW"},
        ]

    def test_columns(self):
        c = self._ctx()
        out = c.sql(
            "SELECT column_name, data_type, is_nullable"
            " FROM information_schema.columns WHERE table_name = 't'"
            " ORDER BY ordinal_position"
        ).to_pylist()
        assert [r["column_name"] for r in out] == ["column1", "column2"]
        assert out[0]["data_type"] == "int64"

    def test_settings_and_schemata(self):
        c = self._ctx()
        out = c.sql(
            "SELECT value FROM information_schema.df_settings"
            " WHERE name = 'datafusion.execution.target_partitions'"
        ).to_pylist()
        assert len(out) == 1
        sch = c.sql("SELECT * FROM information_schema.schemata").to_pylist()
        assert sch == [
            {"catalog_name": "datafusion", "schema_name": "public"}
        ]

    def test_joins_with_user_tables(self):
        c = self._ctx()
        out = c.sql(
            "SELECT count(*) FROM information_schema.columns c"
            " JOIN information_schema.tables ti"
            " ON c.table_name = ti.table_name"
            " WHERE ti.table_type = 'BASE TABLE'"
        ).to_pylist_column(0)
        assert out == [2]

    def test_unknown_info_table(self):
        c = self._ctx()
        with pytest.raises(PlanError):
            c.sql("SELECT * FROM information_schema.nope")


class TestCopyStoredAs:
    def test_copy_stored_as_override(self, tmp_path):
        import pyarrow.parquet as pq

        c = SessionContext()
        c.sql("CREATE TABLE t AS VALUES ('a', 1), ('b', 2)")
        c.sql(f"COPY t TO '{tmp_path}/out1' STORED AS parquet")
        assert pq.read_table(f"{tmp_path}/out1").num_rows == 2
        c.sql(f"COPY t TO '{tmp_path}/out2' STORED AS csv")
        assert "column1" in open(f"{tmp_path}/out2").read()
        c.sql(f"COPY (SELECT column1 FROM t) TO '{tmp_path}/o.csv'")
        assert open(f"{tmp_path}/o.csv").read().count("\n") == 3
        with pytest.raises(PlanError):
            c.sql(f"COPY t TO '{tmp_path}/x' STORED AS nope")
