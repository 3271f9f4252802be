"""General SQL operator tests: aggregates, grouping, sort, distinct,
limit, expressions — the engine surface beyond joins."""

import numpy as np
import pytest

from sequila_tpu.errors import PlanError
from sequila_tpu.session import SessionContext


@pytest.fixture
def ctx():
    c = SessionContext()
    c.sql(
        "CREATE TABLE t (contig TEXT, strand TEXT, start INTEGER, len INTEGER)"
        " AS VALUES"
        " ('chr1', '+', 10, 5), ('chr1', '-', 20, 15), ('chr1', '+', 30, 25),"
        " ('chr2', '+', 40, 35), ('chr2', '-', 50, 45), ('chr3', '+', 60, 55)"
    )
    return c


def rows(t):
    cols = [t.column_np(i).tolist() for i in range(len(t.column_names))]
    return list(zip(*cols))


def test_aggregates_no_group(ctx):
    out = ctx.sql("SELECT count(*), sum(len), min(start), max(start), avg(len) FROM t")
    r = rows(out)[0]
    assert r[0] == 6
    assert r[1] == 5 + 15 + 25 + 35 + 45 + 55
    assert r[2] == 10 and r[3] == 60
    assert abs(r[4] - 30.0) < 1e-9


def test_group_by_single(ctx):
    out = ctx.sql(
        "SELECT contig, count(*) AS n, sum(len) AS s FROM t GROUP BY contig ORDER BY contig"
    )
    assert rows(out) == [("chr1", 3, 45), ("chr2", 2, 80), ("chr3", 1, 55)]


def test_group_by_multi_column(ctx):
    out = ctx.sql(
        "SELECT contig, strand, count(*) AS n FROM t GROUP BY contig, strand"
        " ORDER BY contig, strand"
    )
    assert rows(out) == [
        ("chr1", "+", 2), ("chr1", "-", 1), ("chr2", "+", 1),
        ("chr2", "-", 1), ("chr3", "+", 1),
    ]


def test_count_distinct(ctx):
    out = ctx.sql("SELECT count(DISTINCT contig) FROM t")
    assert rows(out)[0][0] == 3


def test_where_and_arithmetic(ctx):
    out = ctx.sql(
        "SELECT start + len AS e FROM t WHERE start >= 20 AND start + len < 80 ORDER BY e"
    )
    assert [r[0] for r in rows(out)] == [35, 55, 75]


def test_order_desc_and_limit(ctx):
    out = ctx.sql("SELECT start FROM t ORDER BY start DESC LIMIT 2")
    assert [r[0] for r in rows(out)] == [60, 50]


def test_order_by_string_desc(ctx):
    out = ctx.sql("SELECT DISTINCT contig FROM t ORDER BY contig DESC")
    assert [r[0] for r in rows(out)] == ["chr3", "chr2", "chr1"]


def test_distinct(ctx):
    out = ctx.sql("SELECT DISTINCT strand FROM t")
    assert sorted(r[0] for r in rows(out)) == ["+", "-"]


def test_between_and_or(ctx):
    out = ctx.sql(
        "SELECT start FROM t WHERE start BETWEEN 20 AND 40 OR contig = 'chr3' ORDER BY start"
    )
    assert [r[0] for r in rows(out)] == [20, 30, 40, 60]


def test_aliases_and_projection(ctx):
    out = ctx.sql("SELECT contig AS c, start * 2 AS dbl FROM t LIMIT 1")
    assert out.column_names == ["c", "dbl"]
    assert rows(out) == [("chr1", 20)]


def test_create_table_as_select(ctx):
    ctx.sql("CREATE TABLE t2 AS SELECT contig, start FROM t WHERE start > 30")
    out = ctx.sql("SELECT count(*) FROM t2")
    assert rows(out)[0][0] == 3


def test_show_tables_and_drop(ctx):
    ctx.sql("CREATE TABLE tmp AS VALUES (1)")
    names = [r[0] for r in rows(ctx.sql("SHOW TABLES"))]
    assert "tmp" in names and "t" in names
    ctx.sql("DROP TABLE tmp")
    assert "tmp" not in [r[0] for r in rows(ctx.sql("SHOW TABLES"))]
    ctx.sql("DROP TABLE IF EXISTS nosuch")  # no error


def test_group_by_expression_must_match(ctx):
    from sequila_tpu.errors import PlanError

    with pytest.raises(PlanError):
        ctx.sql("SELECT strand, count(*) FROM t GROUP BY contig")


def test_null_keys_never_match(ctx):
    """SQL: NULL = NULL is not true — null join keys must not match."""
    ctx.sql(
        "CREATE TABLE na (k TEXT, s INTEGER, e INTEGER) AS VALUES"
        " ('x', 1, 5), (NULL, 1, 5)"
    )
    ctx.sql(
        "CREATE TABLE nb (k TEXT, s INTEGER, e INTEGER) AS VALUES"
        " ('x', 2, 6), (NULL, 2, 6)"
    )
    for pref in ("true", "false"):
        ctx.sql(f"SET sequila.prefer_interval_join = {pref}")
        out = ctx.sql(
            "SELECT * FROM na JOIN nb ON na.k = nb.k"
            " AND na.s <= nb.e AND na.e >= nb.s"
        )
        assert out.num_rows == 1, pref
        assert out.column_np(0)[0] == "x"


def test_group_alias_projection(ctx):
    out = ctx.sql("SELECT contig AS c, count(*) AS n FROM t GROUP BY contig ORDER BY c")
    assert out.column_names == ["c", "n"]
    assert [r for r in out.column_np("c").tolist()] == ["chr1", "chr2", "chr3"]


def test_order_by_aggregate(ctx):
    out = ctx.sql(
        "SELECT contig, count(*) FROM t GROUP BY contig ORDER BY count(*) DESC, contig"
    )
    assert out.column_np(0).tolist() == ["chr1", "chr2", "chr3"]


def test_self_join_with_aliases(ctx):
    out = ctx.sql(
        "SELECT x.contig, y.start FROM t x JOIN t y ON x.contig = y.contig"
        " AND x.start <= y.len AND x.len >= y.start"
    )
    # oracle by brute force
    import numpy as np

    c = ctx.table("t").column_np("contig")
    s = ctx.table("t").column_np("start")
    ln = ctx.table("t").column_np("len")
    want = sum(
        1
        for i in range(len(c))
        for j in range(len(c))
        if c[i] == c[j] and s[i] <= ln[j] and ln[i] >= s[j]
    )
    assert out.num_rows == want


def test_three_table_join(ctx):
    ctx.sql(
        "CREATE TABLE iv (contig TEXT, s INTEGER, e INTEGER) AS VALUES"
        " ('chr1', 10, 20), ('chr1', 15, 30), ('chr1', 100, 110),"
        " ('chr2', 5, 9), ('chr2', 7, 8)"
    )
    ctx.sql("CREATE TABLE u (contig TEXT, tag INTEGER) AS VALUES ('chr1', 7), ('chr2', 9)")
    out = ctx.sql(
        "SELECT x.contig, u.tag FROM iv x JOIN iv y ON x.contig = y.contig"
        " AND x.s <= y.e AND x.e >= y.s"
        " JOIN u ON x.contig = u.contig"
    )
    assert out.column_names == ["contig", "tag"]
    c = ctx.table("iv").column_np("contig")
    s = ctx.table("iv").column_np("s")
    e = ctx.table("iv").column_np("e")
    want = sum(
        1
        for i in range(len(c))
        for j in range(len(c))
        if c[i] == c[j] and s[i] <= e[j] and e[i] >= s[j]
    )
    assert out.num_rows == want  # every iv contig appears in u exactly once
    assert set(out.column_np("tag").tolist()) == {7, 9}


def test_two_column_operand_panics_like_reference(ctx):
    """`t.start <= t2.start + t2.len` has two columns in one operand: the
    reference's predicate parser panics ('complex sub queries are not
    supported', intervals.rs) during the rewrite; we raise PlanError."""
    from sequila_tpu.errors import PlanError

    with pytest.raises(PlanError, match="complex sub queries"):
        ctx.sql(
            "SELECT * FROM t JOIN t t2 ON t.contig = t2.contig"
            " AND t.start <= t2.start + t2.len AND t.start + t.len >= t2.start"
        )


def test_having(ctx):
    out = ctx.sql(
        "SELECT contig, count(*) AS n FROM t GROUP BY contig HAVING count(*) > 1 ORDER BY contig"
    )
    assert rows(out) == [("chr1", 3), ("chr2", 2)]


def test_having_hidden_aggregate(ctx):
    # HAVING references sum(len) which is not in the SELECT list
    out = ctx.sql(
        "SELECT contig FROM t GROUP BY contig HAVING sum(len) >= 55 ORDER BY contig"
    )
    assert [r[0] for r in rows(out)] == ["chr2", "chr3"]
    assert out.column_names == ["contig"]


def test_union_all(ctx):
    out = ctx.sql(
        "SELECT contig FROM t WHERE contig = 'chr1'"
        " UNION ALL SELECT contig FROM t WHERE contig = 'chr3'"
    )
    assert sorted(r[0] for r in rows(out)) == ["chr1", "chr1", "chr1", "chr3"]


def test_union_distinct(ctx):
    out = ctx.sql("SELECT contig FROM t UNION SELECT contig FROM t")
    assert sorted(r[0] for r in rows(out)) == ["chr1", "chr2", "chr3"]


def test_having_without_group_by_errors_on_bare_column(ctx):
    from sequila_tpu.errors import PlanError

    with pytest.raises(PlanError):
        ctx.sql("SELECT contig FROM t HAVING count(*) > 10")


def test_having_without_group_by_on_aggregate(ctx):
    out = ctx.sql("SELECT count(*) FROM t HAVING count(*) > 10")
    assert out.num_rows == 0
    out = ctx.sql("SELECT count(*) FROM t HAVING count(*) > 1")
    assert rows(out) == [(6,)]


def test_union_trailing_order_and_limit(ctx):
    out = ctx.sql(
        "SELECT contig FROM t WHERE contig = 'chr1'"
        " UNION ALL SELECT contig FROM t ORDER BY contig LIMIT 2"
    )
    assert rows(out) == [("chr1",), ("chr1",)]
    assert out.num_rows == 2


def test_mixed_union_chain(ctx):
    # (A UNION B) UNION ALL C: C's duplicates survive
    out = ctx.sql(
        "SELECT contig FROM t WHERE contig = 'chr3'"
        " UNION SELECT contig FROM t WHERE contig = 'chr3'"
        " UNION ALL SELECT contig FROM t WHERE contig = 'chr3'"
    )
    assert [r[0] for r in rows(out)] == ["chr3", "chr3"]


def test_union_distinct_with_nulls(ctx):
    ctx.sql("CREATE TABLE un (c TEXT) AS VALUES ('chr1'), (NULL)")
    out = ctx.sql("SELECT c FROM un UNION SELECT c FROM un")
    vals = sorted((v is None, str(v)) for v in out.column_np(0).tolist())
    assert len(vals) == 2  # chr1 + one NULL


def test_mixed_dtype_join_keys(ctx):
    """int64 vs string key columns compare as strings (arrow cast), in
    both the fresh-encode and cached-key-codes paths."""
    ctx.sql("CREATE TABLE ia (k BIGINT, s INTEGER, e INTEGER) AS VALUES (1, 0, 10)")
    ctx.sql("CREATE TABLE sb (k TEXT, s INTEGER, e INTEGER) AS VALUES ('1', 5, 6), ('2', 5, 6)")
    for pref in ("true", "false"):
        ctx.sql(f"SET sequila.prefer_interval_join = {pref}")
        out = ctx.sql(
            "SELECT * FROM ia JOIN sb ON ia.k = sb.k AND ia.s <= sb.e AND ia.e >= sb.s"
        )
        assert out.num_rows == 1, pref


class TestFromlessSelect:
    """FROM-less SELECT evaluates constants over one row (datafusion-cli
    style: `SELECT 1+1` in the REPL works)."""

    def test_constants(self):
        from sequila_tpu.session import SessionContext

        c = SessionContext()
        got = c.sql("SELECT 1 + 1 AS two, upper('ok') AS u").to_pylist()
        assert got == [{"two": 2, "u": "OK"}]

    def test_where_filters_the_row(self):
        from sequila_tpu.session import SessionContext

        c = SessionContext()
        assert c.sql("SELECT 1 WHERE 1 = 2").num_rows == 0

    def test_star_rejected(self):
        import pytest as _pytest

        from sequila_tpu.errors import PlanError
        from sequila_tpu.session import SessionContext

        with _pytest.raises(PlanError, match="FROM"):
            SessionContext().sql("SELECT *")


class TestSetOperations:
    """INTERSECT / EXCEPT [ALL] — DataFusion-surface set operations with
    standard precedence (INTERSECT binds tighter) and bag semantics for
    the ALL variants.  Plain INTERSECT/EXCEPT are sqlite-fuzz-verified in
    test_fuzz_sqlite.py; sqlite has no ALL variants, so they are pinned
    here."""

    def _ctx(self):
        import pyarrow as pa

        c = SessionContext()
        c.register_table("a", pa.table({"x": [1, 1, 1, 2, 3, None]}))
        c.register_table("b", pa.table({"x": [1, 1, 2, 2, None, None]}))
        return c

    @staticmethod
    def _xs(t):
        return sorted(
            (r["x"] for r in t.to_pylist()),
            key=lambda v: (v is None, v),
        )

    def test_intersect_all_min_multiplicity(self):
        c = self._ctx()
        out = c.sql("SELECT x FROM a INTERSECT ALL SELECT x FROM b")
        assert self._xs(out) == [1, 1, 2, None]  # min(3,2), min(1,2), min(1,2)

    def test_except_all_difference_multiplicity(self):
        c = self._ctx()
        out = c.sql("SELECT x FROM a EXCEPT ALL SELECT x FROM b")
        assert self._xs(out) == [1, 3]  # 3-2 ones, 1-2 twos -> 0, 1 three

    def test_except_rows_keep_left_order(self):
        c = self._ctx()
        out = c.sql("SELECT x FROM a EXCEPT ALL SELECT x FROM b")
        assert [r["x"] for r in out.to_pylist()] == [1, 3]

    def test_intersect_binds_tighter_than_union(self):
        c = self._ctx()
        # a UNION (b INTERSECT {2}) -- NOT (a UNION b) INTERSECT {2}
        out = c.sql(
            "SELECT x FROM a UNION SELECT x FROM b INTERSECT SELECT 2 AS x"
        )
        assert self._xs(out) == [1, 2, 3, None]

    def test_set_op_arity_mismatch_raises(self):
        from sequila_tpu.errors import PlanError

        c = self._ctx()
        with pytest.raises(PlanError, match="column count"):
            c.sql("SELECT x FROM a INTERSECT SELECT x, x FROM b")

    def test_view_over_set_op(self):
        c = self._ctx()
        c.sql("CREATE VIEW v AS SELECT x FROM a INTERSECT SELECT x FROM b")
        out = c.sql("SELECT x FROM v WHERE x IS NOT NULL ORDER BY x")
        assert [r["x"] for r in out.to_pylist()] == [1, 2]

    def test_ctas_and_insert_from_set_op(self):
        c = self._ctx()
        c.sql("CREATE TABLE t AS SELECT x FROM a EXCEPT SELECT x FROM b")
        assert self._xs(c.table("t")) == [3]
        c.sql("INSERT INTO t SELECT x FROM a INTERSECT ALL SELECT x FROM b")
        assert self._xs(c.table("t")) == [1, 1, 2, 3, None]

    def test_explain_set_op(self):
        c = self._ctx()
        plan = c.sql(
            "EXPLAIN SELECT x FROM a INTERSECT SELECT x FROM b"
        ).to_pylist()[0]["plan"]
        assert "SetOpExec: ops=[intersect]" in plan
        assert plan.count("ScanExec") == 2

    def test_order_by_ordinal_and_limit_apply_to_chain(self):
        c = self._ctx()
        out = c.sql(
            "SELECT x FROM a INTERSECT ALL SELECT x FROM b "
            "ORDER BY 1 DESC NULLS LAST LIMIT 2"
        )
        assert [r["x"] for r in out.to_pylist()] == [2, 1]

    def test_recursive_set_op_view_detected(self):
        import pyarrow as pa

        from sequila_tpu.errors import PlanError

        c = SessionContext()
        c.register_table("a", pa.table({"x": [1]}))
        c.sql("CREATE VIEW v AS SELECT x FROM a")
        c.sql(
            "CREATE OR REPLACE VIEW v AS "
            "SELECT x FROM v UNION SELECT x FROM a"
        )
        with pytest.raises(PlanError, match="recursive"):
            c.sql("SELECT * FROM v")


class TestDerivedTablesAndCTEs:
    """FROM (SELECT ...) alias and WITH ... AS (non-recursive), the two
    DataFusion query shapes the parser previously rejected.  Randomized
    parity vs sqlite lives in test_fuzz_sqlite.py; structural corners are
    pinned here."""

    def _ctx(self):
        import pyarrow as pa

        c = SessionContext()
        c.register_table("t", pa.table({"x": [1, 2, 3], "g": ["a", "b", "a"]}))
        return c

    def test_derived_requires_its_alias_for_qualified_refs(self):
        c = self._ctx()
        out = c.sql(
            "SELECT s.x FROM (SELECT x FROM t) s JOIN t ON s.x = t.x ORDER BY 1"
        )
        assert [r["x"] for r in out.to_pylist()] == [1, 2, 3]

    def test_derived_set_op_body(self):
        c = self._ctx()
        out = c.sql(
            "SELECT count(*) FROM (SELECT g FROM t INTERSECT SELECT 'a' AS g) s"
        )
        assert out.to_pylist() == [{"count(*)": 1}]

    def test_cte_chain_references_earlier_cte(self):
        c = self._ctx()
        out = c.sql(
            "WITH w AS (SELECT x FROM t), w2 AS (SELECT x + 10 AS y FROM w) "
            "SELECT * FROM w2 ORDER BY y"
        )
        assert [r["y"] for r in out.to_pylist()] == [11, 12, 13]

    def test_cte_shadows_table_and_restores(self):
        import pyarrow as pa

        c = self._ctx()
        c.register_table("w", pa.table({"x": [99]}))
        out = c.sql("WITH w AS (SELECT x FROM t WHERE x = 1) SELECT * FROM w")
        assert out.to_pylist() == [{"x": 1}]
        assert c.sql("SELECT * FROM w").to_pylist() == [{"x": 99}]

    def test_cte_visible_in_scalar_subquery(self):
        c = self._ctx()
        out = c.sql(
            "WITH w AS (SELECT max(x) AS mx FROM t) "
            "SELECT x FROM t WHERE x = (SELECT mx FROM w)"
        )
        assert out.to_pylist() == [{"x": 3}]

    def test_cte_leaves_no_catalog_residue_after_error(self):
        c = self._ctx()
        with pytest.raises(Exception):
            c.sql("WITH w AS (SELECT x FROM t) SELECT nope FROM w")
        assert sorted(c.catalog) == ["t"]

    def test_duplicate_cte_name_rejected(self):
        from sequila_tpu.errors import PlanError

        c = self._ctx()
        with pytest.raises(PlanError, match="duplicate"):
            c.sql("WITH w AS (SELECT 1 AS a), w AS (SELECT 2 AS a) SELECT * FROM w")

    def test_with_recursive(self):
        c = self._ctx()
        # non-self-referencing cte under RECURSIVE runs as a plain cte
        assert c.sql(
            "WITH RECURSIVE w AS (SELECT 1 AS a) SELECT * FROM w"
        ).to_pylist_column(0) == [1]
        got = c.sql(
            "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n + 1"
            " FROM r WHERE n < 4) SELECT n FROM r ORDER BY n"
        ).to_pylist_column(0)
        assert got == [1, 2, 3, 4]

    def test_explain_with_cte(self):
        c = self._ctx()
        plan = c.sql(
            "EXPLAIN WITH w AS (SELECT x FROM t) SELECT * FROM w"
        ).to_pylist()[0]["plan"]
        assert "ScanExec" in plan
        assert sorted(c.catalog) == ["t"]


class TestJoinUsingAndValues:
    """JOIN ... USING (dedup'd shared column) and VALUES table
    expressions; randomized parity vs sqlite in test_fuzz_sqlite.py."""

    def _ctx(self):
        import pyarrow as pa

        c = SessionContext()
        c.register_table("t", pa.table({"x": [1, 2, 3], "g": ["a", "b", "a"]}))
        c.register_table("u", pa.table({"x": [2, 3, 4], "h": ["p", "q", "r"]}))
        return c

    def test_star_shows_using_column_once(self):
        c = self._ctx()
        out = c.sql("SELECT * FROM t JOIN u USING (x) ORDER BY x").to_pylist()
        assert out == [
            {"x": 2, "g": "b", "h": "p"},
            {"x": 3, "g": "a", "h": "q"},
        ]

    def test_right_join_using_takes_right_values(self):
        c = self._ctx()
        out = c.sql(
            "SELECT x, h FROM t RIGHT JOIN u USING (x) ORDER BY x NULLS LAST"
        ).to_pylist()
        assert [r["x"] for r in out] == [2, 3, 4]

    def test_full_join_using_coalesces(self):
        c = self._ctx()
        out = c.sql(
            "SELECT x FROM t FULL JOIN u USING (x) ORDER BY x"
        ).to_pylist()
        assert [int(r["x"]) for r in out] == [1, 2, 3, 4]

    def test_using_column_missing_raises(self):
        from sequila_tpu.errors import PlanError

        c = self._ctx()
        with pytest.raises(PlanError, match="USING"):
            c.sql("SELECT * FROM t JOIN u USING (nope)")

    def test_values_default_names_and_alias_list(self):
        c = self._ctx()
        got = c.sql(
            "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) v ORDER BY 1"
        ).to_pylist()
        assert got == [
            {"column1": 1, "column2": "a"},
            {"column1": 2, "column2": "b"},
        ]
        got = c.sql(
            "SELECT s, n FROM (VALUES (1, 'a')) AS v(n, s)"
        ).to_pylist()
        assert got == [{"s": "a", "n": 1}]

    def test_alias_list_arity_mismatch_raises(self):
        from sequila_tpu.errors import PlanError

        c = self._ctx()
        with pytest.raises(PlanError, match="names"):
            c.sql("SELECT * FROM (VALUES (1, 2)) AS v(a)")

    def test_ragged_values_rejected(self):
        from sequila_tpu.errors import PlanError

        c = self._ctx()
        with pytest.raises(PlanError, match="VALUES row"):
            c.sql("SELECT * FROM (VALUES (1, 2), (3)) v")


class TestArrowStringFastPath:
    """String filters ride arrow compute (planner/expr._arrow_str_col);
    semantics must match the numpy object-array fallback exactly,
    including Kleene NULLs and dictionary-encoded columns."""

    def _ctx(self, arr):
        import pyarrow as pa

        from sequila_tpu.session import SessionContext

        c = SessionContext()
        c.register_table(
            "t", pa.table({"i": list(range(len(arr))), "s": arr})
        )
        return c

    def test_string_compare_with_nulls_is_kleene(self):
        import pyarrow as pa

        arr = pa.array(["chr1", None, "chr2", "apple"])
        c = self._ctx(arr)
        got = c.sql("SELECT i FROM t WHERE s >= 'chr1' ORDER BY i").to_pylist()
        assert got == [{"i": 0}, {"i": 2}]
        got = c.sql("SELECT i FROM t WHERE NOT (s >= 'chr1') ORDER BY i").to_pylist()
        assert got == [{"i": 3}]  # NULL stays UNKNOWN under NOT

    def test_dictionary_encoded_column(self):
        import pyarrow as pa

        arr = pa.array(["b", "a", None, "b"]).dictionary_encode()
        c = self._ctx(arr)
        got = c.sql("SELECT i FROM t WHERE s = 'b' ORDER BY i").to_pylist()
        assert got == [{"i": 0}, {"i": 3}]

    def test_literal_on_left_flips_operator(self):
        import pyarrow as pa

        arr = pa.array(["a", "b", "c"])
        c = self._ctx(arr)
        got = c.sql("SELECT i FROM t WHERE 'b' < s ORDER BY i").to_pylist()
        assert got == [{"i": 2}]

    def test_like_newline_semantics(self):
        """SQL LIKE: % and _ match newlines; a trailing newline is NOT
        ignored (sqlite-verified; both eval paths agree)."""
        import pyarrow as pa

        arr = pa.array(["a\nc", "abc\n", "abc"])
        c = self._ctx(arr)
        got = c.sql("SELECT i FROM t WHERE s LIKE 'a%c' ORDER BY i").to_pylist()
        assert got == [{"i": 0}, {"i": 2}]
        got = c.sql("SELECT i FROM t WHERE s LIKE 'abc' ORDER BY i").to_pylist()
        assert got == [{"i": 2}]
        got = c.sql("SELECT i FROM t WHERE s LIKE 'a_c' ORDER BY i").to_pylist()
        assert got == [{"i": 0}, {"i": 2}]

    def test_not_like_with_nulls(self):
        import pyarrow as pa

        arr = pa.array(["chr1", None, "other"])
        c = self._ctx(arr)
        got = c.sql("SELECT i FROM t WHERE s NOT LIKE 'chr%' ORDER BY i").to_pylist()
        assert got == [{"i": 2}]  # NULL excluded, not flipped to TRUE


class TestExtendedAggregates:
    """Statistical aggregates, FILTER, DISTINCT-for-all-aggs, and
    ROLLUP/CUBE/GROUPING SETS (DataFusion's aggregate surface; values
    hand-checked, sqlite cross-checks live in test_fuzz_sqlite)."""

    def _ctx(self):
        import pyarrow as pa

        from sequila_tpu.session import SessionContext

        c = SessionContext()
        c.register_table(
            "t",
            pa.table(
                {
                    "g": ["a", "a", "b", "b", "b", None],
                    "x": [1, 1, 2, 3, 3, 4],
                    "y": [1.5, 2.5, None, 4.0, 4.0, 5.0],
                }
            ),
        )
        return c

    def test_sum_avg_distinct(self):
        c = self._ctx()
        r = c.sql("SELECT sum(DISTINCT x) s, avg(DISTINCT x) a FROM t").to_pylist()
        assert r == [{"s": 10, "a": 2.5}]

    def test_variance_family(self):
        import math

        c = self._ctx()
        r = c.sql(
            "SELECT var_pop(x) vp, var_samp(x) vs, stddev(x) sd FROM t"
        ).to_pylist()[0]
        assert abs(r["vp"] - 11 / 9) < 1e-12
        assert abs(r["vs"] - 22 / 15) < 1e-12
        assert abs(r["sd"] - math.sqrt(22 / 15)) < 1e-12

    def test_variance_small_groups_null(self):
        c = self._ctx()
        r = c.sql(
            "SELECT g, stddev(x) sd, stddev_pop(x) sp FROM t "
            "WHERE g = 'a' AND x = 1 GROUP BY g"
        ).to_pylist()
        # two equal values: samp = 0; one value after DISTINCT-like cases
        assert r == [{"g": "a", "sd": 0.0, "sp": 0.0}]
        r = c.sql("SELECT stddev(x) sd FROM t WHERE x = 4").to_pylist()
        assert r == [{"sd": None}]  # n=1: sample stddev undefined

    def test_median_and_corr(self):
        c = self._ctx()
        r = c.sql("SELECT median(x) m FROM t").to_pylist()
        assert r == [{"m": 2.5}]
        r = c.sql("SELECT covar_samp(x, y) cs, covar_pop(x, y) cp FROM t").to_pylist()[0]
        assert abs(r["cs"] - 1.8) < 1e-12 and abs(r["cp"] - 1.44) < 1e-12

    def test_corr_zero_variance_is_null(self):
        c = self._ctx()
        r = c.sql("SELECT corr(x, y) r FROM t WHERE x = 3").to_pylist()
        assert r == [{"r": None}]  # y constant -> zero variance

    def test_string_agg_and_array_agg(self):
        c = self._ctx()
        r = c.sql("SELECT string_agg(g, '-') s FROM t").to_pylist()
        assert r == [{"s": "a-a-b-b-b"}]
        r = c.sql("SELECT g, array_agg(y) a FROM t GROUP BY g ORDER BY g").to_pylist()
        assert r[0] == {"g": "a", "a": [1.5, 2.5]}
        assert r[1] == {"g": "b", "a": [None, 4.0, 4.0]}  # NULLs kept

    def test_filter_clause(self):
        c = self._ctx()
        r = c.sql(
            "SELECT count(*) FILTER (WHERE g = 'b') cb, "
            "sum(x) FILTER (WHERE g = 'a') sa, count(*) n FROM t"
        ).to_pylist()
        assert r == [{"cb": 3, "sa": 2, "n": 6}]

    def test_filter_all_rows_excluded(self):
        c = self._ctx()
        r = c.sql(
            "SELECT g, min(x) FILTER (WHERE x > 100) m FROM t "
            "GROUP BY g ORDER BY g"
        ).to_pylist()
        assert [row["m"] for row in r] == [None, None, None]

    def test_bool_and_or(self):
        c = self._ctx()
        r = c.sql(
            "SELECT g, bool_and(x < 3) ba, bool_or(x > 2) bo FROM t "
            "GROUP BY g ORDER BY g"
        ).to_pylist()
        assert r[0] == {"g": "a", "ba": True, "bo": False}
        assert r[1] == {"g": "b", "ba": False, "bo": True}

    def test_rollup(self):
        c = self._ctx()
        r = c.sql(
            "SELECT g, sum(x) s FROM t GROUP BY ROLLUP(g) ORDER BY s"
        ).to_pylist()
        assert r == [
            {"g": "a", "s": 2},
            {"g": None, "s": 4},
            {"g": "b", "s": 8},
            {"g": None, "s": 14},  # grand total
        ]

    def test_cube_set_count(self):
        c = self._ctx()
        r = c.sql(
            "SELECT g, x, count(*) n FROM t GROUP BY CUBE(g, x)"
        ).to_pylist()
        # (g,x): 4 combos; (g): 3; (x): 4; (): 1
        assert len(r) == 12
        total = [row for row in r if row["g"] is None and row["x"] is None]
        assert {"g": None, "x": None, "n": 6} in total

    def test_grouping_sets_with_grouping_fn(self):
        c = self._ctx()
        r = c.sql(
            "SELECT g, sum(x) s, grouping(g) gr FROM t "
            "GROUP BY GROUPING SETS ((g), ()) ORDER BY gr, g"
        ).to_pylist()
        assert r[-1] == {"g": None, "s": 14, "gr": 1}
        assert {"g": "b", "s": 8, "gr": 0} in r

    def test_having_over_grouping_sets(self):
        c = self._ctx()
        r = c.sql(
            "SELECT g, sum(x) s FROM t GROUP BY ROLLUP(g) "
            "HAVING sum(x) > 5 ORDER BY s"
        ).to_pylist()
        assert r == [{"g": "b", "s": 8}, {"g": None, "s": 14}]

    def test_first_last_value_aggregates(self):
        c = self._ctx()
        r = c.sql("SELECT first_value(x) f, last_value(x) l FROM t").to_pylist()
        assert r == [{"f": 1, "l": 4}]

    def test_count_fast_path_not_taken_with_filter(self):
        """count(*) FILTER must NOT ride the interval-join count fast
        path (which counts all join rows)."""
        import pyarrow as pa

        c = self._ctx()
        c.register_table(
            "r", pa.table({"c": ["c1", "c1"], "s": [1, 5], "e": [3, 9]})
        )
        c.register_table(
            "q", pa.table({"c": ["c1"], "s": [2], "e": [6]})
        )
        r = c.sql(
            "SELECT count(*) FILTER (WHERE r.s > 2) n FROM r JOIN q "
            "ON r.c = q.c AND r.s <= q.e AND r.e >= q.s"
        ).to_pylist()
        assert r == [{"n": 1}]


class TestRegrAggregates:
    """Postgres/DataFusion linear-regression aggregate family —
    regr_*(Y, X), rows with a NULL on either side excluded."""

    def _ctx(self):
        import pyarrow as pa

        c = SessionContext()
        c.register_table(
            "p",
            pa.table(
                {
                    "g": ["a", "a", "a", "b", "b", "c"],
                    "x": pa.array([1, 2, 3, 1, 1, None], type=pa.int64()),
                    "y": [2.0, 4.1, 5.9, 1.0, 3.0, 5.0],
                }
            ),
        )
        return c

    def test_slope_intercept_vs_polyfit(self):
        import numpy as np

        out = self._ctx().sql(
            "SELECT regr_slope(y, x) m, regr_intercept(y, x) b,"
            " regr_count(y, x) n FROM p WHERE g = 'a'"
        ).to_pylist()[0]
        m, b = np.polyfit([1, 2, 3], [2.0, 4.1, 5.9], 1)
        assert abs(out["m"] - m) < 1e-9 and abs(out["b"] - b) < 1e-9
        assert out["n"] == 3

    def test_moments_and_r2(self):
        out = self._ctx().sql(
            "SELECT regr_avgx(y, x) ax, regr_avgy(y, x) ay,"
            " regr_sxx(y, x) sxx, regr_syy(y, x) syy, regr_sxy(y, x) sxy,"
            " regr_r2(y, x) r2 FROM p WHERE g = 'a'"
        ).to_pylist()[0]
        assert out["ax"] == 2.0 and out["ay"] == 4.0
        assert abs(out["sxx"] - 2.0) < 1e-12
        assert abs(out["syy"] - 7.62) < 1e-12
        assert abs(out["sxy"] - 3.9) < 1e-12
        assert abs(out["r2"] - 3.9**2 / (2.0 * 7.62)) < 1e-12

    def test_degenerate_groups(self):
        out = self._ctx().sql(
            "SELECT g, regr_count(y, x) n, regr_slope(y, x) m,"
            " regr_r2(y, x) r2, regr_avgx(y, x) ax"
            " FROM p GROUP BY g ORDER BY g"
        ).to_pylist()
        # b: vertical line (sxx = 0) -> slope/r2 NULL; c: all-NULL x
        assert [r["n"] for r in out] == [3, 2, 0]
        assert out[1]["m"] is None and out[1]["r2"] is None
        assert out[2]["m"] is None and out[2]["ax"] is None

    def test_perfect_fit_r2_and_filter(self):
        out = self._ctx().sql(
            "SELECT regr_r2(y, x) r2,"
            " regr_count(y, x) FILTER (WHERE g = 'a') nf"
            " FROM p WHERE g = 'b'"
        ).to_pylist()[0]
        # constant x -> NULL r2 even though syy > 0
        assert out["r2"] is None and out["nf"] == 0


class TestSqlSurfacePack3:
    """GROUP BY ALL, ORDER BY <aggregate>, agg-internal ORDER BY,
    NATURAL JOIN, WINDOW clause, DISTINCT ON — the DataFusion surface
    the round-2 probe found missing."""

    def _ctx(self):
        import pyarrow as pa

        c = SessionContext()
        c.register_table(
            "t",
            pa.table(
                {
                    "g": ["a", "a", "b", "c", "b", "b"],
                    "v": [1, 3, 2, 9, 5, 1],
                    "s": ["x", "w", None, "q", "z", "m"],
                }
            ),
        )
        return c

    def test_order_by_aggregate_not_in_select(self):
        c = self._ctx()
        got = c.sql(
            "SELECT g FROM t GROUP BY g ORDER BY count(*) DESC, g"
        )
        assert got.to_pylist_column(0) == ["b", "a", "c"]
        assert got.column_names == ["g"]
        got = c.sql(
            "SELECT g FROM t GROUP BY g ORDER BY sum(v) * -1, min(s)"
        ).to_pylist_column(0)
        assert got == ["c", "b", "a"]

    def test_order_by_aggregate_present_in_select(self):
        c = self._ctx()
        got = c.sql(
            "SELECT g, count(*) AS n FROM t GROUP BY g"
            " ORDER BY count(*) DESC, g"
        )
        assert got.column_names == ["g", "n"]
        assert got.to_pylist_column(1) == [3, 2, 1]

    def test_group_by_all(self):
        c = self._ctx()
        got = c.sql(
            "SELECT g, sum(v) AS sv FROM t GROUP BY ALL ORDER BY g"
        ).to_pylist()
        assert [(r["g"], r["sv"]) for r in got] == [
            ("a", 4), ("b", 8), ("c", 9),
        ]
        got = c.sql(
            "SELECT v % 2 AS p, count(*) FROM t GROUP BY ALL ORDER BY p"
        ).to_pylist()
        assert [r["p"] for r in got] == [0, 1]

    def test_agg_internal_order_by(self):
        c = self._ctx()
        got = c.sql(
            "SELECT g, array_agg(v ORDER BY v DESC) a FROM t"
            " GROUP BY g ORDER BY g"
        ).to_pylist()
        assert [list(r["a"]) for r in got] == [[3, 1], [5, 2, 1], [9]]
        got = c.sql(
            "SELECT string_agg(s, '-' ORDER BY v) x FROM t WHERE g = 'b'"
        ).to_pylist_column(0)
        assert got == ["m-z"]  # NULL s dropped; v order 1,2,5
        got = c.sql(
            "SELECT first_value(s ORDER BY v DESC) f,"
            " last_value(v ORDER BY s NULLS FIRST) l FROM t WHERE g = 'b'"
        ).to_pylist()[0]
        assert got["f"] == "z" and got["l"] == 5

    def test_agg_order_by_rejected_for_plain_aggs(self):
        c = self._ctx()
        with pytest.raises(PlanError):
            c.sql("SELECT sum(v ORDER BY v) FROM t")

    def test_natural_join(self):
        c = SessionContext()
        c.sql("CREATE TABLE a AS SELECT value AS k, value * 10 AS x"
              " FROM generate_series(1, 3)")
        c.sql("CREATE TABLE b AS SELECT value AS k, value * 100 AS y"
              " FROM generate_series(2, 4)")
        got = c.sql("SELECT * FROM a NATURAL JOIN b ORDER BY k")
        assert got.column_names == ["k", "x", "y"]
        assert got.to_pylist() == [
            {"k": 2, "x": 20, "y": 200},
            {"k": 3, "x": 30, "y": 300},
        ]
        got = c.sql("SELECT * FROM a NATURAL LEFT JOIN b ORDER BY k")
        assert got.to_pylist_column(0) == [1, 2, 3]
        assert got.to_pylist()[0]["y"] is None

    def test_window_clause(self):
        c = self._ctx()
        got = c.sql(
            "SELECT g, v, sum(v) OVER w AS rs, row_number() OVER w AS rn"
            " FROM t WINDOW w AS (PARTITION BY g ORDER BY v)"
            " ORDER BY g, v"
        ).to_pylist()
        assert [r["rs"] for r in got] == [1, 4, 1, 3, 8, 9]
        assert [r["rn"] for r in got] == [1, 2, 1, 2, 3, 1]
        with pytest.raises(PlanError):
            c.sql("SELECT sum(v) OVER nope FROM t")

    def test_distinct_on(self):
        c = self._ctx()
        got = c.sql(
            "SELECT DISTINCT ON (g) g, v FROM t ORDER BY g, v DESC"
        ).to_pylist()
        assert got == [
            {"g": "a", "v": 3}, {"g": "b", "v": 5}, {"g": "c", "v": 9},
        ]
        # no ORDER BY: first row per key in input order
        got = c.sql("SELECT DISTINCT ON (g) g, v FROM t").to_pylist()
        assert sorted((r["g"], r["v"]) for r in got) == [
            ("a", 1), ("b", 2), ("c", 9),
        ]


class TestSqlSurfacePack4:
    """arrow_cast, struct functions, star EXCLUDE/EXCEPT, SIMILAR TO,
    LIMIT const-expressions, SELECT ALL, EXPLAIN VERBOSE."""

    def _ctx(self):
        c = SessionContext()
        c.sql("CREATE TABLE t AS VALUES ('a', 1), ('b', 2), ('c', 3)")
        return c

    def test_arrow_cast(self):
        c = self._ctx()
        out = c.sql(
            "SELECT arrow_cast(column2, 'Float64') f,"
            " arrow_cast('12', 'Int32') + 1 i,"
            " arrow_cast(column2, 'Utf8') s FROM t LIMIT 1"
        ).to_pylist()[0]
        assert out["f"] == 1.0 and out["i"] == 13 and out["s"] == "1"
        with pytest.raises(PlanError):
            c.sql("SELECT arrow_cast(column2, 'Decimal256(10,2)') FROM t")

    def test_struct_functions(self):
        c = self._ctx()
        out = c.sql(
            "SELECT struct(column1, column2) st,"
            " named_struct('k', column1, 'v', column2) ns,"
            " named_struct('k', column1, 'v', column2)['k'] kk,"
            " get_field(struct(column2), 'c0') g FROM t ORDER BY column1"
        ).to_pylist()
        assert out[0]["st"] == {"c0": "a", "c1": 1}
        assert out[1]["ns"] == {"k": "b", "v": 2}
        assert [r["kk"] for r in out] == ["a", "b", "c"]
        assert [r["g"] for r in out] == [1, 2, 3]
        # struct columns round-trip through CTAS (arrow struct type)
        c.sql("CREATE TABLE s2 AS SELECT named_struct('x', column2) st FROM t")
        assert c.sql(
            "SELECT st['x'] * 10 AS v FROM s2 ORDER BY 1"
        ).to_pylist_column(0) == [10, 20, 30]

    def test_star_exclude(self):
        c = self._ctx()
        assert c.sql(
            "SELECT * EXCLUDE (column2) FROM t"
        ).column_names == ["column1"]
        assert c.sql(
            "SELECT * EXCEPT (column1) FROM t"
        ).column_names == ["column2"]
        assert c.sql(
            "SELECT t.* EXCLUDE column1 FROM t"
        ).column_names == ["column2"]
        with pytest.raises(PlanError):
            c.sql("SELECT * EXCLUDE (nope) FROM t")
        # set-operation EXCEPT is unaffected
        got = c.sql(
            "SELECT column1 FROM t EXCEPT SELECT 'a'"
        ).to_pylist_column(0)
        assert sorted(got) == ["b", "c"]

    def test_similar_to(self):
        c = SessionContext()
        c.sql("CREATE TABLE p AS VALUES ('abc'), ('a.c'), ('abcd'), ('xbc')")
        run = lambda pat, neg="": sorted(
            c.sql(
                f"SELECT column1 FROM p WHERE column1 {neg}SIMILAR TO '{pat}'"
            ).to_pylist_column(0)
        )
        assert run("ab%") == ["abc", "abcd"]
        assert run("(a|x)bc") == ["abc", "xbc"]
        assert run("a.c") == ["a.c"]  # '.' is literal in SIMILAR TO
        assert run("_bc") == ["abc", "xbc"]
        assert run("%bc%", neg="NOT ") == ["a.c"]

    def test_limit_expressions_select_all_explain_verbose(self):
        c = self._ctx()
        assert c.sql("SELECT * FROM t LIMIT 1+1").num_rows == 2
        assert c.sql(
            "SELECT column2 FROM t ORDER BY column2 LIMIT 4/2 OFFSET 3-2"
        ).to_pylist_column(0) == [2, 3]
        assert c.sql("SELECT ALL column1 FROM t").num_rows == 3
        plan = c.sql("EXPLAIN VERBOSE SELECT * FROM t").to_pylist_column(1)
        assert any("Scan" in p for p in plan)
        with pytest.raises(PlanError):
            c.sql("SELECT * FROM t LIMIT column1")


class TestOrderByAliasInExpression:
    def test_alias_inside_order_expression(self):
        c = SessionContext()
        c.sql("CREATE TABLE t AS VALUES ('a', -3), ('b', 2), ('c', -1)")
        got = c.sql(
            "SELECT column2 AS v FROM t ORDER BY abs(v)"
        ).to_pylist_column(0)
        assert got == [-1, 2, -3]  # sqlite/DataFusion resolution
        got = c.sql(
            "SELECT column2 AS v, column1 FROM t"
            " ORDER BY abs(v) * -1, column1"
        ).to_pylist_column(0)
        assert got == [-3, 2, -1]

    def test_input_column_shadows_alias(self):
        c = SessionContext()
        c.sql("CREATE TABLE u AS VALUES (5, -10)")
        out = c.sql(
            "SELECT column2 AS column1, column1 AS orig FROM u"
            " ORDER BY abs(column1)"
        ).to_pylist()
        assert out == [{"column1": -10, "orig": 5}]

    def test_unknown_name_still_errors(self):
        c = SessionContext()
        c.sql("CREATE TABLE t AS VALUES (1)")
        with pytest.raises(PlanError):
            c.sql("SELECT column1 AS v FROM t ORDER BY abs(nope)")
