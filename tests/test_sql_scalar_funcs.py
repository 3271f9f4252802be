"""Scalar SQL functions and expressions over aggregates.

The reference inherits DataFusion's scalar-function library; this engine
implements the commonly used subset (docs/SQL.md) with SQL NULL
propagation.  Also locks in `IS [NOT] NULL` (previously unbound) and
post-aggregate expressions like round(avg(v), 1).
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
                "g": ["a", "a", "b"],
                "v": pa.array([1, None, -3], type=pa.int64()),
                "s": ["Hello", None, "world"],
            }
        ),
    )
    return c


class TestIsNull:
    def test_is_null(self, ctx):
        assert ctx.sql("SELECT g FROM t WHERE v IS NULL").to_pylist_column(0) == ["a"]

    def test_is_not_null(self, ctx):
        got = ctx.sql("SELECT v FROM t WHERE v IS NOT NULL ORDER BY v")
        assert got.to_pylist_column(0) == [-3, 1]


class TestNumericFuncs:
    def test_abs_round_sqrt_power(self, ctx):
        got = ctx.sql(
            "SELECT abs(v), round(sqrt(4), 1), power(2, 10) FROM t WHERE v = -3"
        ).to_pylist()[0]
        assert list(got.values()) == [3.0, 2.0, 1024.0]

    def test_floor_ceil_sign(self, ctx):
        c = SessionContext()
        c.register_table("q", pa.table({"f": [2.7, -2.7]}))
        got = c.sql("SELECT floor(f), ceil(f), sign(f) FROM q").to_pylist()
        assert [list(r.values()) for r in got] == [[2.0, 3.0, 1.0], [-3.0, -2.0, -1.0]]


class TestStringFuncs:
    def test_upper_lower_length(self, ctx):
        got = ctx.sql(
            "SELECT upper(s), lower(s), length(s) FROM t WHERE s = 'Hello'"
        ).to_pylist()[0]
        assert list(got.values()) == ["HELLO", "hello", 5]

    def test_null_propagates(self, ctx):
        got = ctx.sql("SELECT upper(s) FROM t WHERE v IS NULL").to_pylist()[0]
        assert list(got.values()) == [None]

    def test_substr_one_based(self, ctx):
        c = SessionContext()
        c.register_table("q", pa.table({"s": ["genomics"]}))
        got = c.sql("SELECT substr(s, 1, 3), substr(s, 4) FROM q").to_pylist()[0]
        assert list(got.values()) == ["gen", "omics"]

    def test_replace_trim_starts_with(self, ctx):
        c = SessionContext()
        c.register_table("q", pa.table({"s": ["  chr1  "]}))
        got = c.sql(
            "SELECT trim(s), replace(trim(s), 'chr', ''), starts_with(trim(s), 'chr') FROM q"
        ).to_pylist()[0]
        assert list(got.values()) == ["chr1", "1", True]

    def test_concat_skips_nulls(self, ctx):
        got = ctx.sql("SELECT concat(s, '!') FROM t ORDER BY g").to_pylist()
        vals = [list(r.values())[0] for r in got]
        assert "!" in vals  # NULL s row contributes just the literal


class TestConditionalFuncs:
    def test_coalesce(self, ctx):
        got = ctx.sql("SELECT coalesce(v, 0) FROM t ORDER BY g")
        assert sorted(got.to_pylist_column(0)) == [-3.0, 0.0, 1.0]

    def test_nullif(self, ctx):
        c = SessionContext()
        c.register_table("q", pa.table({"x": [1, 2]}))
        got = c.sql("SELECT nullif(x, 1) FROM q").to_pylist()
        assert [list(r.values())[0] for r in got] == [None, 2]

    def test_greatest_least(self, ctx):
        c = SessionContext()
        c.register_table("q", pa.table({"x": [5]}))
        got = c.sql("SELECT greatest(3, x, 4), least(3, x, 4) FROM q").to_pylist()[0]
        assert list(got.values()) == [5, 3]

    def test_unknown_function_rejected(self, ctx):
        with pytest.raises(PlanError, match="unknown function"):
            ctx.sql("SELECT frobnicate(v) FROM t")


class TestExprOverAggregates:
    def test_round_avg(self, ctx):
        c = SessionContext()
        c.register_table("q", pa.table({"v": [1, 2, 5]}))
        got = c.sql("SELECT round(avg(v), 1) AS a FROM q").to_pylist()
        assert got == [{"a": 2.7}]

    def test_arith_over_aggs_grouped(self, ctx):
        c = SessionContext()
        c.register_table("q", pa.table({"g": ["a", "a", "b"], "v": [1, 2, 5]}))
        got = c.sql(
            "SELECT g, sum(v) * 2 + count(*) AS z FROM q GROUP BY g ORDER BY g"
        ).to_pylist()
        assert got == [{"g": "a", "z": 8}, {"g": "b", "z": 11}]

    def test_cast_over_agg(self, ctx):
        c = SessionContext()
        c.register_table("q", pa.table({"v": [1, 2, 5]}))
        got = c.sql("SELECT CAST(avg(v) AS INT) FROM q").to_pylist()[0]
        assert list(got.values()) == [2]

    def test_ratio_of_aggs(self, ctx):
        c = SessionContext()
        c.register_table("q", pa.table({"v": [2, 4, 6]}))
        got = c.sql("SELECT sum(v) / count(v) AS m FROM q").to_pylist()
        assert got == [{"m": 4}]

    def test_scalar_funcs_in_where(self, ctx):
        got = ctx.sql("SELECT s FROM t WHERE length(s) = 5 AND lower(s) = 'world'")
        assert got.to_pylist_column(0) == ["world"]

    def test_group_by_scalar_func(self, ctx):
        c = SessionContext()
        c.register_table("q", pa.table({"s": ["aa", "AB", "ba"], "v": [1, 2, 4]}))
        got = c.sql(
            "SELECT upper(substr(s, 1, 1)) AS k, sum(v) FROM q "
            "GROUP BY upper(substr(s, 1, 1)) ORDER BY k"
        ).to_pylist()
        assert got == [
            {"k": "A", "sum(v)": 3},
            {"k": "B", "sum(v)": 4},
        ]


class TestCaseWhen:
    @pytest.fixture()
    def cctx(self):
        c = SessionContext()
        c.register_table(
            "t",
            pa.table({"x": [1, 2, 3, 4], "s": ["chr1", "chr2", "chrX", "other"],
                      "v": pa.array([5, None, 1, 3], type=pa.int64())}),
        )
        return c

    def test_searched_case(self, cctx):
        got = cctx.sql(
            "SELECT CASE WHEN x < 2 THEN 'low' WHEN x < 4 THEN 'mid' "
            "ELSE 'high' END AS b FROM t"
        ).to_pylist_column(0)
        assert got == ["low", "mid", "mid", "high"]

    def test_simple_case_null_fallthrough(self, cctx):
        got = cctx.sql(
            "SELECT CASE x WHEN 1 THEN 'one' WHEN 2 THEN 'two' END AS w FROM t"
        ).to_pylist_column(0)
        assert got == ["one", "two", None, None]

    def test_case_numeric_in_aggregate(self, cctx):
        # conditional count via CASE (classic pivot idiom)
        got = cctx.sql(
            "SELECT sum(CASE WHEN x < 3 THEN 1 ELSE 0 END) AS c FROM t"
        ).to_pylist()
        assert got == [{"c": 2.0}]

    def test_case_in_where(self, cctx):
        got = cctx.sql(
            "SELECT x FROM t WHERE CASE WHEN x > 2 THEN TRUE ELSE FALSE END "
            "ORDER BY x"
        ).to_pylist_column(0)
        assert got == [3, 4]


class TestLike:
    @pytest.fixture()
    def lctx(self):
        c = SessionContext()
        c.register_table(
            "t",
            pa.table({"s": ["chr1", "chr2", "chrX", "other", None]}),
        )
        return c

    def test_like_prefix(self, lctx):
        got = lctx.sql("SELECT s FROM t WHERE s LIKE 'chr%' ORDER BY s")
        assert got.to_pylist_column(0) == ["chr1", "chr2", "chrX"]

    def test_like_single_char(self, lctx):
        got = lctx.sql("SELECT s FROM t WHERE s LIKE 'chr_' ORDER BY s")
        assert got.to_pylist_column(0) == ["chr1", "chr2", "chrX"]

    def test_not_like_excludes_nulls(self, lctx):
        # NULL NOT LIKE p is UNKNOWN -> filtered
        got = lctx.sql("SELECT s FROM t WHERE s NOT LIKE 'chr%'")
        assert got.to_pylist_column(0) == ["other"]

    def test_ilike(self, lctx):
        got = lctx.sql("SELECT s FROM t WHERE s ILIKE 'CHR%' ORDER BY s")
        assert got.to_pylist_column(0) == ["chr1", "chr2", "chrX"]

    def test_like_regex_metachar_escaped(self, lctx):
        c = SessionContext()
        c.register_table("q", pa.table({"s": ["a.b", "axb"]}))
        got = c.sql("SELECT s FROM q WHERE s LIKE 'a.b'")
        assert got.to_pylist_column(0) == ["a.b"]  # '.' is literal in LIKE


class TestOrderNullsAndOffset:
    @pytest.fixture()
    def octx(self):
        c = SessionContext()
        c.register_table(
            "t", pa.table({"v": pa.array([5, None, 1, 3], type=pa.int64())})
        )
        return c

    def test_nulls_first(self, octx):
        got = octx.sql("SELECT v FROM t ORDER BY v NULLS FIRST")
        assert got.to_pylist_column(0) == [None, 1, 3, 5]

    def test_default_nulls_last(self, octx):
        got = octx.sql("SELECT v FROM t ORDER BY v")
        assert got.to_pylist_column(0) == [1, 3, 5, None]

    def test_desc_nulls_last(self, octx):
        got = octx.sql("SELECT v FROM t ORDER BY v DESC NULLS LAST")
        assert got.to_pylist_column(0) == [5, 3, 1, None]

    def test_limit_offset(self, octx):
        got = octx.sql("SELECT v FROM t ORDER BY v LIMIT 2 OFFSET 1")
        assert got.to_pylist_column(0) == [3, 5]

    def test_offset_only(self, octx):
        got = octx.sql("SELECT v FROM t ORDER BY v OFFSET 3")
        assert got.to_pylist_column(0) == [None]


class TestAliasOrdinalRefs:
    """GROUP BY / ORDER BY may reference SELECT aliases and 1-based
    ordinals (sqlite/Postgres/DataFusion shorthand)."""

    @pytest.fixture()
    def rctx(self):
        c = SessionContext()
        c.register_table("t", pa.table({"g": ["a", "a", "b"], "x": [1, 5, 3]}))
        return c

    def test_group_by_alias(self, rctx):
        got = rctx.sql(
            "SELECT CASE WHEN x > 2 THEN 'hi' ELSE 'lo' END AS c, count(*) "
            "FROM t GROUP BY c ORDER BY c"
        ).to_pylist()
        assert got == [{"c": "hi", "count(*)": 2}, {"c": "lo", "count(*)": 1}]

    def test_group_by_ordinal(self, rctx):
        got = rctx.sql(
            "SELECT g, sum(x) FROM t GROUP BY 1 ORDER BY 2 DESC"
        ).to_pylist()
        assert got == [{"g": "a", "sum(x)": 6}, {"g": "b", "sum(x)": 3}]

    def test_order_by_ordinal_plain(self, rctx):
        got = rctx.sql("SELECT x, g FROM t ORDER BY 2, 1 DESC").to_pylist()
        assert [r["x"] for r in got] == [5, 1, 3]

    def test_ordinal_out_of_range(self, rctx):
        with pytest.raises(PlanError, match="position"):
            rctx.sql("SELECT x FROM t ORDER BY 3")
        with pytest.raises(PlanError, match="position"):
            rctx.sql("SELECT g, count(*) FROM t GROUP BY 5")


def test_constant_items_with_aggregates():
    """Constants need no GROUP BY membership (SELECT 1, count(*) — the
    Postgres rule); ungrouped columns are still rejected."""
    from sequila_tpu.errors import PlanError
    from sequila_tpu.session import SessionContext

    c = SessionContext()
    c.register_table("t", pa.table({"g": ["a", "b"], "x": [1, 2]}))
    got = c.sql("SELECT -7 / 2 AS d, count(*) AS c FROM t").to_pylist()
    assert got == [{"d": -3, "c": 2}]
    got2 = c.sql("SELECT g, 'tag' AS t2, count(*) FROM t GROUP BY g ORDER BY g").to_pylist()
    assert [r["t2"] for r in got2] == ["tag", "tag"]
    with pytest.raises(PlanError, match="GROUP BY"):
        c.sql("SELECT x, count(*) FROM t")


class TestStringFuncPack:
    """The wider DataFusion string-function surface added in round 2."""

    def test_concat_operator_null_propagates(self, ctx):
        got = ctx.sql("SELECT s || '!' FROM t").to_pylist_column(0)
        assert got == ["Hello!", None, "world!"]

    def test_concat_operator_renders_ints(self, ctx):
        got = ctx.sql(
            "SELECT g || v FROM t ORDER BY g"
        ).to_pylist_column(0)
        assert got == ["a1", None, "b-3"]

    def test_double_colon_cast(self, ctx):
        got = ctx.sql("SELECT '7'::INT + v FROM t WHERE v = 1")
        assert got.to_pylist_column(0) == [8]

    def test_pads(self, ctx):
        got = ctx.sql(
            "SELECT lpad('x', 4, 'ab'), rpad('x', 4, 'ab'), lpad('long', 2)"
        ).to_pylist()[0]
        assert list(got.values()) == ["abax", "xaba", "lo"]

    def test_split_part(self, ctx):
        got = ctx.sql(
            "SELECT split_part('a,b,c', ',', 2), split_part('a,b,c', ',', -1),"
            " split_part('a,b,c', ',', 9)"
        ).to_pylist()[0]
        assert list(got.values()) == ["b", "c", ""]

    def test_translate_repeat_left_right(self, ctx):
        got = ctx.sql(
            "SELECT translate('abcd', 'bd', 'x'), repeat('ab', 2),"
            " left('abcdef', -2), right('abcdef', -2)"
        ).to_pylist()[0]
        assert list(got.values()) == ["axc", "abab", "abcd", "cdef"]

    def test_strpos_and_position(self, ctx):
        got = ctx.sql(
            "SELECT strpos('hello', 'll') AS a, position('ll' IN 'hello')"
            " AS b, instr('hello', 'zz') AS c"
        ).to_pylist()[0]
        assert list(got.values()) == [3, 3, 0]

    def test_concat_ws(self, ctx):
        got = ctx.sql(
            "SELECT concat_ws('-', 'a', NULL, 'b'), concat_ws(NULL, 'a', 'b')"
        ).to_pylist()[0]
        assert list(got.values()) == ["a-b", None]

    def test_trim_chars(self, ctx):
        got = ctx.sql(
            "SELECT trim('xxaxx', 'x'), ltrim('xxa', 'x'), rtrim('axx', 'x'),"
            " btrim('xxaxx', 'x')"
        ).to_pylist()[0]
        assert list(got.values()) == ["a", "a", "a", "a"]

    def test_regexp_funcs(self, ctx):
        got = ctx.sql(
            "SELECT regexp_like('Hello', '^h', 'i'),"
            " regexp_replace('aaa', 'a', 'b'),"
            " regexp_replace('aaa', 'a', 'b', 'g'),"
            " regexp_count('banana', 'an')"
        ).to_pylist()[0]
        assert list(got.values()) == [True, "baa", "bbb", 2]

    def test_misc(self, ctx):
        got = ctx.sql(
            "SELECT chr(65), to_hex(255), md5('abc'), initcap('hi wORLD'),"
            " ascii('A'), octet_length('héllo'), character_length('ab')"
        ).to_pylist()[0]
        assert list(got.values()) == [
            "A", "ff", "900150983cd24fb0d6963f7d28e17f72", "Hi World",
            65, 6, 2,
        ]

    def test_arrow_typeof(self, ctx):
        got = ctx.sql(
            "SELECT arrow_typeof(v), arrow_typeof(s), arrow_typeof(v + 0.5)"
            " FROM t LIMIT 1"
        ).to_pylist()[0]
        assert list(got.values()) == ["Int64", "Utf8", "Float64"]


class TestTypedNullOutputs:
    """Computed nullable expressions come back as typed arrow arrays with
    real nulls — not NaN doubles (the engine's internal NULL encoding)."""

    def test_int_arith_keeps_int64(self, ctx):
        arr = ctx.sql("SELECT v + 1 AS o FROM t").arrow.column("o")
        assert str(arr.type) == "int64"
        assert arr.to_pylist() == [2, None, -2]

    def test_comparison_returns_bool_with_null(self, ctx):
        arr = ctx.sql("SELECT v > 0 AS o FROM t").arrow.column("o")
        assert str(arr.type) == "bool"
        assert arr.to_pylist() == [True, None, False]

    def test_sum_of_int_is_int(self, ctx):
        arr = ctx.sql(
            "SELECT g, sum(v) AS o FROM t GROUP BY g ORDER BY g"
        ).arrow
        assert str(arr.column("o").type) == "int64"
        assert arr.column("o").to_pylist() == [1, -3]

    def test_null_group_key_is_null(self, ctx):
        c = SessionContext()
        c.register_table("q", pa.table({"k": [1, 1, None], "v": [1, 2, 3]}))
        out = c.sql(
            "SELECT k + 0, sum(v) FROM q GROUP BY 1 ORDER BY 1 NULLS LAST"
        ).to_pylist()
        assert [list(r.values()) for r in out] == [[1, 3], [None, 3]]


class TestBitAggregates:
    def test_bit_aggs(self, ctx):
        c = SessionContext()
        c.register_table(
            "q", pa.table({"g": ["a", "a", "b"], "v": [6, 3, None]})
        )
        out = c.sql(
            "SELECT g, bit_and(v), bit_or(v), bit_xor(v) FROM q"
            " GROUP BY g ORDER BY g"
        ).to_pylist()
        assert [list(r.values()) for r in out] == [
            ["a", 2, 7, 5], ["b", None, None, None],
        ]


class TestArraysAndUnnest:
    """DataFusion's array-library subset + projection-level unnest."""

    def _ctx(self):
        c = SessionContext()
        c.register_table(
            "t", pa.table({"g": ["a", "a", "b"], "v": [1, 2, 3]})
        )
        return c

    def test_literals_and_make_array(self):
        out = self._ctx().sql("SELECT [1, 2, 3] AS a, make_array('x') AS b").to_pylist()[0]
        assert out == {"a": [1, 2, 3], "b": ["x"]}

    def test_length_element_indexing(self):
        out = self._ctx().sql(
            "SELECT array_length([1,2,3]) AS n, [10,20,30][2] AS e,"
            " array_element([10,20], -1) AS neg, [1][5] AS oob"
        ).to_pylist()[0]
        assert out == {"n": 3, "e": 20, "neg": 20, "oob": None}

    def test_contains_position_to_string(self):
        out = self._ctx().sql(
            "SELECT array_contains([1,2], 2) AS c,"
            " array_position(['a','b'], 'b') AS p,"
            " array_position([1], 9) AS miss,"
            " array_to_string([1, NULL, 3], '-') AS s1,"
            " array_to_string([1, NULL, 3], '-', 'x') AS s2"
        ).to_pylist()[0]
        assert out == {"c": True, "p": 2, "miss": None, "s1": "1-3", "s2": "1-x-3"}

    def test_string_to_array_roundtrip(self):
        out = self._ctx().sql(
            "SELECT array_to_string(string_to_array('a,b,c', ','), '|') AS r,"
            " string_to_array('a,,c', ',', '') AS withnull"
        ).to_pylist()[0]
        assert out == {"r": "a|b|c", "withnull": ["a", None, "c"]}

    def test_unnest_literal_and_limit(self):
        c = self._ctx()
        assert c.sql("SELECT unnest([1,2,3])").to_pylist_column(0) == [1, 2, 3]
        assert c.sql("SELECT unnest([1,2,3]) LIMIT 2").to_pylist_column(0) == [1, 2]
        assert c.sql("SELECT unnest([])").num_rows == 0

    def test_unnest_repeats_other_columns(self):
        out = self._ctx().sql(
            "SELECT unnest(string_to_array('x;y', ';')) AS part, v"
            " FROM t WHERE v < 3"
        ).to_pylist()
        assert [list(r.values()) for r in out] == [
            ["x", 1], ["y", 1], ["x", 2], ["y", 2],
        ]

    def test_unnest_of_array_agg(self):
        out = self._ctx().sql(
            "SELECT g, unnest(array_agg(v)) AS v FROM t GROUP BY g ORDER BY g"
        ).to_pylist()
        assert [list(r.values()) for r in out] == [
            ["a", 1], ["a", 2], ["b", 3],
        ]

    def test_unnest_scalar_passthrough(self):
        assert self._ctx().sql(
            "SELECT unnest(v) FROM t"
        ).to_pylist_column(0) == [1, 2, 3]

    def test_two_unnests_rejected(self):
        with pytest.raises(PlanError, match="one unnest"):
            self._ctx().sql("SELECT unnest([1]), unnest([2])")

    def test_array_length_of_agg(self):
        assert self._ctx().sql(
            "SELECT array_length(array_agg(v)) FROM t"
        ).to_pylist_column(0) == [3]

    def test_unnest_order_by_applies_after_expansion(self):
        out = self._ctx().sql(
            "SELECT g, unnest(array_agg(v)) AS v FROM t GROUP BY g"
            " ORDER BY 2 DESC"
        ).to_pylist()
        assert [r["v"] for r in out] == [3, 2, 1]


class TestMathFuncPack:
    def test_trig_and_misc(self, ctx):
        import math

        out = ctx.sql(
            "SELECT atan2(1, 1) AS a, log(100) AS l1, log(2, 8) AS l2,"
            " pi() AS p, factorial(5) AS f, gcd(12, 8) AS g, lcm(12, 4) AS l,"
            " cbrt(27) AS cb, degrees(pi()) AS dg, radians(180.0) AS rd,"
            " trunc(-2.7) AS tr, signum(-5) AS sg"
        ).to_pylist()[0]
        assert out["a"] == math.atan2(1, 1)
        assert out["l1"] == 2.0 and out["l2"] == 3.0
        assert out["p"] == math.pi and out["f"] == 120
        assert out["g"] == 4 and out["l"] == 12
        assert out["cb"] == 3.0 and out["dg"] == 180.0
        assert out["rd"] == math.pi and out["tr"] == -2.0 and out["sg"] == -1.0

    def test_nanvl_iszero_isnan(self, ctx):
        out = ctx.sql(
            "SELECT nanvl(v, 0) AS nv, iszero(v - 1) AS z, isnan(v) AS n"
            " FROM t ORDER BY g, v"
        ).to_pylist()
        # v = [1, None, -3]; NULL rides as NaN -> nanvl substitutes
        assert [r["nv"] for r in out] == [1, 0, -3]
        assert [r["z"] for r in out] == [True, None, False]
        assert [r["n"] for r in out] == [False, None, False]


class TestScalarFuncPack2:
    """The long tail of DataFusion's scalar library (math/string/hash/
    binary-encoding families)."""

    def test_inverse_hyperbolic_and_random(self, ctx):
        import math

        out = ctx.sql(
            "SELECT acosh(1.0) AS ac, asinh(1.0) AS asn, atanh(0.5) AS at,"
            " random() AS r, uuid() AS u"
        ).to_pylist()[0]
        assert out["ac"] == 0.0
        assert out["asn"] == pytest.approx(math.asinh(1.0))
        assert out["at"] == pytest.approx(math.atanh(0.5))
        assert 0.0 <= out["r"] < 1.0
        assert len(out["u"]) == 36 and out["u"].count("-") == 4

    def test_nvl2(self, ctx):
        out = ctx.sql(
            "SELECT nvl2(v, 'has', 'null') AS x FROM t ORDER BY g, v"
        ).to_pylist_column(0)
        assert out == ["has", "null", "has"]

    def test_string_pack(self, ctx):
        out = ctx.sql(
            "SELECT contains('alphabet', 'pha') AS c,"
            " find_in_set('b', 'a,b,c') AS f,"
            " levenshtein('kitten', 'sitting') AS lv,"
            " substr_index('www.apache.org', '.', 2) AS s1,"
            " substr_index('www.apache.org', '.', -1) AS s2,"
            " bit_length('abc') AS bl"
        ).to_pylist()[0]
        assert list(out.values()) == [
            True, 2, 3, "www.apache", "org", 24,
        ]

    def test_hashes_and_encode_decode(self, ctx):
        import hashlib

        out = ctx.sql(
            "SELECT sha256('x') AS h, digest('x', 'sha1') AS d,"
            " encode('hi', 'hex') AS eh, decode('6869', 'hex') AS dh,"
            " decode(encode('hi', 'base64'), 'base64') AS rt"
        ).to_pylist()[0]
        assert out["h"] == hashlib.sha256(b"x").hexdigest()
        assert out["d"] == hashlib.sha1(b"x").hexdigest()
        assert out["eh"] == "6869" and out["dh"] == "hi" and out["rt"] == "hi"

    def test_regexp_match(self, ctx):
        got = ctx.sql(
            "SELECT regexp_match('aBc', '(b)', 'i') AS m,"
            " regexp_match('abc', 'z') AS n"
        ).to_pylist()[0]
        assert list(got["m"]) == ["B"]
        assert got["n"] is None

    def test_null_propagation(self, ctx):
        out = ctx.sql(
            "SELECT levenshtein(s, 'x') AS lv, contains(s, 'o') AS c"
            " FROM t WHERE s IS NULL"
        ).to_pylist()[0]
        assert out["lv"] is None and out["c"] is None


class TestTableFunctions:
    """FROM-clause table functions (DataFusion functions-table)."""

    def test_generate_series_inclusive(self):
        c = SessionContext()
        assert c.sql(
            "SELECT * FROM generate_series(1, 5)"
        ).to_pylist_column(0) == [1, 2, 3, 4, 5]
        assert c.sql(
            "SELECT * FROM generate_series(4)"
        ).to_pylist_column(0) == [0, 1, 2, 3, 4]

    def test_range_exclusive_and_step(self):
        c = SessionContext()
        assert c.sql("SELECT * FROM range(1, 5)").to_pylist_column(0) == [
            1, 2, 3, 4,
        ]
        assert c.sql(
            "SELECT * FROM generate_series(10, 2, -3) t"
        ).to_pylist_column(0) == [10, 7, 4]

    def test_alias_join_and_aggregate(self):
        c = SessionContext()
        assert c.sql(
            "SELECT sum(g.value) FROM generate_series(1, 100) g"
        ).to_pylist_column(0) == [5050]
        out = c.sql(
            "SELECT a.value, b.value FROM range(0, 2) a"
            " JOIN range(0, 2) b ON a.value = b.value ORDER BY 1"
        )
        assert out.column_np(0).tolist() == [0, 1]
        assert out.column_np(1).tolist() == [0, 1]
        assert c.sql(
            "SELECT n FROM generate_series(1, 3) t(n) WHERE n > 1 ORDER BY n"
        ).to_pylist_column(0) == [2, 3]

    def test_errors(self):
        c = SessionContext()
        with pytest.raises(PlanError):
            c.sql("SELECT * FROM generate_series(5, 1)")
        with pytest.raises(PlanError):
            c.sql("SELECT * FROM range(1, 5, 0)")
        with pytest.raises(PlanError):
            c.sql("SELECT * FROM nosuch_table_func(1)")


class TestArrayLibrary2:
    """The long tail of DataFusion's array library."""

    def _one(self, q):
        c = SessionContext()
        v = c.sql(q).to_pylist_column(0)[0]
        if hasattr(v, "tolist"):
            v = v.tolist()
        if isinstance(v, list):
            v = [x.item() if hasattr(x, "item") else x for x in v]
        return v

    def test_mutators(self):
        assert self._one("SELECT array_append([1,2], 3)") == [1, 2, 3]
        assert self._one("SELECT array_prepend(0, [1,2])") == [0, 1, 2]
        assert self._one("SELECT array_concat([1], [2,3], [4])") == [1, 2, 3, 4]
        assert self._one("SELECT array_remove([1,2,1], 1)") == [2, 1]
        assert self._one("SELECT array_remove_all([1,2,1], 1)") == [2]
        assert self._one("SELECT array_replace([1,2,1], 1, 9)") == [9, 2, 1]
        assert self._one("SELECT array_replace_all([1,2,1], 1, 9)") == [9, 2, 9]
        assert self._one("SELECT array_pop_back([1,2,3])") == [1, 2]
        assert self._one("SELECT array_pop_front([1,2,3])") == [2, 3]
        assert self._one("SELECT array_repeat('x', 3)") == ["x", "x", "x"]

    def test_slice_and_sort(self):
        assert self._one("SELECT array_slice([1,2,3,4,5], 2, 4)") == [2, 3, 4]
        assert self._one("SELECT array_slice([1,2,3,4,5], -3, -1)") == [3, 4, 5]
        assert self._one("SELECT array_slice([1,2,3,4,5], 5, 1, -2)") == [5, 3, 1]
        assert self._one("SELECT array_sort([3,1,2])") == [1, 2, 3]
        assert self._one("SELECT array_sort([3,1,2], 'DESC')") == [3, 2, 1]
        got = self._one("SELECT array_sort([2, NULL, 1])")
        assert [x if x is None else int(x) for x in got] == [1, 2, None]
        got = self._one(
            "SELECT array_sort([2, NULL, 1], 'ASC', 'NULLS FIRST')"
        )
        assert got[0] is None

    def test_set_operations(self):
        assert self._one("SELECT array_union([1,2], [2,3])") == [1, 2, 3]
        assert self._one("SELECT array_intersect([1,2,3], [2,3,4])") == [2, 3]
        assert self._one("SELECT array_except([1,2,3], [2])") == [1, 3]
        assert self._one("SELECT array_distinct([1,2,1,3,2])") == [1, 2, 3]

    def test_predicates_and_reductions(self):
        assert self._one("SELECT array_max([1,5,2])") == 5
        assert self._one("SELECT array_min([1,5,2])") == 1
        assert self._one("SELECT array_has_all([1,2,3], [1,3])") is True
        assert self._one("SELECT array_has_any([1,2], [9])") is False
        assert self._one("SELECT flatten([[1,2],[3]])") == [1, 2, 3]
        assert self._one("SELECT empty([])") is True
        assert self._one("SELECT array_join([1,2,3], '-')") == "1-2-3"
        assert self._one("SELECT array_reverse([1,2,3])") == [3, 2, 1]

    def test_null_propagation_and_columns(self):
        assert self._one("SELECT array_append(NULL, 1)") is None
        c = SessionContext()
        c.sql("CREATE TABLE t AS VALUES (1), (2), (3)")
        got = c.sql(
            "SELECT array_sort(array_agg(column1), 'DESC') FROM t"
        ).to_pylist_column(0)[0]
        assert [int(x) for x in got] == [3, 2, 1]


class TestUnionByName:
    def test_union_all_by_name(self):
        c = SessionContext()
        c.sql("CREATE TABLE a AS SELECT value AS x, value * 2 AS y"
              " FROM generate_series(1, 2)")
        c.sql("CREATE TABLE b AS SELECT value * 10 AS z, value AS x"
              " FROM generate_series(2, 3)")
        t = c.sql(
            "SELECT * FROM a UNION ALL BY NAME SELECT * FROM b"
            " ORDER BY x, y NULLS LAST"
        )
        assert t.column_names == ["x", "y", "z"]
        assert t.to_pylist() == [
            {"x": 1, "y": 2, "z": None},
            {"x": 2, "y": 4, "z": None},
            {"x": 2, "y": None, "z": 20},
            {"x": 3, "y": None, "z": 30},
        ]

    def test_union_by_name_dedups(self):
        c = SessionContext()
        c.sql("CREATE TABLE a AS VALUES (1), (2)")
        c.sql("CREATE TABLE b AS VALUES (2), (3)")
        got = c.sql(
            "SELECT column1 FROM a UNION BY NAME SELECT column1 FROM b"
            " ORDER BY column1"
        ).to_pylist_column(0)
        assert got == [1, 2, 3]


class TestMapFunctions:
    """DataFusion's map library (dict cells like structs)."""

    def _one(self, q):
        v = SessionContext().sql(q).to_pylist_column(0)[0]
        if hasattr(v, "tolist"):
            v = v.tolist()
        if isinstance(v, list):
            v = [x.item() if hasattr(x, "item") else x for x in v]
        return v

    def test_construction_and_access(self):
        assert self._one("SELECT map(['a','b'], [1,2])['a']") == 1
        assert self._one("SELECT make_map('x', 10, 'y', 20)['y']") == 20
        assert self._one("SELECT map_keys(map(['a','b'], [1,2]))") == ["a", "b"]
        assert self._one("SELECT map_values(map(['a','b'], [1,2]))") == [1, 2]

    def test_extract_and_contains(self):
        assert self._one("SELECT map_extract(map(['a'],[1]), 'a')") == [1]
        assert self._one("SELECT map_extract(map(['a'],[1]), 'z')") == []
        assert self._one("SELECT map_contains_key(map(['a'],[1]), 'a')") is True
        assert self._one("SELECT map_contains_key(map(['a'],[1]), 'z')") is False

    def test_errors_and_nulls(self):
        c = SessionContext()
        with pytest.raises(Exception):
            c.sql("SELECT map(['a'], [1, 2])")
        assert self._one("SELECT map_keys(NULL)") is None


class TestArrowStringFastPath:
    """The arrow-compute fast path for string functions must agree
    bit-for-bit with the per-row Python fallback (NULLs, unicode,
    newlines, empty strings)."""

    def test_parity_with_python_fallback(self):
        c = SessionContext()
        c.register_table(
            "p",
            pa.table(
                {"s": ["Hello", None, "wörld", "", "chr\n1", "ß", "a,b"]}
            ),
        )
        funcs = [
            "upper(S)", "lower(S)", "length(S)", "char_length(S)",
            "octet_length(S)", "bit_length(S)", "reverse(S)", "trim(S)",
            "ltrim(S)", "rtrim(S)", "starts_with(S, 'ch')",
            "ends_with(S, '1')", "contains(S, 'r')",
            "replace(S, 'l', 'L')",
        ]
        for f in funcs:
            fast = c.sql(
                f"SELECT {f.replace('S', 's')} FROM p"
            ).to_pylist_column(0)
            slow = c.sql(
                f"SELECT {f.replace('S', chr(40) + 's || ' + chr(39) * 2 + chr(41))} FROM p"
            ).to_pylist_column(0)
            assert fast == slow, (f, fast, slow)

    def test_fast_path_types(self):
        # nullable length keeps int64-with-null output typing
        c = SessionContext()
        c.register_table("p", pa.table({"s": ["ab", None]}))
        t = c.sql("SELECT length(s) AS n FROM p")
        assert t.to_pylist_column(0) == [2, None]


class TestUnnestTableFunction:
    def test_from_unnest(self):
        c = SessionContext()
        assert c.sql(
            "SELECT * FROM unnest([3,1,2]) ORDER BY value"
        ).to_pylist_column(0) == [1, 2, 3]
        assert c.sql(
            "SELECT sum(value) FROM unnest([1,2,3])"
        ).to_pylist_column(0) == [6]
        assert c.sql(
            "SELECT n FROM unnest(['a','b']) t(n) ORDER BY n"
        ).to_pylist_column(0) == ["a", "b"]
        assert c.sql(
            "SELECT * FROM unnest(string_to_array('x,y', ','))"
        ).num_rows == 2
        with pytest.raises(PlanError):
            c.sql("SELECT * FROM unnest(1)")
