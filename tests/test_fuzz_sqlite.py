"""Differential SQL fuzz: this engine vs sqlite3 (stdlib).

Random queries over the common SQL subset run through both engines and
must produce identical result sets (float-tolerant).  Determinism comes
from ORDER BY over a unique key with NULLS LAST (sqlite defaults to
NULLS FIRST; PRAGMA case_sensitive_like aligns LIKE semantics).

This is the engine-level analog of the kernel fuzz in test_fuzz.py: the
kernels have brute-force oracles, the SQL frontend has sqlite.
"""

import math
import os
import random
import sqlite3

import pyarrow as pa
import pytest

from sequila_tpu.session import SessionContext

N_ROWS = 60
N_QUERIES = int(os.environ.get("SEQUILA_FUZZ_N", "40"))
# Offline campaigns: SEQUILA_FUZZ_SEED_BASE=<k> re-runs every case with
# fresh seeds (tools/sql_fuzz_campaign.py sweeps many bases).
_SEED_BASE = int(os.environ.get("SEQUILA_FUZZ_SEED_BASE", "0"))


def _rng(seed: int) -> random.Random:
    return random.Random(seed + _SEED_BASE)


def _dataset(rng: random.Random):
    ids = list(range(N_ROWS))
    gs = [rng.choice(["a", "b", "c", None]) for _ in ids]
    xs = [rng.choice([None, *range(-5, 20)]) for _ in ids]
    ys = [
        rng.choice([None, round(rng.uniform(-3, 3), 2)]) for _ in ids
    ]
    ss = [
        # newline values exercise SQL LIKE's wildcards-match-newlines /
        # trailing-newline-is-significant semantics (both eval paths)
        rng.choice(["chr1", "chr2", "chrX", "other", "", None, "chr\n1", "chr1\n"])
        for _ in ids
    ]
    return ids, gs, xs, ys, ss


def _setup(rng):
    ids, gs, xs, ys, ss = _dataset(rng)
    ctx = SessionContext()
    ctx.register_table(
        "t",
        pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "g": pa.array(gs),
                "x": pa.array(xs, type=pa.int64()),
                "y": pa.array(ys, type=pa.float64()),
                "s": pa.array(ss),
            }
        ),
    )
    con = sqlite3.connect(":memory:")
    con.execute("PRAGMA case_sensitive_like=ON")
    con.execute("CREATE TABLE t (id INTEGER, g TEXT, x INTEGER, y REAL, s TEXT)")
    con.executemany(
        "INSERT INTO t VALUES (?,?,?,?,?)", list(zip(ids, gs, xs, ys, ss))
    )
    return ctx, con


def _rand_pred(rng: random.Random) -> str:
    preds = [
        lambda: f"x {rng.choice(['<', '<=', '>', '>=', '=', '!='])} {rng.randint(-3, 15)}",
        lambda: f"y {rng.choice(['<', '>'])} {round(rng.uniform(-2, 2), 2)}",
        lambda: f"g = '{rng.choice(['a', 'b', 'c'])}'",
        lambda: f"s LIKE '{rng.choice(['chr%', '%1', 'chr_', '%th%'])}'",
        # ordered string compares ride the arrow fast path (NULLs -> Kleene)
        lambda: f"s {rng.choice(['<', '<=', '>', '>=', '=', '!='])} 'chr1'",
        lambda: f"'chr2' {rng.choice(['<', '>', '='])} s",
        lambda: f"s NOT LIKE '{rng.choice(['chr%', '%2'])}'",
        lambda: f"x IN ({', '.join(str(rng.randint(0, 12)) for _ in range(3))})",
        lambda: rng.choice(["x IS NULL", "x IS NOT NULL", "g IS NULL", "s IS NOT NULL"]),
        lambda: f"x BETWEEN {rng.randint(-2, 5)} AND {rng.randint(6, 15)}",
        lambda: f"abs(x) < {rng.randint(2, 10)}",
        lambda: f"length(s) = {rng.randint(0, 5)}",
    ]
    p = rng.choice(preds)()
    if rng.random() < 0.4:
        q = rng.choice(preds)()
        p = f"({p} {rng.choice(['AND', 'OR'])} {q})"
    if rng.random() < 0.25:
        p = f"NOT {p}"  # exercises Kleene NOT over UNKNOWN
    return p


def _rand_scalar_item(rng: random.Random) -> str:
    items = [
        "x + 1",
        "x * 2 - 3",
        "abs(x)",
        "coalesce(x, -99)",
        # round() is deliberately absent: sqlite rounds the DECIMAL
        # representation (round(2.65,1)=2.7) while numpy/DataFusion round
        # the binary double (2.6) — both self-consistent, not comparable
        "upper(s)",
        "lower(s)",
        "length(s)",
        "substr(s, 1, 3)",
        "nullif(g, 'a')",
        "CASE WHEN x < 5 THEN 'lo' WHEN x < 12 THEN 'mid' ELSE 'hi' END",
        "CASE g WHEN 'a' THEN 1 WHEN 'b' THEN 2 ELSE 0 END",
        # string operator/function surface shared with sqlite
        "s || '_t'",
        "g || s",
        "trim(s, 'a')",
        "ltrim(s, 'ab')",
        "rtrim(s, 'ab')",
        "replace(s, 'a', 'Z')",
        "instr(s, 'b')",
    ]
    return rng.choice(items)


def _normalize(rows):
    out = []
    for row in rows:
        norm = []
        for v in row:
            if v is None:
                norm.append(None)
            elif isinstance(v, float):
                if math.isnan(v):
                    norm.append(None)
                else:
                    norm.append(round(v, 6))
            elif isinstance(v, bool):
                norm.append(int(v))
            else:
                norm.append(v)
        out.append(tuple(norm))
    return out


def _run_both(ctx, con, sql):
    mine = [
        tuple(r.values()) for r in ctx.sql(sql).to_pylist()
    ]
    theirs = con.execute(sql).fetchall()
    assert _normalize(mine) == _normalize(theirs), sql


class TestSqliteDifferential:
    def test_select_where_order(self):
        rng = _rng(100)
        ctx, con = _setup(rng)
        for _ in range(N_QUERIES):
            item = _rand_scalar_item(rng)
            sql = (
                f"SELECT id, {item} FROM t WHERE {_rand_pred(rng)} "
                "ORDER BY id NULLS LAST"
            )
            _run_both(ctx, con, sql)

    def test_aggregates_group_by(self):
        rng = _rng(200)
        ctx, con = _setup(rng)
        for _ in range(N_QUERIES):
            aggs = rng.sample(
                ["count(*)", "count(x)", "sum(x)", "avg(y)", "min(x)",
                 "max(y)", "count(DISTINCT g)",
                 "sum(DISTINCT x)", "avg(DISTINCT x)",
                 "group_concat(x)", "group_concat(g, '-')",
                 "count(x) FILTER (WHERE g = 'a')",
                 "sum(x) FILTER (WHERE x > 2)",
                 "max(x) FILTER (WHERE g IS NOT NULL)"],
                k=3,
            )
            sql = (
                f"SELECT g, {', '.join(aggs)} FROM t WHERE {_rand_pred(rng)} "
                "GROUP BY g ORDER BY g NULLS LAST"
            )
            _run_both(ctx, con, sql)

    def test_having(self):
        rng = _rng(300)
        ctx, con = _setup(rng)
        for _ in range(N_QUERIES // 2):
            sql = (
                f"SELECT g, count(*) FROM t WHERE {_rand_pred(rng)} "
                f"GROUP BY g HAVING count(*) > {rng.randint(0, 6)} "
                "ORDER BY g NULLS LAST"
            )
            _run_both(ctx, con, sql)

    def test_limit_offset(self):
        rng = _rng(400)
        ctx, con = _setup(rng)
        for _ in range(N_QUERIES // 2):
            sql = (
                f"SELECT id, x FROM t ORDER BY id NULLS LAST "
                f"LIMIT {rng.randint(1, 20)} OFFSET {rng.randint(0, 10)}"
            )
            _run_both(ctx, con, sql)

    def test_in_and_exists_subqueries(self):
        rng = _rng(500)
        ctx, con = _setup(rng)
        for _ in range(N_QUERIES // 2):
            inner_pred = _rand_pred(rng)
            form = rng.choice(
                [
                    f"x IN (SELECT x FROM t WHERE {inner_pred})",
                    f"EXISTS (SELECT id FROM t WHERE {inner_pred})",
                    f"x > (SELECT avg(x) FROM t WHERE x IS NOT NULL)",
                ]
            )
            sql = f"SELECT id FROM t WHERE {form} ORDER BY id NULLS LAST"
            _run_both(ctx, con, sql)

    def test_window_functions(self):
        rng = _rng(600)
        ctx, con = _setup(rng)
        for _ in range(N_QUERIES // 2):
            fn = rng.choice(
                [
                    "row_number() OVER (ORDER BY id)",
                    "rank() OVER (ORDER BY x NULLS LAST, id)",
                    "dense_rank() OVER (ORDER BY g NULLS LAST, id)",
                    "sum(x) OVER (PARTITION BY g ORDER BY id)",
                    "count(*) OVER (PARTITION BY g)",
                    "lag(x) OVER (ORDER BY id)",
                    "lead(x, 2) OVER (ORDER BY id)",
                    "min(x) OVER (ORDER BY id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)",
                    "sum(x) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING)",
                    "sum(x) OVER (ORDER BY id ROWS BETWEEN 2 FOLLOWING AND 4 FOLLOWING)",
                    "sum(x) OVER (ORDER BY id RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)",
                    "sum(y) OVER (PARTITION BY g ORDER BY x RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)",
                    "count(*) OVER (ORDER BY x NULLS FIRST RANGE BETWEEN 4 PRECEDING AND CURRENT ROW)",
                    "count(*) OVER (PARTITION BY g ORDER BY id RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)",
                    "max(s) OVER (PARTITION BY g)",
                    "min(s) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)",
                    "percent_rank() OVER (PARTITION BY g ORDER BY x NULLS LAST)",
                    "cume_dist() OVER (ORDER BY x NULLS LAST)",
                    "nth_value(x, 2) OVER (PARTITION BY g ORDER BY id)",
                    "nth_value(s, 3) OVER (ORDER BY id)",
                ]
            )
            sql = f"SELECT id, {fn} FROM t ORDER BY id NULLS LAST"
            _run_both(ctx, con, sql)

    def test_group_by_alias_and_ordinals(self):
        rng = _rng(800)
        ctx, con = _setup(rng)
        for _ in range(N_QUERIES // 4):
            sql = (
                "SELECT CASE WHEN x > "
                f"{rng.randint(0, 10)} THEN 'y' ELSE 'n' END AS c, count(*) "
                "FROM t GROUP BY c ORDER BY 1 NULLS LAST"
            )
            _run_both(ctx, con, sql)
            sql2 = (
                f"SELECT g, count(x) FROM t WHERE {_rand_pred(rng)} "
                "GROUP BY 1 ORDER BY 1 NULLS LAST, 2"
            )
            _run_both(ctx, con, sql2)

    def test_case_in_aggregate(self):
        rng = _rng(700)
        ctx, con = _setup(rng)
        for _ in range(N_QUERIES // 4):
            sql = (
                "SELECT g, sum(CASE WHEN x > "
                f"{rng.randint(0, 10)} THEN 1 ELSE 0 END) FROM t "
                "GROUP BY g ORDER BY g NULLS LAST"
            )
            _run_both(ctx, con, sql)

    def test_division_and_order_nulls(self):
        rng = _rng(950)
        ctx, con = _setup(rng)
        for _ in range(N_QUERIES // 2):
            sql = rng.choice(
                [
                    f"SELECT id FROM t WHERE x / 3 = {rng.randint(-2, 5)} "
                    f"OR x % 4 = {rng.randint(0, 3)} ORDER BY id NULLS LAST",
                    f"SELECT id, x / 2, x % 3 FROM t WHERE x IS NOT NULL "
                    "ORDER BY id NULLS LAST",
                    f"SELECT id FROM t ORDER BY y "
                    f"{rng.choice(['ASC', 'DESC'])} "
                    f"{rng.choice(['NULLS FIRST', 'NULLS LAST'])}, id "
                    f"LIMIT {rng.randint(1, 30)} OFFSET {rng.randint(0, 5)}",
                ]
            )
            _run_both(ctx, con, sql)

    def test_views_match(self):
        rng = _rng(900)
        ctx, con = _setup(rng)
        vdef = f"SELECT id, g, x, y, s FROM t WHERE {_rand_pred(rng)}"
        ctx.sql(f"CREATE VIEW v AS {vdef}")
        con.execute(f"CREATE VIEW v AS {vdef}")
        for _ in range(N_QUERIES // 4):
            sql = rng.choice(
                [
                    f"SELECT id FROM v WHERE {_rand_pred(rng)} ORDER BY id NULLS LAST",
                    "SELECT g, count(*), sum(x) FROM v GROUP BY g ORDER BY g NULLS LAST",
                    "SELECT v.id FROM v JOIN t ON v.id = t.id "
                    "WHERE t.x IS NOT NULL ORDER BY v.id NULLS LAST",
                ]
            )
            _run_both(ctx, con, sql)

    def test_set_operations(self):
        """INTERSECT / EXCEPT / UNION [ALL] chains vs sqlite (single-op
        chains only: sqlite gives all compound operators equal precedence
        while this engine follows the standard's INTERSECT-binds-tighter,
        so mixed chains legitimately differ).  NULLs compare equal in set
        ops in both engines."""
        rng = _rng(1000)
        ctx, con = _setup(rng)
        for _ in range(N_QUERIES):
            op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
            cols = rng.choice(["g", "g, x", "x, s"])
            branches = [
                f"SELECT {cols} FROM t WHERE {_rand_pred(rng)}"
                for _ in range(rng.choice([2, 2, 3]))
            ]
            ncols = cols.count(",") + 1
            order = ", ".join(f"{i + 1} NULLS LAST" for i in range(ncols))
            sql = f" {op} ".join(branches) + f" ORDER BY {order}"
            _run_both(ctx, con, sql)

    def test_derived_tables_and_ctes(self):
        """FROM (SELECT ...) and WITH ... AS chains vs sqlite."""
        rng = _rng(1100)
        ctx, con = _setup(rng)

        def outer(rng):
            # the derived projections expose only (id, x): outer
            # predicates must not reference the other base columns
            return rng.choice([
                f"x {rng.choice(['<', '<=', '>', '>='])} {rng.randint(-3, 15)}",
                f"id % {rng.randint(2, 5)} = 0",
                "x IS NOT NULL",
                f"x BETWEEN {rng.randint(-2, 5)} AND {rng.randint(6, 15)}",
            ])

        for _ in range(N_QUERIES):
            inner_pred = _rand_pred(rng)
            outer_pred = outer(rng)
            shape = rng.randrange(4)
            if shape == 0:
                sql = (
                    f"SELECT id, x FROM (SELECT id, x FROM t WHERE {inner_pred}) s "
                    f"WHERE {outer_pred} ORDER BY id NULLS LAST"
                )
            elif shape == 1:
                sql = (
                    f"WITH w AS (SELECT id, g, x FROM t WHERE {inner_pred}) "
                    f"SELECT id, x FROM w WHERE {outer_pred} ORDER BY id NULLS LAST"
                )
            elif shape == 2:
                sql = (
                    f"WITH w AS (SELECT id, x FROM t WHERE {inner_pred}), "
                    "w2 AS (SELECT id, x + 1 AS x1 FROM w) "
                    "SELECT id, x1 FROM w2 ORDER BY id NULLS LAST"
                )
            else:
                sql = (
                    "SELECT g, count(*), sum(x) FROM "
                    f"(SELECT g, x FROM t WHERE {inner_pred}) s "
                    "GROUP BY g ORDER BY g NULLS LAST"
                )
            _run_both(ctx, con, sql)

    def test_join_using_and_values(self):
        """JOIN ... USING and VALUES table expressions vs sqlite (both
        dedup the USING column in * expansion)."""
        rng = _rng(1200)
        ctx, con = _setup(rng)
        # a second table sharing column names x (join key) and g
        ids2 = list(range(0, N_ROWS, 2))
        xs2 = [rng.choice([None, *range(-2, 12)]) for _ in ids2]
        hs2 = [rng.choice(["p", "q", None]) for _ in ids2]
        import pyarrow as _pa

        ctx.register_table("t2", _pa.table({
            "id2": _pa.array(ids2, type=_pa.int64()),
            "x": _pa.array(xs2, type=_pa.int64()),
            "h": _pa.array(hs2),
        }))
        con.execute("CREATE TABLE t2 (id2 INTEGER, x INTEGER, h TEXT)")
        con.executemany("INSERT INTO t2 VALUES (?,?,?)", list(zip(ids2, xs2, hs2)))
        for _ in range(N_QUERIES):
            shape = rng.randrange(3)
            if shape == 0:
                jt = rng.choice(["JOIN", "LEFT JOIN"])
                sql = (
                    f"SELECT id, x, h FROM t {jt} t2 USING (x) "
                    f"WHERE {_rand_pred(rng)} "
                    "ORDER BY id NULLS LAST, h NULLS LAST"
                )
            elif shape == 1:
                # sqlite has no alias column lists (AS v(n, s)); both
                # engines name VALUES columns column1.. so alias inside
                vals = ", ".join(
                    f"({rng.randint(-2, 12)}, '{rng.choice('abc')}')"
                    for _ in range(3)
                )
                sql = (
                    f"SELECT column1, column2 FROM (VALUES {vals}) v "
                    "ORDER BY column1, column2"
                )
            else:
                vals = ", ".join(f"({rng.randint(-2, 12)})" for _ in range(4))
                sql = (
                    "SELECT t.id FROM t JOIN "
                    f"(SELECT column1 AS n FROM (VALUES {vals}) w) v "
                    "ON t.x = v.n ORDER BY t.id NULLS LAST"
                )
            _run_both(ctx, con, sql)


class TestRecursiveCte:
    """WITH RECURSIVE verified against sqlite3 (same iteration-to-
    fixpoint semantics as Postgres/DataFusion)."""

    QUERIES = [
        "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM r"
        " WHERE n < 50) SELECT n FROM r ORDER BY n",
        "WITH RECURSIVE f(a, b) AS (SELECT 0, 1 UNION ALL SELECT b, a+b"
        " FROM f WHERE b < 1000) SELECT a, b FROM f ORDER BY a",
        # UNION (distinct) termination on a cyclic graph
        "WITH RECURSIVE reach(node) AS (SELECT 1 UNION SELECT g.dst"
        " FROM g JOIN reach ON g.src = reach.node)"
        " SELECT node FROM reach ORDER BY node",
        # aggregate over the fixpoint + a non-recursive sibling CTE
        "WITH RECURSIVE base(v) AS (SELECT 5),"
        " r(n) AS (SELECT v FROM base UNION ALL SELECT n*2 FROM r"
        " WHERE n < 100) SELECT count(*), sum(n), max(n) FROM r",
        # string accumulation
        "WITH RECURSIVE s(x, p) AS (SELECT 'a', 1 UNION ALL"
        " SELECT x || 'b', p + 1 FROM s WHERE p < 4)"
        " SELECT x FROM s ORDER BY p",
    ]

    def test_recursive_vs_sqlite(self):
        ctx = SessionContext()
        con = sqlite3.connect(":memory:")
        ctx.register_table(
            "g", pa.table({"src": [1, 2, 3, 1], "dst": [2, 3, 1, 3]})
        )
        con.execute("CREATE TABLE g (src INTEGER, dst INTEGER)")
        con.executemany(
            "INSERT INTO g VALUES (?, ?)",
            [(1, 2), (2, 3), (3, 1), (1, 3)],
        )
        for sql in self.QUERIES:
            _run_both(ctx, con, sql)


MATH_ITEMS = [
    # domain-guarded so numpy (±inf) and sqlite (NULL on domain error)
    # can't diverge; the harness already maps NaN -> NULL
    "sin(x)", "cos(x)", "tan(y)", "atan(x)",
    "sinh(y)", "cosh(y)", "tanh(x)",
    "asin(1.0 / (abs(x) + 2))", "acos(1.0 / (abs(x) + 2))",
    "asinh(x)", "acosh(abs(x) + 1)", "atanh(1.0 / (abs(x) + 2))",
    "atan2(y, x)", "exp(x / 10.0)",
    "ln(abs(x) + 1)", "log10(abs(x) + 1)", "log2(abs(x) + 1)",
    "log(2, abs(x) + 1)", "log(abs(x) + 1)",
    "sqrt(abs(x))", "pow(2, x)", "power(abs(y), 2)",
    "floor(y)", "ceil(y)", "ceiling(y)", "sign(x)",
    "degrees(y)", "radians(x)", "trunc(y)", "pi()",
    "mod(x, 7)",
]


class TestSqliteMathFuncs:
    def test_math_function_pack(self):
        """sqlite >= 3.35 ships the same C math library semantics
        DataFusion uses; every guarded expression must agree."""
        rng = _rng(4200)
        ctx, con = _setup(rng)
        for item in MATH_ITEMS:
            sql = f"SELECT id, {item} FROM t ORDER BY id NULLS LAST"
            _run_both(ctx, con, sql)

    def test_math_in_predicates(self):
        rng = _rng(4300)
        ctx, con = _setup(rng)
        for _ in range(N_QUERIES // 2):
            item = rng.choice(MATH_ITEMS)
            sql = (
                f"SELECT id, {item} FROM t "
                f"WHERE {_rand_pred(rng)} ORDER BY id NULLS LAST"
            )
            _run_both(ctx, con, sql)


class TestSqliteNewSurface:
    """Differential coverage of the round-2 surface additions that
    sqlite shares: named WINDOW clauses, NATURAL/USING joins, ORDER BY
    aggregates outside the SELECT list, LIMIT constant expressions."""

    def test_named_window_clause(self):
        rng = _rng(900)
        ctx, con = _setup(rng)
        specs = [
            "(PARTITION BY g ORDER BY id)",
            "(ORDER BY x NULLS LAST, id)",
            "(PARTITION BY g)",
            "(ORDER BY id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
        ]
        fns = ["sum(x)", "count(*)", "row_number()", "min(x)", "max(y)"]
        for _ in range(N_QUERIES // 2):
            spec = rng.choice(specs)
            f1, f2 = rng.sample(fns, k=2)
            if "ORDER BY" not in spec and "row_number" in f1 + f2:
                continue  # row_number over unordered window: order differs
            sql = (
                f"SELECT id, {f1} OVER w, {f2} OVER w FROM t"
                f" WINDOW w AS {spec} ORDER BY id NULLS LAST"
            )
            _run_both(ctx, con, sql)

    def test_natural_and_using_joins(self):
        rng = _rng(1000)
        ctx, con = _setup(rng)
        # second table sharing (g) plus its own column
        rows = [
            (g, rng.randint(0, 20))
            for g in ["a", "b", "c", "a", "b"]
        ]
        import pyarrow as _pa

        ctx.register_table(
            "u",
            _pa.table(
                {
                    "g": _pa.array([r[0] for r in rows]),
                    "w": _pa.array([r[1] for r in rows], type=_pa.int64()),
                }
            ),
        )
        con.execute("CREATE TABLE u (g TEXT, w INTEGER)")
        con.executemany("INSERT INTO u VALUES (?,?)", rows)
        for _ in range(N_QUERIES // 2):
            form = rng.choice(
                [
                    "SELECT t.id, u.w FROM t NATURAL JOIN u",
                    "SELECT t.id, u.w FROM t JOIN u USING (g)",
                    "SELECT t.id, u.w FROM t NATURAL LEFT JOIN u",
                    "SELECT t.id, u.w FROM t LEFT JOIN u USING (g)",
                ]
            )
            sql = (
                f"{form} WHERE {_rand_pred(rng)}"
                " ORDER BY t.id NULLS LAST, u.w NULLS LAST"
            )
            _run_both(ctx, con, sql)

    def test_order_by_hidden_aggregates(self):
        rng = _rng(1100)
        ctx, con = _setup(rng)
        for _ in range(N_QUERIES // 2):
            agg = rng.choice(
                ["count(*)", "sum(x)", "count(x)", "min(x)", "max(x)"]
            )
            sql = (
                f"SELECT g FROM t WHERE {_rand_pred(rng)} GROUP BY g"
                f" ORDER BY {agg} DESC NULLS LAST, g NULLS LAST"
            )
            _run_both(ctx, con, sql)

    def test_limit_expressions(self):
        rng = _rng(1200)
        ctx, con = _setup(rng)
        for _ in range(N_QUERIES // 4):
            a, b = rng.randint(1, 5), rng.randint(0, 4)
            sql = (
                f"SELECT id FROM t ORDER BY id NULLS LAST"
                f" LIMIT {a}+{b} OFFSET {b}*2"
            )
            _run_both(ctx, con, sql)


class TestSqliteInequalityJoins:
    """Equi-join + inequality side-condition (ON a.g = b.g AND
    a.id < b.id) — the join-filter path under random predicates."""

    def test_inequality_join_filters(self):
        import re as _re

        rng = _rng(1300)
        ctx, con = _setup(rng)

        def qualify(pred):
            return _re.sub(r"\b([xgys])\b", r"a.\1", pred)

        for _ in range(N_QUERIES // 2):
            op = rng.choice(["<", "<=", ">", ">=", "!="])
            sql = (
                f"SELECT a.id AS ai, b.id AS bi FROM t a JOIN t b"
                f" ON a.g = b.g AND a.id {op} b.id"
                f" WHERE {qualify(_rand_pred(rng))}"
                " ORDER BY 1 NULLS LAST, 2 NULLS LAST LIMIT 300"
            )
            _run_both(ctx, con, sql)
