"""Differential fuzzing: random tables and query shapes, interval join vs
the hash/NLJ baseline — the reference's oracle pattern pushed to
adversarial inputs (nulls, negative coordinates, zero-length and inverted
intervals, strict/non-strict mixes, all algorithms, all join types)."""

import numpy as np
import pytest

from sequila_tpu import Algorithm
from sequila_tpu.session import SessionContext

ORDERINGS = [
    "a.s <= b.e AND a.e >= b.s",
    "b.e >= a.s AND a.e >= b.s",
    "a.s < b.e AND a.e > b.s",
    "a.e > b.s AND a.s <= b.e",
    "b.s <= a.e AND b.e >= a.s",
]

ALGOS = [
    Algorithm.COITREES,
    Algorithm.INTERVAL_TREE,
    Algorithm.LAPPER,
    Algorithm.SUPER_INTERVALS,
]


def random_table_sql(rng, name, n, with_nulls, coord_lo, coord_hi, max_len):
    rows = []
    contigs = ["chr1", "chr2", "chr3", "chrX"]
    for _ in range(n):
        if with_nulls and rng.random() < 0.05:
            c = "NULL"
        else:
            c = f"'{contigs[rng.integers(0, len(contigs))]}'"
        s = int(rng.integers(coord_lo, coord_hi))
        ln = int(rng.integers(-2, max_len))  # occasional inverted intervals
        rows.append(f"({c}, {s}, {s + ln})")
    return (
        f"CREATE TABLE {name} (contig TEXT, s INTEGER, e INTEGER) AS VALUES "
        + ", ".join(rows)
    )


def rows_of(t):
    cols = [t.column_np(i).tolist() for i in range(len(t.column_names))]

    def norm(v):
        if v is None or (isinstance(v, float) and v != v):
            return None
        if isinstance(v, float) and v == int(v):
            return int(v)
        return v

    return sorted(
        (tuple(norm(v) for v in r) for r in zip(*cols)),
        key=lambda r: tuple((x is None, str(x)) for x in r),
    )


@pytest.mark.parametrize("trial", range(12))
def test_differential_interval_vs_hash(trial, monkeypatch):
    rng = np.random.default_rng(1000 + trial)
    ctx = SessionContext()
    coord_lo = -500 if trial % 3 == 0 else 0
    ctx.sql(
        random_table_sql(
            rng, "a", int(rng.integers(5, 60)), trial % 2 == 0, coord_lo, 1000, 80
        )
    )
    ctx.sql(
        random_table_sql(
            rng, "b", int(rng.integers(5, 60)), trial % 2 == 0, coord_lo, 1000, 80
        )
    )
    cond = ORDERINGS[trial % len(ORDERINGS)]
    equi = "a.contig = b.contig AND " if trial % 4 != 3 else ""
    jt = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"][trial % 4]
    q = f"SELECT * FROM a {jt} b ON {equi}{cond}"

    # host-path + device-path for each algorithm must equal the baseline
    ctx.sql("SET sequila.prefer_interval_join = false")
    baseline = rows_of(ctx.sql(q))

    alg = ALGOS[trial % len(ALGOS)]
    ctx.sql("SET sequila.prefer_interval_join = true")
    ctx.sql(f"SET sequila.interval_join_algorithm = {alg.value}")
    for threshold in ("65536", "0"):
        monkeypatch.setenv("SEQUILA_HOST_THRESHOLD", threshold)
        got = rows_of(ctx.sql(q))
        assert got == baseline, (
            f"trial={trial} alg={alg} jt={jt} threshold={threshold} cond={cond}"
        )

    # count(*) fast path agrees too (inner joins only)
    if jt == "JOIN":
        qc = f"SELECT count(1) FROM a JOIN b ON {equi}{cond}"
        monkeypatch.setenv("SEQUILA_HOST_THRESHOLD", "0")
        assert int(ctx.sql(qc).column_np(0)[0]) == len(baseline)
        monkeypatch.setenv("SEQUILA_HOST_THRESHOLD", "65536")
        assert int(ctx.sql(qc).column_np(0)[0]) == len(baseline)


class TestParserRobustness:
    """Garbage and truncated SQL must raise PlanError (or parse), never
    crash with an internal exception — the REPL feeds user input here."""

    def test_truncations_of_valid_queries(self):
        import pyarrow as pa
        from sequila_tpu.errors import ExecutionError, PlanError
        from sequila_tpu.session import SessionContext

        c = SessionContext()
        c.register_table("t", pa.table({"g": ["a"], "x": [1]}))
        queries = [
            "SELECT x, row_number() OVER (PARTITION BY g ORDER BY x DESC NULLS FIRST) FROM t",
            "SELECT CASE WHEN x IN (1, 2) THEN upper(g) ELSE 'z' END FROM t WHERE g LIKE 'a%'",
            "SELECT count(*) FROM t WHERE EXISTS (SELECT 1 FROM t WHERE x > 0) GROUP BY g HAVING count(*) > 0",
            "SELECT sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t ORDER BY 1 LIMIT 5 OFFSET 1",
            "SELECT g FROM t WHERE x IS NOT DISTINCT FROM 1 AND x NOT IN (SELECT x FROM t)",
            # round-2 surface: table functions, WINDOW clause, DISTINCT ON,
            # GROUP BY ALL, NATURAL JOIN, PREPARE, SIMILAR TO, star EXCLUDE
            "SELECT sum(value) FROM generate_series(1, 10) g WHERE value > 2",
            "SELECT x, sum(x) OVER w FROM t WINDOW w AS (PARTITION BY g ORDER BY x)",
            "SELECT DISTINCT ON (g) g, x FROM t ORDER BY g, x DESC",
            "SELECT g, count(*) FROM t GROUP BY ALL ORDER BY count(*) DESC",
            "SELECT * EXCLUDE (x) FROM t NATURAL LEFT JOIN t",
            "PREPARE q1 (INT) AS SELECT * FROM t WHERE x > $1",
            "SELECT g FROM t WHERE g SIMILAR TO '(a|b)%' ORDER BY ALL",
            "SELECT array_sort(array_agg(x ORDER BY x DESC), 'DESC') FROM t",
            "SELECT map_extract(map(['k'], [x]), 'k') FROM t",
            "CREATE TABLE IF NOT EXISTS e2 (a INTEGER NOT NULL, b TEXT)",
        ]
        for q in queries:
            for cut in range(1, len(q)):
                try:
                    c.sql(q[:cut])
                except (PlanError, ExecutionError):
                    pass
                # anything else crashes the test

    def test_token_soup(self):
        import random

        import pyarrow as pa

        from sequila_tpu.errors import ExecutionError, PlanError
        from sequila_tpu.session import SessionContext

        c = SessionContext()
        c.register_table("t", pa.table({"g": ["a"], "x": [1]}))
        rng = random.Random(9)
        tokens = [
            "SELECT", "FROM", "WHERE", "t", "g", "x", "(", ")", ",", "*",
            "OVER", "CASE", "WHEN", "END", "IN", "NOT", "LIKE", "NULLS",
            "ORDER", "BY", "GROUP", "1", "'a'", "=", "<", "AND", "OR",
            "EXISTS", "ROWS", "BETWEEN", "CAST", "AS", "INT", "VIEW",
            # round-2 syntax tokens
            "WINDOW", "NATURAL", "DISTINCT", "ON", "ALL", "EXCLUDE",
            "PREPARE", "EXECUTE", "SIMILAR", "TO", "[", "]", "$1",
            "generate_series", "map", "IF", "TABLE",
        ]
        for _ in range(400):
            q = " ".join(rng.choices(tokens, k=rng.randint(1, 14)))
            try:
                c.sql(q)
            except (PlanError, ExecutionError, KeyError):
                pass
