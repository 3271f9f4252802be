"""Range-predicate parser matrix — mirror of the reference's inline tests
(reference intervals.rs:234-538): all 8 non-strict orderings, all 8 strict
orderings, mixed forms, and rejections (OR, complex sub-expressions,
duplicate bounds).  Like the reference, the exprs are produced by planning
real SQL and digging the join filter out of the physical plan."""

import pytest

from sequila_tpu.errors import PlanError
from sequila_tpu.exec.joins.hash_join import HashJoinExec
from sequila_tpu.exec.joins.interval_join import IntervalJoinExec
from sequila_tpu.exec.joins.nl_join import NestedLoopJoinExec
from sequila_tpu.planner.intervals import parse, try_parse
from sequila_tpu.session import SessionContext


@pytest.fixture
def ctx():
    c = SessionContext()
    c.sql("CREATE TABLE t1 (contig TEXT, start INTEGER, end INTEGER) AS VALUES ('a', 1, 2)")
    c.sql("CREATE TABLE t2 (contig TEXT, start INTEGER, end INTEGER) AS VALUES ('a', 1, 2)")
    return c


def join_filter_of(ctx, condition):
    """Plan `SELECT * FROM t1 JOIN t2 ON contig AND <condition>` with the
    interval rewrite disabled and return the HashJoin filter."""
    ctx.sql("SET sequila.prefer_interval_join = false")
    plan = ctx.plan_sql(
        f"SELECT * FROM t1 JOIN t2 ON t1.contig = t2.contig AND {condition}"
    )
    joins = []

    def visit(node):
        if isinstance(node, (HashJoinExec, NestedLoopJoinExec)):
            joins.append(node)
        return node

    plan.transform_up(visit)
    assert joins, "no join in plan"
    return joins[0].filter


def intervals_of(ctx, condition):
    return parse(join_filter_of(ctx, condition))


def bounds_display(iv):
    return (
        iv.left_interval.start.display(),
        iv.left_interval.end.display(),
        iv.right_interval.start.display(),
        iv.right_interval.end.display(),
    )


# The 8 legal non-strict orderings (intervals.rs:258-358):
NON_STRICT = [
    "t2.end >= t1.start AND t1.end >= t2.start",
    "t2.end >= t1.start AND t2.start <= t1.end",
    "t1.start <= t2.end AND t1.end >= t2.start",
    "t1.start <= t2.end AND t2.start <= t1.end",
    "t1.end >= t2.start AND t2.end >= t1.start",
    "t1.end >= t2.start AND t1.start <= t2.end",
    "t2.start <= t1.end AND t2.end >= t1.start",
    "t2.start <= t1.end AND t1.start <= t2.end",
]


@pytest.mark.parametrize("cond", NON_STRICT)
def test_non_strict_orderings(ctx, cond):
    iv = intervals_of(ctx, cond)
    assert iv is not None
    ls, le, rs, re = bounds_display(iv)
    # bounds are rewritten back to SOURCE schema indices (contig,start,end)
    assert ls == "start@1"
    assert le == "end@2"
    assert rs == "start@1"
    assert re == "end@2"


# The 8 strict orderings: END expressions get `- 1` (intervals.rs:360-505)
STRICT = [
    "t2.end > t1.start AND t1.end > t2.start",
    "t2.end > t1.start AND t2.start < t1.end",
    "t1.start < t2.end AND t1.end > t2.start",
    "t1.start < t2.end AND t2.start < t1.end",
    "t1.end > t2.start AND t2.end > t1.start",
    "t1.end > t2.start AND t1.start < t2.end",
    "t2.start < t1.end AND t2.end > t1.start",
    "t2.start < t1.end AND t1.start < t2.end",
]


@pytest.mark.parametrize("cond", STRICT)
def test_strict_orderings_minus_one(ctx, cond):
    iv = intervals_of(ctx, cond)
    assert iv is not None
    ls, le, rs, re = bounds_display(iv)
    assert ls == "start@1"
    assert le == "end@2 - 1"
    assert rs == "start@1"
    assert re == "end@2 - 1"


def test_mixed_strict_non_strict(ctx):
    iv = intervals_of(ctx, "t1.start <= t2.end AND t1.end > t2.start")
    ls, le, rs, re = bounds_display(iv)
    assert le == "end@2 - 1"
    assert re == "end@2"


def test_or_is_rejected(ctx):
    iv = intervals_of(ctx, "t1.start <= t2.end OR t1.end >= t2.start")
    assert iv is None


def test_equality_conjunct_rejected(ctx):
    # `=` inside the range condition is not an interval predicate
    iv = intervals_of(ctx, "t1.start = t2.end AND t1.end >= t2.start")
    assert iv is None


def test_same_side_comparison_rejected(ctx):
    iv = intervals_of(ctx, "t1.start <= t1.end AND t1.end >= t2.start")
    assert iv is None


def test_duplicate_bound_raises(ctx):
    # both conjuncts set (ls, re): the reference panics ("must not be
    # called twice"); here it raises PlanError.
    with pytest.raises(PlanError):
        try_parse(join_filter_of(ctx, "t1.start <= t2.end AND t1.start <= t2.end"))


def test_complex_sub_expression_raises(ctx):
    # two columns inside one comparison operand -> reference panics
    # ("complex sub queries are not supported"), here PlanError
    # (intervals.rs:507-512).
    with pytest.raises(PlanError):
        try_parse(
            join_filter_of(
                ctx, "t1.start + t1.end <= t2.end AND t1.end >= t2.start"
            )
        )


def test_single_column_arithmetic_accepted(ctx):
    # one column per operand may be wrapped in arithmetic
    iv = intervals_of(ctx, "t1.start - 1 <= t2.end AND t1.end + 1 >= t2.start")
    assert iv is not None
    ls, le, _, _ = bounds_display(iv)
    assert ls == "start@1 - 1"
    assert le == "end@2 + 1"


def test_plan_rewrite_explain(ctx):
    """CLI-crate plan-rewrite assertions (reference
    sequila-cli/src/main.rs:64-109): equi+range, range-only, mixed strict."""
    ctx.sql("SET sequila.prefer_interval_join = true")
    for cond, on in [
        ("t1.contig = t2.contig AND t1.start <= t2.end AND t1.end >= t2.start",
         "on=[(contig@0, contig@0)]"),
        ("t1.start <= t2.end AND t1.end >= t2.start", "on=[(1, 1)]"),
        ("t1.contig = t2.contig AND t1.start < t2.end AND t1.end >= t2.start",
         "on=[(contig@0, contig@0)]"),
    ]:
        out = ctx.sql(f"EXPLAIN SELECT * FROM t1 JOIN t2 ON {cond}")
        text = out.column_np("plan")[0]
        assert "IntervalJoinExec:" in text, text
        assert on in text, text


def test_prefer_interval_join_off(ctx):
    ctx.sql("SET sequila.prefer_interval_join = false")
    out = ctx.sql(
        "EXPLAIN SELECT * FROM t1 JOIN t2 ON t1.contig = t2.contig"
        " AND t1.start <= t2.end AND t1.end >= t2.start"
    )
    text = out.column_np("plan")[0]
    assert "HashJoinExec" in text and "IntervalJoinExec" not in text


def test_predicate_pushdown_below_join(ctx):
    """Single-side WHERE conjuncts are pushed below the join (DataFusion
    behavior the reference relies on for chromosome-subset queries)."""
    ctx.sql("SET sequila.prefer_interval_join = true")
    q = (
        "SELECT * FROM t1 JOIN t2 ON t1.contig = t2.contig"
        " AND t1.start <= t2.end AND t1.end >= t2.start"
        " WHERE t1.contig = 'a' AND t2.end >= 2"
    )
    text = ctx.sql(f"EXPLAIN {q}").column_np("plan")[0]
    lines = text.splitlines()
    join_depth = next(i for i, l in enumerate(lines) if "IntervalJoinExec" in l)
    # both FilterExecs must appear BELOW the join
    below = "\n".join(lines[join_depth + 1:])
    assert "FilterExec: contig@0 = a" in below
    assert "FilterExec: end@2 >= 2" in below
    # and results are correct
    assert ctx.sql(q).num_rows == ctx.sql(
        "SELECT * FROM t1 JOIN t2 ON t1.contig = t2.contig"
        " AND t1.start <= t2.end AND t1.end >= t2.start"
    ).num_rows  # fixture rows all satisfy the pushed filters
