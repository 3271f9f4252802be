"""Physical expressions: vectorized evaluation over host columnar batches.

Analog of DataFusion's PhysicalExpr tree as used by the reference's filter
parsing and evaluation (reference intervals.rs, interval_join.rs
evaluate_as_i32).  Expressions evaluate column-at-a-time over a Table (or a
plain list of numpy columns) and display themselves in DataFusion's
``name@index`` notation so EXPLAIN output is comparable with the
reference's plan assertions.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from sequila_tpu.errors import ExecutionError, PlanError


class PhysicalExpr:
    def eval(self, cols: list[np.ndarray], num_rows: int) -> np.ndarray:
        raise NotImplementedError

    def columns(self) -> list["Column"]:
        """All Column nodes in this subtree (pre-order)."""
        return []

    def display(self) -> str:
        raise NotImplementedError

    def transform(self, fn) -> "PhysicalExpr":
        """Bottom-up rewrite; fn(node) returns a replacement node."""
        return fn(self)


@dataclasses.dataclass(frozen=True)
class Column(PhysicalExpr):
    name: str
    index: int

    def eval(self, cols, num_rows):
        return np.asarray(cols[self.index])

    def columns(self):
        return [self]

    def display(self):
        return f"{self.name}@{self.index}"


@dataclasses.dataclass(frozen=True)
class Literal(PhysicalExpr):
    value: Any

    def eval(self, cols, num_rows):
        if self.value is None:
            return np.full(num_rows, None, dtype=object)
        return np.full(num_rows, self.value)

    def display(self):
        if isinstance(self.value, str):
            return self.value
        if isinstance(self.value, bool):
            return "true" if self.value else "false"
        return str(self.value)


_OP_FUNCS = {
    "+": np.add,
    "-": np.subtract,
    "*": np.multiply,
    "/": None,  # integer vs float division resolved at eval
    "%": np.mod,
    "=": np.equal,
    "!=": np.not_equal,
    "<": np.less,
    "<=": np.less_equal,
    ">": np.greater,
    ">=": np.greater_equal,
}


@dataclasses.dataclass(frozen=True)
class BinaryExpr(PhysicalExpr):
    left: PhysicalExpr
    op: str
    right: PhysicalExpr

    def eval(self, cols, num_rows):
        l = self.left.eval(cols, num_rows)
        r = self.right.eval(cols, num_rows)
        op = self.op
        if op == "AND":
            return np.logical_and(l.astype(bool), r.astype(bool))
        if op == "OR":
            return np.logical_or(l.astype(bool), r.astype(bool))
        if op == "/":
            if np.issubdtype(np.asarray(l).dtype, np.integer) and np.issubdtype(
                np.asarray(r).dtype, np.integer
            ):
                return l // r
            return l / r
        fn = _OP_FUNCS.get(op)
        if fn is None:
            raise ExecutionError(f"unsupported operator {op}")
        return fn(l, r)

    def columns(self):
        return self.left.columns() + self.right.columns()

    def display(self):
        return f"{self.left.display()} {self.op} {self.right.display()}"

    def transform(self, fn):
        return fn(
            BinaryExpr(self.left.transform(fn), self.op, self.right.transform(fn))
        )


@dataclasses.dataclass(frozen=True)
class NotExpr(PhysicalExpr):
    child: PhysicalExpr

    def eval(self, cols, num_rows):
        return np.logical_not(self.child.eval(cols, num_rows).astype(bool))

    def columns(self):
        return self.child.columns()

    def display(self):
        return f"NOT {self.child.display()}"

    def transform(self, fn):
        return fn(NotExpr(self.child.transform(fn)))


@dataclasses.dataclass(frozen=True)
class NegExpr(PhysicalExpr):
    child: PhysicalExpr

    def eval(self, cols, num_rows):
        return -self.child.eval(cols, num_rows)

    def columns(self):
        return self.child.columns()

    def display(self):
        return f"(- {self.child.display()})"

    def transform(self, fn):
        return fn(NegExpr(self.child.transform(fn)))


# ---------------------------------------------------------------------------
# Join filters
# ---------------------------------------------------------------------------

LEFT, RIGHT = "left", "right"


@dataclasses.dataclass(frozen=True)
class ColumnIndex:
    """Maps a filter-schema column back to (side, source column index).

    Same role as DataFusion's ColumnIndex used by the reference's
    map_column_to_source_schema (intervals.rs:39-65).
    """

    index: int
    side: str  # LEFT | RIGHT


@dataclasses.dataclass(frozen=True)
class JoinFilter:
    """A join filter expression over a compact filter schema."""

    expression: PhysicalExpr
    column_indices: tuple[ColumnIndex, ...]

    def display(self) -> str:
        return self.expression.display()


def map_column_to_source_schema(
    expr: PhysicalExpr, indices: tuple[ColumnIndex, ...]
) -> tuple[PhysicalExpr, str]:
    """Rewrite filter-schema column indices to source-schema indices.

    Enforces the reference's 'exactly one column per sub-expression' rule
    (intervals.rs:39-65): two columns in one comparison operand is an error
    (the reference panics; we raise PlanError).
    """
    sides: list[str] = []

    def rewrite(node):
        if isinstance(node, Column):
            ci = indices[node.index]
            if sides:
                raise PlanError(f"complex sub queries are not supported: {expr.display()}")
            sides.append(ci.side)
            return Column(node.name, ci.index)
        return node

    new = expr.transform(rewrite)
    if not sides:
        raise PlanError(f"no column found in sub expression: {expr.display()}")
    return new, sides[0]
