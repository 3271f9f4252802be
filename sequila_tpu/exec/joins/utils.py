"""Shared join plumbing: pair gathering, filter evaluation, display.

Analog of the reference's joins/utils.rs (metrics, output assembly); the
output of every join is take(left, left_idx) ++ take(right, right_idx)
exactly as the reference's emit paths (interval_join.rs:1338-1420).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sequila_tpu.models.table import Table
from sequila_tpu.planner.expr import LEFT, JoinFilter

JOIN_TYPE_DISPLAY = {
    "inner": "Inner",
    "left": "Left",
    "right": "Right",
    "full": "Full",
    "rightsemi": "RightSemi",
    "rightanti": "RightAnti",
}


def gather_join_output(
    left: Table,
    right: Table,
    left_idx: np.ndarray,
    right_idx: np.ndarray,
    left_null: np.ndarray | None = None,
    right_null: np.ndarray | None = None,
) -> Table:
    lt = left.take(left_idx, left_null)
    rt = right.take(right_idx, right_null)
    arrays = list(lt.arrow.columns) + list(rt.arrow.columns)
    names = lt.column_names + rt.column_names
    return Table(pa.Table.from_arrays(arrays, names=names))


def eval_join_filter(
    filter_: JoinFilter,
    left: Table,
    right: Table,
    left_idx: np.ndarray,
    right_idx: np.ndarray,
) -> np.ndarray:
    """Evaluate a join filter over candidate pairs -> bool mask."""
    cols = []
    for ci in filter_.column_indices:
        if ci.side == LEFT:
            cols.append(left.column_np(ci.index)[left_idx])
        else:
            cols.append(right.column_np(ci.index)[right_idx])
    return np.asarray(
        filter_.expression.eval(cols, len(left_idx)), dtype=bool
    )


def display_on(on_pairs) -> str:
    """`on=[(contig@0, contig@0)]` display, `(1, 1)` for the NLJ-synthesized
    literal pair (reference sequila_physical_planner.rs:127-148)."""
    parts = [f"({l.display()}, {r.display()})" for l, r in on_pairs]
    return "on=[" + ", ".join(parts) + "]"
