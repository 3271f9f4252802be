"""Physical optimizer rules.

1. IntervalJoinRule — the engine's defining rewrite, mirroring the
   reference's IntervalJoinPhysicalOptimizationRule (reference
   sequila_physical_planner.rs:24-148): walk the plan bottom-up and replace
   every HashJoinExec / NestedLoopJoinExec whose filter parses as a
   2-conjunct range-overlap predicate with an IntervalJoinExec.  Honors the
   `sequila.prefer_interval_join` off-switch; algorithm and low-memory mode
   come from the session config at optimize time.  The NLJ rewrite
   synthesizes `on = [(1, 1)]` — one global key segment — exactly like the
   reference (:127-148).

2. CountFastPathRule — TPU-specific: `count(*)` over an inner interval
   join needs no pair materialization (the BITS count is exact), so
   Aggregate(count, no group-by) directly over IntervalJoinExec becomes an
   IntervalCountExec.  This is the whole databio benchmark query shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sequila_tpu.config import SequilaConfig
from sequila_tpu.exec.joins.hash_join import HashJoinExec
from sequila_tpu.exec.joins.interval_join import IntervalJoinExec
from sequila_tpu.exec.joins.nl_join import NestedLoopJoinExec
from sequila_tpu.exec.plan import AggregateExec, ExecPlan
from sequila_tpu.models.table import Table
from sequila_tpu.planner.expr import Literal
from sequila_tpu.planner.intervals import parse
from sequila_tpu.utils.logging import get_logger

log = get_logger(__name__)


class IntervalJoinRule:
    def __init__(self, config: SequilaConfig):
        self.config = config

    def optimize(self, plan: ExecPlan) -> ExecPlan:
        if not self.config.prefer_interval_join:
            log.debug("prefer_interval_join=false; skipping rewrite")
            return plan
        return plan.transform_up(self._rewrite)

    def _rewrite(self, node: ExecPlan) -> ExecPlan:
        cfg = self.config
        if isinstance(node, HashJoinExec):
            intervals = parse(node.filter)
            if intervals is not None:
                log.debug("rewriting HashJoinExec -> IntervalJoinExec")
                return IntervalJoinExec(
                    node.children[0], node.children[1], node.on, node.filter,
                    intervals, node.join_type,
                    cfg.interval_join_algorithm, cfg.interval_join_low_memory,
                    mode=node.mode,
                )
        elif isinstance(node, NestedLoopJoinExec):
            intervals = parse(node.filter)
            if intervals is not None:
                log.debug("rewriting NestedLoopJoinExec -> IntervalJoinExec")
                on = [(Literal(1), Literal(1))]
                return IntervalJoinExec(
                    node.children[0], node.children[1], on, node.filter,
                    intervals, node.join_type,
                    cfg.interval_join_algorithm, cfg.interval_join_low_memory,
                    mode="CollectLeft",
                )
        return node


class IntervalCountExec(ExecPlan):
    """count(*) over an interval join via the count-only kernel."""

    def __init__(self, join: IntervalJoinExec, out_name: str):
        self.children = [join]
        self.out_name = out_name

    def schema(self):
        return [(None, self.out_name)]

    def execute(self, ctx):
        total = self.children[0].count_rows(ctx)
        return Table(
            pa.Table.from_arrays(
                [pa.array(np.asarray([total], np.int64))], names=[self.out_name]
            )
        )

    def display_line(self):
        return f"IntervalCountExec: aggr=[{self.out_name}]"

    def with_children(self, children):
        return IntervalCountExec(children[0], self.out_name)


class CountFastPathRule:
    def optimize(self, plan: ExecPlan) -> ExecPlan:
        return plan.transform_up(self._rewrite)

    def _rewrite(self, node: ExecPlan) -> ExecPlan:
        if (
            isinstance(node, AggregateExec)
            and not node.group_exprs
            and len(node.agg_specs) == 1
            and isinstance(node.children[0], IntervalJoinExec)
            and node.children[0].join_type == "inner"
            and not node.children[0].algorithm.is_nearest
        ):
            func, arg, distinct, out_name = node.agg_specs[0]
            if func == "count" and not distinct and (
                arg is None or isinstance(arg, Literal)
            ):
                return IntervalCountExec(node.children[0], out_name)
        return node
