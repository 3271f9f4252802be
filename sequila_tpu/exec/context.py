"""Execution context: config, metrics, device placement."""

from __future__ import annotations

import dataclasses
import time

from sequila_tpu.config import SequilaConfig
from sequila_tpu.utils.metrics import MetricsRegistry


@dataclasses.dataclass
class ExecContext:
    config: SequilaConfig
    metrics: MetricsRegistry = dataclasses.field(default_factory=MetricsRegistry)
    collect_metrics: bool = False

    def timer(self, op: str, name: str):
        return _Timer(self, op, name)


class _Timer:
    def __init__(self, ctx: ExecContext, op: str, name: str):
        self.ctx, self.op, self.name = ctx, op, name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.ctx.metrics.add_time(self.op, self.name, time.perf_counter() - self.t0)
        return False
