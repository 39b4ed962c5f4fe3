"""Per-query metrics.

The reference's only designed-in query metrics are
`QueryComplete{total_rows, execution_time_ms}`
(/root/reference/crates/api/proto/distributed.proto:66-69) plus cache
hit/miss tracing. This module records those and per-operator row
throughput; `jax.named_scope` tags every operator so device profiles
(jax.profiler / Perfetto) attribute kernel time to SQL operators.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from collections import defaultdict


@dataclasses.dataclass
class QueryMetrics:
    sql: str = ""
    total_rows: int = 0
    execution_time_ms: float = 0.0
    operators: dict = dataclasses.field(default_factory=dict)
    cache_hit: bool = False

    def to_dict(self):
        return {
            "total_rows": self.total_rows,
            "execution_time_ms": round(self.execution_time_ms, 3),
            "operators": dict(self.operators),
            "cache_hit": self.cache_hit,
        }


class MetricsCollector:
    """`current` is thread-local: concurrent queries (Flight serves
    do_get from a gRPC thread pool) each attribute operators/rows to
    their own QueryMetrics; `history` appends under the GIL."""

    def __init__(self):
        self._tls = threading.local()
        self.history: list[QueryMetrics] = []
        self._op_counts = defaultdict(int)

    @property
    def current(self) -> QueryMetrics | None:
        return getattr(self._tls, "current", None)

    @current.setter
    def current(self, m) -> None:
        self._tls.current = m

    def start_query(self, sql: str) -> None:
        self.current = QueryMetrics(sql=sql)
        self.current._t0 = time.perf_counter()

    def record_operator(self, name: str, capacity: int) -> None:
        if self.current is not None:
            ops = self.current.operators
            ops[name] = ops.get(name, 0) + 1

    def finish_query(self, total_rows: int, cache_hit: bool = False) -> QueryMetrics:
        m = self.current or QueryMetrics()
        m.total_rows = total_rows
        m.cache_hit = cache_hit
        if hasattr(m, "_t0"):
            m.execution_time_ms = (time.perf_counter() - m._t0) * 1e3
        self.history.append(m)
        if len(self.history) > 256:
            del self.history[:128]
        self.current = None
        return m
