"""QueryEngine facade: SQL string in, Arrow table out.

≙ the reference's QueryEngine (`new()`, `register_table()`, `execute()`,
/root/reference/crates/engine/src/lib.rs:28-62), with the `capitalize`
UDF registered at construction exactly like the reference (`lib.rs:41-42`).
The execution pipeline is native end-to-end:

    SQL → tokenizer/parser → binder → optimizer → executor (XLA/Pallas)

collapsing the reference's two parallel paths (DataFusion-delegated +
custom operators, SURVEY §1) into one.
"""

from __future__ import annotations

import threading
from typing import Iterable, Mapping, Optional

import pyarrow as pa

from .cache import ResultCache
from .catalog import ArrowProvider, Catalog, MemoryProvider
from .errors import IglooError, NotSupportedError
from .exec.runtime import Executor
from .functions import FunctionRegistry
from .io import register_csv, register_iceberg, register_parquet
from .metrics import MetricsCollector
from .plan.binder import Binder
from .plan.optimizer import optimize
from .sql import ast, parse_sql
from .table import DeviceTable


class QueryEngine:
    def __init__(self, device=None, result_cache: bool = True,
                 session_config: Optional[Mapping[str, str]] = None):
        self.device = device
        self.catalog = Catalog()
        self.functions = FunctionRegistry()
        self.metrics = MetricsCollector()
        self.executor = Executor(self.catalog, self.functions, self.metrics)
        self._result_cache = ResultCache() if result_cache else None
        self._plan_cache: dict[str, object] = {}
        self._epoch = 0
        self._lock = threading.RLock()
        self.session_config = dict(session_config or {})

    # ================= registration =================

    def register_table(self, name: str, source) -> None:
        """Register a table from pyarrow.Table / dict / pandas / DeviceTable.
        ≙ reference register_table (lib.rs:46-52)."""
        with self._lock:
            if isinstance(source, DeviceTable):
                self.catalog.register(name, MemoryProvider(source))
            elif isinstance(source, pa.Table):
                self.catalog.register(name, ArrowProvider(source, self.device))
            elif isinstance(source, Mapping):
                self.catalog.register(
                    name, ArrowProvider(pa.table(dict(source)), self.device))
            else:
                try:
                    import pandas as pd
                    if isinstance(source, pd.DataFrame):
                        self.catalog.register(
                            name, ArrowProvider(pa.Table.from_pandas(source),
                                                self.device))
                        self._bump()
                        return
                except ImportError:
                    pass
                raise IglooError(f"cannot register table from {type(source)}")
            self._bump()

    def register_parquet(self, name: str, path: str) -> None:
        with self._lock:
            register_parquet(self.catalog, name, path, device=self.device)
            self._bump()

    def register_csv(self, name: str, path: str, has_header: bool = True) -> None:
        with self._lock:
            register_csv(self.catalog, name, path, has_header=has_header,
                         device=self.device)
            self._bump()

    def register_iceberg(self, name: str, table_dir: str) -> None:
        with self._lock:
            register_iceberg(self.catalog, name, table_dir, device=self.device)
            self._bump()

    def deregister_table(self, name: str) -> bool:
        with self._lock:
            out = self.catalog.deregister(name)
            self._bump()
            return out

    def register_udf(self, name: str, fn, *, kind: str = "string",
                     ret_type=None) -> None:
        """≙ the reference's UDF registration (lib.rs:136-144)."""
        self.functions.register_udf(name, fn, kind=kind, ret_type=ret_type)
        self._plan_cache.clear()

    def _bump(self):
        self._epoch += 1
        self._plan_cache.clear()

    # ================= execution =================

    def execute(self, sql: str) -> pa.Table:
        """Execute SQL → pyarrow.Table (≙ Vec<RecordBatch>, lib.rs:54-57)."""
        return self.sql(sql).to_arrow()

    def sql(self, sql: str) -> DeviceTable:
        """Execute SQL → device-resident result table."""
        self.metrics.start_query(sql)
        if self._result_cache is not None:
            hit = self._result_cache.get(sql, self._epoch)
            if hit is not None:
                self.metrics.finish_query(hit.nrows, cache_hit=True)
                return hit
        stmt = self._parse_cached(sql)
        out = self._execute_statement(stmt, sql)
        if self._result_cache is not None and isinstance(
                getattr(stmt, "node", stmt), (ast.Select, ast.SetOp)):
            self._result_cache.put(sql, self._epoch, out)
        self.metrics.finish_query(out.nrows)
        return out

    def _parse_cached(self, sql: str):
        key = ResultCache.normalize(sql)
        entry = self._plan_cache.get(key)
        if entry is None:
            entry = parse_sql(sql)
            self._plan_cache[key] = entry
        return entry

    def _execute_statement(self, stmt, sql: str) -> DeviceTable:
        if isinstance(stmt, (ast.Select, ast.SetOp)):
            plan = self._plan(stmt, sql)
            return self.executor.execute(plan)
        if isinstance(stmt, ast.Explain):
            plan = self._plan(stmt.query, sql)
            text = plan.tree_str()
            return DeviceTable.from_arrow(
                pa.table({"plan": text.split("\n")}), device=self.device)
        if isinstance(stmt, ast.ShowTables):
            return DeviceTable.from_arrow(
                pa.table({"table_name": self.catalog.names()}),
                device=self.device)
        if isinstance(stmt, ast.CreateTableAs):
            if stmt.if_not_exists and self.catalog.has(stmt.name):
                return DeviceTable.from_arrow(pa.table({"created": [False]}))
            plan = self._plan(stmt.query, sql)
            result = self.executor.execute(plan)
            with self._lock:
                self.catalog.register(stmt.name, MemoryProvider(result))
                self._bump()
            return DeviceTable.from_arrow(pa.table({"created": [True]}))
        if isinstance(stmt, ast.DropTable):
            found = self.catalog.has(stmt.name)
            if not found and not stmt.if_exists:
                raise IglooError(f"table {stmt.name!r} does not exist")
            with self._lock:
                self.catalog.deregister(stmt.name)
                self._bump()
            return DeviceTable.from_arrow(pa.table({"dropped": [found]}))
        raise NotSupportedError(f"statement {type(stmt).__name__}")

    def _plan(self, query, sql: str):
        key = ("plan", ResultCache.normalize(sql), self._epoch)
        plan = self._plan_cache.get(key)
        if plan is None:
            binder = Binder(self.catalog, self.functions)
            plan = optimize(binder.bind(query))
            self._plan_cache[key] = plan
        return plan

    # ================= introspection =================

    def profile(self, sql: str, log_dir: str = "/tmp/igloo_trace") -> str:
        """Execute under jax.profiler; returns the trace directory
        (open with Perfetto / TensorBoard). Operators appear as
        `igloo.<Op>` named scopes — SURVEY §5's per-operator kernel-time
        attribution."""
        import jax

        with jax.profiler.trace(log_dir):
            self.sql(sql)
        return log_dir

    def explain(self, sql: str) -> str:
        stmt = self._parse_cached(sql)
        q = stmt.query if isinstance(stmt, ast.Explain) else stmt
        return self._plan(q, sql).tree_str()

    def table_names(self) -> list[str]:
        return self.catalog.names()

    @property
    def last_metrics(self):
        return self.metrics.history[-1] if self.metrics.history else None
