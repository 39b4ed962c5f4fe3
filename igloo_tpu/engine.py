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
from .io import (register_csv, register_dbapi, register_iceberg,
                 register_parquet)
from .metrics import MetricsCollector
from .plan.binder import Binder
from .plan.optimizer import optimize
from .sql import ast, parse_sql
from .table import DeviceTable


class QueryEngine:
    def __init__(self, device=None, result_cache: bool = True,
                 session_config: Optional[Mapping[str, str]] = None,
                 fused: bool = True, cache_dir: Optional[str] = None,
                 shape_buckets: bool = False):
        if shape_buckets:
            # snap ingest capacities to a coarse log grid so nearby
            # table sizes share compiled fragment shapes (bounds the
            # distinct-compile count of many-table workloads)
            from . import table as _table
            _table.SHAPE_BUCKETS = True
        self.device = device
        self.catalog = Catalog()
        self.functions = FunctionRegistry()
        self.metrics = MetricsCollector()
        self.executor = Executor(self.catalog, self.functions, self.metrics)
        if cache_dir:
            import uuid
            from .cache import PersistentResultCache
            self._result_cache = PersistentResultCache(cache_dir)
            # engine-unique salt: in-memory tables must never produce
            # cache hits across engines/processes
            self._cache_salt = uuid.uuid4().hex
        else:
            self._result_cache = ResultCache() if result_cache else None
        self._plan_cache: dict[str, object] = {}
        self._epoch = 0
        self._lock = threading.RLock()
        self.session_config = dict(session_config or {})
        # fused mode: distributable plan subtrees compile into ONE XLA
        # program (over a trivial 1-device mesh) instead of one program
        # per operator — host round trips are the latency floor of small
        # queries (SURVEY §7 "XLA-side pipeline compiler")
        self.fused = fused
        self.mesh = None                     # lazily built (1-device)
        self._ptables: dict = {}
        self._frag_cache: dict = {}
        self._tmp_counter = 0
        self._frag_lock = threading.Lock()
        # lazily re-cluster big fact tables on the join key the sorted
        # bitmap probe wants (physical layout is engine-owned): the
        # first join pays the sort once, every later join skips it
        self.auto_cluster = True
        # out-of-core: any chunked (host/virtual-resident) tables
        # registered? gates the per-query plan walk in _ooc_route
        self._has_chunked = False
        self.last_ooc = None

    def _ooc_route(self, plan) -> bool:
        from .ooc import ooc_scans
        return bool(ooc_scans(plan, self.catalog))

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

    def register_parquet(self, name: str, path: str,
                         out_of_core: bool = False,
                         chunk_rows: int = 1 << 22) -> None:
        if out_of_core:
            from .ooc import ChunkedTableProvider
            import os as _os
            st = _os.stat(path)
            with self._lock:
                self.catalog.register(name, ChunkedTableProvider.from_parquet(
                    path, chunk_rows,
                    identity=f"parquet:{path}:{st.st_mtime_ns}:{st.st_size}"))
                self._has_chunked = True
                self._bump()
            return
        with self._lock:
            register_parquet(self.catalog, name, path, device=self.device)
            self._bump()

    def register_chunked(self, name: str, source=None, *, fields=None,
                         nrows: int = None, chunk_fn=None,
                         chunk_rows: int = 1 << 22) -> None:
        """Register an out-of-core (chunked, host/virtual-resident) table:
        a pa.Table kept on host, or a fully virtual table via
        `chunk_fn(start, stop, columns) -> dict[str, np.ndarray]` with
        `fields` (pa.schema or Field tuple) and `nrows`. Queries stream
        it through bounded device buffers (see igloo_tpu/ooc.py)."""
        from .ooc import ChunkedTableProvider
        if isinstance(source, pa.Table):
            prov = ChunkedTableProvider.from_arrow(source, chunk_rows)
        elif source is None:
            if fields is None or nrows is None or chunk_fn is None:
                raise IglooError(
                    "register_chunked needs source=pa.Table or "
                    "(fields, nrows, chunk_fn)")
            if isinstance(fields, pa.Schema):
                from .dtypes import from_arrow as _fa
                from .plan.logical import Field as _Field
                fields = tuple(_Field(f.name, _fa(f.type), f.nullable)
                               for f in fields)
            prov = ChunkedTableProvider.from_generator(
                fields, nrows, chunk_fn, chunk_rows)
        else:
            raise IglooError(f"cannot register chunked from {type(source)}")
        with self._lock:
            self.catalog.register(name, prov)
            self._has_chunked = True
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

    def register_dbapi(self, name: str, connect, query: str = None) -> None:
        """Register a table from any DB-API 2.0 driver (postgres, mysql,
        sqlite3, ...). The reference's postgres/mysql connectors are
        stubs; this is the working equivalent."""
        with self._lock:
            register_dbapi(self.catalog, name, connect, query,
                           device=self.device)
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
        self._ptables.clear()
        self._frag_cache.clear()

    # ================= execution =================

    def execute(self, sql: str) -> pa.Table:
        """Execute SQL → pyarrow.Table (≙ Vec<RecordBatch>, lib.rs:54-57)."""
        return self.sql(sql).to_arrow()

    def sql(self, sql: str) -> DeviceTable:
        """Execute SQL → device-resident result table."""
        self.metrics.start_query(sql)
        fp = self._cache_fingerprint()
        if self._result_cache is not None:
            hit = (self._result_cache.get(sql, self._epoch, fp)
                   if fp is not None
                   else self._result_cache.get(sql, self._epoch))
            if hit is not None:
                self.metrics.finish_query(hit.nrows, cache_hit=True)
                return hit
        stmt = self._parse_cached(sql)
        out = self._execute_statement(stmt, sql)
        if self._result_cache is not None and isinstance(
                getattr(stmt, "node", stmt), (ast.Select, ast.SetOp)):
            if fp is not None:
                self._result_cache.put(sql, self._epoch, out, fp)
            else:
                self._result_cache.put(sql, self._epoch, out)
        self.metrics.finish_query(out.nrows)
        return out

    def _cache_fingerprint(self) -> Optional[str]:
        """Catalog + UDF fingerprint for the persistent cache tier (None
        for the in-memory-only cache)."""
        from .cache import PersistentResultCache
        if not isinstance(self._result_cache, PersistentResultCache):
            return None
        vol = f"{self._cache_salt}:{self._epoch}"
        udfs = ",".join(sorted(self.functions.udf_names()))
        return self.catalog.fingerprint(vol) + "#udfs:" + udfs

    def _parse_cached(self, sql: str):
        key = ResultCache.normalize(sql)
        entry = self._plan_cache.get(key)
        if entry is None:
            entry = parse_sql(sql)
            self._plan_cache[key] = entry
        return entry

    def _execute_statement(self, stmt, sql: str) -> DeviceTable:
        if isinstance(stmt, (ast.Select, ast.SetOp)):
            if self._has_chunked:
                plan = self._plan(stmt, sql)
                if self._ooc_route(plan):
                    from .ooc import execute_ooc
                    return execute_ooc(self, plan)
            if self.fused:
                return self._execute_fused(stmt, sql)
            plan = self._plan(stmt, sql)
            return self.executor.execute(plan)
        if isinstance(stmt, ast.Explain):
            plan = self._plan(stmt.query, sql)
            text = plan.tree_str()
            if stmt.analyze:
                # EXPLAIN ANALYZE: execute and append observed metrics
                import time as _time
                t0 = _time.perf_counter()
                result = self._execute_statement(
                    stmt.query, sql + " /*analyze*/")
                ms = (_time.perf_counter() - t0) * 1e3
                lines = text.split("\n")
                lines.append(f"-- rows: {result.nrows}")
                lines.append(f"-- execution: {ms:.2f} ms")
                m = self.metrics.history[-1] if self.metrics.history else None
                if m is not None and m.operators:
                    ops = ", ".join(f"{k}×{v}" for k, v in
                                    sorted(m.operators.items()))
                    lines.append(f"-- operators: {ops}")
                text = "\n".join(lines)
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
            if self._has_chunked and self._ooc_route(plan):
                from .ooc import execute_ooc
                result = execute_ooc(self, plan)
            else:
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
            rows = {n.lower(): r for n in self.catalog.names()
                    if (r := self.catalog.table_rows(n)) is not None}
            plan = optimize(binder.bind(query), table_rows=rows)
            self._plan_cache[key] = plan
        return plan

    # ================= fused execution =================

    def _get_mesh(self):
        if self.mesh is None:
            import jax

            from .parallel.mesh import make_mesh
            dev = self.device or jax.devices()[0]
            self.mesh = make_mesh((1,), devices=[dev])
        return self.mesh

    def _ptable(self, name: str):
        from .parallel.partition import PartitionedTable
        key = name.lower()
        pt = self._ptables.get(key)
        if pt is None:
            dt = self.catalog.get_table(name)
            pt = PartitionedTable.from_device_table(dt, self._get_mesh())
            self._ptables[key] = pt
        return pt

    def _execute_fused(self, stmt, sql: str) -> DeviceTable:
        import copy

        # IMPORTANT: fragments are compiled + cached against the CACHED
        # plan object (stable id across executions). The deepcopy only
        # exists so temp-scan substitution never mutates the cached plan;
        # fragment execution itself reads the original subtrees.
        plan = self._plan(stmt, sql)
        tmp_before = self._tmp_counter
        try:
            from .parallel.dist_exec import subtree_distributable
            single = self._mesh_size() == 1
            if subtree_distributable(plan, single) \
                    and self._worth_fragmenting(plan):
                out = self._run_fragment(plan)
                if out is not None:
                    if not self._needs_host_fallback(plan, out):
                        return out
                    return self.executor.execute(copy.deepcopy(plan))
                # whole-plan fragment rejected by the compile service:
                # fall through and fragment the plan's subtrees instead
            work = copy.deepcopy(plan)
            self._substitute_fragments(work, plan)
            return self.executor.execute(work)
        finally:
            for i in range(tmp_before + 1, self._tmp_counter + 1):
                self.catalog.deregister(f"__frag_{i}")

    def _mesh_size(self) -> int:
        import numpy as _np
        return int(_np.prod(self._get_mesh().devices.shape))

    def _worth_fragmenting(self, plan) -> bool:
        """A bare Scan gains nothing from fragment compilation (it would
        just round-trip the table through a shard_map)."""
        from .plan import logical as L
        return not isinstance(plan, L.Scan)

    def _substitute_fragments(self, copy_node, orig_node):
        """Walk copy+original in lockstep; run distributable ORIGINAL
        subtrees as fused fragments and splice temp scans into the copy.

        Sibling fragments (a node's independent children — join inputs,
        UNION branches) dispatch CONCURRENTLY on a thread pool: JAX's
        async dispatch queues both device programs, so the second
        fragment's host prep and dispatch hide behind the first's device
        time (≙ the reference's ready-fragment wave scheduler,
        /root/reference/crates/coordinator/src/distributed_executor.rs:49-182,
        without its per-wave barrier)."""
        from .parallel.dist_exec import subtree_distributable
        from .plan import logical as L

        single = self._mesh_size() == 1

        def fragmentable(o_child):
            return (subtree_distributable(o_child, single)
                    and self._worth_fragmenting(o_child))

        # pass 1: collect this node's fragmentable children
        tasks = []      # (kind, slot, c_child, o_child)
        for attr in ("input", "left", "right"):
            c_child = getattr(copy_node, attr, None)
            o_child = getattr(orig_node, attr, None)
            if isinstance(c_child, L.LogicalPlan):
                tasks.append((("attr", attr), c_child, o_child,
                              fragmentable(o_child)))
        if isinstance(copy_node, L.Union):
            for i, (c_child, o_child) in enumerate(
                    zip(copy_node.inputs, orig_node.inputs)):
                tasks.append((("union", i), c_child, o_child,
                              fragmentable(o_child)))

        # pass 2: run fragmentable siblings concurrently
        frag_tasks = [t for t in tasks if t[3]]
        results: dict[int, object] = {}
        if len(frag_tasks) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(len(frag_tasks)) as pool:
                futs = {id(t): pool.submit(self._run_fragment, t[2])
                        for t in frag_tasks}
            for t in frag_tasks:
                results[id(t)] = futs[id(t)].result()
        elif frag_tasks:
            t = frag_tasks[0]
            results[id(t)] = self._run_fragment(t[2])

        # pass 3: substitute / recurse (host-side, serial)
        new_union = list(copy_node.inputs) if isinstance(copy_node,
                                                        L.Union) else None
        for t in tasks:
            (kind, slot), c_child, o_child, is_frag = t
            replacement = None
            if is_frag:
                result = results[id(t)]
                ok = result is not None and (
                    kind == "union"
                    or not self._needs_host_fallback(o_child, result))
                if ok:
                    replacement = self._as_scan(o_child, result)
            if replacement is None:
                self._substitute_fragments(c_child, o_child)
            if kind == "attr":
                if replacement is not None:
                    setattr(copy_node, slot, replacement)
            else:
                new_union[slot] = (replacement if replacement is not None
                                   else c_child)
        if new_union is not None:
            copy_node.inputs = tuple(new_union)

    def _needs_host_fallback(self, plan, result: DeviceTable) -> bool:
        from .plan import logical as L
        node = plan
        while isinstance(node, (L.Projection, L.Filter)):
            node = node.input
        return (isinstance(node, L.Aggregate) and not node.group_exprs
                and result.nrows == 0)

    def _run_fragment(self, plan) -> DeviceTable:
        from .parallel.dist_exec import DistFragment
        from .plan import logical as L

        # host-side caches are shared across the concurrent sibling
        # threads — prep under the lock; frag.run (device work) outside
        with self._frag_lock:
            ptables = {}

            def scans(node):
                if isinstance(node, L.Scan):
                    ptables[node.table.lower()] = self._ptable(node.table)
                for c in node.children():
                    scans(c)

            scans(plan)
            frag = self._frag_cache.get(id(plan))
            if frag is None or frag.ptables != ptables:
                import os
                frag = DistFragment(
                    self._get_mesh(), ptables, self.functions,
                    broadcast_rows=int(os.environ.get(
                        "IGLOO_BROADCAST_ROWS", 1 << 20)))
                self._frag_cache[id(plan)] = frag
            self._last_frag = frag      # scaling harness reads .last_cost
        if getattr(frag, "compile_broken", False):
            return None
        try:
            out = frag.run(plan).to_device_table()
        except Exception as e:                        # noqa: BLE001
            # the remote TPU compile service can reject a large fused
            # program (exit-1 with no diagnostic). Degrade instead of
            # failing the query: returning None makes the caller split
            # into SMALLER child fragments, bottoming out at the
            # unfused per-operator executor — slower, still exact.
            msg = str(e)
            if ("remote_compile" in msg or "tpu_compile_helper" in msg
                    or "Mosaic" in msg):
                import sys as _sys
                print(f"[igloo] fragment compile rejected by the TPU "
                      f"compile service; splitting: {msg[:120]}",
                      file=_sys.stderr)
                frag.compile_broken = True
                return None
            raise
        if frag.cluster_hints:
            self._apply_cluster_hints(frag.cluster_hints)
        return out

    # tables below this size don't amortize a layout rewrite (matches
    # DistFragment.DSORT_MIN_ROWS — smaller probes never take the
    # sorted path at real scale)
    AUTO_CLUSTER_MIN_ROWS = 1 << 24

    def _apply_cluster_hints(self, hints) -> None:
        """Re-layout tables the sorted-probe join flagged: per-shard sort
        by the join key so repeat joins skip the probe-side lax.sort.
        Row order is semantically free (SQL tables are unordered);
        results are bit-identical, only physical layout changes."""
        if not self.auto_cluster:
            return
        with self._frag_lock:
            acted = False
            for tname, cname in sorted(hints):
                pt = self._ptables.get(tname)
                if (pt is None or pt.clustered_by is not None
                        or pt.nrows < self.AUTO_CLUSTER_MIN_ROWS):
                    continue
                try:
                    pt.cluster_by(cname)
                    self._sync_cluster_back(tname, pt)
                    acted = True
                except Exception:
                    continue
            if acted:
                # compiled fragments captured the pre-cluster buffers;
                # drop them so recompiles read the new layout (and the
                # old arrays can be freed)
                self._frag_cache.clear()

    def _sync_cluster_back(self, tname: str, pt) -> None:
        """On a 1-device mesh the PartitionedTable shares the catalog
        DeviceTable's buffers; point the catalog columns at the
        re-clustered arrays so the pre-cluster layout can be freed
        (otherwise the table would be resident twice)."""
        if pt.num_parts != 1:
            return
        try:
            dt = self.catalog.get_table(tname)
        except Exception:
            return
        for n, pc in pt.cols.items():
            col = dt.columns.get(n)
            if col is None:
                return
        for n, pc in pt.cols.items():
            col = dt.columns[n]
            col.data = pc.data
            col.validity = pc.valid
            if getattr(col, "pair_hi", None) is not None:
                col.pair_hi = pc.pair_hi

    def cluster_table(self, name: str, key: str) -> None:
        """Explicitly cluster a table's physical layout by an integer
        column: each shard is sorted by `key`, so sorted-probe joins on
        it skip their per-query probe sort (the dominant cost of
        repeated fact⋈dim joins)."""
        with self._frag_lock:
            pt = self._ptable(name)
            pt.cluster_by(key)
            self._sync_cluster_back(name.lower(), pt)
            self._frag_cache.clear()

    def _as_scan(self, child, result: DeviceTable):
        import dataclasses as _dc

        from .catalog import MemoryProvider
        from .plan import logical as L

        self._tmp_counter += 1
        name = f"__frag_{self._tmp_counter}"
        self.catalog.register(name, MemoryProvider(result))
        fields = []
        for (col_name, _), f in zip(result.schema(), child.schema):
            fields.append(_dc.replace(f, name=col_name))
        return L.Scan(name, tuple(fields))

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
