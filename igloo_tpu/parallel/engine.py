"""DistributedQueryEngine: the full engine over a device mesh.

≙ the reference's coordinator role (process 0 parses/plans/collects,
/root/reference/crates/coordinator/src/main.rs) — but instead of mailing
fragments to stub workers, the distributable prefix of every plan runs as
one SPMD program over all devices (dist_exec.py) and only the
non-distributable tail (global ORDER BY, LIMIT, Values, set ops) runs on
the gathered result through the single-device executor.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..catalog import MemoryProvider
from ..config import EngineConfig
from ..engine import QueryEngine
from ..errors import ExecutionError
from ..plan import logical as L
from ..table import DeviceTable
from .dist_exec import DistFragment, subtree_distributable
from .mesh import make_mesh
from .partition import PartitionedTable


class DistributedQueryEngine(QueryEngine):
    def __init__(self, mesh=None, config: Optional[EngineConfig] = None,
                 **kwargs):
        config = config or EngineConfig(distributed=True)
        kwargs.setdefault("result_cache", config.result_cache)
        super().__init__(**kwargs)
        self.config = config
        self.mesh = mesh or make_mesh(config.mesh_shape, config.mesh_axes)
        self._ptables: dict[str, PartitionedTable] = {}
        self._tmp_counter = 0

    # ---- partitioned table access ----

    def _ptable(self, name: str) -> PartitionedTable:
        key = name.lower()
        pt = self._ptables.get(key)
        if pt is None:
            dt = self.catalog.get_table(name)
            pt = PartitionedTable.from_device_table(dt, self.mesh)
            self._ptables[key] = pt
        return pt

    def partition_table(self, name: str, hash_key: Optional[str] = None) -> None:
        """Explicitly (re)partition a table, optionally hash-placed by key."""
        dt = self.catalog.get_table(name)
        self._ptables[name.lower()] = PartitionedTable.from_device_table(
            dt, self.mesh, hash_key=hash_key)

    def _bump(self):
        super()._bump()
        if hasattr(self, "_ptables"):
            self._ptables.clear()

    # ---- execution ----

    def _execute_plan_distributed(self, plan: L.LogicalPlan) -> DeviceTable:
        plan = self._split_and_run(plan)
        if isinstance(plan, DeviceTable):
            return plan
        # remaining non-distributable tail runs single-device
        return self.executor.execute(plan)

    def _split_and_run(self, plan: L.LogicalPlan):
        """Run maximal distributable subtrees; replace them with temp scans."""
        if subtree_distributable(plan):
            out = self._run_fragment(plan)
            if self._needs_host_fallback(plan, out):
                return None  # signal caller to run whole subtree locally
            return out

        def replace_children(node):
            for attr in ("input", "left", "right"):
                child = getattr(node, attr, None)
                if isinstance(child, L.LogicalPlan):
                    if subtree_distributable(child):
                        result = self._run_fragment(child)
                        if result is not None and not \
                                self._needs_host_fallback(child, result):
                            setattr(node, attr, self._as_scan(child, result))
                    else:
                        replace_children(child)
            if isinstance(node, L.Union):
                new_inputs = []
                for child in node.inputs:
                    if subtree_distributable(child):
                        result = self._run_fragment(child)
                        if result is not None:
                            new_inputs.append(self._as_scan(child, result))
                            continue
                    replace_children(child)
                    new_inputs.append(child)
                node.inputs = tuple(new_inputs)
            return node

        return replace_children(plan)

    def _needs_host_fallback(self, plan, result: DeviceTable) -> bool:
        # SQL semantics: ungrouped aggregate over zero rows yields ONE row
        node = plan
        while isinstance(node, (L.Projection, L.Filter)):
            node = node.input
        return (isinstance(node, L.Aggregate) and not node.group_exprs
                and result.nrows == 0)

    def _run_fragment(self, plan: L.LogicalPlan) -> DeviceTable:
        ptables = {}
        for scan in self._scans(plan):
            ptables[scan.table.lower()] = self._ptable(scan.table)
        frag = DistFragment(self.mesh, ptables, self.functions)
        return frag.run(plan).to_device_table()

    def _scans(self, node, out=None):
        if out is None:
            out = []
        if isinstance(node, L.Scan):
            out.append(node)
        for c in node.children():
            self._scans(c, out)
        return out

    def _as_scan(self, child: L.LogicalPlan, result: DeviceTable) -> L.Scan:
        """Register a fragment result as a temp table + matching Scan node."""
        self._tmp_counter += 1
        name = f"__frag_{self._tmp_counter}"
        self.catalog.register(name, MemoryProvider(result))
        # temp table column names were uniquified — rebuild schema to match
        fields = []
        for (col_name, _), f in zip(result.schema(), child.schema):
            fields.append(dataclasses.replace(f, name=col_name))
        return L.Scan(name, tuple(fields))

    def _execute_statement(self, stmt, sql: str) -> DeviceTable:
        import copy

        from ..sql import ast
        if isinstance(stmt, (ast.Select, ast.SetOp)):
            # work on a copy: the split rewrites subtrees into temp scans,
            # which must not leak into the plan cache
            plan = copy.deepcopy(self._plan(stmt, sql))
            tmp_before = self._tmp_counter
            try:
                out = self._execute_plan_distributed(plan)
                if out is None:
                    out = self.executor.execute(
                        copy.deepcopy(self._plan(stmt, sql)))
                return out
            finally:
                for i in range(tmp_before + 1, self._tmp_counter + 1):
                    self.catalog.deregister(f"__frag_{i}")
        return super()._execute_statement(stmt, sql)
