"""Out-of-core execution: stream larger-than-HBM tables through the engine.

The reference executes any table size in bounded memory because its
operators pull 1024-row RecordBatches from a streaming parquet scan
(/root/reference/crates/engine/src/operators/parquet_scan.rs:46-82).
This engine's execution model is the opposite — whole padded columns
resident in HBM — so bounded-memory execution needs an explicit
multi-pass path: a `ChunkedTableProvider` keeps the table host-resident
(or fully virtual, via a generator) and queries over it run as

    for each chunk:                      # fixed device capacity
        upload chunk -> run PARTIAL plan -> small host partial
    concat partials -> run MERGE plan    # ordinary in-memory execution

The partial/merge split happens on the bound logical plan:

- `Aggregate` over the chunked scan (through any Filter/Projection
  chain) decomposes into mergeable partials: count->sum of counts,
  sum/min/max->same, avg->(sum, count), var/stddev->(count, sum, sum of
  squares) with the final expression reconstructing the engine's exact
  sample-variance formula (ops/aggregate.py:325-333), any_value->
  any_value. Holistic (median/quantile), host (string_agg) and DISTINCT
  aggregates do not decompose — they fall back to the concat split
  below.
- `Distinct` runs per chunk, then once more over the union of partials.
- `Sort(limit=k)` (fused top-k) keeps the per-chunk top-k, then merges.
- `Limit` takes limit+offset rows per chunk and stops early.
- anything else: the Filter/Projection chain streams per chunk and the
  concatenated survivors feed the untouched remainder of the plan (the
  result itself must fit; the chunked input need not).

Every chunk reuses ONE device capacity and ONE set of compiled programs
(shapes are fixed; the per-chunk row count only changes the scan mask,
which is data, not shape). Peak device residency is ~2 chunks of the
scanned columns plus the partial results; `OocStats.peak_live_bytes`
measures it so tests/bench can assert the bound.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Callable, Optional

import numpy as np
import pyarrow as pa

from .catalog import MemoryProvider, TableProvider
from .dtypes import SqlType, from_arrow as sqltype_from_arrow
from .errors import ExecutionError, NotSupportedError
from .plan import logical as L
from .sql.ast import BinOp, JoinKind
from .table import DeviceTable, Column, pad_count


# ---------------------------------------------------------------------------
# provider
# ---------------------------------------------------------------------------

class ChunkedTableProvider(TableProvider):
    """Host-resident (or virtual) chunked table; never fully on device.

    `chunk_fn(start, stop, columns)` returns a pa.Table (or dict of
    numpy arrays) holding rows [start, stop) of the requested columns.
    """

    def __init__(self, fields: tuple, nrows: int, chunk_rows: int,
                 chunk_fn: Callable, identity: Optional[str] = None):
        self._fields = tuple(fields)
        self._nrows = int(nrows)
        self.chunk_rows = pad_count(int(chunk_rows))
        self._chunk_fn = chunk_fn
        self.identity = identity

    def schema(self):
        return self._fields

    def row_estimate(self):
        return self._nrows

    def load(self):
        raise ExecutionError(
            "table is registered out-of-core (chunked); this query shape "
            "requires full device residency. Supported shapes stream "
            "through igloo_tpu.ooc.execute_ooc — see module docstring.")

    def iter_chunks(self, columns: list[str]):
        """Yield (pa.Table, start_row) covering the table in order."""
        for start in range(0, self._nrows, self.chunk_rows):
            stop = min(start + self.chunk_rows, self._nrows)
            t = self._chunk_fn(start, stop, columns)
            if isinstance(t, dict):
                t = pa.table({c: t[c] for c in columns})
            elif isinstance(t, pa.Table) and t.column_names != columns:
                t = t.select(columns)
            if t.num_rows != stop - start:
                raise ExecutionError(
                    f"chunk_fn returned {t.num_rows} rows for "
                    f"[{start}, {stop})")
            yield t, start

    # ---- constructors ----

    @classmethod
    def from_parquet(cls, path: str, chunk_rows: int = 1 << 22,
                     identity: Optional[str] = None):
        import pyarrow.parquet as pq
        pf = pq.ParquetFile(path)
        fields = tuple(
            L.Field(f.name, sqltype_from_arrow(f.type), f.nullable)
            for f in pf.schema_arrow)
        nrows = pf.metadata.num_rows

        def chunk_fn(start, stop, columns):
            # parquet is row-group addressable, not row addressable:
            # walk groups and slice the overlap (each group decodes at
            # most twice across the whole scan)
            out = []
            base = 0
            for rg in range(pf.metadata.num_row_groups):
                gn = pf.metadata.row_group(rg).num_rows
                g0, g1 = base, base + gn
                base = g1
                if g1 <= start or g0 >= stop:
                    continue
                t = pf.read_row_group(rg, columns=columns)
                lo = max(start - g0, 0)
                hi = min(stop, g1) - g0
                out.append(t.slice(lo, hi - lo))
            return pa.concat_tables(out)

        return cls(fields, nrows, chunk_rows, chunk_fn, identity=identity)

    @classmethod
    def from_arrow(cls, table: pa.Table, chunk_rows: int = 1 << 22):
        fields = tuple(
            L.Field(f.name, sqltype_from_arrow(f.type), f.nullable)
            for f in table.schema)

        def chunk_fn(start, stop, columns):
            return table.select(columns).slice(start, stop - start)

        return cls(fields, table.num_rows, chunk_rows, chunk_fn)

    @classmethod
    def from_generator(cls, fields, nrows: int, chunk_fn,
                       chunk_rows: int = 1 << 22):
        """Fully virtual table: chunk_fn(start, stop, columns) -> dict of
        numpy arrays. Lets benchmarks stream tables far larger than host
        RAM (nothing is ever materialized whole)."""
        return cls(tuple(fields), nrows, chunk_rows, chunk_fn)


# ---------------------------------------------------------------------------
# plan analysis
# ---------------------------------------------------------------------------

def ooc_scans(plan: L.LogicalPlan, catalog) -> list[L.Scan]:
    """All Scan nodes (including in scalar-subquery plans) referencing a
    chunked provider."""
    out = []

    def walk(node):
        if isinstance(node, L.Scan):
            p = catalog._providers.get(node.table.lower()) \
                if catalog.has(node.table) else None
            if isinstance(p, ChunkedTableProvider):
                out.append(node)
        for e in _node_exprs_deep(node):
            for sub in L.walk_expr(e):
                if isinstance(sub, L.BScalarSubquery):
                    walk(sub.plan)
        for c in node.children():
            walk(c)

    walk(plan)
    return out


def _node_exprs_deep(node) -> list:
    out = []
    for f in dataclasses.fields(node) if dataclasses.is_dataclass(node) \
            else []:
        v = getattr(node, f.name)
        stack = [v]
        while stack:
            x = stack.pop()
            if isinstance(x, L.BExpr):
                out.append(x)
            elif isinstance(x, (tuple, list)):
                stack.extend(x)
            elif isinstance(x, L.SortKey):
                out.append(x.expr)
            elif isinstance(x, L.AggSpec) and x.arg is not None:
                out.append(x.arg)
    return out


@dataclasses.dataclass
class OocStats:
    chunks: int = 0
    rows_scanned: int = 0
    peak_live_bytes: int = 0
    base_live_bytes: int = 0
    split: str = ""


def _live_bytes() -> int:
    import jax
    return sum(int(np.prod(a.shape)) * a.dtype.itemsize
               for a in jax.live_arrays())


# ---------------------------------------------------------------------------
# aggregate decomposition
# ---------------------------------------------------------------------------

_F64 = SqlType.FLOAT64
_I64 = SqlType.INT64


def _col(fields, i):
    f = fields[i]
    return L.BColumn(f.dtype, f.nullable, i, f.name)


def _cast_f64(e):
    if e.dtype is _F64:
        return e
    return L.BCast(_F64, e.nullable, e, False)


def _bin(op, a, b, dtype, nullable=True):
    return L.BBinary(dtype, nullable, op, a, b)


def _lit(v, dtype):
    return L.BLiteral(dtype, False, v)


def _decompose_aggs(A: L.Aggregate):
    """Per original AggSpec: partial specs + a final-expression builder.

    Returns (partial_specs, finals) where finals[i](part_base, cols) is
    called with the index of this agg's first merged column and a
    column-maker over the merged schema, yielding the expr reproducing
    the original output — or None if any agg is non-decomposable.
    """
    partial_specs: list[L.AggSpec] = []
    merge_specs: list[tuple] = []   # (func, partial_idx, out_dtype, out_nullable)
    finals = []                     # (merged_base, builder)

    for spec in A.aggs:
        if spec.distinct or spec.func in L.HOLISTIC_AGGS \
                or spec.func in L.HOST_AGGS:
            return None
        base = len(merge_specs)
        f = spec.func
        if f == "count_star":
            partial_specs.append(dataclasses.replace(
                spec, out_name=f"p{len(partial_specs)}"))
            merge_specs.append(("sum", len(partial_specs) - 1, _I64, False))
            finals.append((base, lambda b, col: col(b)))
        elif f == "count":
            partial_specs.append(dataclasses.replace(
                spec, out_name=f"p{len(partial_specs)}"))
            merge_specs.append(("sum", len(partial_specs) - 1, _I64, False))
            finals.append((base, lambda b, col: col(b)))
        elif f in ("sum", "min", "max", "any_value", "first_value"):
            partial_specs.append(dataclasses.replace(
                spec, out_name=f"p{len(partial_specs)}"))
            mf = "sum" if f == "sum" else ("any_value" if f in (
                "any_value", "first_value") else f)
            merge_specs.append((mf, len(partial_specs) - 1,
                                spec.out_dtype, spec.out_nullable))
            finals.append((base, lambda b, col: col(b)))
        elif f == "avg":
            partial_specs.append(L.AggSpec(
                "sum", _cast_f64(spec.arg), False,
                f"p{len(partial_specs)}", _F64, True))
            partial_specs.append(L.AggSpec(
                "count", spec.arg, False, f"p{len(partial_specs)}",
                _I64, False))
            merge_specs.append(("sum", len(partial_specs) - 2, _F64, True))
            merge_specs.append(("sum", len(partial_specs) - 1, _I64, False))

            def fin_avg(b, col):
                return _bin(BinOp.DIV, col(b), _cast_f64(col(b + 1)), _F64)
            finals.append((base, fin_avg))
        elif f in ("var", "stddev"):
            x = _cast_f64(spec.arg)
            partial_specs.append(L.AggSpec(
                "count", spec.arg, False, f"p{len(partial_specs)}",
                _I64, False))
            partial_specs.append(L.AggSpec(
                "sum", x, False, f"p{len(partial_specs)}", _F64, True))
            partial_specs.append(L.AggSpec(
                "sum", _bin(BinOp.MUL, x, x, _F64, x.nullable), False,
                f"p{len(partial_specs)}", _F64, True))
            merge_specs.append(("sum", len(partial_specs) - 3, _I64, False))
            merge_specs.append(("sum", len(partial_specs) - 2, _F64, True))
            merge_specs.append(("sum", len(partial_specs) - 1, _F64, True))
            is_std = (f == "stddev")

            def fin_var(b, col, is_std=is_std):
                # exact mirror of ops/aggregate.py:325-333 — sample
                # variance, clamped >= 0, NULL unless count > 1
                n, s, q = col(b), col(b + 1), col(b + 2)
                nf = _cast_f64(n)
                var = _bin(BinOp.DIV,
                           _bin(BinOp.SUB, q,
                                _bin(BinOp.DIV, _bin(BinOp.MUL, s, s, _F64),
                                     nf, _F64), _F64),
                           _bin(BinOp.SUB, nf, _lit(1.0, _F64), _F64), _F64)
                var = L.BScalarFunc(_F64, True, "greatest",
                                    (var, _lit(0.0, _F64)))
                out = L.BScalarFunc(_F64, True, "sqrt", (var,)) \
                    if is_std else var
                return L.BCase(_F64, True,
                               ((_bin(BinOp.GT, n, _lit(1, _I64),
                                      SqlType.BOOL, False), out),), None)
            finals.append((base, fin_var))
        else:
            return None

    return partial_specs, merge_specs, finals


def _build_agg_split(A: L.Aggregate, chain_top: L.LogicalPlan):
    """Aggregate split: (partial_plan, merge_subtree_builder)."""
    dec = _decompose_aggs(A)
    if dec is None:
        return None
    partial_specs, merge_specs, finals = dec
    k = len(A.group_exprs)
    gfields = tuple(
        L.Field(f"g{i}", A.schema[i].dtype, A.schema[i].nullable)
        for i in range(k))
    pfields = tuple(
        L.Field(s.out_name, s.out_dtype, s.out_nullable)
        for s in partial_specs)
    partial_plan = L.Aggregate(chain_top, A.group_exprs,
                               tuple(partial_specs), gfields + pfields)

    def merge_builder(part_table_name: str):
        scan = L.Scan(part_table_name, gfields + pfields)
        mspecs = tuple(
            L.AggSpec(func, _col(gfields + pfields, k + pi), False,
                      f"m{j}", dt, nl)
            for j, (func, pi, dt, nl) in enumerate(merge_specs))
        mfields = tuple(L.Field(s.out_name, s.out_dtype, s.out_nullable)
                        for s in mspecs)
        magg = L.Aggregate(
            scan, tuple(_col(gfields + pfields, i) for i in range(k)),
            mspecs, gfields + mfields)
        msch = gfields + mfields

        def mcol(i):
            return _col(msch, k + i)

        exprs = [_col(msch, i) for i in range(k)]
        for spec, (base, fin) in zip(A.aggs, finals):
            e = fin(base, mcol)
            if e.dtype is not spec.out_dtype:
                e = L.BCast(spec.out_dtype, spec.out_nullable, e, False)
            exprs.append(e)
        return L.Projection(magg, tuple(exprs), A.schema)

    return partial_plan, merge_builder


# ---------------------------------------------------------------------------
# executor
# ---------------------------------------------------------------------------

_TMP_COUNT = [0]


def execute_ooc(engine, plan: L.LogicalPlan) -> DeviceTable:
    """Execute a plan referencing exactly one chunked table. Raises
    NotSupportedError for shapes that cannot stream (chunked table under
    a join/window/set-op, several chunked tables)."""
    catalog = engine.catalog
    work = copy.deepcopy(plan)
    scans = ooc_scans(work, catalog)
    if len(scans) != 1:
        raise NotSupportedError(
            f"{len(scans)} out-of-core scans in one query (exactly one "
            "supported; joins/set-ops over chunked tables need the table "
            "re-registered in-memory or pre-reduced)")
    scan = scans[0]

    # spine: root .. scan (parent chain)
    spine = _path_to(work, scan)
    if spine is None:
        raise NotSupportedError(
            "out-of-core table inside a scalar subquery")
    k = len(spine) - 1
    j = k - 1
    while j >= 0:
        nd = spine[j]
        if isinstance(nd, (L.Filter, L.Projection)):
            j -= 1
            continue
        # a Join is chain-transparent (runs per chunk) when the OTHER
        # side is fully in-memory and chunking the streamed side cannot
        # duplicate the other side's unmatched emissions: INNER/CROSS
        # always; LEFT/SEMI/ANTI only when streaming the probe (left);
        # RIGHT only when streaming the right. FULL never (both sides'
        # unmatched rows would re-emit every chunk).
        if isinstance(nd, L.Join):
            came_from = spine[j + 1]
            other = nd.right if nd.left is came_from else nd.left
            kind_ok = (
                nd.kind in (JoinKind.INNER, JoinKind.CROSS)
                or (nd.kind in (JoinKind.LEFT, JoinKind.SEMI,
                                JoinKind.ANTI) and nd.left is came_from)
                or (nd.kind is JoinKind.RIGHT and nd.right is came_from))
            if kind_ok and not ooc_scans(other, catalog):
                j -= 1
                continue
        break
    anchor = spine[j] if j >= 0 else None
    chain_top = spine[j + 1]     # top of the streamable chain (FP+joins)

    provider: ChunkedTableProvider = catalog._providers[scan.table.lower()]
    _TMP_COUNT[0] += 1
    chunk_name = f"__ooc_chunk_{_TMP_COUNT[0]}"
    part_name = f"__ooc_part_{_TMP_COUNT[0]}"
    needed_cols = [f.name for f in scan.schema]
    orig_table = scan.table
    scan.table = chunk_name
    scan.projection = None

    split = None
    partial_plan = None
    merge_make = None
    stop_rows = None

    if isinstance(anchor, L.Aggregate):
        built = _build_agg_split(anchor, chain_top)
        if built is not None:
            partial_plan, merge_make = built
            split = "aggregate"

            def splice(parts_scan_plan):
                return _replace(work, anchor, parts_scan_plan)
    if split is None and isinstance(anchor, L.Distinct):
        partial_plan = L.Distinct(chain_top)
        split = "distinct"

        def merge_make(name):
            return L.Distinct(_scan_like(name, chain_top.schema))

        def splice(m):
            return _replace(work, anchor, m)
    if split is None and isinstance(anchor, L.Sort) \
            and anchor.limit is not None:
        partial_plan = L.Sort(chain_top, anchor.keys, anchor.limit)
        split = "topk"

        def merge_make(name):
            return L.Sort(_scan_like(name, chain_top.schema),
                          anchor.keys, anchor.limit)

        def splice(m):
            return _replace(work, anchor, m)
    if split is None and isinstance(anchor, L.Limit) \
            and anchor.limit is not None:
        stop_rows = anchor.limit + anchor.offset
        partial_plan = L.Limit(chain_top, stop_rows, 0)
        split = "limit"

        def merge_make(name):
            return L.Limit(_scan_like(name, chain_top.schema),
                           anchor.limit, anchor.offset)

        def splice(m):
            return _replace(work, anchor, m)
    if split is None:
        # generic: stream the FP chain, feed survivors to the remainder
        partial_plan = chain_top
        split = "concat"

        def merge_make(name):
            return _scan_like(name, chain_top.schema)

        def splice(m):
            if chain_top is work:
                return m
            return _replace(work, chain_top, m)

    stats = OocStats(split=split, base_live_bytes=_live_bytes())
    cap0 = None
    parts: list[pa.Table] = []
    part_rows = 0
    try:
        for chunk, start in provider.iter_chunks(needed_cols):
            dt = DeviceTable.from_arrow(chunk, device=engine.device)
            if cap0 is None:
                cap0 = dt.capacity
            elif dt.capacity != cap0:
                dt = _repad(dt, cap0)
            catalog.register(chunk_name, MemoryProvider(dt))
            out = engine.executor.execute(partial_plan)
            parts.append(out.to_arrow())
            part_rows += out.nrows
            stats.chunks += 1
            stats.rows_scanned += chunk.num_rows
            stats.peak_live_bytes = max(stats.peak_live_bytes,
                                        _live_bytes())
            if stop_rows is not None and part_rows >= stop_rows:
                break

        merged = pa.concat_tables(parts) if parts else None
        if merged is None:
            raise ExecutionError("chunked table produced no chunks")
        part_dt = DeviceTable.from_arrow(merged, device=engine.device)
        catalog.register(part_name, MemoryProvider(part_dt))
        final_plan = splice(merge_make(part_name))
        result = engine.executor.execute(final_plan)
        stats.peak_live_bytes = max(stats.peak_live_bytes, _live_bytes())
        return result
    finally:
        scan.table = orig_table
        catalog.deregister(chunk_name)
        catalog.deregister(part_name)
        engine.last_ooc = stats


def _scan_like(name: str, schema) -> L.Scan:
    # partial results round-trip through Arrow with finalize's
    # deduplicated column names — mirror that here so the merge scan
    # finds its columns
    names = _unique([f.name for f in schema])
    return L.Scan(name, tuple(
        dataclasses.replace(f, name=n) for f, n in zip(schema, names)))


def _unique(names):
    seen = {}
    out = []
    for n in names:
        if n in seen:
            seen[n] += 1
            out.append(f"{n}_{seen[n]}")
        else:
            seen[n] = 0
            out.append(n)
    return out


def _path_to(root, target):
    if root is target:
        return [root]
    for c in root.children():
        p = _path_to(c, target)
        if p is not None:
            return [root] + p
    return None


def _replace(root, target, new):
    if root is target:
        return new
    for attr in ("input", "left", "right"):
        c = getattr(root, attr, None)
        if isinstance(c, L.LogicalPlan):
            setattr(root, attr, _replace(c, target, new))
    if isinstance(root, L.Union):
        root.inputs = tuple(_replace(c, target, new) for c in root.inputs)
    return root


def _repad(dt: DeviceTable, cap: int) -> DeviceTable:
    import jax.numpy as jnp
    cols = {}
    for n, c in dt.columns.items():
        data = jnp.zeros((cap,), c.data.dtype).at[:c.capacity].set(c.data)
        valid = None
        if c.validity is not None:
            valid = jnp.zeros((cap,), jnp.bool_).at[:c.capacity].set(
                c.validity)
        cols[n] = Column(data=data, dtype=c.dtype, validity=valid,
                         dictionary=c.dictionary, stats=c.stats)
    return DeviceTable(cols, dt.nrows)
