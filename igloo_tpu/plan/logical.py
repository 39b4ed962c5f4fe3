"""Bound logical plan: typed expressions over positional schemas.

The reference's logical planning is DataFusion's (`LogicalPlan`), consumed
by Igloo's PhysicalPlanner (/root/reference/crates/engine/src/physical_planner.rs:23-140).
Here the logical plan is native and already *bound*: every column reference
is a positional index into the child's schema, and every expression carries
its SqlType + nullability, so lowering to kernels is mechanical.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

from ..dtypes import SqlType
from ..sql.ast import BinOp, JoinKind, UnOp


# --------------------------------------------------------------------------
# Schema
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Field:
    name: str
    dtype: SqlType
    nullable: bool = True
    table: Optional[str] = None     # qualifier for name resolution

    def __repr__(self):
        q = f"{self.table}." if self.table else ""
        n = "?" if self.nullable else ""
        return f"{q}{self.name}:{self.dtype.name}{n}"


Schema = tuple  # tuple[Field, ...]


# --------------------------------------------------------------------------
# Bound expressions
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BExpr:
    dtype: SqlType
    nullable: bool


@dataclasses.dataclass(frozen=True, repr=False)
class BColumn(BExpr):
    index: int
    name: str

    def __repr__(self):
        return f"#{self.index}({self.name})"


@dataclasses.dataclass(frozen=True, repr=False)
class BLiteral(BExpr):
    value: object

    def __repr__(self):
        return f"lit({self.value!r})"


@dataclasses.dataclass(frozen=True)
class BBinary(BExpr):
    op: BinOp
    left: BExpr
    right: BExpr


@dataclasses.dataclass(frozen=True)
class BUnary(BExpr):
    op: UnOp
    operand: BExpr


@dataclasses.dataclass(frozen=True)
class BIsNull(BExpr):
    operand: BExpr
    negated: bool


@dataclasses.dataclass(frozen=True)
class BIsDistinctFrom(BExpr):
    left: BExpr
    right: BExpr
    negated: bool


@dataclasses.dataclass(frozen=True)
class BCast(BExpr):
    operand: BExpr
    safe: bool


@dataclasses.dataclass(frozen=True)
class BCase(BExpr):
    whens: tuple          # ((bool_expr, value_expr), ...)
    else_: Optional[BExpr]


@dataclasses.dataclass(frozen=True)
class BInList(BExpr):
    operand: BExpr
    items: tuple
    negated: bool


@dataclasses.dataclass(frozen=True)
class BLike(BExpr):
    operand: BExpr
    pattern: str
    negated: bool
    case_insensitive: bool


@dataclasses.dataclass(frozen=True)
class BScalarFunc(BExpr):
    """Numeric/generic scalar function evaluated on device."""
    name: str
    args: tuple


@dataclasses.dataclass(frozen=True)
class BStringFunc(BExpr):
    """String→string or string→scalar function.

    Evaluated via dictionary transform: the host applies the function to the
    (small) dictionary and ships a per-code remap/lookup array to the device;
    the device does one gather per row. This is how `capitalize`
    (/root/reference/crates/engine/src/lib.rs:71-144) and upper/lower/length
    run at TPU speed.
    """
    name: str
    args: tuple
    udf: object = None   # optional host callable str->str|scalar


@dataclasses.dataclass(frozen=True)
class BScalarSubquery(BExpr):
    plan: "LogicalPlan"


# --------------------------------------------------------------------------
# Aggregates
# --------------------------------------------------------------------------

AGG_FUNCS = ("sum", "count", "min", "max", "avg", "stddev", "stddev_samp",
             "var", "var_samp", "first_value", "any_value",
             "median", "quantile", "string_agg")

# holistic aggregates need every raw row of the group in one place
# (value-sorted) — they never decompose into mergeable partials
HOLISTIC_AGGS = ("median", "quantile")

# host-assembled aggregates (string results need dictionary rebuilds);
# executed by the single-device runtime, never inside fused fragments
HOST_AGGS = ("string_agg",)


@dataclasses.dataclass(frozen=True)
class AggSpec:
    func: str                  # one of AGG_FUNCS or 'count_star'
    arg: Optional[BExpr]       # None for count(*)
    distinct: bool
    out_name: str
    out_dtype: SqlType
    out_nullable: bool
    param: Optional[float] = None   # quantile fraction
    text_param: Optional[str] = None  # string_agg separator


# --------------------------------------------------------------------------
# Plan nodes
# --------------------------------------------------------------------------

class LogicalPlan:
    schema: Schema

    def children(self) -> Sequence["LogicalPlan"]:
        return []

    def tree_str(self, indent: int = 0) -> str:
        pad = "  " * indent
        lines = [f"{pad}{self._describe()}"]
        for c in self.children():
            lines.append(c.tree_str(indent + 1))
        return "\n".join(lines)

    def _describe(self) -> str:
        return type(self).__name__


@dataclasses.dataclass
class Scan(LogicalPlan):
    table: str
    schema: Schema
    projection: Optional[tuple] = None   # column indices into the stored table

    def _describe(self):
        proj = f" proj={list(self.projection)}" if self.projection is not None else ""
        return f"Scan({self.table}{proj})"


@dataclasses.dataclass
class Values(LogicalPlan):
    """Literal rows (e.g. SELECT 42) — one row, no table.
    ≙ DataFusion's EmptyRelation+Projection path used by `SELECT 42 as answer`
    (/root/reference/crates/engine/src/lib.rs:156-184)."""
    schema: Schema
    rows: tuple                          # tuple of tuples of python values

    def _describe(self):
        return f"Values({len(self.rows)} rows)"


@dataclasses.dataclass
class Projection(LogicalPlan):
    input: LogicalPlan
    exprs: tuple                         # (BExpr, ...)
    schema: Schema

    def children(self):
        return [self.input]

    def _describe(self):
        return f"Projection({', '.join(f.name for f in self.schema)})"


@dataclasses.dataclass
class RenderString(LogicalPlan):
    """Host-rendered CAST(x AS VARCHAR): converts the given numeric /
    temporal / boolean input columns into order-preserving
    dictionary-coded STRING columns (one device→host→device round trip
    per query — the dictionary must be lexicographically sorted for the
    engine's string comparison/sort invariants, which no on-device
    representation of unbounded values can provide). Inserted by the
    optimizer's string-render hoist; never distributable."""
    input: LogicalPlan
    indices: tuple                       # input columns to render
    schema: Schema

    def children(self):
        return [self.input]

    def _describe(self):
        return f"RenderString(cols={list(self.indices)})"


@dataclasses.dataclass
class Filter(LogicalPlan):
    input: LogicalPlan
    predicate: BExpr

    @property
    def schema(self) -> Schema:
        return self.input.schema

    def children(self):
        return [self.input]

    def _describe(self):
        return f"Filter({self.predicate})"


@dataclasses.dataclass
class Join(LogicalPlan):
    left: LogicalPlan
    right: LogicalPlan
    kind: JoinKind
    left_keys: tuple                     # (BExpr over left schema, ...)
    right_keys: tuple
    residual: Optional[BExpr]            # non-equi part of ON, over joined schema
    schema: Schema
    # ANTI joins implement two SQL constructs with different NULL rules:
    # NOT IN (null_aware_anti=True: a NULL probe value, or any NULL among
    # the subquery's values, removes the row) and NOT EXISTS
    # (False: NULL keys simply never match, so such rows are KEPT)
    null_aware_anti: bool = True

    def children(self):
        return [self.left, self.right]

    def _describe(self):
        return f"Join({self.kind.value}, keys={len(self.left_keys)})"


@dataclasses.dataclass
class Aggregate(LogicalPlan):
    input: LogicalPlan
    group_exprs: tuple                   # (BExpr, ...)
    aggs: tuple                          # (AggSpec, ...)
    schema: Schema                       # group fields ++ agg fields

    def children(self):
        return [self.input]

    def _describe(self):
        return f"Aggregate(groups={len(self.group_exprs)}, aggs=[{', '.join(a.func for a in self.aggs)}])"


@dataclasses.dataclass(frozen=True)
class SortKey:
    expr: BExpr
    ascending: bool
    nulls_first: bool


@dataclasses.dataclass
class Sort(LogicalPlan):
    input: LogicalPlan
    keys: tuple                          # (SortKey, ...)
    limit: Optional[int] = None          # fused top-k

    @property
    def schema(self) -> Schema:
        return self.input.schema

    def children(self):
        return [self.input]

    def _describe(self):
        ks = ", ".join(
            f"{k.expr}{'' if k.ascending else ' DESC'}{' NF' if k.nulls_first else ''}"
            for k in self.keys)
        lim = f" limit={self.limit}" if self.limit is not None else ""
        return f"Sort({ks}{lim})"


@dataclasses.dataclass
class Limit(LogicalPlan):
    input: LogicalPlan
    limit: Optional[int]
    offset: int = 0

    @property
    def schema(self) -> Schema:
        return self.input.schema

    def children(self):
        return [self.input]

    def _describe(self):
        return f"Limit({self.limit}, offset={self.offset})"


@dataclasses.dataclass
class Distinct(LogicalPlan):
    input: LogicalPlan

    @property
    def schema(self) -> Schema:
        return self.input.schema

    def children(self):
        return [self.input]


@dataclasses.dataclass
class Union(LogicalPlan):
    inputs: tuple
    schema: Schema
    all: bool = True

    def children(self):
        return list(self.inputs)

    def _describe(self):
        return f"Union({'ALL' if self.all else 'DISTINCT'}, {len(self.inputs)} inputs)"


WINDOW_FUNCS = ("row_number", "rank", "dense_rank", "percent_rank",
                "cume_dist", "ntile", "lag", "lead",
                "first_value", "last_value", "nth_value",
                "sum", "count", "avg", "min", "max")


@dataclasses.dataclass(frozen=True)
class WindowFuncSpec:
    func: str
    arg: Optional[BExpr]          # None for row_number/rank/dense_rank
    offset: int                   # lag/lead distance, ntile buckets, nth n
    out_name: str
    out_dtype: SqlType
    out_nullable: bool
    # normalized frame: None = SQL default (RANGE UNBOUNDED PRECEDING →
    # CURRENT ROW with ORDER BY, whole partition without); else
    # ("rows"|"range", (kind, n), (kind, n)) — see sql/ast.py WindowCall
    frame: Optional[tuple] = None


@dataclasses.dataclass
class Window(LogicalPlan):
    """Window computation: appends one column per window function.

    All functions share one (PARTITION BY, ORDER BY) clause; output row
    order is unspecified (rows come back partition-sorted), matching SQL.
    Default frame semantics: with ORDER BY, RANGE UNBOUNDED PRECEDING →
    CURRENT ROW (running, peers included); without, the whole partition.
    """
    input: LogicalPlan
    partition_exprs: tuple        # (BExpr, ...)
    order_keys: tuple             # (SortKey, ...)
    specs: tuple                  # (WindowFuncSpec, ...)
    schema: Schema                # input schema ++ window fields

    def children(self):
        return [self.input]

    def _describe(self):
        return (f"Window([{', '.join(s.func for s in self.specs)}], "
                f"partitions={len(self.partition_exprs)}, "
                f"order={len(self.order_keys)})")


# --------------------------------------------------------------------------
# expression tree utilities
# --------------------------------------------------------------------------

def expr_children(e: BExpr) -> tuple:
    if isinstance(e, BBinary):
        return (e.left, e.right)
    if isinstance(e, BIsDistinctFrom):
        return (e.left, e.right)
    if isinstance(e, (BUnary, BIsNull, BCast, BLike)):
        return (e.operand,)
    if isinstance(e, BInList):
        return (e.operand,) + e.items
    if isinstance(e, BCase):
        out = []
        for c, v in e.whens:
            out.extend((c, v))
        if e.else_ is not None:
            out.append(e.else_)
        return tuple(out)
    if isinstance(e, (BScalarFunc, BStringFunc)):
        return e.args
    return ()


def walk_expr(e: BExpr):
    yield e
    for c in expr_children(e):
        yield from walk_expr(c)


def referenced_columns(e: BExpr) -> set[int]:
    return {n.index for n in walk_expr(e) if isinstance(n, BColumn)}


def rewrite_expr(e: BExpr, fn):
    """Bottom-up rewrite: fn is applied to each node after its children."""
    if isinstance(e, BBinary):
        e = dataclasses.replace(e, left=rewrite_expr(e.left, fn),
                                right=rewrite_expr(e.right, fn))
    elif isinstance(e, BIsDistinctFrom):
        e = dataclasses.replace(e, left=rewrite_expr(e.left, fn),
                                right=rewrite_expr(e.right, fn))
    elif isinstance(e, (BUnary, BIsNull, BCast, BLike)):
        e = dataclasses.replace(e, operand=rewrite_expr(e.operand, fn))
    elif isinstance(e, BInList):
        e = dataclasses.replace(
            e, operand=rewrite_expr(e.operand, fn),
            items=tuple(rewrite_expr(i, fn) for i in e.items))
    elif isinstance(e, BCase):
        e = dataclasses.replace(
            e,
            whens=tuple((rewrite_expr(c, fn), rewrite_expr(v, fn)) for c, v in e.whens),
            else_=rewrite_expr(e.else_, fn) if e.else_ is not None else None)
    elif isinstance(e, (BScalarFunc, BStringFunc)):
        e = dataclasses.replace(e, args=tuple(rewrite_expr(a, fn) for a in e.args))
    return fn(e)


def shift_columns(e: BExpr, delta: int) -> BExpr:
    """Shift all column indices by delta (for join schema concatenation)."""
    def fn(n):
        if isinstance(n, BColumn):
            return dataclasses.replace(n, index=n.index + delta)
        return n
    return rewrite_expr(e, fn)
