"""Name resolution + type checking: SQL AST → bound logical plan.

Replaces DataFusion's SQL planner (the front half of the reference's
working path, /root/reference/crates/engine/src/lib.rs:54-57) with a
native binder. Produces the LogicalPlan/BExpr trees in plan/logical.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from ..dtypes import SqlType, common_type
from ..errors import BindError, NotSupportedError
from ..functions import FunctionRegistry
from ..sql import ast
from .logical import (
    AGG_FUNCS, WINDOW_FUNCS, AggSpec, BBinary, BCase, BCast, BColumn, BExpr, BInList,
    BIsDistinctFrom, BIsNull, BLike, BLiteral, BScalarFunc, BScalarSubquery,
    BStringFunc, BUnary, Distinct, Field, Filter, Join, Limit, LogicalPlan,
    Projection, Scan, Sort, SortKey, Union, Values, Window, WindowFuncSpec,
    walk_expr,
)

_TYPE_NAMES = {
    "bigint": SqlType.INT64, "int8": SqlType.INT64, "long": SqlType.INT64,
    "int": SqlType.INT32, "integer": SqlType.INT32, "int4": SqlType.INT32,
    "smallint": SqlType.INT32, "tinyint": SqlType.INT32,
    "double": SqlType.FLOAT64, "double precision": SqlType.FLOAT64,
    "float8": SqlType.FLOAT64, "real": SqlType.FLOAT32, "float4": SqlType.FLOAT32,
    "float": SqlType.FLOAT64, "decimal": SqlType.FLOAT64, "numeric": SqlType.FLOAT64,
    "boolean": SqlType.BOOL, "bool": SqlType.BOOL,
    "varchar": SqlType.STRING, "text": SqlType.STRING, "string": SqlType.STRING,
    "char": SqlType.STRING, "date": SqlType.DATE32, "timestamp": SqlType.TIMESTAMP,
}

_CMP_OPS = (ast.BinOp.EQ, ast.BinOp.NEQ, ast.BinOp.LT, ast.BinOp.LTE,
            ast.BinOp.GT, ast.BinOp.GTE)
_ARITH_OPS = (ast.BinOp.ADD, ast.BinOp.SUB, ast.BinOp.MUL, ast.BinOp.DIV,
              ast.BinOp.MOD)
_LOGIC_OPS = (ast.BinOp.AND, ast.BinOp.OR)


class Scope:
    """Resolution environment: an ordered list of qualified fields."""

    def __init__(self, fields: list[Field]):
        self.fields = list(fields)

    def resolve(self, name: str, table: Optional[str]) -> int:
        hits = [
            i for i, f in enumerate(self.fields)
            if f.name == name and (table is None or f.table == table)
        ]
        if not hits:
            where = f"{table}.{name}" if table else name
            known = ", ".join(
                (f"{f.table}.{f.name}" if f.table else f.name) for f in self.fields)
            raise BindError(f"column {where!r} not found (available: {known})")
        if len(hits) > 1 and table is None:
            raise BindError(f"column {name!r} is ambiguous; qualify it")
        return hits[0]

    def schema(self) -> tuple:
        return tuple(self.fields)


def _infer_literal(value) -> tuple[SqlType, bool]:
    if value is None:
        return SqlType.NULL, True
    if isinstance(value, bool):
        return SqlType.BOOL, False
    if isinstance(value, int):
        return SqlType.INT64, False
    if isinstance(value, float):
        return SqlType.FLOAT64, False
    if isinstance(value, str):
        return SqlType.STRING, False
    raise BindError(f"unsupported literal {value!r}")


class Binder:
    def __init__(self, catalog, functions: FunctionRegistry):
        self.catalog = catalog          # .table_schema(name) -> tuple[Field,...]
        self.functions = functions
        self.ctes: dict[str, LogicalPlan] = {}

    # ================= statements =================

    def bind(self, node) -> LogicalPlan:
        if isinstance(node, ast.Select):
            return self.bind_select(node)
        if isinstance(node, ast.SetOp):
            return self.bind_setop(node)
        raise NotSupportedError(f"cannot bind {type(node).__name__}")

    def bind_setop(self, node: ast.SetOp) -> LogicalPlan:
        saved = dict(self.ctes)
        try:
            for name, sub in node.ctes:
                self.ctes[name.lower()] = self.bind(sub)
            left = self.bind(node.left)
            right = self.bind(node.right)
        finally:
            self.ctes = saved
        if len(left.schema) != len(right.schema):
            raise BindError("UNION inputs must have the same number of columns")
        fields = []
        for lf, rf in zip(left.schema, right.schema):
            dt = common_type(lf.dtype, rf.dtype)
            fields.append(Field(lf.name, dt, lf.nullable or rf.nullable))
        schema = tuple(fields)
        if node.kind in (ast.SetOpKind.UNION, ast.SetOpKind.UNION_ALL):
            plan: LogicalPlan = Union((left, right), schema, all=True)
            if node.kind is ast.SetOpKind.UNION:
                plan = Distinct(plan)
        elif node.kind in (ast.SetOpKind.INTERSECT, ast.SetOpKind.EXCEPT):
            plan = self._bind_intersect_except(left, right, schema, node.kind)
        else:
            plan = self._bind_intersect_except_all(left, right, schema,
                                                   node.kind)
        if node.order_by:
            scope = Scope(list(schema))
            keys = tuple(self._bind_order_item(o, scope, None) for o in node.order_by)
            plan = Sort(plan, keys)
        if node.limit is not None or node.offset is not None:
            plan = Limit(plan, node.limit, node.offset or 0)
        return plan

    # ================= SELECT =================

    def bind_select(self, sel: ast.Select) -> LogicalPlan:
        saved = dict(self.ctes)
        try:
            for name, sub in sel.ctes:
                self.ctes[name.lower()] = self.bind(sub)
            return self._bind_select_body(sel)
        finally:
            self.ctes = saved

    def _bind_select_body(self, sel: ast.Select) -> LogicalPlan:
        # ---- FROM ----
        if sel.from_ is None:
            plan: LogicalPlan = Values(schema=(), rows=((),))
            scope = Scope([])
        else:
            plan, scope = self.bind_relation(sel.from_)

        # ---- WHERE ----
        if sel.where is not None:
            normal = []
            extra_preds = []     # bound preds over the (join-extended) schema
            for conj in _split_and(sel.where):
                sub = self._try_subquery_conjunct(conj)
                if sub is not None:
                    plan = self._bind_subquery_join(plan, scope, *sub)
                    continue
                scalar = self._try_decorrelate_scalar_cmp(plan, scope, conj)
                if scalar is not None:
                    plan, pred = scalar
                    extra_preds.append(pred)
                    continue
                normal.append(conj)
            preds = [self.bind_expr(c, scope) for c in normal] + extra_preds
            for p_ in preds:
                if p_.dtype not in (SqlType.BOOL, SqlType.NULL):
                    raise BindError("WHERE predicate must be boolean")
            if preds:
                pred = preds[0]
                for p_ in preds[1:]:
                    pred = BBinary(SqlType.BOOL,
                                   pred.nullable or p_.nullable,
                                   ast.BinOp.AND, pred, p_)
                plan = Filter(plan, pred)

        # ---- expand stars, collect select items ----
        items: list[tuple[ast.Expr, str]] = []
        for it in sel.items:
            e = it.expr
            if isinstance(e, ast.Star):
                for i, f in enumerate(scope.fields):
                    if e.table is None or f.table == e.table:
                        items.append((ast.ColumnRef(f.name, f.table), f.name))
                if not items:
                    raise BindError(f"no columns for {e.table}.*")
            else:
                items.append((e, it.alias or _auto_name(e)))

        # ---- aggregate detection ----
        has_aggs = any(
            self._contains_agg(e) for e, _ in items
        ) or (sel.having is not None and self._contains_agg(sel.having)) or bool(sel.group_by)

        agg_rebind = None
        if has_aggs:
            plan, scope, items, having, agg_rebind = self._bind_aggregate(
                sel, plan, scope, items)
        else:
            having = None
            if sel.having is not None:
                raise BindError("HAVING requires GROUP BY or aggregates")

        if having is not None:
            plan = Filter(plan, having)

        # ---- window functions ----
        win_calls: list[ast.WindowCall] = []

        def collect_windows(e):
            if isinstance(e, ast.WindowCall):
                if e not in win_calls:
                    win_calls.append(e)
                return
            for c in _ast_children(e):
                collect_windows(c)

        for e, _ in items:
            collect_windows(e)
        if win_calls:
            plan, scope, items = self._bind_window(plan, scope, items,
                                                   win_calls)

        # ---- projection ----
        proj_exprs = [self.bind_expr(e, scope) for e, _ in items]
        out_fields = [
            Field(name, ex.dtype, ex.nullable)
            for (_, name), ex in zip(items, proj_exprs)
        ]

        # ---- ORDER BY (may reference aliases, ordinals, or input columns) ----
        sort_keys: list[SortKey] = []
        hidden: list[BExpr] = []
        if sel.order_by:
            out_scope = Scope(list(out_fields))
            for o in sel.order_by:
                key_expr = self._resolve_order_expr(o.expr, items, out_scope,
                                                    scope, agg_rebind)
                if isinstance(key_expr, int):        # index into projection output
                    bexpr = proj_exprs[key_expr]
                    pos = key_expr
                else:                                # expression over input scope
                    bexpr = key_expr
                    pos = None
                    # append as hidden projection column if not already projected
                    for i, pe in enumerate(proj_exprs):
                        if pe == bexpr:
                            pos = i
                            break
                    if pos is None:
                        pos = len(proj_exprs)
                        proj_exprs.append(bexpr)
                        hidden.append(bexpr)
                        out_fields.append(Field(f"__sort_{len(hidden)}", bexpr.dtype,
                                                bexpr.nullable))
                nf = o.nulls_first
                if nf is None:
                    nf = not o.ascending   # Postgres default: NULLS LAST asc, FIRST desc
                sort_keys.append(SortKey(
                    BColumn(bexpr.dtype, bexpr.nullable, pos, out_fields[pos].name),
                    o.ascending, nf))

        plan = Projection(plan, tuple(proj_exprs), tuple(out_fields))

        if sel.distinct:
            if hidden:
                raise BindError("ORDER BY expressions must appear in SELECT DISTINCT list")
            plan = Distinct(plan)

        if sort_keys:
            plan = Sort(plan, tuple(sort_keys))
            if hidden:  # drop hidden sort columns
                keep = len(out_fields) - len(hidden)
                cols = tuple(
                    BColumn(f.dtype, f.nullable, i, f.name)
                    for i, f in enumerate(out_fields[:keep]))
                plan = Projection(plan, cols, tuple(out_fields[:keep]))

        if sel.limit is not None or sel.offset is not None:
            plan = Limit(plan, sel.limit, sel.offset or 0)
        return plan

    # ---- aggregate planning ----

    def _bind_aggregate(self, sel, plan, scope, items):
        from .logical import Aggregate

        # resolve GROUP BY expressions (ordinals / aliases / exprs)
        group_asts: list[ast.Expr] = []
        for g in sel.group_by:
            if isinstance(g, ast.Literal) and isinstance(g.value, int):
                idx = g.value - 1
                if not (0 <= idx < len(items)):
                    raise BindError(f"GROUP BY ordinal {g.value} out of range")
                group_asts.append(items[idx][0])
            elif isinstance(g, ast.ColumnRef) and g.table is None and not any(
                    f.name == g.name for f in scope.fields):
                # alias reference
                for e, name in items:
                    if name == g.name:
                        group_asts.append(e)
                        break
                else:
                    raise BindError(f"GROUP BY column {g.name!r} not found")
            else:
                group_asts.append(g)

        group_bound = [self.bind_expr(g, scope) for g in group_asts]

        # collect aggregate calls from select items + having + order by
        agg_calls: list[ast.FunctionCall] = []

        def collect(e):
            for fc in self._iter_agg_calls(e):
                if fc not in agg_calls:
                    agg_calls.append(fc)

        for e, _ in items:
            collect(e)
        if sel.having is not None:
            collect(sel.having)
        for o in sel.order_by:
            collect(o.expr)

        specs: list[AggSpec] = []
        for i, fc in enumerate(agg_calls):
            specs.append(self._bind_agg_call(fc, scope, f"__agg_{i}"))

        sets = sel.group_sets
        grouping_calls: list[ast.FunctionCall] = []
        grouping_idx: list[int] = []
        if sets is not None:
            # GROUPING(expr) markers referenced anywhere in the output
            def collect_grouping(e):
                if isinstance(e, ast.FunctionCall) and e.name == "grouping":
                    if e not in grouping_calls:
                        grouping_calls.append(e)
                    return
                for c in _ast_children(e):
                    collect_grouping(c)

            for e, _ in items:
                collect_grouping(e)
            if sel.having is not None:
                collect_grouping(sel.having)
            for o in sel.order_by:
                collect_grouping(o.expr)
            for fc in grouping_calls:
                if len(fc.args) != 1:
                    raise BindError("grouping(expr) takes one argument")
                for i, g_ast in enumerate(group_asts):
                    if fc.args[0] == g_ast:
                        grouping_idx.append(i)
                        break
                else:
                    raise BindError(
                        "grouping() argument must be a GROUP BY expression")

        ng = len(group_bound)
        group_fields = [
            Field(_auto_name(g_ast), g.dtype,
                  g.nullable or (sets is not None
                                 and any(i not in s for s in sets)))
            for i, (g_ast, g) in enumerate(zip(group_asts, group_bound))
        ]
        agg_fields = [
            Field(s.out_name, s.out_dtype, s.out_nullable) for s in specs
        ]
        grouping_fields = [Field(f"__grouping_{k}", SqlType.INT64, False)
                           for k in range(len(grouping_calls))]
        agg_schema = tuple(group_fields + agg_fields + grouping_fields)

        if sets is None:
            plan = Aggregate(plan, tuple(group_bound), tuple(specs),
                             agg_schema)
        else:
            # ROLLUP/CUBE/GROUPING SETS desugar: one Aggregate per set,
            # each projected onto the unified layout (omitted group
            # columns → typed NULLs, GROUPING() markers → 0/1 literals),
            # UNION ALL of the branches. (DataFusion — the reference's
            # SQL engine substrate — executes grouping sets similarly.)
            import copy as _copy
            branches = []
            for s in sets:
                sub_groups = tuple(group_bound[i] for i in s)
                sub_gf = [group_fields[i] for i in s]
                sub_schema = tuple(sub_gf) + tuple(agg_fields)
                # each branch owns a copy of the input subtree — the
                # optimizer prunes/mutates plans in place, so Union
                # branches must not alias nodes
                agg_node = Aggregate(_copy.deepcopy(plan), sub_groups,
                                     tuple(specs), sub_schema)
                proj_exprs: list[BExpr] = []
                for i in range(ng):
                    if i in s:
                        pos = s.index(i)
                        f = sub_schema[pos]
                        proj_exprs.append(
                            BColumn(f.dtype, group_fields[i].nullable, pos,
                                    f.name))
                    else:
                        proj_exprs.append(
                            BLiteral(group_fields[i].dtype, True, None))
                for j in range(len(specs)):
                    f = sub_schema[len(s) + j]
                    proj_exprs.append(
                        BColumn(f.dtype, f.nullable, len(s) + j, f.name))
                for gi in grouping_idx:
                    proj_exprs.append(
                        BLiteral(SqlType.INT64, False,
                                 0 if gi in s else 1))
                branches.append(
                    Projection(agg_node, tuple(proj_exprs), agg_schema))
            plan = Union(tuple(branches), agg_schema, all=True)

        # Rebind select/having/order expressions over the aggregate output:
        # occurrences of a group expr AST → BColumn(i); agg call → BColumn(g+j).
        agg_scope = _AggScope(list(agg_schema))

        def rewrite(e: ast.Expr) -> ast.Expr:
            if (sets is not None and isinstance(e, ast.FunctionCall)
                    and e.name == "grouping" and e in grouping_calls):
                k = grouping_calls.index(e)
                f = agg_schema[ng + len(specs) + k]
                return _PreBound(BColumn(f.dtype, f.nullable,
                                         ng + len(specs) + k, f.name))
            for i, g_ast in enumerate(group_asts):
                if e == g_ast:
                    f = agg_schema[i]
                    return _PreBound(BColumn(f.dtype, f.nullable, i, f.name))
            if isinstance(e, ast.FunctionCall) and self._is_agg(e):
                j = agg_calls.index(e)
                f = agg_schema[ng + j]
                return _PreBound(BColumn(f.dtype, f.nullable, ng + j, f.name))
            return _rebuild_ast(e, [rewrite(c) for c in _ast_children(e)])

        def rebind(e: ast.Expr) -> BExpr:
            return self.bind_expr(rewrite(e), agg_scope)

        # items keep their (rewritten) AST form: window binding still needs
        # to see WindowCall nodes; final binding happens at projection time
        new_items = [(rewrite(e), name) for e, name in items]
        having = rebind(sel.having) if sel.having is not None else None

        new_scope = _AggOutScope(list(agg_schema))
        return plan, new_scope, new_items, having, rebind

    def _bind_window(self, plan, scope, items, win_calls):
        # calls sharing one (PARTITION BY, ORDER BY) clause compute in one
        # Window node (one partition sort); distinct clauses stack Window
        # nodes — appended output columns keep earlier indices valid
        groups: list[list] = []
        for w in win_calls:
            for grp in groups:
                if (grp[0].partition_by == w.partition_by
                        and grp[0].order_by == w.order_by):
                    grp.append(w)
                    break
            else:
                groups.append([w])

        placed: list[tuple] = []   # (call, column index, Field)
        for gi, calls in enumerate(groups):
            first = calls[0]
            partition = tuple(self.bind_expr(e, scope)
                              for e in first.partition_by)
            order_keys = tuple(self._bind_order_item(o, scope, None)
                               for o in first.order_by)
            specs = [self._bind_window_func(w, scope, f"__win_{gi}_{j}",
                                            bool(order_keys))
                     for j, w in enumerate(calls)]
            base = len(scope.fields)
            win_fields = [Field(s.out_name, s.out_dtype, s.out_nullable)
                          for s in specs]
            schema = tuple(scope.fields) + tuple(win_fields)
            plan = Window(plan, partition, order_keys, tuple(specs), schema)
            scope = Scope(list(schema))
            for j, w in enumerate(calls):
                placed.append((w, base + j, win_fields[j]))

        def rewrite(e):
            if isinstance(e, ast.WindowCall):
                for w, idx, f in placed:
                    if w == e:
                        return _PreBound(BColumn(f.dtype, f.nullable, idx,
                                                 f.name))
            return _rebuild_ast(e, [rewrite(c) for c in _ast_children(e)])

        new_items = [(rewrite(e), name) for e, name in items]
        return plan, scope, new_items

    _NO_FRAME_FUNCS = ("row_number", "rank", "dense_rank", "percent_rank",
                       "cume_dist", "ntile", "lag", "lead")

    def _bind_window_func(self, w: ast.WindowCall, scope, out_name: str,
                          has_order: bool) -> WindowFuncSpec:
        name = w.func
        frame = w.frame
        if frame is not None:
            if name in self._NO_FRAME_FUNCS:
                raise BindError(f"{name}() does not accept a frame clause")
            unit, start, end = frame
            if unit == "range" and ("p" in (start[0], end[0])
                                    or "f" in (start[0], end[0])):
                raise NotSupportedError(
                    "RANGE frames with numeric offsets are not supported "
                    "yet (use ROWS)")
            if start[0] == "uf":
                raise BindError(
                    "frame start cannot be UNBOUNDED FOLLOWING")
            if end[0] == "up":
                raise BindError("frame end cannot be UNBOUNDED PRECEDING")

        def int_literal(lit, what, minimum):
            if not (isinstance(lit, ast.Literal)
                    and isinstance(lit.value, int)):
                raise BindError(f"{name}() {what} must be an integer literal")
            if lit.value < minimum:
                raise BindError(f"{name}() {what} must be >= {minimum}")
            return lit.value

        if name in ("row_number", "rank", "dense_rank", "percent_rank",
                    "cume_dist"):
            if w.args:
                raise BindError(f"{name}() takes no arguments")
            if name != "row_number" and not has_order:
                raise BindError(f"{name}() requires ORDER BY")
            dt = (SqlType.FLOAT64 if name in ("percent_rank", "cume_dist")
                  else SqlType.INT64)
            return WindowFuncSpec(name, None, 0, out_name, dt, False)
        if name == "ntile":
            if len(w.args) != 1:
                raise BindError("ntile(n)")
            n = int_literal(w.args[0], "bucket count", 1)
            return WindowFuncSpec(name, None, n, out_name, SqlType.INT64,
                                  False)
        if name in ("lag", "lead"):
            if not (1 <= len(w.args) <= 2):
                raise BindError(f"{name}(expr [, offset])")
            if not has_order:
                raise BindError(f"{name}() requires ORDER BY")
            arg = self.bind_expr(w.args[0], scope)
            off = 1 if len(w.args) == 1 else int_literal(w.args[1],
                                                         "offset", 0)
            return WindowFuncSpec(name, arg, off, out_name, arg.dtype, True)
        if name in ("first_value", "last_value"):
            if len(w.args) != 1:
                raise BindError(f"{name}(expr)")
            arg = self.bind_expr(w.args[0], scope)
            return WindowFuncSpec(name, arg, 0, out_name, arg.dtype, True,
                                  frame)
        if name == "nth_value":
            if len(w.args) != 2:
                raise BindError("nth_value(expr, n)")
            arg = self.bind_expr(w.args[0], scope)
            n = int_literal(w.args[1], "n", 1)
            return WindowFuncSpec(name, arg, n, out_name, arg.dtype, True,
                                  frame)
        if name in ("sum", "count", "avg", "min", "max"):
            if name == "count" and len(w.args) == 1 \
                    and isinstance(w.args[0], ast.Star):
                return WindowFuncSpec("count_star", None, 0, out_name,
                                      SqlType.INT64, False, frame)
            if len(w.args) != 1:
                raise BindError(f"window {name}() takes one argument")
            arg = self.bind_expr(w.args[0], scope)
            if name == "count":
                dt, nl = SqlType.INT64, False
            elif name == "sum":
                dt = (SqlType.INT64 if arg.dtype.is_integer
                      else SqlType.FLOAT64)
                nl = True
            elif name == "avg":
                dt, nl = SqlType.FLOAT64, True
            else:
                dt, nl = arg.dtype, True
            return WindowFuncSpec(name, arg, 0, out_name, dt, nl, frame)
        raise NotSupportedError(f"window function {name}()")

    def _bind_agg_call(self, fc: ast.FunctionCall, scope: Scope, out_name: str) -> AggSpec:
        name = fc.name
        if name == "count" and len(fc.args) == 1 and isinstance(fc.args[0], ast.Star):
            return AggSpec("count_star", None, False, out_name, SqlType.INT64, False)
        if name == "quantile":
            if len(fc.args) != 2:
                raise BindError("quantile(expr, fraction)")
            arg = self.bind_expr(fc.args[0], scope)
            qlit = fc.args[1]
            if not (isinstance(qlit, ast.Literal)
                    and isinstance(qlit.value, (int, float))
                    and 0 <= qlit.value <= 1):
                raise BindError("quantile() fraction must be a literal in [0, 1]")
            if not arg.dtype.is_numeric:
                raise BindError(f"quantile() over {arg.dtype.name} not supported")
            return AggSpec("quantile", arg, False, out_name, SqlType.FLOAT64,
                           True, float(qlit.value))
        if name == "string_agg":
            if len(fc.args) != 2:
                raise BindError("string_agg(expr, separator)")
            arg = self.bind_expr(fc.args[0], scope)
            sep = fc.args[1]
            if not (isinstance(sep, ast.Literal)
                    and isinstance(sep.value, str)):
                raise BindError("string_agg() separator must be a string "
                                "literal")
            if not arg.dtype.is_string:
                raise BindError("string_agg() expects a string argument "
                                "(CAST(x AS VARCHAR) first)")
            return AggSpec("string_agg", arg, fc.distinct, out_name,
                           SqlType.STRING, True, text_param=sep.value)
        if len(fc.args) != 1:
            raise BindError(f"{name}() takes exactly one argument")
        arg = self.bind_expr(fc.args[0], scope)
        if name == "median":
            if not arg.dtype.is_numeric:
                raise BindError(f"median() over {arg.dtype.name} not supported")
            return AggSpec("quantile", arg, False, out_name, SqlType.FLOAT64,
                           True, 0.5)
        if name == "count":
            return AggSpec("count", arg, fc.distinct, out_name, SqlType.INT64, False)
        if name in ("sum",):
            if arg.dtype.is_integer:
                out = SqlType.INT64
            elif arg.dtype.is_float:
                out = SqlType.FLOAT64
            else:
                raise BindError(f"sum() over {arg.dtype.name} not supported")
            return AggSpec("sum", arg, fc.distinct, out_name, out, True)
        if name == "avg":
            if not arg.dtype.is_numeric:
                raise BindError(f"avg() over {arg.dtype.name} not supported")
            return AggSpec("avg", arg, fc.distinct, out_name, SqlType.FLOAT64, True)
        if name in ("min", "max"):
            if not (arg.dtype.is_numeric or arg.dtype.is_string or arg.dtype.is_temporal
                    or arg.dtype is SqlType.BOOL):
                raise BindError(f"{name}() over {arg.dtype.name} not supported")
            return AggSpec(name, arg, False, out_name, arg.dtype, True)
        if name in ("stddev", "stddev_samp", "var", "var_samp"):
            if not arg.dtype.is_numeric:
                raise BindError(f"{name}() over {arg.dtype.name} not supported")
            canon = {"stddev": "stddev", "stddev_samp": "stddev",
                     "var": "var", "var_samp": "var"}[name]
            return AggSpec(canon, arg, False, out_name, SqlType.FLOAT64, True)
        if name in ("first_value", "any_value"):
            return AggSpec("any_value", arg, False, out_name, arg.dtype, True)
        raise NotSupportedError(f"aggregate function {name}() not supported")

    def _is_agg(self, e) -> bool:
        return (isinstance(e, ast.FunctionCall)
                and (e.name in AGG_FUNCS or e.name == "count"))

    def _contains_agg(self, e: ast.Expr) -> bool:
        return any(True for _ in self._iter_agg_calls(e))

    def _iter_agg_calls(self, e):
        if isinstance(e, ast.FunctionCall) and self._is_agg(e):
            yield e
            return
        for c in _ast_children(e):
            yield from self._iter_agg_calls(c)

    # ---- ORDER BY resolution ----

    def _resolve_order_expr(self, e: ast.Expr, items, out_scope: Scope,
                            in_scope: Scope, agg_rebind=None):
        """Return either an int (projection output ordinal) or a BExpr over in_scope."""
        if isinstance(e, ast.Literal) and isinstance(e.value, int):
            idx = e.value - 1
            if not (0 <= idx < len(items)):
                raise BindError(f"ORDER BY ordinal {e.value} out of range")
            return idx
        if isinstance(e, ast.ColumnRef) and e.table is None:
            for i, (_, name) in enumerate(items):
                if name == e.name:
                    return i
        # match full expression against select items
        for i, (item_e, _) in enumerate(items):
            if isinstance(item_e, _PreBound):
                continue
            if e == item_e:
                return i
        # else bind over the input scope (pre-projection columns)
        if agg_rebind is not None:
            return agg_rebind(e)
        return self.bind_expr(e, in_scope)

    def _bind_order_item(self, o: ast.OrderItem, scope: Scope, _) -> SortKey:
        b = self.bind_expr(o.expr, scope)
        nf = o.nulls_first
        if nf is None:
            nf = not o.ascending
        return SortKey(b, o.ascending, nf)

    def _bind_intersect_except(self, left: LogicalPlan, right: LogicalPlan,
                               schema, kind) -> LogicalPlan:
        """INTERSECT / EXCEPT via side-tagged grouping.

        Rows from both sides are tagged, unioned, and grouped on every
        column; groups are kept by per-side counts. GROUP BY equates
        NULLs, matching SQL set-operation semantics (unlike join-key
        equality, where NULL never matches).
        """
        from .logical import Aggregate, AggSpec

        def tagged(plan: LogicalPlan, tag: int) -> LogicalPlan:
            exprs = tuple(
                BColumn(f.dtype, f.nullable, i, f.name)
                for i, f in enumerate(plan.schema)
            ) + (BLiteral(SqlType.INT64, False, tag),)
            out_schema = tuple(
                Field(f.name, s.dtype, s.nullable)
                for f, s in zip(schema, plan.schema)
            ) + (Field("__side", SqlType.INT64, False),)
            # cast columns to the unified schema dtype via projection
            cast_exprs = []
            for e_, f in zip(exprs[:-1], schema):
                if e_.dtype != f.dtype:
                    cast_exprs.append(BCast(f.dtype, e_.nullable, e_, False))
                else:
                    cast_exprs.append(e_)
            return Projection(plan, tuple(cast_exprs) + (exprs[-1],),
                              tuple(Field(f.name, f.dtype, sf.nullable)
                                    for f, sf in zip(schema, plan.schema))
                              + (Field("__side", SqlType.INT64, False),))

        tl = tagged(left, 1)
        tr = tagged(right, 0)
        u_schema = tl.schema
        u = Union((tl, tr), u_schema, all=True)

        ncols = len(schema)
        group_exprs = tuple(
            BColumn(f.dtype, f.nullable, i, f.name)
            for i, f in enumerate(u_schema[:ncols]))
        tag_col = BColumn(SqlType.INT64, False, ncols, "__side")
        aggs = (
            AggSpec("sum", tag_col, False, "__lcnt", SqlType.INT64, True),
            AggSpec("count_star", None, False, "__total", SqlType.INT64, False),
        )
        agg_schema = tuple(schema) + (
            Field("__lcnt", SqlType.INT64, True),
            Field("__total", SqlType.INT64, False))
        plan: LogicalPlan = Aggregate(u, group_exprs, aggs, agg_schema)

        lcnt = BColumn(SqlType.INT64, True, ncols, "__lcnt")
        total = BColumn(SqlType.INT64, False, ncols + 1, "__total")
        zero = BLiteral(SqlType.INT64, False, 0)
        has_left = BBinary(SqlType.BOOL, True, ast.BinOp.GT, lcnt, zero)
        rcnt = BBinary(SqlType.INT64, True, ast.BinOp.SUB, total, lcnt)
        if kind is ast.SetOpKind.INTERSECT:
            cond = BBinary(SqlType.BOOL, True, ast.BinOp.AND, has_left,
                           BBinary(SqlType.BOOL, True, ast.BinOp.GT, rcnt, zero))
        else:  # EXCEPT
            cond = BBinary(SqlType.BOOL, True, ast.BinOp.AND, has_left,
                           BBinary(SqlType.BOOL, True, ast.BinOp.EQ, rcnt, zero))
        plan = Filter(plan, cond)
        # project the tag columns away
        out_exprs = tuple(
            BColumn(f.dtype, f.nullable, i, f.name)
            for i, f in enumerate(schema))
        return Projection(plan, out_exprs, tuple(schema))

    def _bind_intersect_except_all(self, left: LogicalPlan,
                                   right: LogicalPlan, schema,
                                   kind) -> LogicalPlan:
        """INTERSECT ALL / EXCEPT ALL — bag semantics via windowed
        multiplicities over the side-tagged union:

        per key (= every column, NULL-equating like GROUP BY):
          lcnt = Σ side, rcnt = count(*) − lcnt, and per-side duplicate
          rank rn (row_number partitioned by key AND side). Left rows
          with rn ≤ rcnt give min(l, r) copies (INTERSECT ALL); rows
          with rn > rcnt give max(l − r, 0) copies (EXCEPT ALL).
        """
        def tagged(plan: LogicalPlan, tag: int) -> LogicalPlan:
            exprs = []
            for i, (f, sf) in enumerate(zip(schema, plan.schema)):
                e = BColumn(sf.dtype, sf.nullable, i, f.name)
                if sf.dtype != f.dtype:
                    e = BCast(f.dtype, sf.nullable, e, False)
                exprs.append(e)
            exprs.append(BLiteral(SqlType.INT64, False, tag))
            out = tuple(Field(f.name, f.dtype, sf.nullable)
                        for f, sf in zip(schema, plan.schema)) \
                + (Field("__side", SqlType.INT64, False),)
            return Projection(plan, tuple(exprs), out)

        u_schema = tuple(schema) + (Field("__side", SqlType.INT64, False),)
        u = Union((tagged(left, 1), tagged(right, 0)), u_schema, all=True)

        ncols = len(schema)
        key_cols = tuple(BColumn(f.dtype, f.nullable, i, f.name)
                         for i, f in enumerate(u_schema[:ncols]))
        side = BColumn(SqlType.INT64, False, ncols, "__side")

        # W1 over (key): lcnt = sum(side), total = count(*)
        w1_schema = u_schema + (Field("__lcnt", SqlType.INT64, True),
                                Field("__total", SqlType.INT64, False))
        w1 = Window(u, key_cols, (), (
            WindowFuncSpec("sum", side, 0, "__lcnt", SqlType.INT64, True),
            WindowFuncSpec("count_star", None, 0, "__total",
                           SqlType.INT64, False),
        ), w1_schema)

        # W2 over (key, side): per-side duplicate rank
        w2_keys = key_cols + (side,)
        w2_schema = w1_schema + (Field("__rn", SqlType.INT64, False),)
        w2 = Window(w1, w2_keys, (), (
            WindowFuncSpec("row_number", None, 0, "__rn",
                           SqlType.INT64, False),
        ), w2_schema)

        lcnt = BColumn(SqlType.INT64, True, ncols + 1, "__lcnt")
        total = BColumn(SqlType.INT64, False, ncols + 2, "__total")
        rn = BColumn(SqlType.INT64, False, ncols + 3, "__rn")
        one = BLiteral(SqlType.INT64, False, 1)
        rcnt = BBinary(SqlType.INT64, True, ast.BinOp.SUB, total, lcnt)
        is_left = BBinary(SqlType.BOOL, False, ast.BinOp.EQ, side, one)
        if kind is ast.SetOpKind.INTERSECT_ALL:
            keep = BBinary(SqlType.BOOL, True, ast.BinOp.LTE, rn, rcnt)
        else:  # EXCEPT_ALL
            keep = BBinary(SqlType.BOOL, True, ast.BinOp.GT, rn, rcnt)
        cond = BBinary(SqlType.BOOL, True, ast.BinOp.AND, is_left, keep)
        plan = Filter(w2, cond)
        out_exprs = tuple(BColumn(f.dtype, f.nullable, i, f.name)
                          for i, f in enumerate(schema))
        return Projection(plan, out_exprs, tuple(schema))

    def _try_subquery_conjunct(self, e: ast.Expr):
        """Recognize [NOT] IN (subquery) / [NOT] EXISTS (subquery) conjuncts."""
        negated = False
        if isinstance(e, ast.UnaryOp) and e.op is ast.UnOp.NOT:
            inner = e.operand
            if isinstance(inner, (ast.InSubquery, ast.Exists)):
                negated = True
                e = inner
        if isinstance(e, ast.InSubquery):
            return ("in", e.operand, e.query, e.negated ^ negated)
        if isinstance(e, ast.Exists):
            return ("exists", None, e.query, e.negated ^ negated)
        return None

    def _bind_subquery_join(self, plan, scope, mode, operand_ast, query,
                            negated):
        """[NOT] IN / [NOT] EXISTS → SEMI/ANTI join; correlated equality
        predicates decorrelate into extra join keys (TPC-H Q4/Q21 shape).
        NOT IN is null-aware (any NULL in the subquery, or a NULL probe
        value, removes the row — SQL three-valued logic)."""
        corr = self._try_decorrelate_exists(plan, scope, mode, operand_ast,
                                            query, negated)
        if corr is not None:
            return corr
        sub = self.bind(query)
        kind = ast.JoinKind.ANTI if negated else ast.JoinKind.SEMI
        if mode == "in":
            if len(sub.schema) != 1:
                raise BindError("IN subquery must return exactly one column")
            operand = self.bind_expr(operand_ast, scope)
            f = sub.schema[0]
            self._check_comparable(operand,
                                   BColumn(f.dtype, f.nullable, 0, f.name),
                                   ast.BinOp.EQ)
            left_keys = (operand,)
            right_keys = (BColumn(f.dtype, f.nullable, 0, f.name),)
        else:
            # EXISTS: constant keys — matches iff the subquery is nonempty
            lit = BLiteral(SqlType.INT64, False, 0)
            left_keys = (lit,)
            right_keys = (BLiteral(SqlType.INT64, False, 0),)
        return Join(plan, sub, kind, left_keys, right_keys, None,
                    tuple(plan.schema))

    def _try_decorrelate_exists(self, plan, scope, mode, operand_ast,
                                query, negated):
        """Correlated EXISTS/IN with equality correlation:

            EXISTS (SELECT ... FROM s WHERE s.k = outer.k AND <preds>)
            x IN   (SELECT y FROM s WHERE s.k = outer.k AND <preds>)

        become SEMI/ANTI joins keyed on (outer.k, s.k) [+ (x, y) for IN],
        with <preds> staying as a filter on the subquery side. Returns
        None when the subquery is not of this supported shape (the caller
        then binds it as uncorrelated)."""
        if not isinstance(query, ast.Select):
            return None
        if (query.group_by or query.having or query.ctes or query.distinct
                or query.from_ is None or query.limit is not None):
            return None
        if query.where is None:
            return None

        try:
            sub_plan, sub_scope = self.bind_relation(query.from_)
        except (BindError, NotSupportedError):
            return None

        corr_pairs = []     # (outer BExpr, inner BExpr)
        inner_preds = []
        residual_asts = []  # correlated non-equality conjuncts
        correlated = False
        for conj in _split_and(query.where):
            pair = self._corr_eq(conj, sub_scope, scope)
            if pair is not None:
                corr_pairs.append(pair)
                correlated = True
                continue
            try:
                inner_preds.append(self.bind_expr(conj, sub_scope))
            except BindError:
                # outer reference in a non-equality conjunct: try it as
                # a join residual over the combined (outer ++ inner)
                # schema (TPC-H Q21's l2.l_suppkey <> l1.l_suppkey)
                residual_asts.append(conj)
                correlated = True
            except NotSupportedError:
                # nested subquery machinery (IN-subquery, correlated
                # scalar) only runs on full SELECT binding — let the
                # uncorrelated path bind the whole subquery instead
                return None
        if not correlated:
            return None         # plain uncorrelated path handles it

        sub = sub_plan
        for p_ in inner_preds:
            sub = Filter(sub, p_)

        if not corr_pairs:
            return None     # residual-only correlation: no equi keys to
                            # anchor the join — unsupported shape

        residual = None
        if residual_asts:
            if mode == "in" and negated:
                return None  # null-aware NOT IN machinery takes no residual
            # bind over the COMBINED (outer ++ inner) schema. plan may
            # carry appended decoration columns (earlier decorrelations)
            # beyond the user-visible scope — pad with unresolvable
            # fields so inner indices land at len(plan.schema)+k.
            pad = [Field("\x00pad", SqlType.INT32, True, table="\x00")
                   ] * (len(plan.schema) - len(scope.fields))
            comb = Scope(list(scope.fields) + pad + list(sub_scope.fields))
            try:
                parts = [self.bind_expr(c, comb) for c in residual_asts]
            except (BindError, NotSupportedError):
                return None
            residual = parts[0]
            for p_ in parts[1:]:
                residual = BBinary(SqlType.BOOL,
                                   residual.nullable or p_.nullable,
                                   ast.BinOp.AND, residual, p_)

        left_keys = [o for o, _ in corr_pairs]
        right_keys = [i for _, i in corr_pairs]
        if mode == "in":
            operand = self.bind_expr(operand_ast, scope)
            items = query.items
            if len(items) != 1 or isinstance(items[0].expr, ast.Star):
                raise BindError("IN subquery must return exactly one column")
            inner_val = self.bind_expr(items[0].expr, sub_scope)
            left_keys.append(operand)
            right_keys.append(inner_val)
            if negated:
                return self._corr_not_in(plan, sub, corr_pairs, operand,
                                         inner_val)
        kind = ast.JoinKind.ANTI if negated else ast.JoinKind.SEMI
        # decorrelated NOT EXISTS is a PLAIN anti join: NULL keys never
        # match and such rows are kept (NOT IN's null-awareness is wrong
        # here — its decorrelated form is handled above)
        return Join(plan, sub, kind, tuple(left_keys), tuple(right_keys),
                    residual, tuple(plan.schema), null_aware_anti=False)

    def _corr_not_in(self, plan, sub, corr_pairs, operand, inner_val):
        """Correlated NOT IN: per-group three-valued logic.

            x NOT IN (SELECT y FROM s WHERE s.k = outer.k AND preds)

        Per outer row, with S = the row's correlated group: keep iff
        S is empty, OR (x IS NOT NULL AND S has no NULL y AND x ∉ S).
        Two stages over existing machinery:
        1. LEFT JOIN a per-key aggregate (count(*) AS tot, count(y) AS
           nn): keep rows where the group is absent, or has no NULL y
           and x is non-NULL;
        2. a PLAIN anti join on (k..., x=y) removes actual matches
           (NULL keys never match — stage 1 already decided them).
        """
        import copy

        from .logical import Aggregate, AggSpec

        n0 = len(plan.schema)
        nk = len(corr_pairs)
        inner_keys = [i for _, i in corr_pairs]
        outer_keys = [o for o, _ in corr_pairs]
        # the subquery feeds both stages — deep-copy so no plan node is
        # shared (rewrites and column pruning mutate nodes in place)
        sub_agg = copy.deepcopy(sub)

        gfields = tuple(
            Field(f"__k{j}", ik.dtype, ik.nullable)
            for j, ik in enumerate(inner_keys)
        ) + (Field("__tot", SqlType.INT64, False),
             Field("__nn", SqlType.INT64, False))
        agg = Aggregate(
            sub_agg, tuple(inner_keys),
            (AggSpec("count_star", None, False, "__tot", SqlType.INT64,
                     False),
             AggSpec("count", inner_val, False, "__nn", SqlType.INT64,
                     False)),
            gfields)

        j_schema = tuple(plan.schema) + tuple(
            dataclasses.replace(f, nullable=True) for f in gfields)
        gkey_cols = tuple(BColumn(f.dtype, f.nullable, j, f.name)
                          for j, f in enumerate(gfields[:nk]))
        j1 = Join(plan, agg, ast.JoinKind.LEFT, tuple(outer_keys),
                  gkey_cols, None, j_schema)

        tot = BColumn(SqlType.INT64, True, n0 + nk, "__tot")
        nn = BColumn(SqlType.INT64, True, n0 + nk + 1, "__nn")
        # group absent (tot IS NULL) → keep; else x non-NULL and no
        # NULL y in the group (tot == nn)
        group_absent = BIsNull(SqlType.BOOL, False, tot, False)
        x_not_null = BIsNull(SqlType.BOOL, False, operand, True)
        no_nulls = BBinary(SqlType.BOOL, True, ast.BinOp.EQ, tot, nn)
        cond = BBinary(SqlType.BOOL, True, ast.BinOp.OR, group_absent,
                       BBinary(SqlType.BOOL, True, ast.BinOp.AND,
                               x_not_null, no_nulls))
        filtered = Filter(j1, cond)
        back = Projection(filtered, tuple(
            BColumn(f.dtype, f.nullable, i, f.name)
            for i, f in enumerate(plan.schema)), tuple(plan.schema))

        return Join(back, sub, ast.JoinKind.ANTI,
                    tuple(outer_keys) + (operand,),
                    tuple(inner_keys) + (inner_val,), None,
                    tuple(plan.schema), null_aware_anti=False)

    def _try_decorrelate_scalar_cmp(self, plan, scope, conj):
        """Correlated scalar-aggregate subquery in a WHERE comparison:

            expr < (SELECT agg(...) FROM s WHERE s.k = outer.k [AND preds])

        (TPC-H Q17 shape) → LEFT JOIN against the per-key aggregated
        subquery; the comparison references the joined value column.
        Returns (new_plan, bound predicate) or None."""
        if not (isinstance(conj, ast.BinaryOp) and conj.op in _CMP_OPS):
            return None
        if isinstance(conj.right, ast.ScalarSubquery):
            other_ast, subq, flipped = conj.left, conj.right.query, False
        elif isinstance(conj.left, ast.ScalarSubquery):
            other_ast, subq, flipped = conj.right, conj.left.query, True
        else:
            return None
        if not isinstance(subq, ast.Select):
            return None
        if (subq.group_by or subq.having or subq.ctes or subq.distinct
                or subq.from_ is None or subq.where is None
                or len(subq.items) != 1):
            return None
        item = subq.items[0].expr
        if not self._contains_agg(item):
            return None

        try:
            sub_from, sub_scope = self.bind_relation(subq.from_)
        except (BindError, NotSupportedError):
            return None

        corr_pairs = []
        inner_preds = []
        for c in _split_and(subq.where):
            pair = self._corr_eq(c, sub_scope, scope)
            if pair is not None:
                corr_pairs.append(pair)
                continue
            try:
                inner_preds.append(self.bind_expr(c, sub_scope))
            except BindError:
                return None
        if not corr_pairs:
            return None    # uncorrelated scalar subqueries take the old path

        from .logical import Aggregate

        inner = sub_from
        for p_ in inner_preds:
            inner = Filter(inner, p_)

        # aggregate grouped by the correlation keys
        group_bound = tuple(i for _, i in corr_pairs)
        agg_calls: list[ast.FunctionCall] = []
        for fc in self._iter_agg_calls(item):
            if fc not in agg_calls:
                agg_calls.append(fc)
        specs = tuple(
            self._bind_agg_call(fc, sub_scope, f"__cagg_{i}")
            for i, fc in enumerate(agg_calls))
        group_fields = [
            Field(f"__ckey_{i}", g.dtype, g.nullable)
            for i, g in enumerate(group_bound)
        ]
        agg_fields = [Field(s.out_name, s.out_dtype, s.out_nullable)
                      for s in specs]
        agg_schema = tuple(group_fields) + tuple(agg_fields)
        sub = Aggregate(inner, group_bound, specs, agg_schema)

        # the subquery's value expression over the aggregate output
        ng = len(group_bound)

        def rewrite(e):
            if isinstance(e, ast.FunctionCall) and self._is_agg(e):
                j = agg_calls.index(e)
                f = agg_schema[ng + j]
                return _PreBound(BColumn(f.dtype, f.nullable, ng + j, f.name))
            return _rebuild_ast(e, [rewrite(c) for c in _ast_children(e)])

        val = self.bind_expr(rewrite(item), _AggScope(list(agg_schema)))
        key_cols = tuple(
            BColumn(f.dtype, f.nullable, i, f.name)
            for i, f in enumerate(group_fields))
        sub_proj_schema = tuple(group_fields) + (
            Field("__cval", val.dtype, True),)
        sub = Projection(sub, key_cols + (val,), sub_proj_schema)

        # LEFT JOIN on the correlation keys (missing key → NULL value)
        nl = len(plan.schema)
        left_keys = tuple(o for o, _ in corr_pairs)
        right_keys = key_cols
        joined_fields = tuple(plan.schema) + tuple(
            dataclasses.replace(f, nullable=True) for f in sub_proj_schema)
        new_plan = Join(plan, sub, ast.JoinKind.LEFT, left_keys, right_keys,
                        None, joined_fields)

        val_col = BColumn(val.dtype, True, nl + len(group_fields), "__cval")
        other = self.bind_expr(other_ast, scope)
        l, r = (val_col, other) if flipped else (other, val_col)
        l, r = _coerce_temporal(l, r)
        self._check_comparable(l, r, conj.op)
        pred = BBinary(SqlType.BOOL, True, conj.op, l, r)
        return new_plan, pred

    def _corr_eq(self, conj, inner_scope: Scope, outer_scope: Scope):
        """<inner expr> = <outer expr> (either orientation, arbitrary
        single-scope expressions) → (outer BExpr, inner BExpr)."""
        if not (isinstance(conj, ast.BinaryOp)
                and conj.op is ast.BinOp.EQ):
            return None

        def side(e, scope):
            try:
                return self.bind_expr(e, scope)
            except (BindError, NotSupportedError):
                return None

        li, lo = side(conj.left, inner_scope), side(conj.left, outer_scope)
        ri, ro = side(conj.right, inner_scope), side(conj.right, outer_scope)
        # the correlation side must resolve ONLY in the outer scope; the
        # other side must resolve inner. The inner side MAY also resolve
        # in the outer scope (the same table can appear in both FROMs —
        # TPC-H Q2's partsupp): SQL scoping shadows outward, so an
        # inner-resolvable name IS the inner column.
        if lo is not None and li is None and ri is not None:
            return (lo, ri)
        if ro is not None and ri is None and li is not None:
            return (ro, li)
        return None

    # ================= relations =================

    def bind_relation(self, rel: ast.Relation) -> tuple[LogicalPlan, Scope]:
        if isinstance(rel, ast.TableRef):
            key = rel.name.lower()
            alias = (rel.alias or rel.name).lower()
            if key in self.ctes:
                sub = self.ctes[key]
                fields = [dataclasses.replace(f, table=alias) for f in sub.schema]
                return sub, Scope(fields)
            schema = self.catalog.table_schema(rel.name)
            fields = [dataclasses.replace(f, table=alias) for f in schema]
            return Scan(rel.name, tuple(fields)), Scope(fields)
        if isinstance(rel, ast.ValuesRef):
            return self._bind_values_ref(rel)
        if isinstance(rel, ast.SubqueryRef):
            sub = self.bind(rel.query)
            alias = rel.alias.lower()
            fields = [dataclasses.replace(f, table=alias) for f in sub.schema]
            return sub, Scope(fields)
        if isinstance(rel, ast.Join):
            return self._bind_join(rel)
        raise NotSupportedError(f"relation {type(rel).__name__}")

    def _bind_values_ref(self, rel: ast.ValuesRef):
        if not rel.rows:
            raise BindError("VALUES needs at least one row")
        width = len(rel.rows[0])
        rows = []
        for r in rel.rows:
            if len(r) != width:
                raise BindError("VALUES rows have differing widths")
            vals = []
            for e in r:
                neg = False
                if isinstance(e, ast.UnaryOp) and e.op is ast.UnOp.NEG:
                    e, neg = e.operand, True
                if not isinstance(e, ast.Literal):
                    raise NotSupportedError(
                        "VALUES rows must contain literals")
                v = e.value
                if neg:
                    v = -v
                vals.append(v)
            rows.append(tuple(vals))
        names = rel.col_names or tuple(
            f"column{i + 1}" for i in range(width))
        if len(names) != width:
            raise BindError("VALUES column-name count mismatch")
        fields = []
        alias = rel.alias.lower()
        for i, name in enumerate(names):
            col_vals = [r[i] for r in rows]
            dt = SqlType.NULL
            for v in col_vals:
                vt, _ = _infer_literal(v)
                dt = vt if dt is SqlType.NULL else (
                    dt if vt is SqlType.NULL else common_type(dt, vt))
            if dt is SqlType.NULL:
                dt = SqlType.INT64
            fields.append(Field(name, dt,
                                any(v is None for v in col_vals),
                                table=alias))
        plan = Values(tuple(fields), tuple(rows))
        return plan, Scope(fields)

    def _bind_join(self, j: ast.Join) -> tuple[LogicalPlan, Scope]:
        from .logical import shift_columns
        left, lscope = self.bind_relation(j.left)
        right, rscope = self.bind_relation(j.right)
        nl = len(lscope.fields)
        joined_fields = list(lscope.fields) + list(rscope.fields)
        jscope = Scope(joined_fields)

        left_keys: list[BExpr] = []
        right_keys: list[BExpr] = []
        residual: Optional[BExpr] = None

        if j.using:
            for c in j.using:
                li = lscope.resolve(c, None)
                ri = rscope.resolve(c, None)
                lf, rf = lscope.fields[li], rscope.fields[ri]
                left_keys.append(BColumn(lf.dtype, lf.nullable, li, lf.name))
                right_keys.append(BColumn(rf.dtype, rf.nullable, ri, rf.name))
        elif j.condition is not None:
            conjuncts = _split_and(j.condition)
            residual_parts = []
            for c in conjuncts:
                pair = self._try_equi_key(c, lscope, rscope)
                if pair is not None:
                    left_keys.append(pair[0])
                    right_keys.append(pair[1])
                else:
                    residual_parts.append(self.bind_expr(c, jscope))
            for p in residual_parts:
                residual = p if residual is None else BBinary(
                    SqlType.BOOL, True, ast.BinOp.AND, residual, p)
        elif j.kind is not ast.JoinKind.CROSS:
            raise BindError("JOIN requires ON or USING")

        if j.condition is not None and not left_keys:
            # no equi conjunct at all (e.g. ON a.x < b.y): constant keys
            # make every pair key-match; the residual decides, and outer
            # rows resurface via the usual match semantics
            left_keys = [BLiteral(SqlType.INT32, False, 0)]
            right_keys = [BLiteral(SqlType.INT32, False, 0)]

        # unify key types: both sides must share a physical representation
        # (normalize_keys compares bit patterns)
        uni_l, uni_r = [], []
        for lk, rk in zip(left_keys, right_keys):
            if lk.dtype != rk.dtype:
                ct = common_type(lk.dtype, rk.dtype)
                if lk.dtype != ct:
                    lk = BCast(ct, lk.nullable, lk, False)
                if rk.dtype != ct:
                    rk = BCast(ct, rk.nullable, rk, False)
            uni_l.append(lk)
            uni_r.append(rk)
        left_keys, right_keys = uni_l, uni_r

        # outer-join nullability
        out_fields = []
        for i, f in enumerate(joined_fields):
            nullable = f.nullable
            if j.kind in (ast.JoinKind.LEFT, ast.JoinKind.FULL) and i >= nl:
                nullable = True
            if j.kind in (ast.JoinKind.RIGHT, ast.JoinKind.FULL) and i < nl:
                nullable = True
            out_fields.append(dataclasses.replace(f, nullable=nullable))

        plan = Join(left, right, j.kind, tuple(left_keys), tuple(right_keys),
                    residual, tuple(out_fields))
        return plan, Scope(out_fields)

    def _try_equi_key(self, c: ast.Expr, lscope: Scope, rscope: Scope):
        """If `c` is <left-side expr> = <right-side expr> (either
        orientation), return the bound key pair. An expression qualifies
        as one side's key when it binds entirely against that side's
        scope — e.g. `u.age % 2 = v.age % 2` hash-partitions on the
        expression values instead of falling back to a cross product."""
        if not (isinstance(c, ast.BinaryOp) and c.op is ast.BinOp.EQ):
            return None

        def try_side(e, scope):
            if isinstance(e, (ast.ScalarSubquery, ast.Exists,
                              ast.InSubquery, ast.WindowCall)):
                return None
            try:
                return self.bind_expr(e, scope)
            except (BindError, NotSupportedError):
                return None

        ll = try_side(c.left, lscope)
        rr = try_side(c.right, rscope)
        if ll is not None and rr is not None:
            return (ll, rr)
        lr = try_side(c.left, rscope)
        rl = try_side(c.right, lscope)
        if lr is not None and rl is not None:
            return (rl, lr)
        return None

    # ================= expressions =================

    def bind_expr(self, e: ast.Expr, scope: Scope) -> BExpr:
        if isinstance(e, _PreBound):
            return e.bound
        if isinstance(e, ast.Literal):
            dt, nullable = _infer_literal(e.value)
            return BLiteral(dt, nullable, e.value)
        if isinstance(e, ast.ColumnRef):
            i = scope.resolve(e.name, e.table)
            f = scope.fields[i]
            return BColumn(f.dtype, f.nullable, i, f.name)
        if isinstance(e, ast.BinaryOp):
            return self._bind_binary(e, scope)
        if isinstance(e, ast.UnaryOp):
            operand = self.bind_expr(e.operand, scope)
            if e.op is ast.UnOp.NOT:
                if operand.dtype not in (SqlType.BOOL, SqlType.NULL):
                    raise BindError("NOT expects a boolean")
                return BUnary(SqlType.BOOL, operand.nullable, ast.UnOp.NOT, operand)
            if not operand.dtype.is_numeric:
                raise BindError("unary minus expects a numeric")
            return BUnary(operand.dtype, operand.nullable, e.op, operand)
        if isinstance(e, ast.IsNull):
            operand = self.bind_expr(e.operand, scope)
            return BIsNull(SqlType.BOOL, False, operand, e.negated)
        if isinstance(e, ast.IsDistinctFrom):
            l = self.bind_expr(e.left, scope)
            r = self.bind_expr(e.right, scope)
            return BIsDistinctFrom(SqlType.BOOL, False, l, r, e.negated)
        if isinstance(e, ast.Between):
            # x BETWEEN a AND b  ≡  x >= a AND x <= b
            low = ast.BinaryOp(ast.BinOp.GTE, e.operand, e.low)
            high = ast.BinaryOp(ast.BinOp.LTE, e.operand, e.high)
            both = ast.BinaryOp(ast.BinOp.AND, low, high)
            if e.negated:
                both = ast.UnaryOp(ast.UnOp.NOT, both)
            return self.bind_expr(both, scope)
        if isinstance(e, ast.InList):
            operand = self.bind_expr(e.operand, scope)
            if operand.dtype.is_string:
                # string IN-list → OR of equalities: each equality gets
                # the dictionary-compare preparation (exec/expr.py keys
                # prepared string compares by the BBinary node), which a
                # BInList node would bypass. Kleene OR/NOT match IN's
                # NULL semantics exactly.
                expr: ast.Expr = None
                for item in e.items:
                    eq = ast.BinaryOp(ast.BinOp.EQ, e.operand, item)
                    expr = eq if expr is None else ast.BinaryOp(
                        ast.BinOp.OR, expr, eq)
                if expr is None:
                    return BLiteral(SqlType.BOOL, False, e.negated)
                if e.negated:
                    expr = ast.UnaryOp(ast.UnOp.NOT, expr)
                return self.bind_expr(expr, scope)
            items = tuple(self.bind_expr(i, scope) for i in e.items)
            nullable = operand.nullable or any(i.nullable for i in items)
            return BInList(SqlType.BOOL, nullable, operand, items, e.negated)
        if isinstance(e, ast.Like):
            operand = self.bind_expr(e.operand, scope)
            if not operand.dtype.is_string:
                raise BindError("LIKE expects a string operand")
            pat = self.bind_expr(e.pattern, scope)
            if not isinstance(pat, BLiteral) or not isinstance(pat.value, str):
                raise NotSupportedError("LIKE pattern must be a string literal")
            return BLike(SqlType.BOOL, operand.nullable, operand, pat.value,
                         e.negated, e.case_insensitive)
        if isinstance(e, ast.Cast):
            operand = self.bind_expr(e.operand, scope)
            tname = e.type_name
            if tname not in _TYPE_NAMES:
                raise BindError(f"unknown type {tname!r} in CAST")
            target = _TYPE_NAMES[tname]
            if (target.is_temporal and isinstance(operand, BLiteral)
                    and operand.dtype.is_string):
                # DATE '...' / TIMESTAMP '...' → typed literal now
                _, lit = _coerce_temporal(
                    BLiteral(target, False, 0), operand)
                return lit
            return BCast(target, operand.nullable or e.safe, operand, e.safe)
        if isinstance(e, ast.Case):
            return self._bind_case(e, scope)
        if isinstance(e, ast.FunctionCall):
            return self._bind_function(e, scope)
        if isinstance(e, ast.ScalarSubquery):
            sub = self.bind(e.query)
            if len(sub.schema) != 1:
                raise BindError("scalar subquery must return one column")
            f = sub.schema[0]
            return BScalarSubquery(f.dtype, True, sub)
        if isinstance(e, ast.WindowCall):
            raise BindError(
                "window functions are only allowed in the SELECT list")
        if isinstance(e, (ast.Exists, ast.InSubquery)):
            raise NotSupportedError(
                f"{type(e).__name__} is not supported yet; rewrite as a JOIN")
        raise NotSupportedError(f"expression {type(e).__name__}")

    def _bind_binary(self, e: ast.BinaryOp, scope: Scope) -> BExpr:
        # temporal ± INTERVAL → calendar-shift device function
        if e.op in (ast.BinOp.ADD, ast.BinOp.SUB):
            liv = isinstance(e.left, ast.IntervalLiteral)
            riv = isinstance(e.right, ast.IntervalLiteral)
            if liv or riv:
                if liv and e.op is ast.BinOp.SUB:
                    raise BindError("INTERVAL - timestamp is not valid SQL")
                iv = e.left if liv else e.right
                other = e.right if liv else e.left
                base = self.bind_expr(other, scope)
                if isinstance(base, BLiteral) and base.dtype.is_string:
                    # implicit cast of a bare string literal date
                    _, base = _coerce_temporal(
                        BLiteral(SqlType.DATE32, False, 0), base)
                if not base.dtype.is_temporal:
                    raise BindError("INTERVAL arithmetic needs a DATE or "
                                    "TIMESTAMP operand")
                sign = -1 if e.op is ast.BinOp.SUB else 1
                args = (base,
                        BLiteral(SqlType.INT64, False, sign * iv.months),
                        BLiteral(SqlType.INT64, False, sign * iv.days),
                        BLiteral(SqlType.INT64, False, sign * iv.micros))
                return BScalarFunc(base.dtype, base.nullable,
                                   "interval_shift", args)
        if isinstance(e.left, ast.IntervalLiteral) or isinstance(
                e.right, ast.IntervalLiteral):
            raise BindError("INTERVAL literals only support + and -")
        l = self.bind_expr(e.left, scope)
        r = self.bind_expr(e.right, scope)
        nullable = l.nullable or r.nullable
        if e.op in _LOGIC_OPS:
            for side in (l, r):
                if side.dtype not in (SqlType.BOOL, SqlType.NULL):
                    raise BindError(f"{e.op.value} expects booleans")
            return BBinary(SqlType.BOOL, nullable, e.op, l, r)
        if e.op in _CMP_OPS:
            l, r = _coerce_temporal(l, r)
            self._check_comparable(l, r, e.op)
            return BBinary(SqlType.BOOL, nullable, e.op, l, r)
        if e.op is ast.BinOp.CONCAT:
            if not ((l.dtype.is_string or l.dtype is SqlType.NULL)
                    and (r.dtype.is_string or r.dtype is SqlType.NULL)):
                raise BindError("|| expects strings")
            return BBinary(SqlType.STRING, nullable, e.op, l, r)
        if e.op in _ARITH_OPS:
            if not (l.dtype.is_numeric or l.dtype is SqlType.NULL) or \
               not (r.dtype.is_numeric or r.dtype is SqlType.NULL):
                raise BindError(f"{e.op.value} expects numeric operands "
                                f"({l.dtype.name}, {r.dtype.name})")
            out = common_type(l.dtype, r.dtype)
            if e.op is ast.BinOp.DIV and out.is_integer:
                pass  # SQL integer division truncates
            # division by zero yields NULL
            if e.op in (ast.BinOp.DIV, ast.BinOp.MOD):
                nullable = True
            return BBinary(out, nullable, e.op, l, r)
        raise NotSupportedError(f"operator {e.op.value}")

    def _check_comparable(self, l: BExpr, r: BExpr, op) -> None:
        lt, rt = l.dtype, r.dtype
        if SqlType.NULL in (lt, rt):
            return
        if lt.is_numeric and rt.is_numeric:
            return
        if lt == rt:
            return
        if lt.is_string and rt.is_string:
            return
        if lt.is_temporal and rt.is_temporal:
            return
        raise BindError(f"cannot compare {lt.name} with {rt.name}")

    def _bind_case(self, e: ast.Case, scope: Scope) -> BExpr:
        whens = []
        for cond, val in e.whens:
            if e.operand is not None:
                cond = ast.BinaryOp(ast.BinOp.EQ, e.operand, cond)
            bc = self.bind_expr(cond, scope)
            if bc.dtype not in (SqlType.BOOL, SqlType.NULL):
                raise BindError("CASE WHEN condition must be boolean")
            whens.append((bc, self.bind_expr(val, scope)))
        else_ = self.bind_expr(e.else_, scope) if e.else_ is not None else None
        out = whens[0][1].dtype
        for _, v in whens[1:]:
            out = common_type(out, v.dtype)
        if else_ is not None:
            out = common_type(out, else_.dtype)
        nullable = else_ is None or else_.nullable or any(v.nullable for _, v in whens)
        return BCase(out, nullable, tuple(whens), else_)

    def _bind_function(self, e: ast.FunctionCall, scope: Scope) -> BExpr:
        if self._is_agg(e):
            raise BindError(f"aggregate {e.name}() not allowed here")
        name = e.name
        if name == "coalesce":
            args = tuple(self.bind_expr(a, scope) for a in e.args)
            if not args:
                raise BindError("coalesce() needs arguments")
            out = args[0].dtype
            for a in args[1:]:
                out = common_type(out, a.dtype)
            nullable = all(a.nullable for a in args)
            return BScalarFunc(out, nullable, "coalesce", args)
        if name == "nullif":
            if len(e.args) != 2:
                raise BindError("nullif() takes two arguments")
            args = tuple(self.bind_expr(a, scope) for a in e.args)
            return BScalarFunc(args[0].dtype, True, "nullif", args)
        fn = self.functions.get(name)
        if fn is None:
            raise BindError(f"unknown function {name!r}")
        if not (fn.min_args <= len(e.args) <= fn.max_args):
            raise BindError(f"{name}() takes {fn.min_args}..{fn.max_args} arguments")
        args = tuple(self.bind_expr(a, scope) for a in e.args)
        ret = fn.ret_type([a.dtype for a in args])
        nullable = any(a.nullable for a in args)
        if fn.kind == "numeric":
            return BScalarFunc(ret, nullable, name, args)
        return BStringFunc(ret, nullable, name, args, udf=fn.host_fn)

class _PreBound(ast.Expr):
    """Wrapper carrying an already-bound expression through item lists."""
    def __init__(self, bound: BExpr):
        self.bound = bound


class _AggOutScope(Scope):
    """Post-aggregate scope: resolves group/agg output columns by name;
    anything else gets the GROUP BY hint."""

    def resolve(self, name, table):
        try:
            return super().resolve(name, table)
        except BindError as e:
            raise BindError(
                f"column {name!r} must appear in GROUP BY or inside an "
                f"aggregate ({e})")


class _AggScope(Scope):
    """Post-aggregate scope: bare columns must come from GROUP BY/aggs,
    which the AST rewrite already replaced with _PreBound nodes."""

    def resolve(self, name, table):
        raise BindError(
            f"column {name!r} must appear in GROUP BY or inside an aggregate")


def _rebuild_ast(e: ast.Expr, children: list) -> ast.Expr:
    """Reconstruct an AST node with new children (order = _ast_children)."""
    if not children and not _ast_children(e):
        return e
    it = iter(children)
    if isinstance(e, ast.BinaryOp):
        return ast.BinaryOp(e.op, next(it), next(it))
    if isinstance(e, ast.UnaryOp):
        return ast.UnaryOp(e.op, next(it))
    if isinstance(e, ast.IsNull):
        return ast.IsNull(next(it), e.negated)
    if isinstance(e, ast.IsDistinctFrom):
        return ast.IsDistinctFrom(next(it), next(it), e.negated)
    if isinstance(e, ast.Between):
        return ast.Between(next(it), next(it), next(it), e.negated)
    if isinstance(e, ast.InList):
        op = next(it)
        return ast.InList(op, tuple(it), e.negated)
    if isinstance(e, ast.Like):
        return ast.Like(next(it), next(it), e.negated, e.case_insensitive)
    if isinstance(e, ast.FunctionCall):
        return ast.FunctionCall(e.name, tuple(it), e.distinct)
    if isinstance(e, ast.WindowCall):
        args = tuple(next(it) for _ in e.args)
        part = tuple(next(it) for _ in e.partition_by)
        order = tuple(
            ast.OrderItem(next(it), o.ascending, o.nulls_first)
            for o in e.order_by)
        return ast.WindowCall(e.func, args, part, order, e.frame)
    if isinstance(e, ast.Cast):
        return ast.Cast(next(it), e.type_name, e.safe)
    if isinstance(e, ast.Case):
        operand = next(it) if e.operand is not None else None
        whens = tuple((next(it), next(it)) for _ in e.whens)
        else_ = next(it) if e.else_ is not None else None
        return ast.Case(operand, whens, else_)
    return e


def _coerce_temporal(l: BExpr, r: BExpr):
    """'1998-09-02' literals compared against DATE/TIMESTAMP columns are
    parsed to the column's physical representation (days / microseconds),
    matching DataFusion's implicit coercion."""
    import datetime as _dt

    def conv(lit: BLiteral, target: SqlType) -> BLiteral:
        s = lit.value
        try:
            if target is SqlType.DATE32:
                d = _dt.date.fromisoformat(s)
                days = (d - _dt.date(1970, 1, 1)).days
                return BLiteral(SqlType.DATE32, False, days)
            ts = _dt.datetime.fromisoformat(s)
            if ts.tzinfo is not None:
                ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            us = int((ts - _dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
            return BLiteral(SqlType.TIMESTAMP, False, us)
        except ValueError:
            raise BindError(f"cannot parse {s!r} as {target.name}")

    if l.dtype.is_temporal and isinstance(r, BLiteral) and r.dtype.is_string:
        return l, conv(r, l.dtype)
    if r.dtype.is_temporal and isinstance(l, BLiteral) and l.dtype.is_string:
        return conv(l, r.dtype), r
    return l, r


def _split_and(e: ast.Expr) -> list[ast.Expr]:
    if isinstance(e, ast.BinaryOp) and e.op is ast.BinOp.AND:
        return _split_and(e.left) + _split_and(e.right)
    return [e]


def _ast_children(e: ast.Expr) -> tuple:
    if isinstance(e, ast.BinaryOp):
        return (e.left, e.right)
    if isinstance(e, ast.UnaryOp):
        return (e.operand,)
    if isinstance(e, ast.IsNull):
        return (e.operand,)
    if isinstance(e, ast.IsDistinctFrom):
        return (e.left, e.right)
    if isinstance(e, ast.Between):
        return (e.operand, e.low, e.high)
    if isinstance(e, ast.InList):
        return (e.operand,) + e.items
    if isinstance(e, ast.Like):
        return (e.operand, e.pattern)
    if isinstance(e, ast.FunctionCall):
        return e.args
    if isinstance(e, ast.WindowCall):
        return e.args + e.partition_by + tuple(o.expr for o in e.order_by)
    if isinstance(e, ast.Cast):
        return (e.operand,)
    if isinstance(e, ast.Case):
        out = []
        if e.operand is not None:
            out.append(e.operand)
        for c, v in e.whens:
            out.extend((c, v))
        if e.else_ is not None:
            out.append(e.else_)
        return tuple(out)
    return ()


def _auto_name(e: ast.Expr) -> str:
    if isinstance(e, ast.ColumnRef):
        return e.name
    if isinstance(e, ast.FunctionCall):
        if e.args and isinstance(e.args[0], ast.Star):
            return f"{e.name}(*)"
        inner = ",".join(_auto_name(a) for a in e.args)
        return f"{e.name}({inner})"
    if isinstance(e, ast.Literal):
        if e.value is None:
            return "NULL"
        if isinstance(e.value, str):
            return f"'{e.value}'"
        return str(e.value)
    if isinstance(e, ast.BinaryOp):
        return f"{_auto_name(e.left)} {e.op.value} {_auto_name(e.right)}"
    if isinstance(e, ast.Cast):
        return _auto_name(e.operand)
    if isinstance(e, _PreBound):
        return "expr"
    return "expr"
