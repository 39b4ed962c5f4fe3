"""Plan executor: bound logical plan → device arrays → DeviceTable.

Execution model (TPU-first, replaces the reference's async stream-of-
RecordBatch runtime, /root/reference/crates/engine/src/physical_plan.rs):

- Tables are whole padded columns in HBM (table.py).
- A node's result is an `RTable`: columns + a selection mask. Filters
  only AND into the mask (late materialization); physical row movement
  happens at sort/join/aggregate (which permute anyway) and at egress.
- Each operator executes as one jitted XLA program; expression chains
  fuse inside it. Jitted programs are cached per (plan node, shapes,
  dictionary-baked scalars) so repeated queries skip tracing.
- Joins are two-phase: a probe-count program, one scalar host read to
  size the output, then the gather/expand program (ops/join_ops.py).

Host work is planning + dictionary prep only — never per-row.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import SqlType
from ..errors import ExecutionError, NotSupportedError
from ..sql.ast import JoinKind
from ..plan import logical as L
from ..table import PAD, Column, DeviceTable, pad_count
from ..ops import join_ops, masks
from ..ops.aggregate import AggInput, grouped_aggregate, ungrouped_aggregate
from ..ops.sort_ops import sort_with_payload
from .expr import EvalCtx, ExprPrep, VV, and_valid, merge_dicts
from ..plan.logical import BScalarSubquery, walk_expr


@dataclasses.dataclass
class RCol:
    arr: jax.Array
    valid: Optional[jax.Array]
    dtype: SqlType
    dictionary: Optional[np.ndarray] = None
    stats: Optional[tuple] = None       # (min, max) for integer columns


@dataclasses.dataclass
class RTable:
    cols: list[RCol]
    names: list[str]
    mask: Optional[jax.Array]          # None = all rows alive
    capacity: int

    def mask_or_ones(self):
        if self.mask is None:
            return jnp.ones((self.capacity,), jnp.bool_)
        return self.mask


class Executor:
    def __init__(self, catalog, functions, metrics=None):
        self.catalog = catalog
        self.functions = functions
        self.metrics = metrics
        self._jit_cache: dict = {}

    # ================= public =================

    def execute(self, plan: L.LogicalPlan) -> DeviceTable:
        rt = self.run(plan)
        return self.finalize(rt)

    def finalize(self, rt: RTable) -> DeviceTable:
        """Compact alive rows to the front and wrap as a DeviceTable."""
        if rt.mask is None:
            cols, count = rt.cols, rt.capacity
        else:
            key = ("finalize", rt.capacity, _cols_sig(rt.cols))
            fn = self._jit_cache.get(key)
            if fn is None:
                @jax.jit
                def fn(mask, arrs, valids):
                    return masks.compact(mask, arrs, valids)
                self._jit_cache[key] = fn
            out_arrs, out_valids, count = fn(
                rt.mask, [c.arr for c in rt.cols], [c.valid for c in rt.cols])
            cols = [dataclasses.replace(c, arr=a, valid=v)
                    for c, a, v in zip(rt.cols, out_arrs, out_valids)]
            count = int(jax.device_get(count))

        names = _unique_names(rt.names)
        columns = {
            n: Column(data=c.arr, dtype=c.dtype, validity=c.valid,
                      dictionary=c.dictionary)
            for n, c in zip(names, cols)
        }
        return DeviceTable(columns, min(count, rt.capacity) if rt.mask is not None
                           else rt.capacity)

    # ================= dispatch =================

    def run(self, node: L.LogicalPlan) -> RTable:
        name = type(node).__name__
        method = getattr(self, f"_run_{name.lower()}", None)
        if method is None:
            raise NotSupportedError(f"no executor for {name}")
        with jax.named_scope(f"igloo.{name}"):
            out = method(node)
        if self.metrics is not None:
            self.metrics.record_operator(name, out.capacity)
        return out

    # ================= leaves =================

    def _run_scan(self, node: L.Scan) -> RTable:
        t = self.catalog.get_table(node.table)
        cols = []
        names = []
        fields = node.schema
        for f in fields:
            c = t.columns.get(f.name)
            if c is None:
                raise ExecutionError(f"column {f.name!r} missing in table {node.table!r}")
            data = (c.data64() if getattr(c, 'pair_hi', None) is not None
                    else c.data)
            cols.append(RCol(data, c.validity, c.dtype, c.dictionary,
                             getattr(c, 'stats', None)))
            names.append(f.name)
        mask = None
        if t.nrows < t.capacity:
            mask = jnp.arange(t.capacity) < t.nrows
        return RTable(cols, names, mask, t.capacity)

    def _run_values(self, node: L.Values) -> RTable:
        nrows = len(node.rows)
        cap = pad_count(nrows)
        cols = []
        names = []
        for ci, f in enumerate(node.schema):
            vals = [r[ci] for r in node.rows]
            npdt = np.dtype(object) if f.dtype.is_string else None
            if f.dtype.is_string:
                import pyarrow as pa
                from ..table import encode_strings
                codes, valid, d = encode_strings(pa.array(vals, type=pa.string()))
                arr = jnp.zeros((cap,), jnp.int32).at[:nrows].set(jnp.asarray(codes))
                v = jnp.zeros((cap,), jnp.bool_).at[:nrows].set(jnp.asarray(valid))
                cols.append(RCol(arr, v, f.dtype, d))
            else:
                data = np.zeros((cap,), dtype=f.dtype.to_jax())
                valid = np.zeros((cap,), dtype=np.bool_)
                for i, v in enumerate(vals):
                    if v is not None:
                        data[i] = v
                        valid[i] = True
                cols.append(RCol(jnp.asarray(data), jnp.asarray(valid), f.dtype))
            names.append(f.name)
        mask = jnp.arange(cap) < nrows
        return RTable(cols, names, mask, cap)

    # ================= expression machinery =================

    def _make_prep(self, rt: RTable, exprs) -> ExprPrep:
        prep = ExprPrep([c.dictionary for c in rt.cols], self.functions)
        for e in exprs:
            for n in walk_expr(e):
                if isinstance(n, BScalarSubquery):
                    self._eval_scalar_subquery(n, prep)
        for e in exprs:
            prep.prepare(e)
        return prep

    def _eval_scalar_subquery(self, node: BScalarSubquery, prep: ExprPrep):
        sub = self.execute(node.plan)
        if sub.nrows > 1:
            raise ExecutionError("scalar subquery returned more than one row")
        col = next(iter(sub.columns.values())) if sub.columns else None
        if sub.nrows == 0 or col is None:
            prep.set_subquery_value(node, 0, True)
            return
        tbl = sub.to_arrow()
        val = tbl.column(0)[0].as_py()
        if val is None:
            prep.set_subquery_value(node, 0, True)
        elif node.dtype.is_string:
            prep.set_subquery_value(node, 0, False,
                                    out_dict=np.asarray([val], dtype=object))
        else:
            prep.set_subquery_value(node, val, False)

    def _eval_program(self, rt: RTable, exprs, tag: str, body=None):
        """Run `body(ctx, vvs, mask)` (default: return exprs' VVs) as one
        cached jitted program. Returns (result, prep)."""
        prep = self._make_prep(rt, exprs)
        key = (tag, tuple(id(e) for e in exprs), _cols_sig(rt.cols),
               rt.mask is not None, rt.capacity, _prep_sig(prep))
        cached = self._jit_cache.get(key)
        if cached is None:
            cap = rt.capacity

            def traced(arrs, valids, mask, aux):
                cols = [VV(a, v) for a, v in zip(arrs, valids)]
                ctx = EvalCtx(cols, aux, traced.prep, nrows_hint=cap)
                vvs = [self._eval_one(e, ctx) for e in exprs]
                if body is None:
                    return [(v.arr, v.valid) for v in vvs]
                return body(ctx, vvs, mask)

            traced.prep = prep
            fitted = jax.jit(traced)
            cached = (fitted, traced, exprs)
            self._jit_cache[key] = cached
        fitted, traced, _ = cached
        traced.prep = prep  # refresh aux mapping for identical baked scalars
        aux = [jnp.asarray(a) for a in prep.aux_arrays]
        out = fitted([c.arr for c in rt.cols], [c.valid for c in rt.cols],
                     rt.mask, aux)
        return out, prep

    def _eval_one(self, e, ctx):
        from .expr import eval_expr
        return eval_expr(e, ctx)

    # ================= unary operators =================

    def _run_projection(self, node: L.Projection) -> RTable:
        rt = self.run(node.input)
        out, prep = self._eval_program(rt, list(node.exprs), "project")
        cols = []
        for (arr, valid), e, f in zip(out, node.exprs, node.schema):
            d = prep.out_dict(e) if f.dtype.is_string else None
            arr = _cast_physical(arr, f.dtype)
            stats = None
            if isinstance(e, L.BColumn):
                stats = rt.cols[e.index].stats
            cols.append(RCol(arr, valid, f.dtype, d, stats))
        return RTable(cols, [f.name for f in node.schema], rt.mask, rt.capacity)

    def _run_renderstring(self, node: L.RenderString) -> RTable:
        """CAST(x AS VARCHAR) host rendering: pull the numeric column,
        format, and rebuild an order-preserving (lexicographically
        sorted) dictionary + codes. One d2h/h2d round trip per query —
        the price of the engine's sorted-dictionary string invariant."""
        rt = self.run(node.input)
        cols = list(rt.cols)
        for i in node.indices:
            c = cols[i]
            arr = c.arr
            live = rt.mask if rt.mask is not None else None
            if c.valid is not None:
                live = c.valid if live is None else (live & c.valid)
            if live is not None:
                arr = jnp.where(live, arr, jnp.zeros((), arr.dtype))
            vals = np.asarray(jax.device_get(arr))
            uniq, inv = np.unique(vals, return_inverse=True)
            strs = _format_sql_strings(uniq, c.dtype)
            d, remap = np.unique(strs, return_inverse=True)
            codes = remap.astype(np.int32)[inv]
            cols[i] = RCol(jnp.asarray(codes), c.valid, SqlType.STRING,
                           d.astype(object))
        return RTable(cols, rt.names, rt.mask, rt.capacity)

    def _run_filter(self, node: L.Filter) -> RTable:
        rt = self.run(node.input)

        def body(ctx, vvs, mask):
            pred = vvs[0]
            keep = pred.arr.astype(jnp.bool_)
            if pred.valid is not None:
                keep = keep & pred.valid
            if mask is not None:
                keep = keep & mask
            return keep

        new_mask, _ = self._eval_program(rt, [node.predicate], "filter", body)
        return RTable(rt.cols, rt.names, new_mask, rt.capacity)

    def _run_limit(self, node: L.Limit) -> RTable:
        rt = self.run(node.input)
        key = ("limit", node.limit, node.offset, rt.capacity,
               rt.mask is not None)
        fn = self._jit_cache.get(key)
        if fn is None:
            lim, off, cap = node.limit, node.offset, rt.capacity

            @jax.jit
            def fn(mask):
                m = mask if mask is not None else jnp.ones((cap,), jnp.bool_)
                return masks.first_k_mask(m, lim, off)
            self._jit_cache[key] = fn
        return RTable(rt.cols, rt.names, fn(rt.mask), rt.capacity)

    def _run_sort(self, node: L.Sort) -> RTable:
        rt = self.run(node.input)
        keys = node.keys

        def body(ctx, vvs, mask):
            key_specs = [
                (v.arr, v.valid, k.ascending, k.nulls_first)
                for v, k in zip(vvs, keys)
            ]
            # payload MUST come from ctx.cols (the traced arguments),
            # never rt.cols — closing over rt.cols bakes this
            # execution's buffers into the cached program as constants,
            # so a later run with swapped buffers (out-of-core chunk
            # streaming) would gather stale payload rows
            payload = [v.arr for v in ctx.cols] + \
                      [v.valid for v in ctx.cols]
            sorted_payload = sort_with_payload(key_specs, mask, payload)
            ncols = len(rt.cols)
            out_arrs = sorted_payload[:ncols]
            out_valids = sorted_payload[ncols:]
            alive = (jnp.sum(mask.astype(jnp.int32)) if mask is not None
                     else rt.capacity)
            new_mask = jnp.arange(rt.capacity) < alive
            return out_arrs, out_valids, new_mask

        (out_arrs, out_valids, new_mask), _ = self._eval_program(
            rt, [k.expr for k in keys], "sort", body)
        cols = [dataclasses.replace(c, arr=a, valid=v)
                for c, a, v in zip(rt.cols, out_arrs, out_valids)]
        return RTable(cols, rt.names, new_mask, rt.capacity)

    def _run_distinct(self, node: L.Distinct) -> RTable:
        rt = self.run(node.input)
        group_exprs = [
            L.BColumn(c.dtype, c.valid is not None, i, rt.names[i])
            for i, c in enumerate(rt.cols)
        ]
        return self._aggregate_impl(rt, group_exprs, [], rt.names,
                                    [c.dtype for c in rt.cols],
                                    [c.dictionary for c in rt.cols])

    def _run_aggregate(self, node: L.Aggregate) -> RTable:
        rt = self.run(node.input)
        group_exprs = list(node.group_exprs)
        agg_specs = list(node.aggs)

        if any(a.func in L.HOST_AGGS for a in agg_specs):
            return self._run_aggregate_host(node, rt, group_exprs, agg_specs)

        if not group_exprs:
            # ungrouped → single row
            arg_exprs = [a.arg for a in agg_specs if a.arg is not None]

            def body(ctx, vvs, mask):
                it = iter(vvs)
                inputs = []
                for a in agg_specs:
                    if a.arg is None:
                        inputs.append(AggInput(a.func, None, None, a.distinct, a.param))
                    else:
                        v = next(it)
                        inputs.append(AggInput(a.func, v.arr, v.valid, a.distinct, a.param))
                return ungrouped_aggregate(inputs, mask, PAD)

            out, prep = self._eval_program(rt, arg_exprs, "agg0", body)
            arg_iter = iter(arg_exprs)
            cols = []
            for (arr, valid), spec in zip(out, agg_specs):
                arr = _cast_physical(arr, spec.out_dtype)
                d = None
                if spec.arg is not None:
                    ae = next(arg_iter)
                    if spec.out_dtype.is_string:
                        d = prep.out_dict(ae)
                cols.append(RCol(arr, valid, spec.out_dtype, d))
            mask = jnp.arange(PAD) < 1
            return RTable(cols, [s.out_name for s in agg_specs], mask, PAD)

        # grouped
        prep_exprs = group_exprs + [a.arg for a in agg_specs if a.arg is not None]
        max_groups = _group_bound(rt, group_exprs)

        from ..ops import tiny_agg
        tiny = tiny_agg.tiny_gate(rt.cols, group_exprs, agg_specs)
        if tiny is not None:
            return self._run_aggregate_tiny(node, rt, group_exprs,
                                            agg_specs, prep_exprs, tiny)

        mxu = _mxu_agg_plan(rt, group_exprs, agg_specs)
        if mxu is not None:
            return self._run_aggregate_mxu(node, rt, group_exprs, agg_specs,
                                           prep_exprs, mxu)

        def body(ctx, vvs, mask):
            gvv = vvs[:len(group_exprs)]
            it = iter(vvs[len(group_exprs):])
            inputs = []
            for a in agg_specs:
                if a.arg is None:
                    inputs.append(AggInput(a.func, None, None, a.distinct, a.param))
                else:
                    v = next(it)
                    inputs.append(AggInput(a.func, v.arr, v.valid, a.distinct, a.param))
            keys = [(v.arr, v.valid) for v in gvv]
            out_keys, out_aggs, ngroups = grouped_aggregate(
                keys, inputs, mask, max_groups=max_groups)
            new_mask = jnp.arange(max_groups) < ngroups
            return out_keys, out_aggs, new_mask

        (out_keys, out_aggs, new_mask), prep = self._eval_program(
            rt, prep_exprs, "agg", body)

        cols = []
        names = []
        for (arr, valid), ge, f in zip(out_keys, group_exprs,
                                       node.schema[:len(group_exprs)]):
            d = prep.out_dict(ge) if f.dtype.is_string else None
            cols.append(RCol(_cast_physical(arr, f.dtype), valid, f.dtype, d))
            names.append(f.name)
        for (arr, valid), spec in zip(out_aggs, agg_specs):
            cols.append(RCol(_cast_physical(arr, spec.out_dtype), valid,
                             spec.out_dtype, None))
            names.append(spec.out_name)
        return RTable(cols, names, new_mask, max_groups)

    def _run_aggregate_tiny(self, node, rt, group_exprs, agg_specs,
                            prep_exprs, tiny):
        """Tiny-cardinality GROUP BY via masked reductions
        (ops/tiny_agg.py): one fused bandwidth pass, no sort, covers
        float sums / min / max / var the MXU kernel can't."""
        from ..ops import tiny_agg

        ng = len(group_exprs)
        cap = pad_count(tiny.g)

        def body(ctx, vvs, mask):
            kv = [(v.arr, v.valid) for v in vvs[:ng]]
            it = iter(vvs[ng:])
            arg_vvs = []
            for a in agg_specs:
                if a.arg is None:
                    arg_vvs.append(None)
                else:
                    v = next(it)
                    arg_vvs.append((v.arr, v.valid))
            slot = tiny_agg.tiny_slots(kv, tiny, mask)
            ident = lambda x: x                              # noqa: E731
            outs, nonempty = tiny_agg.tiny_reduce(
                slot, tiny, agg_specs, arg_vvs, mask, ident, ident, ident)
            gk = tiny_agg.tiny_group_keys(tiny, None)

            def padg(x, fill=0):
                if cap == tiny.g:
                    return x
                return jnp.concatenate(
                    [x, jnp.full((cap - tiny.g,), fill, x.dtype)])
            gk = [(padg(a), None if v is None else padg(v))
                  for a, v in gk]
            outs = [(padg(a), None if v is None else padg(v))
                    for a, v in outs]
            return gk, outs, padg(nonempty)

        (gk, outs, nonempty), prep = self._eval_program(
            rt, prep_exprs, "tinyagg", body)

        cols = []
        names = []
        for (arr, valid), ge, f in zip(gk, group_exprs, node.schema[:ng]):
            d = (rt.cols[ge.index].dictionary
                 if isinstance(ge, L.BColumn) and f.dtype.is_string
                 else None)
            cols.append(RCol(_cast_physical(arr, f.dtype), valid,
                             f.dtype, d))
            names.append(f.name)
        arg_iter = iter([a.arg for a in agg_specs if a.arg is not None])
        for (arr, valid), spec in zip(outs, agg_specs):
            d = None
            if spec.arg is not None:
                ae = next(arg_iter)
                if spec.out_dtype.is_string:
                    d = prep.out_dict(ae)
            cols.append(RCol(_cast_physical(arr, spec.out_dtype), valid,
                             spec.out_dtype, d))
            names.append(spec.out_name)
        return RTable(cols, names, nonempty, cap)

    def _run_aggregate_host(self, node, rt, group_exprs, agg_specs):
        """Aggregates with string outputs (string_agg): the device path
        handles every other aggregate; the string columns assemble on
        host (concatenation needs materialized strings + a rebuilt
        sorted dictionary). Group alignment comes from re-evaluating the
        group keys host-side against the device result's key rows."""
        host_specs = [(i, a) for i, a in enumerate(agg_specs)
                      if a.func in L.HOST_AGGS]
        dev_specs = list(agg_specs)
        for i, a in host_specs:
            # placeholder keeps arity/positions: count of the same arg
            dev_specs[i] = dataclasses.replace(
                a, func="count", distinct=False, out_dtype=SqlType.INT64,
                param=None, text_param=None)
        dev_node = dataclasses.replace(
            node, aggs=tuple(dev_specs),
            schema=tuple(
                dataclasses.replace(f, dtype=SqlType.INT64)
                if j >= len(group_exprs)
                and agg_specs[j - len(group_exprs)].func in L.HOST_AGGS
                else f
                for j, f in enumerate(node.schema)))
        out = self._run_aggregate(dev_node)

        # host inputs: group key values + the string-agg arg codes
        key_out, kprep = self._eval_program(rt, group_exprs, "hagg_k")
        arg_exprs = [a.arg for _, a in host_specs]
        arg_out, aprep = self._eval_program(rt, arg_exprs, "hagg_a")
        mask = np.asarray(jax.device_get(rt.mask_or_ones()))

        def host_col(arr, valid, dict_):
            a = np.asarray(jax.device_get(arr))
            v = (np.asarray(jax.device_get(valid))
                 if valid is not None else None)
            return a, v, dict_

        keys = [host_col(a, v, kprep.out_dict(e))
                for (a, v), e in zip(key_out, group_exprs)]

        def key_tuple(r):
            parts = []
            for a, v, d in keys:
                if v is not None and not v[r]:
                    parts.append(None)
                elif d is not None:
                    parts.append(str(d[a[r]]))
                else:
                    parts.append(a[r].item())
            return tuple(parts)

        groups: dict = {}
        args = [host_col(a, v, aprep.out_dict(e))
                for (a, v), e in zip(arg_out, arg_exprs)]
        for r in range(len(mask)):
            if not mask[r]:
                continue
            kt = key_tuple(r)
            slot = groups.setdefault(kt, [[] for _ in host_specs])
            for ci, (a, v, d) in enumerate(args):
                if v is not None and not v[r]:
                    continue
                slot[ci].append(str(d[a[r]]))

        # align to the device result's group rows
        g_cols = out.cols[:len(group_exprs)]
        n_groups_mask = np.asarray(jax.device_get(out.mask_or_ones()))
        gkeys = [host_col(c.arr, c.valid, c.dictionary) for c in g_cols]
        new_cols = list(out.cols)
        for ci, (pos, spec) in enumerate(host_specs):
            sep = spec.text_param or ""
            rendered = []
            valid_np = np.zeros((out.capacity,), np.bool_)
            for r in range(out.capacity):
                if not n_groups_mask[r]:
                    rendered.append("")
                    continue
                parts = []
                for a, v, d in gkeys:
                    if v is not None and not v[r]:
                        parts.append(None)
                    elif d is not None:
                        parts.append(str(d[a[r]]))
                    else:
                        parts.append(a[r].item())
                vals = groups.get(tuple(parts), [[]] * (ci + 1))[ci]
                if spec.distinct:
                    vals = list(dict.fromkeys(vals))
                if vals:
                    rendered.append(sep.join(vals))
                    valid_np[r] = True
                else:
                    rendered.append("")
            d, codes = np.unique(np.asarray(rendered, dtype=object),
                                 return_inverse=True)
            new_cols[len(group_exprs) + pos] = RCol(
                jnp.asarray(codes.astype(np.int32)), jnp.asarray(valid_np),
                SqlType.STRING, d.astype(object))
        return RTable(new_cols, out.names, out.mask, out.capacity)

    def _run_aggregate_mxu(self, node, rt, group_exprs, agg_specs,
                           prep_exprs, mxu):
        """Dense-small-key GROUP BY on the MXU (ops/pallas/groupby_mxu.py).

        Output: one row per value in the key span (sparse mask = groups
        with rows); keys are lo + arange(G)."""
        from ..ops.pallas.groupby_mxu import (build_fused_call,
                                              groupby_fused_sums)

        lo, span, g_pad, agg_digits = mxu
        interpret = jax.default_backend() != "tpu"

        def body(ctx, vvs, mask):
            karr, lo_k = vvs[0].arr, lo
            if karr.dtype in (jnp.int64, jnp.uint64) and not (
                    -2 ** 31 <= lo and lo + span < 2 ** 31):
                karr, lo_k = (karr - lo).astype(jnp.int32), 0
            values, masks, col_spec, plan = build_fused_call(
                agg_specs, agg_digits, vvs[1:])
            sums = groupby_fused_sums(
                karr.astype(jnp.int32), mask, values, masks,
                lo_key=lo_k, span=span, g_pad=g_pad, col_spec=col_spec,
                interpret=interpret)
            presence = sums[:, 0]
            out_aggs = []
            for kind, ci, cj in plan:
                if kind in ("count_star", "count"):
                    out_aggs.append((sums[:, cj].astype(jnp.int64), None))
                elif kind == "sum":
                    cnt = sums[:, cj]
                    out_aggs.append((sums[:, ci].astype(jnp.int64), cnt > 0))
                else:  # avg
                    cnt = sums[:, cj]
                    out_aggs.append((sums[:, ci] / jnp.maximum(cnt, 1.0),
                                     cnt > 0))
            key_vals = (lo + jnp.arange(g_pad, dtype=jnp.int64)).astype(
                vvs[0].arr.dtype)
            new_mask = presence > 0
            return key_vals, out_aggs, new_mask

        (key_vals, out_aggs, new_mask), prep = self._eval_program(
            rt, prep_exprs, "agg_mxu", body)

        cols = []
        names = []
        kf = node.schema[0]
        d = prep.out_dict(group_exprs[0]) if kf.dtype.is_string else None
        cols.append(RCol(_cast_physical(key_vals, kf.dtype), None, kf.dtype, d))
        names.append(kf.name)
        for (arr, valid), spec in zip(out_aggs, agg_specs):
            cols.append(RCol(_cast_physical(arr, spec.out_dtype), valid,
                             spec.out_dtype, None))
            names.append(spec.out_name)
        return RTable(cols, names, new_mask, key_vals.shape[0])

    def _aggregate_impl(self, rt, group_exprs, agg_specs, names, dtypes, dicts):
        """Distinct via grouping on all columns."""
        max_groups = _group_bound(rt, group_exprs)

        def body(ctx, vvs, mask):
            keys = [(v.arr, v.valid) for v in vvs]
            out_keys, _, ngroups = grouped_aggregate(
                keys, [], mask, max_groups=max_groups)
            new_mask = jnp.arange(max_groups) < ngroups
            return out_keys, new_mask

        (out_keys, new_mask), _ = self._eval_program(
            rt, group_exprs, "distinct", body)
        cols = [
            RCol(_cast_physical(arr, dt), valid, dt, d)
            for (arr, valid), dt, d in zip(out_keys, dtypes, dicts)
        ]
        return RTable(cols, list(names), new_mask, max_groups)

    # ================= window =================

    def _run_window(self, node: L.Window) -> RTable:
        """Window functions: one partition-sort carrying all payloads,
        then segmented scans (ops/window_ops.py)."""
        from ..ops.window_ops import window_program

        rt = self.run(node.input)
        part_exprs = list(node.partition_exprs)
        order_keys = list(node.order_keys)
        arg_exprs = [s.arg for s in node.specs if s.arg is not None]
        prep_exprs = part_exprs + [k.expr for k in order_keys] + arg_exprs
        specs = node.specs
        cap = rt.capacity

        def body(ctx, vvs, mask):
            np_ = len(part_exprs)
            no = len(order_keys)
            part = [(v.arr, v.valid) for v in vvs[:np_]]
            order = [
                (v.arr, v.valid, k.ascending, k.nulls_first)
                for v, k in zip(vvs[np_:np_ + no], order_keys)
            ]
            args_it = iter(vvs[np_ + no:])
            args = [
                ((lambda v: (v.arr, v.valid))(next(args_it))
                 if s.arg is not None else None)
                for s in specs
            ]
            # ctx.cols, not rt.cols: see _run_sort — rt.cols would bake
            # this run's buffers into the cached program as constants
            inputs = [(v.arr, v.valid) for v in ctx.cols]
            alive = mask if mask is not None else jnp.ones((cap,), jnp.bool_)
            return window_program(part, order, args, inputs, specs, alive, cap)

        (sorted_inputs, win_cols, new_mask), prep = self._eval_program(
            rt, prep_exprs, "window", body)

        cols = [
            RCol(arr, valid, c.dtype, c.dictionary, c.stats)
            for (arr, valid), c in zip(sorted_inputs, rt.cols)
        ]
        for (arr, valid), s, f in zip(win_cols, specs,
                                      node.schema[len(rt.cols):]):
            cols.append(RCol(_cast_physical(arr, f.dtype), valid, f.dtype,
                             prep.out_dict(s.arg)
                             if (f.dtype.is_string and s.arg is not None)
                             else None))
        return RTable(cols, [f.name for f in node.schema], new_mask, cap)

    # ================= union =================

    def _run_union(self, node: L.Union) -> RTable:
        parts = [self.run(c) for c in node.inputs]
        ncols = len(node.schema)
        out_cols: list[RCol] = []
        total_cap = sum(p.capacity for p in parts)
        for ci, f in enumerate(node.schema):
            arrs, valids = [], []
            if f.dtype.is_string:
                dicts = [p.cols[ci].dictionary if p.cols[ci].dictionary is not None
                         else np.asarray([""], dtype=object) for p in parts]
                merged = dicts[0]
                remaps = [np.arange(len(dicts[0]), dtype=np.int32)]
                for d in dicts[1:]:
                    merged, r_old, r_new = merge_dicts(merged, d)
                    remaps = [r_old[r] for r in remaps]
                    remaps.append(r_new)
                for p, remap in zip(parts, remaps):
                    c = p.cols[ci]
                    rm = jnp.asarray(remap)
                    arrs.append(rm[jnp.clip(c.arr, 0, rm.shape[0] - 1)])
                    valids.append(c.valid)
                dictionary = merged
            else:
                for p in parts:
                    c = p.cols[ci]
                    arrs.append(c.arr.astype(f.dtype.to_jax()))
                    valids.append(c.valid)
                dictionary = None
            arr = jnp.concatenate(arrs)
            if any(v is not None for v in valids):
                valid = jnp.concatenate([
                    v if v is not None else jnp.ones((p.capacity,), jnp.bool_)
                    for v, p in zip(valids, parts)])
            else:
                valid = None
            out_cols.append(RCol(arr, valid, f.dtype, dictionary))
        mask = jnp.concatenate([p.mask_or_ones() for p in parts])
        return RTable(out_cols, [f.name for f in node.schema], mask, total_cap)

    # ================= join =================

    def _run_join(self, node: L.Join) -> RTable:
        from .join_exec import execute_join
        left = self.run(node.left)
        right = self.run(node.right)
        return execute_join(self, node, left, right)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _cast_physical(arr, dtype: SqlType):
    want = dtype.to_jax()
    if arr.dtype != np.dtype(want) and arr.dtype != want:
        return arr.astype(want)
    return arr


def _mxu_agg_plan(rt: RTable, group_exprs, agg_specs):
    return mxu_agg_gate(rt.cols, rt.capacity, group_exprs, agg_specs)


def mxu_agg_gate(cols, capacity, group_exprs, agg_specs):
    """Static gate for the MXU one-hot aggregation kernel:
    single non-nullable dense-small-span key + count/sum/avg aggregates
    whose integer bounds keep the digit decomposition exact.
    cols: objects with .valid/.dtype/.dictionary/.stats (RCol or SCol).
    Returns (lo, span, g_pad, agg_digits) or None; agg_digits is the
    per-agg base-256 digit count of the value column (None for counts).
    Feasibility (M <= one MXU tile) is checked against the worst-case
    contribution layout; the body may dedupe valid-count columns onto
    presence, which only shrinks M."""
    import os

    from ..ops.pallas.groupby_mxu import (column_digits, plan_shape,
                                          supported_span_aggs)
    from ..table import pad_count

    if os.environ.get("IGLOO_DISABLE_MXU_AGG"):
        return None
    if len(group_exprs) != 1:
        return None
    g = group_exprs[0]
    if not isinstance(g, L.BColumn) or g.index >= len(cols):
        return None
    col = cols[g.index]
    if col.valid is not None:          # nullable keys → sort path (null group)
        return None
    if col.dictionary is not None:
        lo, span = 0, max(len(col.dictionary), 1)
    elif col.stats is not None and col.dtype.is_integer:
        lo, hi = col.stats
        span = hi - lo + 1
    else:
        return None
    if not (0 < span <= 4096):
        return None
    funcs, dtypes, bounds = [], [], []
    for a in agg_specs:
        if a.distinct:
            return None
        funcs.append(a.func)
        if a.arg is None:
            dtypes.append(None)
            bounds.append(None)
            continue
        dtypes.append(a.arg.dtype)
        b = None
        if isinstance(a.arg, L.BColumn) and a.arg.index < len(cols):
            st = cols[a.arg.index].stats
            if st is not None:
                b = max(abs(st[0]), abs(st[1]))
        bounds.append(b)
    if not supported_span_aggs(funcs, dtypes, bounds, capacity):
        return None
    worst = [1]                        # presence column
    agg_digits = []
    for f, b in zip(funcs, bounds):
        if f == "count_star":
            agg_digits.append(None)
            continue
        if f == "count":
            agg_digits.append(None)
            worst.append(1)
        else:                          # sum / avg: value + valid-count
            d = column_digits(f, b, capacity)
            agg_digits.append(d)
            worst.append(d)
            worst.append(1)
    g_pad = pad_count(span, 8)
    if plan_shape(g_pad, tuple(worst)) is None:
        return None                    # M would exceed one MXU tile
    return lo, span, g_pad, tuple(agg_digits)


def _group_bound(rt: RTable, group_exprs) -> int:
    """Static upper bound on the number of groups: dictionary sizes for
    string keys, (max-min+1) from ingest stats for integer keys. Falls
    back to the row capacity when unknown. +1 per nullable key (the null
    group)."""
    from ..table import pad_count
    bound = 1
    for g in group_exprs:
        col_bound = None
        if isinstance(g, L.BColumn) and g.index < len(rt.cols):
            c = rt.cols[g.index]
            if c.dictionary is not None:
                col_bound = len(c.dictionary) + 1
            elif c.stats is not None:
                lo, hi = c.stats
                span = hi - lo + 1
                if 0 < span <= (1 << 22):
                    col_bound = span + 1
        elif getattr(g, "dtype", None) is SqlType.BOOL:
            col_bound = 3
        if col_bound is None:
            return rt.capacity
        bound *= col_bound
        if bound >= rt.capacity:
            return rt.capacity
    return min(pad_count(bound), rt.capacity)


def _cols_sig(cols: list[RCol]):
    return tuple((str(c.arr.dtype), c.arr.shape, c.valid is not None)
                 for c in cols)


def _prep_sig(prep: ExprPrep):
    items = []
    for nid, info in sorted(prep.node_aux.items()):
        for k, v in sorted(info.items(), key=lambda kv: str(kv[0])):
            if isinstance(v, (int, bool, str, float, type(None))):
                items.append((k, v))
            elif isinstance(v, list):
                items.append((k, tuple(v)))
    shapes = tuple(a.shape + (str(a.dtype),) for a in prep.aux_arrays)
    return (tuple(items), shapes)


def _format_sql_strings(uniq: np.ndarray, dtype: SqlType) -> np.ndarray:
    """SQL text for unique values (Postgres-style: true/false, ISO
    dates, 'YYYY-MM-DD HH:MM:SS[.ffffff]' timestamps, shortest
    round-trip floats)."""
    if dtype is SqlType.BOOL:
        return np.where(uniq.astype(bool), "true", "false").astype(object)
    if dtype is SqlType.DATE32:
        base = np.datetime64("1970-01-01", "D")
        return (base + uniq.astype("timedelta64[D]")).astype(str) \
            .astype(object)
    if dtype is SqlType.TIMESTAMP:
        ts = uniq.astype("datetime64[us]").astype(str)
        out = np.char.replace(ts, "T", " ")
        out = np.char.replace(out, ".000000", "")
        return out.astype(object)
    if dtype.is_integer:
        return uniq.astype(str).astype(object)
    # floats: shortest round-trip repr
    return np.asarray([repr(float(v)) for v in uniq], dtype=object)


def _unique_names(names: list[str]) -> list[str]:
    """Reference convention: duplicate right-side column names get a
    `right_` prefix (/root/reference/crates/engine/src/operators/hash_join.rs:53-64)."""
    seen: dict[str, int] = {}
    out = []
    for n in names:
        if n not in seen:
            seen[n] = 0
            out.append(n)
        else:
            cand = f"right_{n}"
            while cand in seen:
                seen[n] += 1
                cand = f"right_{n}_{seen[n]}"
            seen[cand] = 0
            out.append(cand)
    return out
