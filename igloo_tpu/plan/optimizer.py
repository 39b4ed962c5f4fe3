"""Rule-based logical optimizer.

The reference relies on DataFusion's optimizer for its working path
(SURVEY §1). Native rules:
- limit-into-sort fusion (top-k),
- adjacent-filter merging,
- general predicate pushdown: filters move through projections
  (pass-through column substitution), below aggregates (group-key
  conjuncts — HAVING pushdown), and into join inputs,
- greedy left-deep join reordering over INNER equi-join chains
  (largest relation stays the probe side, connected relations join
  smallest-first — the dim-first order a Q5-style star query wants),
- build-side swap on estimated sizes,
- string-render hoisting and column pruning.
"""

from __future__ import annotations

import dataclasses

from ..dtypes import SqlType
from ..sql.ast import BinOp, JoinKind
from . import logical as L


def optimize(plan: L.LogicalPlan,
             table_rows=None) -> L.LogicalPlan:
    """table_rows: optional {table_name_lower: nrows} for size-based
    rewrites (join build-side selection)."""
    plan = _rewrite(plan, _fuse_limit_sort)
    plan = _rewrite(plan, _merge_filters)
    plan = _rewrite(plan, _push_filter_through_projection)
    plan = _rewrite(plan, _push_filter_below_aggregate)
    plan = _rewrite(plan, _push_filter_into_join)
    plan = _rewrite(plan, _push_filter_into_join)  # reach newly-created sites
    # comma-join conversion to FIXPOINT: one pushdown pass moves a
    # conjunct a single join level, and comma-FROM trees are as deep as
    # the relation count (TPC-H Q8: 8 relations) — alternate
    # cross→inner with pushdown until the plan stops changing
    prev = None
    for _ in range(16):
        plan = _rewrite(plan, _merge_filters)
        plan = _rewrite(plan, _cross_to_inner)
        plan = _rewrite(plan, _push_filter_into_join)
        sig = plan.tree_str()
        if sig == prev:
            break
        prev = sig
    plan = _rewrite(plan, _merge_filters)
    if table_rows:
        plan = _reorder_joins_tree(plan, table_rows)
        plan = _rewrite(plan, _push_filter_into_join)
        plan = _rewrite(plan, lambda n: _swap_join_sides(n, table_rows))
    plan = _rewrite(plan, _hoist_string_renders)
    plan, _ = _prune_columns(plan, set(range(len(plan.schema))))
    return plan


def _estimate_rows(node: L.LogicalPlan, table_rows: dict,
                   memo: dict) -> int:
    """Crude bottom-up cardinality estimate for join-order decisions."""
    got = memo.get(id(node))
    if got is not None:
        return got
    if isinstance(node, L.Scan):
        est = table_rows.get(node.table.lower(), 1 << 20)
    elif isinstance(node, L.Values):
        est = len(node.rows)
    elif isinstance(node, L.Aggregate):
        est = max(_estimate_rows(node.input, table_rows, memo) // 2, 1)
    elif isinstance(node, L.Filter):
        # crude 1/3 selectivity: enough to rank filtered dims ahead of
        # unfiltered ones in the greedy join order
        est = max(_estimate_rows(node.input, table_rows, memo) // 3, 1)
    elif isinstance(node, L.Join):
        l = _estimate_rows(node.left, table_rows, memo)
        r = _estimate_rows(node.right, table_rows, memo)
        est = l * r if node.kind is JoinKind.CROSS else max(l, r)
    elif isinstance(node, L.Union):
        est = sum(_estimate_rows(c, table_rows, memo) for c in node.inputs)
    elif isinstance(node, L.Limit) and node.limit is not None:
        est = min(node.limit + node.offset,
                  _estimate_rows(node.input, table_rows, memo))
    else:
        kids = node.children()
        est = (_estimate_rows(kids[0], table_rows, memo) if kids else 1)
    memo[id(node)] = est
    return est


def _swap_join_sides(node: L.LogicalPlan, table_rows: dict
                     ) -> L.LogicalPlan:
    """Build on the smaller side: the right side is the hash build
    (sorted + bucket-addressed); when it is estimated ≫ the probe side,
    swap sides (flipping LEFT↔RIGHT) and restore column order with a
    projection. The reference always builds right
    (/root/reference/crates/engine/src/operators/hash_join.rs:100) and
    has no size-based planning at all."""
    if not isinstance(node, L.Join):
        return node
    flip = {JoinKind.INNER: JoinKind.INNER, JoinKind.LEFT: JoinKind.RIGHT,
            JoinKind.RIGHT: JoinKind.LEFT, JoinKind.FULL: JoinKind.FULL}
    if node.kind not in flip:
        return node
    memo: dict = {}
    el = _estimate_rows(node.left, table_rows, memo)
    er = _estimate_rows(node.right, table_rows, memo)
    if er <= 2 * el:
        return node
    nl = len(node.left.schema)
    nr = len(node.right.schema)
    remap = {i: (i + nr if i < nl else i - nl)
             for i in range(nl + nr)}
    residual = (_remap_expr(node.residual, remap)
                if node.residual is not None else None)
    inner_schema = tuple(node.schema[nl:]) + tuple(node.schema[:nl])
    inner = L.Join(node.right, node.left, flip[node.kind],
                   node.right_keys, node.left_keys, residual, inner_schema,
                   getattr(node, "null_aware_anti", True))
    out_exprs = tuple(
        L.BColumn(f.dtype, f.nullable, (j + nr) if j < nl else (j - nl),
                  f.name)
        for j, f in enumerate(node.schema))
    return L.Projection(inner, out_exprs, tuple(node.schema))


def _node_expr_slots(node):
    """(getter, setter) pairs for every expression a node evaluates —
    the sites the string-render hoist may rewrite."""
    if isinstance(node, L.Projection):
        return [(lambda n=node: n.exprs,
                 lambda v, n=node: setattr(n, "exprs", v))]
    if isinstance(node, L.Filter):
        return [(lambda n=node: (n.predicate,),
                 lambda v, n=node: setattr(n, "predicate", v[0]))]
    if isinstance(node, L.Aggregate):
        def set_aggs(v, n=node):
            n.aggs = tuple(dataclasses.replace(a, arg=e)
                           for a, e in zip(n.aggs, v))
        return [(lambda n=node: n.group_exprs,
                 lambda v, n=node: setattr(n, "group_exprs", v)),
                (lambda n=node: tuple(a.arg for a in n.aggs), set_aggs)]
    if isinstance(node, L.Sort):
        def set_keys(v, n=node):
            n.keys = tuple(dataclasses.replace(k, expr=e)
                           for k, e in zip(n.keys, v))
        return [(lambda n=node: tuple(k.expr for k in n.keys), set_keys)]
    return []


def _replace_subexprs(e, mapping: dict):
    if e is None:
        return None
    if id(e) in mapping:
        return mapping[id(e)]
    if isinstance(e, (L.BBinary, L.BIsDistinctFrom)):
        return dataclasses.replace(
            e, left=_replace_subexprs(e.left, mapping),
            right=_replace_subexprs(e.right, mapping))
    if isinstance(e, (L.BUnary, L.BIsNull, L.BCast, L.BLike)):
        return dataclasses.replace(
            e, operand=_replace_subexprs(e.operand, mapping))
    if isinstance(e, L.BInList):
        return dataclasses.replace(
            e, operand=_replace_subexprs(e.operand, mapping),
            items=tuple(_replace_subexprs(i, mapping) for i in e.items))
    if isinstance(e, L.BCase):
        return dataclasses.replace(
            e, whens=tuple((_replace_subexprs(c, mapping),
                            _replace_subexprs(v, mapping))
                           for c, v in e.whens),
            else_=_replace_subexprs(e.else_, mapping))
    if isinstance(e, (L.BScalarFunc, L.BStringFunc)):
        return dataclasses.replace(
            e, args=tuple(_replace_subexprs(a, mapping) for a in e.args))
    return e


def _hoist_string_renders(node: L.LogicalPlan) -> L.LogicalPlan:
    """CAST(x AS VARCHAR) over non-strings: hoist the operand into a
    pre-projection, render it host-side (L.RenderString — the
    lexicographically-sorted dictionary the string invariants demand
    cannot be built on device), and reference the rendered column."""
    slots = _node_expr_slots(node)
    if not slots:
        return node
    casts = []
    for get, _ in slots:
        for e in get():
            if e is None:
                continue
            for sub in L.walk_expr(e):
                if (isinstance(sub, L.BCast) and sub.dtype.is_string
                        and sub.operand is not None
                        and not sub.operand.dtype.is_string
                        and not any(s is sub for s in casts)):
                    casts.append(sub)
    if not casts:
        return node
    inp = node.input
    n0 = len(inp.schema)
    pre_exprs = tuple(
        L.BColumn(f.dtype, f.nullable, i, f.name)
        for i, f in enumerate(inp.schema)
    ) + tuple(c.operand for c in casts)
    extra = tuple(L.Field(f"__render_{i}", c.operand.dtype, c.nullable)
                  for i, c in enumerate(casts))
    pre = L.Projection(inp, pre_exprs, tuple(inp.schema) + extra)
    rendered = tuple(L.Field(f.name, SqlType.STRING, f.nullable)
                     for f in extra)
    render = L.RenderString(pre, tuple(range(n0, n0 + len(casts))),
                            tuple(inp.schema) + rendered)
    mapping = {
        id(c): L.BColumn(SqlType.STRING, c.nullable, n0 + i,
                         f"__render_{i}")
        for i, c in enumerate(casts)
    }
    for get, setter in slots:
        setter(tuple(_replace_subexprs(e, mapping) for e in get()))
    node.input = render
    return node


def _push_filter_into_join(plan: L.LogicalPlan) -> L.LogicalPlan:
    """Filter(Join) conjuncts that reference only one side move below the
    join (shrinking the build side before the probe — the reference gets
    this from DataFusion's pushdown).

    Safe sides depend on join kind: pushing to the left is wrong for
    RIGHT/FULL (it would delete null-padded probe rows), to the right for
    LEFT/FULL. SEMI/ANTI/CROSS outputs only the left side.
    """
    from ..sql.ast import JoinKind

    if not (isinstance(plan, L.Filter) and isinstance(plan.input, L.Join)):
        return plan
    join = plan.input
    nl = len(join.left.schema)
    can_left = join.kind in (JoinKind.INNER, JoinKind.LEFT, JoinKind.CROSS,
                             JoinKind.SEMI, JoinKind.ANTI)
    can_right = join.kind in (JoinKind.INNER, JoinKind.RIGHT, JoinKind.CROSS)

    keep = []
    for conj in _split_bool_and(plan.predicate):
        refs = L.referenced_columns(conj)
        if refs and max(refs) < nl and can_left:
            join.left = L.Filter(join.left, conj)
        elif refs and min(refs) >= nl and can_right:
            shifted = L.shift_columns(conj, -nl)
            join.right = L.Filter(join.right, shifted)
        else:
            keep.append(conj)
    if len(keep) == len(_split_bool_and(plan.predicate)):
        return plan
    if not keep:
        return join
    pred = keep[0]
    for c in keep[1:]:
        pred = L.BBinary(SqlType.BOOL, pred.nullable or c.nullable,
                         BinOp.AND, pred, c)
    return L.Filter(join, pred)


def _cross_to_inner(plan: L.LogicalPlan) -> L.LogicalPlan:
    """Filter over a CROSS (or residual-free INNER) join: equality
    conjuncts whose sides resolve wholly on opposite join inputs become
    join keys. This is how comma-FROM syntax (`FROM a, b WHERE a.k =
    b.k` — every TPC-H query) reaches the hash-join paths and the join
    reorderer instead of materializing the cross product. WHERE is
    null-rejecting and the equi-join's NULL keys never match, so the
    rewrite is exact. Non-equality conjuncts stay in the Filter above."""
    if not (isinstance(plan, L.Filter) and isinstance(plan.input, L.Join)):
        return plan
    join = plan.input
    if join.residual is not None or join.kind not in (JoinKind.CROSS,
                                                      JoinKind.INNER):
        return plan
    nl = len(join.left.schema)
    keys_l, keys_r, keep = [], [], []
    for conj in _split_bool_and(plan.predicate):
        if isinstance(conj, L.BBinary) and conj.op is BinOp.EQ:
            rl = L.referenced_columns(conj.left)
            rr = L.referenced_columns(conj.right)
            if rl and rr:
                if max(rl) < nl and min(rr) >= nl:
                    keys_l.append(conj.left)
                    keys_r.append(L.shift_columns(conj.right, -nl))
                    continue
                if max(rr) < nl and min(rl) >= nl:
                    keys_l.append(conj.right)
                    keys_r.append(L.shift_columns(conj.left, -nl))
                    continue
        keep.append(conj)
    if not keys_l:
        return plan
    join.kind = JoinKind.INNER
    join.left_keys = tuple(join.left_keys) + tuple(keys_l)
    join.right_keys = tuple(join.right_keys) + tuple(keys_r)
    if not keep:
        return join
    plan.predicate = _and_all(keep)
    return plan


def _split_bool_and(e: L.BExpr) -> list:
    if isinstance(e, L.BBinary) and e.op is BinOp.AND:
        return _split_bool_and(e.left) + _split_bool_and(e.right)
    return [e]


def _and_all(conjs: list) -> L.BExpr:
    pred = conjs[0]
    for c in conjs[1:]:
        pred = L.BBinary(SqlType.BOOL, pred.nullable or c.nullable,
                         BinOp.AND, pred, c)
    return pred


def _push_filter_through_projection(plan: L.LogicalPlan) -> L.LogicalPlan:
    """Filter(Projection) → Projection(Filter) when every projection
    output the predicate references is a plain column or literal (no
    re-evaluation cost). Unblocks _push_filter_into_join across
    SELECT-list projections — the reference gets this whole family from
    DataFusion's PushDownFilter."""
    if not (isinstance(plan, L.Filter)
            and isinstance(plan.input, L.Projection)):
        return plan
    proj = plan.input
    push, keep = [], []
    for conj in _split_bool_and(plan.predicate):
        refs = L.referenced_columns(conj)
        if all(isinstance(proj.exprs[i], (L.BColumn, L.BLiteral))
               for i in refs):
            push.append(L.rewrite_expr(
                conj,
                lambda n: (proj.exprs[n.index]
                           if isinstance(n, L.BColumn) else n)))
        else:
            keep.append(conj)
    if not push:
        return plan
    proj.input = L.Filter(proj.input, _and_all(push))
    if not keep:
        return proj
    plan.predicate = _and_all(keep)
    return plan


def _push_filter_below_aggregate(plan: L.LogicalPlan) -> L.LogicalPlan:
    """HAVING-style conjuncts that reference only GROUP BY output
    columns filter the input rows instead of the groups (substituting
    the group expressions). Aggregate schema = group fields ++ agg
    fields, so a conjunct qualifies iff max(refs) < len(group_exprs)."""
    if not (isinstance(plan, L.Filter)
            and isinstance(plan.input, L.Aggregate)):
        return plan
    agg = plan.input
    ng = len(agg.group_exprs)
    if ng == 0:
        return plan
    push, keep = [], []
    for conj in _split_bool_and(plan.predicate):
        refs = L.referenced_columns(conj)
        if refs and max(refs) < ng:
            push.append(L.rewrite_expr(
                conj,
                lambda n: (agg.group_exprs[n.index]
                           if isinstance(n, L.BColumn) else n)))
        else:
            keep.append(conj)
    if not push:
        return plan
    agg.input = L.Filter(agg.input, _and_all(push))
    if not keep:
        return agg
    plan.predicate = _and_all(keep)
    return plan


# ---------------------------------------------------------------------------
# join reordering: greedy left-deep order over INNER equi-join chains
# ---------------------------------------------------------------------------

def _localize_key(expr, offsets: list):
    """Map a key expression over a concatenated schema to
    (relation_idx, relation-local expr); None when it spans relations."""
    refs = L.referenced_columns(expr)
    if not refs:
        return None
    for ri in range(len(offsets) - 1):
        lo, hi = offsets[ri], offsets[ri + 1]
        if all(lo <= c < hi for c in refs):
            return ri, L.shift_columns(expr, -lo)
    return None


def _flatten_inner_chain(node):
    """Flatten a tree of residual-free INNER equi-joins into
    (relations, edges); edges are (rel_a, expr_a_local, rel_b,
    expr_b_local) equi pairs. Non-qualifying subtrees become leaf
    relations. Returns None when any key spans multiple relations."""
    if not (isinstance(node, L.Join) and node.kind is JoinKind.INNER
            and node.residual is None and node.left_keys):
        return [node], []
    lf = _flatten_inner_chain(node.left)
    rf = _flatten_inner_chain(node.right)
    if lf is None or rf is None:
        return None
    lrels, ledges = lf
    rrels, redges = rf
    rels = lrels + rrels
    edges = list(ledges) + [(a + len(lrels), ea, b + len(lrels), eb)
                            for a, ea, b, eb in redges]
    loffs = [0]
    for r in lrels:
        loffs.append(loffs[-1] + len(r.schema))
    roffs = [0]
    for r in rrels:
        roffs.append(roffs[-1] + len(r.schema))
    for le, re_ in zip(node.left_keys, node.right_keys):
        ll = _localize_key(le, loffs)
        rl = _localize_key(re_, roffs)
        if ll is None or rl is None:
            return None
        edges.append((ll[0], ll[1], len(lrels) + rl[0], rl[1]))
    return rels, edges


def _reorder_joins_tree(node, table_rows):
    """Top-down driver: reorder each maximal INNER equi-join chain of
    ≥3 relations, recursing into the chain's leaf relations (a rewritten
    chain's new Projection must not be re-flattened by a second pass)."""
    flat = None
    if (isinstance(node, L.Join) and node.kind is JoinKind.INNER
            and node.residual is None and node.left_keys):
        flat = _flatten_inner_chain(node)
    if flat is not None and len(flat[0]) >= 3:
        rels = [_reorder_joins_tree(r, table_rows) for r in flat[0]]
        out = _rebuild_chain(node, rels, flat[1], table_rows)
        if out is not None:
            return out
    for attr in ("input", "left", "right"):
        child = getattr(node, attr, None)
        if isinstance(child, L.LogicalPlan):
            setattr(node, attr, _reorder_joins_tree(child, table_rows))
    if isinstance(node, L.Union):
        node.inputs = tuple(_reorder_joins_tree(c, table_rows)
                            for c in node.inputs)
    return node


def _raw_base(node: L.LogicalPlan, table_rows: dict) -> int:
    """Unfiltered size proxy of a relation subtree (its scan size,
    ignoring filter discounts) — the join-size denominator."""
    if isinstance(node, L.Scan):
        return table_rows.get(node.table.lower(), 1 << 20)
    kids = node.children()
    return max((_raw_base(k, table_rows) for k in kids), default=1)


def _rebuild_chain(root, rels, edges, table_rows):
    """Greedy operator ordering (GOO) over the join graph: repeatedly
    merge the connected pair with the smallest estimated join size,
    producing a bushy tree — for a star/snowflake this builds
    (dim ⋈ filtered_subdim) composites first so the big fact probe sees
    pre-reduced build sides. Size model: joining A (bigger est) with B
    scales A by B's filtered fraction:
        est(A ⋈ B) = est_A · est_B / raw_base(min side).
    The probe (bigger) side becomes the LEFT input. Output column order
    is restored with a projection. Returns None to keep the original
    plan (disconnected graph, or order already optimal)."""
    memo: dict = {}
    n = len(rels)
    nodes = []                      # forest of merged subtrees
    for ri, r in enumerate(rels):
        nodes.append({
            "plan": r, "offs": {ri: 0},
            "est": max(_estimate_rows(r, table_rows, memo), 1),
            "base": max(_raw_base(r, table_rows), 1),
        })

    merge_seq = []
    alive = list(range(n))          # indices into `nodes`
    owner = list(range(n))          # rel idx -> node idx

    def join_est(i, j):
        a, b = nodes[i], nodes[j]
        big, small = (a, b) if a["est"] >= b["est"] else (b, a)
        return max(big["est"] * small["est"] // small["base"], 1)

    while len(alive) > 1:
        pairs = set()
        for a, _, b, _ in edges:
            ia, ib = owner[a], owner[b]
            if ia != ib:
                pairs.add((min(ia, ib), max(ia, ib)))
        if not pairs:
            return None             # disconnected: cross-join-ish
        i, j = min(pairs, key=lambda p: join_est(*p))
        # probe (bigger est) side left, build side right
        if nodes[i]["est"] < nodes[j]["est"]:
            i, j = j, i
        li, rj = nodes[i], nodes[j]
        lkeys, rkeys = [], []
        for a, ea, b, eb in edges:
            if owner[a] == i and owner[b] == j:
                lkeys.append(L.shift_columns(ea, li["offs"][a]))
                rkeys.append(L.shift_columns(eb, rj["offs"][b]))
            elif owner[b] == i and owner[a] == j:
                lkeys.append(L.shift_columns(eb, li["offs"][b]))
                rkeys.append(L.shift_columns(ea, rj["offs"][a]))
        nl = len(li["plan"].schema)
        schema = tuple(li["plan"].schema) + tuple(rj["plan"].schema)
        nodes[i] = {
            "plan": L.Join(li["plan"], rj["plan"], JoinKind.INNER,
                           tuple(lkeys), tuple(rkeys), None, schema),
            "offs": {**li["offs"],
                     **{rid: off + nl for rid, off in rj["offs"].items()}},
            "est": join_est(i, j),
            "base": max(li["base"], rj["base"]),
        }
        for rid in rj["offs"]:
            owner[rid] = i
        alive.remove(j)
        merge_seq.append(sorted(nodes[i]["offs"]))

    # original left-deep order merges {0,1}, {0,1,2}, ... — skip rebuild
    if merge_seq == [list(range(k)) for k in range(2, n + 1)]:
        return None

    final = nodes[alive[0]]
    # original concatenated offsets (relation index order)
    ooffs = [0]
    for r in rels:
        ooffs.append(ooffs[-1] + len(r.schema))
    out_exprs = []
    for i, f in enumerate(root.schema):
        k = next(ri for ri in range(n) if ooffs[ri] <= i < ooffs[ri + 1])
        out_exprs.append(L.BColumn(f.dtype, f.nullable,
                                   final["offs"][k] + (i - ooffs[k]),
                                   f.name))
    return L.Projection(final["plan"], tuple(out_exprs),
                        tuple(root.schema))


# ---------------------------------------------------------------------------
# column pruning: drop unreferenced columns from scans (and narrow
# intermediate schemas), rewriting column indices along the way.
# DataFusion does this for the reference; here it is rule one because every
# dropped column is an HBM array never touched.
# ---------------------------------------------------------------------------

def _remap_expr(e: L.BExpr, mapping: dict) -> L.BExpr:
    def fn(n):
        if isinstance(n, L.BColumn):
            return dataclasses.replace(n, index=mapping[n.index])
        return n
    return L.rewrite_expr(e, fn)


def _prune_columns(node: L.LogicalPlan, needed: set):
    """Returns (new_node, mapping old_output_idx -> new_output_idx)."""
    if isinstance(node, L.Scan):
        keep = sorted(needed) if needed else list(range(min(1, len(node.schema))))
        if not keep:                       # keep one column for row counts
            keep = [0] if node.schema else []
        node.schema = tuple(node.schema[i] for i in keep)
        return node, {old: new for new, old in enumerate(keep)}

    if isinstance(node, L.Values):
        return node, {i: i for i in range(len(node.schema))}

    if isinstance(node, L.Projection):
        keep = sorted(needed)
        child_needed = set()
        for i in keep:
            child_needed |= L.referenced_columns(node.exprs[i])
        node.input, cmap = _prune_columns(node.input, child_needed)
        node.exprs = tuple(_remap_expr(node.exprs[i], cmap) for i in keep)
        node.schema = tuple(node.schema[i] for i in keep)
        return node, {old: new for new, old in enumerate(keep)}

    if isinstance(node, L.Filter):
        child_needed = set(needed) | L.referenced_columns(node.predicate)
        node.input, cmap = _prune_columns(node.input, child_needed)
        node.predicate = _remap_expr(node.predicate, cmap)
        return node, dict(cmap)

    if isinstance(node, L.Sort):
        child_needed = set(needed)
        for k in node.keys:
            child_needed |= L.referenced_columns(k.expr)
        node.input, cmap = _prune_columns(node.input, child_needed)
        node.keys = tuple(
            dataclasses.replace(k, expr=_remap_expr(k.expr, cmap))
            for k in node.keys)
        return node, dict(cmap)

    if isinstance(node, (L.Limit, L.Distinct)):
        # Distinct groups on ALL columns — its output schema is its input
        if isinstance(node, L.Distinct):
            needed = set(range(len(node.input.schema)))
        node.input, cmap = _prune_columns(node.input, set(needed))
        return node, dict(cmap)

    if isinstance(node, L.Aggregate):
        child_needed = set()
        for g in node.group_exprs:
            child_needed |= L.referenced_columns(g)
        for a in node.aggs:
            if a.arg is not None:
                child_needed |= L.referenced_columns(a.arg)
        node.input, cmap = _prune_columns(node.input, child_needed)
        node.group_exprs = tuple(_remap_expr(g, cmap) for g in node.group_exprs)
        node.aggs = tuple(
            dataclasses.replace(a, arg=_remap_expr(a.arg, cmap))
            if a.arg is not None else a
            for a in node.aggs)
        return node, {i: i for i in range(len(node.schema))}

    if isinstance(node, L.Join):
        from ..sql.ast import JoinKind
        if node.kind in (JoinKind.SEMI, JoinKind.ANTI):
            # output schema = left side only; right side contributes keys
            # (and any residual references over the combined schema)
            nl0 = len(node.left.schema)
            left_needed = set(needed)
            for e in node.left_keys:
                left_needed |= L.referenced_columns(e)
            right_needed = set()
            for e in node.right_keys:
                right_needed |= L.referenced_columns(e)
            if node.residual is not None:
                for i in L.referenced_columns(node.residual):
                    (left_needed if i < nl0 else right_needed).add(
                        i if i < nl0 else i - nl0)
            node.left, lmap = _prune_columns(node.left, left_needed)
            node.right, rmap = _prune_columns(node.right, right_needed)
            node.left_keys = tuple(_remap_expr(e, lmap) for e in node.left_keys)
            node.right_keys = tuple(_remap_expr(e, rmap) for e in node.right_keys)
            if node.residual is not None:
                new_nl = len(node.left.schema)
                jmap = dict(lmap)
                for old, new in rmap.items():
                    jmap[old + nl0] = new + new_nl
                node.residual = _remap_expr(node.residual, jmap)
            node.schema = tuple(
                node.schema[i] for i in sorted(lmap, key=lambda o: lmap[o]))
            return node, dict(lmap)
        nl = len(node.left.schema)
        left_needed, right_needed = set(), set()
        for i in needed:
            (left_needed if i < nl else right_needed).add(i if i < nl else i - nl)
        for e in node.left_keys:
            left_needed |= L.referenced_columns(e)
        for e in node.right_keys:
            right_needed |= L.referenced_columns(e)
        if node.residual is not None:
            for i in L.referenced_columns(node.residual):
                (left_needed if i < nl else right_needed).add(
                    i if i < nl else i - nl)
        node.left, lmap = _prune_columns(node.left, left_needed)
        node.right, rmap = _prune_columns(node.right, right_needed)
        new_nl = len(node.left.schema)
        node.left_keys = tuple(_remap_expr(e, lmap) for e in node.left_keys)
        node.right_keys = tuple(_remap_expr(e, rmap) for e in node.right_keys)
        # joined-schema mapping: left cols keep lmap; right shift by new_nl
        jmap = {}
        for old, new in lmap.items():
            jmap[old] = new
        for old, new in rmap.items():
            jmap[old + nl] = new + new_nl
        if node.residual is not None:
            node.residual = _remap_expr(node.residual, jmap)
        node.schema = tuple(
            node.schema[i] for i in sorted(jmap, key=lambda o: jmap[o]))
        return node, jmap

    if isinstance(node, L.Union):
        all_needed = set(range(len(node.schema)))
        new_inputs = []
        for c in node.inputs:
            nc, _ = _prune_columns(c, set(range(len(c.schema))))
            new_inputs.append(nc)
        node.inputs = tuple(new_inputs)
        return node, {i: i for i in all_needed}

    # unknown node: conservatively keep everything
    return node, {i: i for i in range(len(node.schema))}


def _rewrite(plan: L.LogicalPlan, rule):
    """Bottom-up rewrite of the plan tree."""
    for attr in ("input", "left", "right"):
        child = getattr(plan, attr, None)
        if isinstance(child, L.LogicalPlan):
            setattr(plan, attr, _rewrite(child, rule))
    if isinstance(plan, L.Union):
        plan.inputs = tuple(_rewrite(c, rule) for c in plan.inputs)
    return rule(plan)


def _fuse_limit_sort(plan: L.LogicalPlan) -> L.LogicalPlan:
    """LIMIT k over ORDER BY → top-k sort (no offset)."""
    if (isinstance(plan, L.Limit) and plan.offset == 0
            and plan.limit is not None and isinstance(plan.input, L.Sort)
            and plan.input.limit is None):
        sort = plan.input
        sort.limit = plan.limit
        # keep the Limit node: the sort still produces capacity-sized
        # buffers; Limit trims the mask. The fused hint lets the executor
        # use a top-k kernel when profitable.
        return plan
    return plan


def _merge_filters(plan: L.LogicalPlan) -> L.LogicalPlan:
    if isinstance(plan, L.Filter) and isinstance(plan.input, L.Filter):
        inner = plan.input
        combined = L.BBinary(SqlType.BOOL,
                             plan.predicate.nullable or inner.predicate.nullable,
                             BinOp.AND, inner.predicate, plan.predicate)
        return L.Filter(inner.input, combined)
    return plan
