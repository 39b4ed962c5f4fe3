"""Tiny-cardinality GROUP BY: per-group masked reductions, no sort.

When the combined group-key span is small (≤ TINY_G slots, known
statically from ingest stats / dictionary sizes), a GROUP BY is G
masked whole-column reductions — one fused bandwidth pass instead of
the general path's O(n log² n) sort network, and it covers aggregates
the MXU one-hot kernel can't (float sums, min/max, var/stddev,
nullable and multi-column keys). Distributed, the per-group partial
vectors merge with ONE psum/pmin/pmax collective — no row shuffle at
all (the reference's DataFusion path always hash-repartitions).

TPC-H Q1 is the canonical shape: 6 groups over two 3/2-value string
keys with float sums — 284 ms → single-pass on v5e.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..plan import logical as L

TINY_G = 32

_FUNCS = ("count_star", "count", "sum", "avg", "min", "max",
          "var", "stddev")


@dataclasses.dataclass(frozen=True)
class TinyPlan:
    keys: tuple        # per key: (lo, span, has_null)
    g: int             # total slots (product of span+has_null)


def tiny_gate(cols, group_exprs, aggs, capacity=None) -> TinyPlan | None:
    """Static gate: every group key a BColumn with a known tiny span
    (dictionary size or integer ingest stats; bool is span 2), combined
    slot count ≤ TINY_G; aggregates from the reduction-friendly set."""
    if not group_exprs:
        return None
    for a in aggs:
        if a.distinct or a.func not in _FUNCS:
            return None
    plan = []
    total = 1
    for gexpr in group_exprs:
        if not isinstance(gexpr, L.BColumn) or gexpr.index >= len(cols):
            return None
        col = cols[gexpr.index]
        if col.dictionary is not None:
            lo, span = 0, max(len(col.dictionary), 1)
        elif col.stats is not None and gexpr.dtype.is_integer:
            lo, hi = col.stats
            span = int(hi) - int(lo) + 1
            lo = int(lo)
        elif gexpr.dtype.name == "BOOL":
            lo, span = 0, 2
        else:
            return None
        has_null = col.valid is not None
        if span <= 0:
            return None
        total *= span + (1 if has_null else 0)
        if total > TINY_G:
            return None
        plan.append((lo, span, has_null))
    return TinyPlan(tuple(plan), total)


def tiny_slots(key_vvs, plan: TinyPlan, alive):
    """Combined slot per row in [0, g); dead rows park at g."""
    slot = jnp.zeros(key_vvs[0][0].shape, jnp.int32)
    for (arr, valid), (lo, span, has_null) in zip(key_vvs, plan.keys):
        a = arr.astype(jnp.int32) if arr.dtype == jnp.bool_ else arr
        # offset in the ORIGINAL dtype (int64 lo can exceed int32)
        code = jnp.clip(a - jnp.asarray(lo, a.dtype), 0,
                        span - 1).astype(jnp.int32)
        width = span + (1 if has_null else 0)
        if has_null:
            code = jnp.where(valid, code, span)
        slot = slot * width + code
    if alive is not None:
        slot = jnp.where(alive, slot, plan.g)
    return slot


def tiny_group_keys(plan: TinyPlan, key_dtypes):
    """Per-slot group key value arrays (g,) + validity, host-free."""
    g = plan.g
    slots = jnp.arange(g, dtype=jnp.int32)
    outs = []
    rem = slots
    widths = [span + (1 if hn else 0) for _, span, hn in plan.keys]
    strides = []
    acc = 1
    for w in reversed(widths):
        strides.append(acc)
        acc *= w
    strides.reverse()
    for (lo, span, has_null), width, stride in zip(plan.keys, widths,
                                                   strides):
        code = (rem // stride) % width
        val = code.astype(jnp.int64) + lo      # int64: lo may be huge
        valid = (code < span) if has_null else None
        outs.append((val, valid))
    return outs


def tiny_reduce(slot, plan: TinyPlan, aggs, arg_vvs, alive,
                gsum, gmin, gmax):
    """Per-group reductions. arg_vvs[i] is (arr, valid) or None for
    count(*). Returns ([(values (g,), valid (g,)|None) per agg],
    group_nonempty (g,) bool)."""
    g = plan.g
    onehot = slot[None, :] == jnp.arange(g, dtype=jnp.int32)[:, None]
    star = gsum(jnp.sum(onehot, axis=1).astype(jnp.int64))

    outs = []
    for a, vv in zip(aggs, arg_vvs):
        if a.func == "count_star":
            outs.append((star, None))
            continue
        arr, valid = vv
        if arr.dtype == jnp.bool_:
            arr = arr.astype(jnp.int32)
        w = onehot if valid is None else (onehot & valid[None, :])
        cnt = gsum(jnp.sum(w, axis=1).astype(jnp.int64))
        is_float = jnp.issubdtype(arr.dtype, jnp.floating)
        if a.func == "count":
            outs.append((cnt, None))
        elif a.func in ("sum", "avg"):
            acc_t = (jnp.float64 if (is_float or a.func == "avg")
                     else jnp.int64)
            s = gsum(jnp.sum(jnp.where(w, arr[None, :], 0).astype(acc_t),
                             axis=1))
            if a.func == "sum":
                outs.append((s, cnt > 0))
            else:
                outs.append((s / jnp.maximum(cnt, 1).astype(jnp.float64),
                             cnt > 0))
        elif a.func in ("min", "max"):
            if is_float:
                sent = jnp.asarray(
                    jnp.inf if a.func == "min" else -jnp.inf, arr.dtype)
            else:
                info = jnp.iinfo(arr.dtype)
                sent = jnp.asarray(
                    info.max if a.func == "min" else info.min, arr.dtype)
            m = jnp.where(w, arr[None, :], sent)
            local = (jnp.min(m, axis=1) if a.func == "min"
                     else jnp.max(m, axis=1))
            outs.append(((gmin if a.func == "min" else gmax)(local),
                         cnt > 0))
        else:  # var / stddev
            x = jnp.where(w, arr[None, :], 0).astype(jnp.float64)
            s = gsum(jnp.sum(x, axis=1))
            s2 = gsum(jnp.sum(x * x, axis=1))
            c = cnt.astype(jnp.float64)
            var = jnp.maximum(
                (s2 - s * s / jnp.maximum(c, 1.0))
                / jnp.maximum(c - 1.0, 1.0), 0.0)
            outs.append((jnp.sqrt(var) if a.func == "stddev" else var,
                         cnt > 1))
    return outs, star > 0
