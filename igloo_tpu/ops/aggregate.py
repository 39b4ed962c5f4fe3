"""Hash-aggregate equivalent: sort-based grouped aggregation.

The reference gets GROUP BY from DataFusion's row-hash aggregate (SURVEY
§2.1 "Operators NOT custom-implemented"); BASELINE.json elevates it to a
first-class benchmark operator. A row-at-a-time hash table is the wrong
shape for a TPU, so grouping here is: one `lax.sort` by group key →
boundary flags → dense segment ids → XLA segment reductions. Nulls form
their own group (SQL GROUP BY semantics); masked-out rows sort last and
contribute nothing.

All outputs are capacity-sized dense buffers whose first `ngroups` rows
are real — the caller's selection-mask model handles the rest.

A Pallas one-hot/MXU kernel for low-cardinality keys lives in
ops/pallas/groupby_mxu.py and is selected by the physical planner when
the key dictionary is small (see benchmark config #2).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

_INT_ACC = jnp.int64
_FLT_ACC = jnp.float64


@dataclasses.dataclass
class AggInput:
    func: str                     # count_star|count|sum|avg|min|max|var|stddev|any_value
    arr: Optional[jax.Array]      # None for count_star
    valid: Optional[jax.Array]
    distinct: bool = False


def _null_rank(valid):
    # grouping: nulls form one group, placed last among alive rows
    return jnp.where(valid, 0, 1).astype(jnp.int32)


def grouped_aggregate(keys: list[tuple[jax.Array, Optional[jax.Array]]],
                      aggs: list[AggInput],
                      alive: Optional[jax.Array]):
    """Returns (out_keys [(arr, valid)], out_aggs [(arr, valid)], ngroups)."""
    n = keys[0][0].shape[0] if keys else aggs[0].arr.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)

    # ---- 1. sort rows by (alive, group keys [, distinct value]) ----
    operands: list[jax.Array] = []
    if alive is not None:
        operands.append((~alive).astype(jnp.int32))
    for arr, valid in keys:
        if valid is not None:
            operands.append(_null_rank(valid))
        operands.append(arr.astype(jnp.int32) if arr.dtype == jnp.bool_ else arr)

    distinct_col = None
    for a in aggs:
        if a.distinct:
            if distinct_col is not None and distinct_col[0] is not a.arr:
                raise ValueError("only one DISTINCT aggregate column supported")
            distinct_col = (a.arr, a.valid)
    if distinct_col is not None:
        darr, dvalid = distinct_col
        if dvalid is not None:
            operands.append(_null_rank(dvalid))
        operands.append(darr.astype(jnp.int32) if darr.dtype == jnp.bool_ else darr)

    num_keys = len(operands)
    perm = jax.lax.sort(operands + [iota], num_keys=num_keys, is_stable=True)[-1]

    def g(x):
        return None if x is None else x[perm]

    s_alive = alive[perm] if alive is not None else jnp.ones((n,), jnp.bool_)
    s_keys = [(g(arr), g(valid)) for arr, valid in keys]

    # ---- 2. group boundaries over sorted alive rows ----
    first = iota == 0
    differs = jnp.zeros((n,), jnp.bool_)
    for arr, valid in s_keys:
        prev = jnp.roll(arr, 1)
        d = arr != prev
        if valid is not None:
            pv = jnp.roll(valid, 1)
            d = (valid != pv) | (d & valid & pv)
        differs = differs | d
    prev_alive = jnp.roll(s_alive, 1)
    boundary = s_alive & (first | differs | ~prev_alive)
    seg = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    seg = jnp.where(s_alive, seg, n - 1)          # dead rows → sentinel segment
    seg = jnp.clip(seg, 0, n - 1)
    ngroups = jnp.sum(boundary.astype(jnp.int32))

    # distinct-value boundaries within a group
    if distinct_col is not None:
        darr, dvalid = distinct_col
        sd, sdv = darr[perm], (dvalid[perm] if dvalid is not None else None)
        dprev = jnp.roll(sd, 1)
        dnew = (sd != dprev) | boundary
        if sdv is not None:
            pv = jnp.roll(sdv, 1)
            dnew = dnew | (sdv != pv)
        distinct_new = dnew
    else:
        distinct_new = None

    # ---- 3. per-group first-row index (for key output / any_value) ----
    firstrow = jax.ops.segment_min(jnp.where(s_alive, iota, n - 1), seg,
                                   num_segments=n)
    firstrow = jnp.clip(firstrow, 0, n - 1)

    out_keys = []
    for arr, valid in s_keys:
        karr = arr[firstrow]
        kvalid = valid[firstrow] if valid is not None else None
        out_keys.append((karr, kvalid))

    # ---- 4. aggregates ----
    out_aggs = []
    for a in aggs:
        out_aggs.append(_compute_agg(a, perm, seg, s_alive, distinct_new,
                                     firstrow, n))
    return out_keys, out_aggs, ngroups


def _compute_agg(a: AggInput, perm, seg, s_alive, distinct_new, firstrow, n):
    if a.func == "count_star":
        cnt = jax.ops.segment_sum(s_alive.astype(_INT_ACC), seg, num_segments=n)
        return cnt, None

    arr = a.arr[perm]
    valid = a.valid[perm] if a.valid is not None else jnp.ones((n,), jnp.bool_)
    w = s_alive & valid
    if a.distinct and distinct_new is not None:
        w = w & distinct_new

    if a.func == "count":
        cnt = jax.ops.segment_sum(w.astype(_INT_ACC), seg, num_segments=n)
        return cnt, None

    is_float = jnp.issubdtype(arr.dtype, jnp.floating)
    acc_t = _FLT_ACC if is_float else _INT_ACC
    cnt = jax.ops.segment_sum(w.astype(_INT_ACC), seg, num_segments=n)
    nonempty = cnt > 0

    if a.func == "sum":
        s = jax.ops.segment_sum(jnp.where(w, arr, 0).astype(acc_t), seg,
                                num_segments=n)
        return s, nonempty
    if a.func == "avg":
        s = jax.ops.segment_sum(jnp.where(w, arr, 0).astype(_FLT_ACC), seg,
                                num_segments=n)
        return s / jnp.maximum(cnt, 1).astype(_FLT_ACC), nonempty
    if a.func in ("min", "max"):
        if is_float:
            sentinel = jnp.asarray(jnp.inf if a.func == "min" else -jnp.inf,
                                   dtype=arr.dtype)
        elif arr.dtype == jnp.bool_:
            arr = arr.astype(jnp.int32)
            sentinel = jnp.asarray(1 if a.func == "min" else 0, jnp.int32)
        else:
            info = jnp.iinfo(arr.dtype)
            sentinel = jnp.asarray(info.max if a.func == "min" else info.min,
                                   dtype=arr.dtype)
        masked = jnp.where(w, arr, sentinel)
        fn = jax.ops.segment_min if a.func == "min" else jax.ops.segment_max
        m = fn(masked, seg, num_segments=n)
        return m, nonempty
    if a.func in ("var", "stddev"):
        x = jnp.where(w, arr, 0).astype(_FLT_ACC)
        s = jax.ops.segment_sum(x, seg, num_segments=n)
        s2 = jax.ops.segment_sum(x * x, seg, num_segments=n)
        c = cnt.astype(_FLT_ACC)
        var = (s2 - s * s / jnp.maximum(c, 1.0)) / jnp.maximum(c - 1.0, 1.0)
        var = jnp.maximum(var, 0.0)
        out = jnp.sqrt(var) if a.func == "stddev" else var
        return out, cnt > 1
    if a.func == "any_value":
        return arr[firstrow], (s_alive & valid)[firstrow]
    raise ValueError(f"unknown aggregate {a.func}")


def ungrouped_aggregate(aggs: list[AggInput], alive: Optional[jax.Array], out_pad: int):
    """Whole-table aggregates → one row, padded to out_pad."""
    n = aggs[0].arr.shape[0] if aggs and aggs[0].arr is not None else (
        alive.shape[0] if alive is not None else out_pad)
    alive_m = alive if alive is not None else jnp.ones((n,), jnp.bool_)

    outs = []
    for a in aggs:
        if a.func == "count_star":
            val = jnp.sum(alive_m.astype(_INT_ACC))
            outs.append((val, True))
            continue
        arr = a.arr
        valid = a.valid if a.valid is not None else jnp.ones((n,), jnp.bool_)
        w = alive_m & valid
        if a.distinct:
            # sort values, count/sum distinct alive+valid values
            s = jax.lax.sort([(~w).astype(jnp.int32), arr], num_keys=2)
            sw_flag, svals = s[0] == 0, s[1]
            newv = sw_flag & ((jnp.arange(n) == 0) | (svals != jnp.roll(svals, 1))
                              | ~jnp.roll(sw_flag, 1))
            if a.func == "count":
                outs.append((jnp.sum(newv.astype(_INT_ACC)), True))
                continue
            w = None  # fallthrough for sum(distinct)
            arr2 = jnp.where(newv, svals, 0)
            if a.func == "sum":
                acc_t = _FLT_ACC if jnp.issubdtype(svals.dtype, jnp.floating) else _INT_ACC
                outs.append((jnp.sum(arr2.astype(acc_t)), jnp.sum(newv) > 0))
                continue
            if a.func == "avg":
                c = jnp.sum(newv.astype(_FLT_ACC))
                outs.append((jnp.sum(arr2.astype(_FLT_ACC)) / jnp.maximum(c, 1.0),
                             c > 0))
                continue
            raise ValueError(f"DISTINCT not supported for {a.func}")
        cnt = jnp.sum(w.astype(_INT_ACC))
        if a.func == "count":
            outs.append((cnt, True))
        elif a.func == "sum":
            acc_t = _FLT_ACC if jnp.issubdtype(arr.dtype, jnp.floating) else _INT_ACC
            outs.append((jnp.sum(jnp.where(w, arr, 0).astype(acc_t)), cnt > 0))
        elif a.func == "avg":
            s = jnp.sum(jnp.where(w, arr, 0).astype(_FLT_ACC))
            outs.append((s / jnp.maximum(cnt, 1).astype(_FLT_ACC), cnt > 0))
        elif a.func in ("min", "max"):
            arr_c = arr.astype(jnp.int32) if arr.dtype == jnp.bool_ else arr
            if jnp.issubdtype(arr_c.dtype, jnp.floating):
                sent = jnp.asarray(jnp.inf if a.func == "min" else -jnp.inf,
                                   arr_c.dtype)
            else:
                info = jnp.iinfo(arr_c.dtype)
                sent = jnp.asarray(info.max if a.func == "min" else info.min,
                                   arr_c.dtype)
            m = jnp.where(w, arr_c, sent)
            val = jnp.min(m) if a.func == "min" else jnp.max(m)
            outs.append((val, cnt > 0))
        elif a.func in ("var", "stddev"):
            x = jnp.where(w, arr, 0).astype(_FLT_ACC)
            s, s2 = jnp.sum(x), jnp.sum(x * x)
            c = cnt.astype(_FLT_ACC)
            var = jnp.maximum((s2 - s * s / jnp.maximum(c, 1.0))
                              / jnp.maximum(c - 1.0, 1.0), 0.0)
            outs.append((jnp.sqrt(var) if a.func == "stddev" else var, cnt > 1))
        elif a.func == "any_value":
            # first alive+valid value
            idx = jnp.argmax(w)   # first True
            outs.append((arr[idx], jnp.any(w)))
        else:
            raise ValueError(f"unknown aggregate {a.func}")

    padded = []
    for val, valid in outs:
        arr = jnp.zeros((out_pad,), dtype=jnp.asarray(val).dtype).at[0].set(val)
        if valid is True:
            vmask = None
        else:
            vmask = jnp.zeros((out_pad,), jnp.bool_).at[0].set(valid)
        padded.append((arr, vmask))
    return padded
