"""Hash-aggregate equivalent: sort-based grouped aggregation, scatter-free.

The reference gets GROUP BY from DataFusion's row-hash aggregate (SURVEY
§2.1); BASELINE.json elevates it to a first-class benchmark operator. A
row-at-a-time hash table is the wrong shape for a TPU — and so is XLA
scatter (segment_sum serializes). Grouping here uses only TPU-fast
primitives:

  1. one `lax.sort` by group key (tiled bitonic network),
  2. boundary flags → dense segment ids via cumsum,
  3. per-group reductions via global cumsum + boundary differencing
     (sums/counts) and hand-rolled segmented doubling scans (min/max) —
     log n fully-vectorized passes, deterministic order,
  4. group start/end positions via `searchsorted` on the sorted segment
     ids (vectorized binary search — no scatter),
  5. results gathered at segment ends.

Output buffers are `max_groups`-sized (a static hint from column stats:
dictionary size for strings, value range for ints — falling back to the
row capacity). Nulls form their own group; masked-out rows sort last and
contribute identity elements only.
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
    func: str                     # count_star|count|sum|avg|min|max|var|stddev|any_value|quantile
    arr: Optional[jax.Array]      # None for count_star
    valid: Optional[jax.Array]
    distinct: bool = False
    param: Optional[float] = None  # quantile fraction

    @property
    def value_sorted(self) -> bool:
        """Needs its arg values sorted within each group (holistic)."""
        return self.distinct or self.func == "quantile"


def _null_rank(valid):
    # grouping: nulls form one group, placed last among alive rows
    return jnp.where(valid, 0, 1).astype(jnp.int32)


def _seg_scan(op, vals: jax.Array, seg: jax.Array) -> jax.Array:
    """Inclusive segmented scan via Hillis-Steele doubling.

    Hand-rolled instead of `lax.associative_scan` with a tuple carry —
    the tuple-carry scan HLO blows up TPU compile memory at 10M+ rows.
    log2(n) fully-vectorized passes; segments are contiguous (rows are
    sorted by key), so a shift-by-k merge only needs a segment-id
    equality check.
    """
    n = vals.shape[0]
    steps = max(1, (n - 1).bit_length())
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(i, v):
        k = jnp.int32(1) << i
        prev_v = jnp.roll(v, k)
        prev_s = jnp.roll(seg, k)
        ok = (idx >= k) & (prev_s == seg)
        return jnp.where(ok, op(v, prev_v), v)

    return jax.lax.fori_loop(0, steps, body, vals)


def grouped_aggregate(keys: list[tuple[jax.Array, Optional[jax.Array]]],
                      aggs: list[AggInput],
                      alive: Optional[jax.Array],
                      max_groups: Optional[int] = None):
    """Returns (out_keys [(arr, valid)], out_aggs [(arr, valid)], ngroups).

    Output arrays have length max_groups (default: input capacity); the
    first `ngroups` rows are real.
    """
    n = keys[0][0].shape[0] if keys else aggs[0].arr.shape[0]
    G = max_groups if max_groups is not None else n
    iota = jnp.arange(n, dtype=jnp.int32)

    # ---- 1. sort rows by (alive, group keys [, distinct value]) ----
    operands: list[jax.Array] = []
    if alive is not None:
        operands.append((~alive).astype(jnp.int32))
    for arr, valid in keys:
        if valid is not None:
            operands.append(_null_rank(valid))
        operands.append(arr.astype(jnp.int32) if arr.dtype == jnp.bool_ else arr)

    key_operands = list(operands)      # alive + group keys, pre-value-sort

    # the DISTINCT column (at most one) rides the MAIN sort — distinct-run
    # detection needs it adjacent to the group-boundary flags. Holistic
    # (quantile) columns each need their values sorted within groups too;
    # extra ones get their own secondary sort below (group extents are
    # intra-group-order-invariant, so starts/ends are shared).
    distinct_col = None
    for a in aggs:
        if a.distinct:
            if distinct_col is not None and distinct_col[0] is not a.arr:
                raise ValueError("only one DISTINCT aggregate column supported")
            distinct_col = (a.arr, a.valid)
    holistic_cols = []
    for a in aggs:
        if a.func == "quantile" and not any(h[0] is a.arr
                                            for h in holistic_cols):
            holistic_cols.append((a.arr, a.valid))
    if distinct_col is None and holistic_cols:
        distinct_col = holistic_cols[0]
    if distinct_col is not None:
        darr, dvalid = distinct_col
        if dvalid is not None:
            operands.append(_null_rank(dvalid))
        operands.append(darr.astype(jnp.int32) if darr.dtype == jnp.bool_ else darr)

    # co-sort every payload column through the sort network — permute-
    # then-gather is ~7x slower on TPU than carrying operands in the sort
    num_keys = len(operands)
    payload: list[jax.Array] = []
    payload_slot: dict[int, int] = {}

    def add_payload(x):
        if x is None:
            return None
        k = id(x)
        if k not in payload_slot:
            payload_slot[k] = num_keys + len(payload)
            payload.append(x)
        return payload_slot[k]

    alive_slot = add_payload(alive)
    key_slots = [(add_payload(arr), add_payload(valid)) for arr, valid in keys]
    agg_slots = [(add_payload(a.arr), add_payload(a.valid)) for a in aggs]
    out = jax.lax.sort(operands + payload, num_keys=num_keys, is_stable=True)

    def sorted_at(slot):
        return None if slot is None else out[slot]

    s_alive = (sorted_at(alive_slot) if alive is not None
               else jnp.ones((n,), jnp.bool_))
    s_keys = [(sorted_at(sa), sorted_at(sv)) for sa, sv in key_slots]
    s_aggs = [(sorted_at(sa), sorted_at(sv)) for sa, sv in agg_slots]

    # ---- 2. group boundaries + dense segment ids (sorted order) ----
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
    seg = jnp.where(s_alive, jnp.clip(seg, 0, G - 1), G)  # dead → past last
    ngroups = jnp.sum(boundary.astype(jnp.int32))

    # ---- 3. group extents ----
    gids = jnp.arange(G, dtype=jnp.int32)
    if G <= (1 << 18):
        # vectorized binary search: O(G log n) serialized gather passes —
        # cheap while G is small (stats-bounded group counts)
        starts = jnp.searchsorted(seg, gids, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(seg, gids, side="right").astype(jnp.int32)
    else:
        # unbounded G: G binary searches cost ~3.6 s at 16M on TPU; one
        # extra sort (~75 ms) compacts the boundary positions instead —
        # group g's start is the g-th boundary row
        bkey = jnp.where(boundary, seg, G).astype(jnp.int32)
        bpos = jax.lax.sort([bkey, iota], num_keys=1)[1][:G]
        total_alive = jnp.sum(s_alive.astype(jnp.int32))
        valid_g = gids < ngroups
        nxt = jnp.concatenate(
            [bpos[1:], jnp.full((1,), 0, bpos.dtype)])
        starts = jnp.where(valid_g, bpos, total_alive).astype(jnp.int32)
        ends = jnp.where(gids + 1 < ngroups, nxt,
                         total_alive).astype(jnp.int32)
        ends = jnp.where(valid_g, ends, total_alive).astype(jnp.int32)
    starts_c = jnp.clip(starts, 0, n - 1)
    last = jnp.clip(ends - 1, 0, n - 1)

    # distinct-value boundaries within a group
    if distinct_col is not None:
        darr, dvalid = distinct_col
        sd = sorted_at(payload_slot[id(darr)])
        sdv = (sorted_at(payload_slot[id(dvalid)])
               if dvalid is not None else None)
        dprev = jnp.roll(sd, 1)
        dnew = (sd != dprev) | boundary
        if sdv is not None:
            pv = jnp.roll(sdv, 1)
            dnew = dnew | (sdv != pv)
        distinct_new = dnew
    else:
        distinct_new = None

    # ---- 4. output keys (value at group start) ----
    out_keys = []
    for arr, valid in s_keys:
        karr = arr[starts_c]
        kvalid = valid[starts_c] if valid is not None else None
        out_keys.append((karr, kvalid))

    # secondary value sorts: holistic columns beyond the primary get
    # their own (alive, keys, null_rank, value) sort; group extents are
    # intra-group-order-invariant, so starts/ends from the main sort
    # apply unchanged
    value_sorted: dict[int, jax.Array] = {}
    for arr2, valid2 in holistic_cols:
        if distinct_col is not None and arr2 is distinct_col[0]:
            continue   # primary: already value-sorted in the main order
        ops2 = list(key_operands)
        if valid2 is not None:
            ops2.append(_null_rank(valid2))
        ops2.append(arr2.astype(jnp.int32) if arr2.dtype == jnp.bool_
                    else arr2)
        value_sorted[id(arr2)] = jax.lax.sort(
            ops2, num_keys=len(ops2), is_stable=True)[-1]

    # ---- 5. aggregates via segmented scans, read at segment ends ----
    ctx = _SegCtx(seg, s_alive, distinct_new, starts_c, last, ends,
                  starts, n, value_sorted)
    out_aggs = [_compute_agg(a, sa, sv, ctx)
                for a, (sa, sv) in zip(aggs, s_aggs)]
    return out_keys, out_aggs, ngroups


@dataclasses.dataclass
class _SegCtx:
    seg: jax.Array
    s_alive: jax.Array
    distinct_new: Optional[jax.Array]
    starts_c: jax.Array
    last: jax.Array
    ends: jax.Array
    starts: jax.Array
    n: int
    value_sorted: Optional[dict] = None   # id(orig arr) -> value-sorted arr


def _seg_reduce_sum(vals, ctx: _SegCtx):
    """Per-group sum: global cumsum + difference at group extents.

    Exact for integer accumulators (modular arithmetic); for floats this
    is the documented divergence (cumulative rounding) shared with every
    parallel reduction order.
    """
    c = jnp.cumsum(vals)
    hi = c[ctx.last]
    lo = jnp.where(ctx.starts > 0, c[jnp.maximum(ctx.starts - 1, 0)],
                   jnp.zeros_like(hi))
    return hi - lo


def _compute_agg(a: AggInput, s_arr, s_valid, ctx: _SegCtx):
    nonempty_rows = ctx.ends > ctx.starts

    if a.func == "count_star":
        cnt = _seg_reduce_sum(ctx.s_alive.astype(_INT_ACC), ctx)
        return jnp.where(nonempty_rows, cnt, 0), None

    arr = s_arr
    valid = (s_valid if s_valid is not None
             else jnp.ones((ctx.n,), jnp.bool_))
    w = ctx.s_alive & valid
    if a.distinct and ctx.distinct_new is not None:
        w = w & ctx.distinct_new

    is_float = jnp.issubdtype(arr.dtype, jnp.floating)
    acc_t = _FLT_ACC if is_float else _INT_ACC
    cnt = _seg_reduce_sum(w.astype(_INT_ACC), ctx)
    cnt = jnp.where(nonempty_rows, cnt, 0)
    nonempty = cnt > 0

    if a.func == "count":
        return cnt, None
    if a.func == "sum":
        s = _seg_reduce_sum(jnp.where(w, arr, 0).astype(acc_t), ctx)
        return s, nonempty
    if a.func == "avg":
        s = _seg_reduce_sum(jnp.where(w, arr, 0).astype(_FLT_ACC), ctx)
        return s / jnp.maximum(cnt, 1).astype(_FLT_ACC), nonempty
    if a.func == "quantile":
        # use the value-sorted image of this column (the main sort when
        # it is the primary holistic column, a secondary sort otherwise);
        # valid values lead each group, so the linear-interpolated
        # quantile is two gathers at the group's rank positions
        if ctx.value_sorted and id(a.arr) in ctx.value_sorted:
            arr = ctx.value_sorted[id(a.arr)]
        q = a.param if a.param is not None else 0.5
        h = q * jnp.maximum(cnt - 1, 0).astype(_FLT_ACC)
        lo = jnp.floor(h)
        frac = h - lo
        lo_i = ctx.starts + lo.astype(jnp.int32)
        hi_i = ctx.starts + jnp.ceil(h).astype(jnp.int32)
        vlo = arr[jnp.clip(lo_i, 0, ctx.n - 1)].astype(_FLT_ACC)
        vhi = arr[jnp.clip(hi_i, 0, ctx.n - 1)].astype(_FLT_ACC)
        return vlo + (vhi - vlo) * frac, nonempty
    if a.func in ("min", "max"):
        if arr.dtype == jnp.bool_:
            arr = arr.astype(jnp.int32)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            sentinel = jnp.asarray(jnp.inf if a.func == "min" else -jnp.inf,
                                   dtype=arr.dtype)
        else:
            info = jnp.iinfo(arr.dtype)
            sentinel = jnp.asarray(info.max if a.func == "min" else info.min,
                                   dtype=arr.dtype)
        masked = jnp.where(w, arr, sentinel)
        op = jnp.minimum if a.func == "min" else jnp.maximum
        m = _seg_scan(op, masked, ctx.seg)[ctx.last]
        return m, nonempty
    if a.func in ("var", "stddev"):
        x = jnp.where(w, arr, 0).astype(_FLT_ACC)
        s = _seg_reduce_sum(x, ctx)
        s2 = _seg_reduce_sum(x * x, ctx)
        c = cnt.astype(_FLT_ACC)
        var = (s2 - s * s / jnp.maximum(c, 1.0)) / jnp.maximum(c - 1.0, 1.0)
        var = jnp.maximum(var, 0.0)
        out = jnp.sqrt(var) if a.func == "stddev" else var
        return out, cnt > 1
    if a.func == "any_value":
        # the group's first row (matches first_value semantics incl. nulls)
        return arr[ctx.starts_c], (ctx.s_alive & valid)[ctx.starts_c]
    raise ValueError(f"unknown aggregate {a.func}")


def ungrouped_aggregate(aggs: list[AggInput], alive: Optional[jax.Array],
                        out_pad: int):
    """Whole-table aggregates → one row, padded to out_pad."""
    # row count from ANY arg array (the first agg may be count_star with
    # arr=None while later args carry the real capacity), else the mask
    n = next((a.arr.shape[0] for a in aggs if a.arr is not None),
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
            s = jax.lax.sort([(~w).astype(jnp.int32), arr], num_keys=2)
            sw_flag, svals = s[0] == 0, s[1]
            newv = sw_flag & ((jnp.arange(n) == 0) | (svals != jnp.roll(svals, 1))
                              | ~jnp.roll(sw_flag, 1))
            if a.func == "count":
                outs.append((jnp.sum(newv.astype(_INT_ACC)), True))
                continue
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
        if a.func == "quantile":
            # sort valid values to the front ascending, interpolate
            s = jax.lax.sort([(~w).astype(jnp.int32), arr], num_keys=2)[1]
            q = a.param if a.param is not None else 0.5
            h = q * jnp.maximum(cnt - 1, 0).astype(_FLT_ACC)
            lo = jnp.floor(h)
            frac = h - lo
            vlo = s[jnp.clip(lo.astype(jnp.int32), 0, n - 1)].astype(_FLT_ACC)
            vhi = s[jnp.clip(jnp.ceil(h).astype(jnp.int32), 0, n - 1)
                    ].astype(_FLT_ACC)
            outs.append((vlo + (vhi - vlo) * frac, cnt > 0))
        elif a.func == "count":
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
                                   dtype=arr_c.dtype)
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
