"""Window-function program: partition sort + segmented scans.

Shared between the operator-at-a-time executor and the fused fragment
compiler. One `lax.sort` carries every payload column (co-sorting beats
permute+gather ~7× on TPU); running/partition aggregates are segmented
scans read at peer-group ends (SQL default frame: RANGE UNBOUNDED
PRECEDING → CURRENT ROW with ORDER BY, whole partition without).
Output rows come back partition-sorted — SQL leaves window output order
unspecified.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..errors import NotSupportedError
from .aggregate import _seg_scan
from .sort_ops import _direction_transform


def window_program(part, order, args, inputs, specs, alive, cap):
    """part: [(arr, valid)] partition keys; order: [(arr, valid, asc, nf)];
    args: per-spec (arr, valid) or None; inputs: [(arr, valid)] payload
    columns; specs: WindowFuncSpec list.

    Returns (sorted_inputs, win_cols, sorted_alive).
    """
    iota = jnp.arange(cap, dtype=jnp.int32)

    operands = [(~alive).astype(jnp.int32)]
    for arr, valid in part:
        if valid is not None:
            operands.append(jnp.where(valid, 0, 1).astype(jnp.int32))
        operands.append(arr.astype(jnp.int32)
                        if arr.dtype == jnp.bool_ else arr)
    for arr, valid, asc, nf in order:
        if valid is not None:
            nr = jnp.where(valid, 1, 0) if nf else jnp.where(valid, 0, 1)
            operands.append(nr.astype(jnp.int32))
        operands.append(_direction_transform(arr, asc))
    nk = len(operands)

    payload, slot_of = [], {}

    def add(x):
        if x is None:
            return None
        key = id(x)
        if key not in slot_of:
            slot_of[key] = nk + len(payload)
            payload.append(x)
        return slot_of[key]

    alive_slot = add(alive)
    in_slots = [(add(a), add(v)) for a, v in inputs]
    p_slots = [(add(a), add(v)) for a, v in part]
    o_slots = [(add(a), add(v)) for a, v, _, _ in order]
    a_slots = [None if x is None else (add(x[0]), add(x[1])) for x in args]
    out = jax.lax.sort(operands + payload, num_keys=nk, is_stable=True)

    def at(slot):
        return None if slot is None else out[slot]

    s_alive = at(alive_slot)
    first = iota == 0
    prev_alive = jnp.roll(s_alive, 1)

    def differs(slots):
        d = jnp.zeros((cap,), jnp.bool_)
        for sa, sv in slots:
            arr = at(sa)
            prev = jnp.roll(arr, 1)
            dd = arr != prev
            if sv is not None:
                valid = at(sv)
                pv = jnp.roll(valid, 1)
                dd = (valid != pv) | (dd & valid & pv)
            d = d | dd
        return d

    pboundary = s_alive & (first | differs(p_slots) | ~prev_alive)
    if not p_slots:
        pboundary = s_alive & (first | ~prev_alive)
    seg = jnp.cumsum(pboundary.astype(jnp.int32)) - 1
    seg = jnp.where(s_alive, jnp.clip(seg, 0, cap - 1), cap)
    pstart = jax.lax.cummax(jnp.where(pboundary, iota, -1))
    pstart_c = jnp.clip(pstart, 0, cap - 1)
    pend = (jnp.searchsorted(seg, seg, side="right") - 1).astype(jnp.int32)
    pend = jnp.clip(pend, 0, cap - 1)

    if order:
        oboundary = pboundary | (s_alive & differs(o_slots))
        pg = jnp.where(s_alive,
                       jnp.cumsum(oboundary.astype(jnp.int32)) - 1,
                       cap + iota)
        peer_end = (jnp.searchsorted(pg, pg, side="right") - 1
                    ).astype(jnp.int32)
        peer_end = jnp.clip(peer_end, 0, cap - 1)
    else:
        oboundary = pboundary
        peer_end = pend

    win_cols = []
    for s, slot in zip(specs, a_slots):
        if slot is not None:
            arr = at(slot[0])
            valid = at(slot[1])
        else:
            arr = valid = None
        w = s_alive if valid is None else (s_alive & valid)

        if s.func == "row_number":
            win_cols.append(((iota - pstart + 1).astype(jnp.int64), None))
        elif s.func == "rank":
            rb = jax.lax.cummax(jnp.where(oboundary, iota, -1))
            win_cols.append(((rb - pstart + 1).astype(jnp.int64), None))
        elif s.func == "dense_rank":
            dr = _seg_scan(jnp.add, oboundary.astype(jnp.int64), seg)
            win_cols.append((dr, None))
        elif s.func in ("lag", "lead"):
            k = s.offset if s.func == "lag" else -s.offset
            src_arr = jnp.roll(arr, k)
            src_seg = jnp.roll(seg, k)
            ok = (src_seg == seg) & s_alive
            if s.func == "lag":
                ok = ok & (iota >= k)
            else:
                ok = ok & (iota < cap + k)
            if valid is not None:
                ok = ok & jnp.roll(valid, k)
            win_cols.append((src_arr, ok))
        elif s.func == "first_value":
            win_cols.append((arr[pstart_c],
                             (w if valid is not None else s_alive)[pstart_c]))
        elif s.func == "last_value":
            win_cols.append((arr[peer_end],
                             (w if valid is not None else s_alive)[peer_end]))
        elif s.func in ("count_star", "count"):
            weights = s_alive if s.func == "count_star" else w
            run = _seg_scan(jnp.add, weights.astype(jnp.int64), seg)
            win_cols.append((run[peer_end], None))
        elif s.func in ("sum", "avg"):
            acc_t = (jnp.float64 if (s.func == "avg"
                     or jnp.issubdtype(arr.dtype, jnp.floating))
                     else jnp.int64)
            vals = jnp.where(w, arr, 0).astype(acc_t)
            run = _seg_scan(jnp.add, vals, seg)[peer_end]
            cnt = _seg_scan(jnp.add, w.astype(jnp.int64), seg)[peer_end]
            if s.func == "sum":
                win_cols.append((run, cnt > 0))
            else:
                win_cols.append((run.astype(jnp.float64)
                                 / jnp.maximum(cnt, 1), cnt > 0))
        elif s.func in ("min", "max"):
            a2 = arr.astype(jnp.int32) if arr.dtype == jnp.bool_ else arr
            if jnp.issubdtype(a2.dtype, jnp.floating):
                sent = jnp.asarray(jnp.inf if s.func == "min" else -jnp.inf,
                                   a2.dtype)
            else:
                info = jnp.iinfo(a2.dtype)
                sent = jnp.asarray(info.max if s.func == "min" else info.min,
                                   a2.dtype)
            op = jnp.minimum if s.func == "min" else jnp.maximum
            run = _seg_scan(op, jnp.where(w, a2, sent), seg)[peer_end]
            cnt = _seg_scan(jnp.add, w.astype(jnp.int64), seg)[peer_end]
            win_cols.append((run, cnt > 0))
        else:
            raise NotSupportedError(f"window function {s.func}")

    sorted_inputs = [(at(sa), at(sv)) for sa, sv in in_slots]
    return sorted_inputs, win_cols, s_alive
