"""Window-function program: partition sort + segmented scans.

Shared between the operator-at-a-time executor and the fused fragment
compiler. One `lax.sort` carries every payload column (co-sorting beats
permute+gather ~7× on TPU); running/partition aggregates are segmented
scans read at peer-group ends (SQL default frame: RANGE UNBOUNDED
PRECEDING → CURRENT ROW with ORDER BY, whole partition without).
Output rows come back partition-sorted — SQL leaves window output order
unspecified.

Frames (ROWS BETWEEN …, RANGE over peer groups) are index arithmetic on
the sorted order:
- any frame bound resolves to per-row [lo, hi] row-index ranges,
- sum/count/avg over a frame = two gathers into a segmented prefix scan,
- min/max anchored at a partition edge = gather into a (forward or
  backward) segmented running scan,
- min/max over a both-bounded ROWS frame = sparse-table range query
  (log2(frame width) doubling levels, two gathers) — no scalar loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..errors import NotSupportedError
from .aggregate import _seg_scan
from .sort_ops import _direction_transform


def _frame_offsets(frame):
    """Static (start_off, end_off) for ROWS frames; None for unbounded."""
    _, (sk, sn), (ek, en) = frame
    s_off = None if sk == "up" else (-sn if sk == "p" else
                                     0 if sk == "c" else sn)
    e_off = None if ek == "uf" else (-en if ek == "p" else
                                     0 if ek == "c" else en)
    return s_off, e_off


def _range_query(op, vals, sentinel, lo, hi, width: int, cap: int):
    """min/max over per-row index ranges [lo, hi] with hi-lo+1 <= width:
    classic sparse-table RMQ — L = ceil(log2(width))+1 doubling levels,
    answer = op of two overlapping 2^k blocks. Empty/invalid ranges must
    be masked by the caller."""
    levels = max(int(width).bit_length(), 1)
    st = [vals]
    for k in range(1, levels):
        h = 1 << (k - 1)
        shifted = jnp.concatenate(
            [st[-1][h:], jnp.full((h,), sentinel, vals.dtype)])
        st.append(op(st[-1], shifted))
    stk = jnp.stack(st).reshape(-1)
    length = jnp.maximum(hi - lo + 1, 1)
    klev = jnp.zeros_like(lo)
    for k in range(1, levels):
        klev = klev + (length >= (1 << k)).astype(lo.dtype)
    p2 = jnp.left_shift(jnp.ones_like(lo), klev)
    a = stk[jnp.clip(klev * cap + lo, 0, levels * cap - 1)]
    b = stk[jnp.clip(klev * cap + hi - p2 + 1, 0, levels * cap - 1)]
    return op(a, b)


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

    # last row of the current run = (first boundary strictly after me) - 1.
    # A reverse cummin is ~100x cheaper than per-row searchsorted over the
    # segment ids (binary search = log n serialized gather passes).
    dead_start = ~s_alive & (first | prev_alive)

    def run_end(bound):
        nxt = jax.lax.cummin(
            jnp.where(bound | dead_start, iota, cap), reverse=True)
        after = jnp.concatenate(
            [nxt[1:], jnp.full((1,), cap, nxt.dtype)])
        return jnp.clip(after - 1, 0, cap - 1).astype(jnp.int32)

    pend = run_end(pboundary)

    if order:
        oboundary = pboundary | (s_alive & differs(o_slots))
        peer_end = run_end(oboundary)
    else:
        oboundary = pboundary
        peer_end = pend
    peer_start = jnp.clip(jax.lax.cummax(jnp.where(oboundary, iota, -1)),
                          0, cap - 1)
    np_rows = pend - pstart_c + 1

    def frame_bounds(frame):
        """Per-row [lo, hi] (clamped) + nonempty mask + static ROWS width
        (None when a bound is partition-anchored)."""
        if frame is None:
            hi = peer_end if order else pend
            return pstart_c, hi, None, None
        unit, (sk, sn), (ek, en) = frame
        if unit == "range":
            lo = pstart_c if sk == "up" else peer_start
            hi = pend if ek == "uf" else peer_end
            return lo, hi, None, None
        s_off, e_off = _frame_offsets(frame)
        lo = pstart_c if s_off is None else iota + s_off
        hi = pend if e_off is None else iota + e_off
        lo = jnp.maximum(lo, pstart_c)
        hi = jnp.minimum(hi, pend)
        nonempty = (lo <= hi) & s_alive
        width = (e_off - s_off + 1
                 if (s_off is not None and e_off is not None) else None)
        return (jnp.clip(lo, 0, cap - 1), jnp.clip(hi, 0, cap - 1),
                nonempty, ("rows", s_off, e_off, width))

    def frame_sum(vals, lo, hi, nonempty):
        """Sum of vals over [lo, hi] per row: segmented inclusive prefix
        scan + two gathers (lo-1 stays in-segment when lo > pstart)."""
        pre = _seg_scan(jnp.add, vals, seg)
        hi_v = pre[hi]
        lo_v = jnp.where(lo > pstart_c,
                         pre[jnp.clip(lo - 1, 0, cap - 1)],
                         jnp.zeros((), vals.dtype))
        res = hi_v - lo_v
        if nonempty is not None:
            res = jnp.where(nonempty, res, jnp.zeros((), vals.dtype))
        return res

    win_cols = []
    for s, slot in zip(specs, a_slots):
        if slot is not None:
            arr = at(slot[0])
            valid = at(slot[1])
        else:
            arr = valid = None
        w = s_alive if valid is None else (s_alive & valid)
        frame = getattr(s, "frame", None)

        if s.func == "row_number":
            win_cols.append(((iota - pstart + 1).astype(jnp.int64), None))
        elif s.func == "rank":
            rb = jax.lax.cummax(jnp.where(oboundary, iota, -1))
            win_cols.append(((rb - pstart + 1).astype(jnp.int64), None))
        elif s.func == "dense_rank":
            dr = _seg_scan(jnp.add, oboundary.astype(jnp.int64), seg)
            win_cols.append((dr, None))
        elif s.func == "percent_rank":
            rank = peer_start - pstart_c + 1
            pr = ((rank - 1).astype(jnp.float64)
                  / jnp.maximum(np_rows - 1, 1).astype(jnp.float64))
            win_cols.append((jnp.where(np_rows > 1, pr, 0.0), None))
        elif s.func == "cume_dist":
            cd = ((peer_end - pstart_c + 1).astype(jnp.float64)
                  / jnp.maximum(np_rows, 1).astype(jnp.float64))
            win_cols.append((cd, None))
        elif s.func == "ntile":
            n = s.offset
            r = iota - pstart_c
            q, rem = np_rows // n, np_rows % n
            big = r < rem * (q + 1)
            bucket = jnp.where(
                big, r // jnp.maximum(q + 1, 1),
                rem + (r - rem * (q + 1)) // jnp.maximum(q, 1))
            win_cols.append(((bucket + 1).astype(jnp.int64), None))
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
        elif s.func in ("first_value", "last_value", "nth_value"):
            lo, hi, nonempty, _ = frame_bounds(frame)
            if s.func == "first_value":
                pos = lo
            elif s.func == "last_value":
                pos = hi
            else:
                pos = jnp.clip(lo + (s.offset - 1), 0, cap - 1)
            ok = s_alive if nonempty is None else nonempty
            if s.func == "nth_value":
                ok = ok & (lo + (s.offset - 1) <= hi)
            if valid is not None:
                ok = ok & valid[pos]
            win_cols.append((arr[pos], ok))
        elif s.func in ("count_star", "count", "sum", "avg"):
            lo, hi, nonempty, _ = frame_bounds(frame)
            weights = s_alive if s.func == "count_star" else w
            cnt = frame_sum(weights.astype(jnp.int64), lo, hi, nonempty)
            if s.func in ("count_star", "count"):
                win_cols.append((cnt, None))
                continue
            acc_t = (jnp.float64 if (s.func == "avg"
                     or jnp.issubdtype(arr.dtype, jnp.floating))
                     else jnp.int64)
            vals = jnp.where(w, arr, 0).astype(acc_t)
            run = frame_sum(vals, lo, hi, nonempty)
            if s.func == "sum":
                win_cols.append((run, cnt > 0))
            else:
                win_cols.append((run.astype(jnp.float64)
                                 / jnp.maximum(cnt, 1), cnt > 0))
        elif s.func in ("min", "max"):
            lo, hi, nonempty, rows_info = frame_bounds(frame)
            a2 = arr.astype(jnp.int32) if arr.dtype == jnp.bool_ else arr
            if jnp.issubdtype(a2.dtype, jnp.floating):
                sent = jnp.asarray(jnp.inf if s.func == "min" else -jnp.inf,
                                   a2.dtype)
            else:
                info = jnp.iinfo(a2.dtype)
                sent = jnp.asarray(info.max if s.func == "min" else info.min,
                                   a2.dtype)
            op = jnp.minimum if s.func == "min" else jnp.maximum
            masked = jnp.where(w, a2, sent)
            cnt = frame_sum(w.astype(jnp.int32), lo, hi, nonempty)
            anchored_lo = rows_info is None or rows_info[1] is None
            anchored_hi = rows_info is not None and rows_info[2] is None
            if anchored_lo:
                # lo == partition start: forward running scan, read at hi
                run = _seg_scan(op, masked, seg)[hi]
            elif anchored_hi:
                # hi == partition end: backward running scan, read at lo
                rrun = _seg_scan(op, masked[::-1], seg[::-1])[::-1]
                run = rrun[lo]
            else:
                width = rows_info[3]
                if width is None or width <= 0:
                    run = jnp.full((cap,), sent)
                else:
                    run = _range_query(op, masked, sent, lo, hi, width, cap)
            win_cols.append((run, cnt > 0))
        else:
            raise NotSupportedError(f"window function {s.func}")

    sorted_inputs = [(at(sa), at(sv)) for sa, sv in in_slots]
    return sorted_inputs, win_cols, s_alive
