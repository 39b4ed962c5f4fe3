"""Dense-direct equi-join: one slot-table gather per probe row.

The bucket path (exec/join_exec.py:_bucket_join) pays three random HBM
gathers per probe row — (start,count), candidate window, payload — at
XLA's ~9-15 ns each (measured, scripts/micro_prims.py), which made the
SF10 fact-dim join 2.8 s of device time for 60 M probes. When the build
keys are a bounded integer range (ingest stats) and unique — the
standard fact→dim PK join — the whole probe collapses to ONE gather:

- build: scatter the dim rows into a dense slot table indexed by
  (key - lo).  Slot tables are int8 when only join *presence* is needed
  (semi-join shape: no right column is consumed downstream), a single
  packed int32 when one value column rides along (value+offset, 0 =
  empty slot), else an int8 presence plane plus an (span, K) int32 row
  table read with one row gather.
- uniqueness is verified by construction: sum(presence) == count of
  joinable build rows; duplicates fall back to the general paths.
- probe: matched/value = table[key - lo] — one gather per probe row.
- the right KEY column itself is never gathered: its joined value
  always equals the probe key (key-equality reconstruction).

Replaces the semantics of the reference's HashJoinExec build+probe
(/root/reference/crates/engine/src/operators/hash_join.rs:100-213) for
the dense-unique case with a TPU design where the hash table is the
identity map.

Output rows keep probe order (output row i = probe row i), so
INNER/LEFT/SEMI/ANTI all emit through the selection-mask model with no
expansion program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sql.ast import JoinKind
from ..plan import logical as L

# probes smaller than this stay on the general paths (the dense table's
# build scatter only amortizes over large probes); tests patch this down
DENSE_MIN_ROWS = 1 << 21

# slot-table span ceiling: span * 4B must stay a modest slice of HBM
MAX_SPAN = 1 << 27

# max int32 planes in the stacked value table (beyond: general path)
MAX_VALUE_PLANES = 4


def _right_key_bounds(node, right):
    """(lo, hi) ints from the right key column's ingest stats, or None."""
    if len(node.right_keys) != 1:
        return None
    e = node.right_keys[0]
    if not isinstance(e, L.BColumn) or e.index >= len(right.cols):
        return None
    if not e.dtype.is_integer:
        return None
    st = getattr(right.cols[e.index], "stats", None)
    if st is None:
        return None
    return int(st[0]), int(st[1])


def _plan_value_cols(node, right):
    """Decide how each right output column is served.

    Returns (key_col_idx, plan) where plan is a list of
    ("key", None) | ("pack", (col_idx, vlo)) | ("row", col_idx) |
    ("rownull", col_idx) per right column, or None when the layout
    doesn't fit the plane budget. "pack" is only used when it is the
    single non-key column (the packed plane then also serves as the
    presence table)."""
    e = node.right_keys[0]
    key_idx = e.index if isinstance(e, L.BColumn) else -1
    plan = []
    packable = []
    row_planes = 0
    for i, c in enumerate(right.cols):
        if i == key_idx:
            plan.append(("key", None))
            continue
        # packed candidate: int-ish, no nulls, bounded range
        bounds = None
        if c.dictionary is not None:
            bounds = (0, max(len(c.dictionary) - 1, 0))
        elif c.stats is not None and c.dtype.is_integer \
                and jnp.asarray(c.arr).dtype == jnp.int32:
            bounds = (int(c.stats[0]), int(c.stats[1]))
        if c.arr.dtype in (jnp.float64, jnp.uint64):
            return key_idx, None        # f64 bitcast rebuild unsupported
        wide = 2 if c.arr.dtype == jnp.int64 else 1
        if bounds is not None and c.valid is None \
                and bounds[1] - bounds[0] < (1 << 30):
            packable.append(i)
            plan.append(("pack", (i, bounds[0], bounds[1])))
        elif c.valid is None:
            plan.append(("row", i))
            row_planes += wide
        else:
            plan.append(("rownull", i))
            row_planes += wide + 1
    if len(packable) == 1 and row_planes == 0:
        # single packed plane serves value + presence
        return key_idx, plan
    # demote pack entries to row entries (presence comes from the i8 plane)
    out = []
    for kind, info in plan:
        if kind == "pack":
            out.append(("row", info[0]))
            row_planes += 1
        else:
            out.append((kind, info))
    if row_planes > MAX_VALUE_PLANES:
        return key_idx, None
    return key_idx, out


def try_dense_direct(ex, node, left, right, l_keys, r_keys):
    """Dense-unique direct join, or None to fall through to the general
    paths (span/stats/kind gates fail, or duplicate build keys)."""
    from .runtime import RCol, RTable
    from .join_exec import _apply_residual, _sig

    if node.kind not in (JoinKind.INNER, JoinKind.LEFT, JoinKind.SEMI,
                         JoinKind.ANTI):
        return None
    if len(l_keys) != 1 or len(r_keys) != 1:
        return None
    if left.capacity < DENSE_MIN_ROWS:
        return None
    if node.residual is not None and node.kind is not JoinKind.INNER:
        return None
    bounds = _right_key_bounds(node, right)
    if bounds is None:
        return None
    lo, hi = bounds
    span = hi - lo + 1
    if not (0 < span <= MAX_SPAN):
        return None
    key_idx, plan = _plan_value_cols(node, right)
    if plan is None:
        return None
    packed = next((x for k, x in plan if k == "pack"), None)
    row_cols = [x for k, x in plan if k in ("row", "rownull")]
    row_null = {x for k, x in plan if k == "rownull"}
    want_presence = packed is None

    la, lv = l_keys[0]
    ra, rv = r_keys[0]

    # ---- build program: dense slot tables + uniqueness stat ----
    key_b = ("dense_b", span, lo, right.capacity, packed,
             tuple(row_cols), tuple(sorted(row_null)),
             rv is not None, right.mask is not None, _sig(right))
    build = ex._jit_cache.get(key_b)
    if build is None:
        packed_info = packed
        rc_idx, rn_set = list(row_cols), set(row_null)
        presence = want_presence

        @jax.jit
        def build(ra, rv, r_mask, r_arrs, r_valids):
            rj = r_mask if r_mask is not None else jnp.ones(ra.shape,
                                                            jnp.bool_)
            if rv is not None:
                rj = rj & rv
            roff = (ra.astype(jnp.int64) - lo)
            # Bounds-check before the int32 cast (mirrors the dist path):
            # stale/broken ingest stats could otherwise wrap an offset
            # >= 2^32 back into [0, span) and corrupt the slot table while
            # still passing the placed == nj uniqueness check.  Out-of-range
            # keys route to the dead slot but still count in nj, so
            # placed != nj detects them and falls back to the general path.
            okr = rj & (roff >= 0) & (roff < span)
            slot = jnp.where(okr, roff, span).astype(jnp.int32)
            outs = {}
            if presence:
                pres = jnp.zeros((span,), jnp.int8).at[slot].set(
                    jnp.int8(1), mode="drop")
                placed = jnp.sum(pres.astype(jnp.int64))
                outs["presence"] = pres
            else:
                ci, vlo, vhi = packed_info
                # ≤126-wide values pack as int8 so big-span tables stay
                # in the fast gather tier (scripts/micro_prims.py)
                tdt = jnp.int8 if vhi - vlo <= 126 else jnp.int32
                pv = ((r_arrs[ci].astype(jnp.int32) - vlo) + 1).astype(tdt)
                tab = jnp.zeros((span,), tdt).at[slot].set(
                    pv, mode="drop")
                placed = jnp.sum((tab > 0).astype(jnp.int64))
                outs["packed"] = tab
            if rc_idx:
                planes = []
                for ci in rc_idx:
                    a = r_arrs[ci]
                    if a.dtype == jnp.int64:
                        w = jax.lax.bitcast_convert_type(a, jnp.int32)
                        planes += [w[:, 0], w[:, 1]]
                    elif a.dtype in (jnp.float32, jnp.uint32):
                        planes.append(
                            jax.lax.bitcast_convert_type(a, jnp.int32))
                    else:
                        planes.append(a.astype(jnp.int32))
                    if ci in rn_set:
                        v = r_valids[ci]
                        planes.append(v.astype(jnp.int32))
                rows = jnp.stack(planes, axis=-1)
                outs["rows"] = jnp.zeros(
                    (span, rows.shape[1]), jnp.int32).at[slot].set(
                    rows, mode="drop")
            nj = jnp.sum(rj.astype(jnp.int64))
            n_alive = (jnp.sum(r_mask.astype(jnp.int64))
                       if r_mask is not None
                       else jnp.asarray(right.capacity, jnp.int64))
            outs["stats"] = jnp.stack([placed, nj, n_alive])
            return outs
        ex._jit_cache[key_b] = build

    tabs = build(ra, rv, right.mask,
                 [c.arr for c in right.cols],
                 [c.valid for c in right.cols])
    placed, nj, n_alive = (int(x) for x in jax.device_get(tabs["stats"]))
    if placed != nj:
        return None        # duplicate build keys → general paths

    # ---- probe program: one gather (+ optional row gather) ----
    key_p = ("dense_p", node.kind.value, span, lo, left.capacity,
             packed, tuple(row_cols), tuple(sorted(row_null)),
             lv is not None, left.mask is not None, _sig(left),
             getattr(node, "null_aware_anti", True), str(la.dtype))
    probe = ex._jit_cache.get(key_p)
    if probe is None:
        kind = node.kind
        packed_info = packed
        rc_idx, rn_set = list(row_cols), set(row_null)
        presence = want_presence
        null_aware = getattr(node, "null_aware_anti", True)
        r_dtypes = [c.arr.dtype for c in right.cols]

        @jax.jit
        def probe(la, lv, l_mask, pres_tab, packed_tab, rows_tab,
                  nj_njb, n_alive_s):
            lj = l_mask if l_mask is not None else jnp.ones(la.shape,
                                                            jnp.bool_)
            if lv is not None:
                lj = lj & lv
            loff = la.astype(jnp.int64) - lo
            in_range = (loff >= 0) & (loff < span) & lj
            lc = jnp.clip(loff, 0, span - 1).astype(jnp.int32)
            packed_val = None
            if presence:
                matched = in_range & (pres_tab[lc] > 0)
            else:
                pv = packed_tab[lc].astype(jnp.int32)
                matched = in_range & (pv > 0)
                packed_val = pv - 1
            if kind in (JoinKind.SEMI, JoinKind.ANTI):
                alive_l = (l_mask if l_mask is not None
                           else jnp.ones(la.shape, jnp.bool_))
                if kind is JoinKind.SEMI:
                    out_mask = alive_l & lj & matched
                elif not null_aware:
                    out_mask = alive_l & ~(lj & matched)
                else:
                    any_null_b = n_alive_s > nj_njb
                    empty_b = n_alive_s == 0
                    out_mask = jnp.where(
                        empty_b, alive_l,
                        alive_l & lj & ~matched & ~any_null_b)
                return None, out_mask, matched
            grows = rows_tab[lc] if rc_idx else None
            inner = kind is JoinKind.INNER
            outs = []
            pi = 0
            for i, dt in enumerate(r_dtypes):
                if packed_info is not None and i == packed_info[0]:
                    ci, vlo = packed_info[0], packed_info[1]
                    outs.append(((packed_val + vlo).astype(dt),
                                 None if inner else matched))
                elif i in rc_idx:
                    if dt == jnp.int64:
                        w = jnp.stack([grows[:, pi], grows[:, pi + 1]],
                                      axis=-1)
                        arr = jax.lax.bitcast_convert_type(w, jnp.int64)
                        pi += 2
                    elif dt in (jnp.float32, jnp.uint32):
                        arr = jax.lax.bitcast_convert_type(
                            grows[:, pi], dt)
                        pi += 1
                    else:
                        arr = grows[:, pi].astype(dt)
                        pi += 1
                    if i in rn_set:
                        nul = grows[:, pi] > 0
                        pi += 1
                        valid = nul if inner else (matched & nul)
                    else:
                        valid = None if inner else matched
                    outs.append((arr, valid))
                else:
                    # key column: reconstruct from the probe key
                    outs.append((la.astype(dt),
                                 None if inner else matched))
            lm = (l_mask if l_mask is not None
                  else jnp.ones(la.shape, jnp.bool_))
            out_mask = lm & matched if inner else lm
            return outs, out_mask, matched
        ex._jit_cache[key_p] = probe

    right_cols, out_mask, matched = probe(
        la, lv, left.mask, tabs.get("presence"), tabs.get("packed"),
        tabs.get("rows"), tabs["stats"][1], tabs["stats"][2])

    if node.kind in (JoinKind.SEMI, JoinKind.ANTI):
        rt = RTable(left.cols, left.names, out_mask, left.capacity)
    else:
        cols = list(left.cols) + [
            RCol(a, v, c.dtype, c.dictionary, c.stats)
            for (a, v), c in zip(right_cols, right.cols)
        ]
        names = [f.name for f in node.schema]
        rt = RTable(cols, names, out_mask, left.capacity)
    if node.residual is not None:
        rt = _apply_residual(ex, rt, node.residual)
    return rt
