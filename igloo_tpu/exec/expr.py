"""Expression evaluation: bound expressions → fused device compute.

Replaces the reference's per-batch PhysicalExpr evaluation
(/root/reference/crates/engine/src/operators/projection.rs:48-72,
filter.rs:39-68) with whole-column jnp programs that XLA fuses into a
single pass over HBM.

Two-phase model (see plan/logical.py BStringFunc for why):

1. `ExprPrep.prepare(expr)` — host phase, runs once per execution with the
   input table's dictionaries in hand. Computes auxiliary device inputs:
   dictionary remap tables for string functions/compares, LIKE match
   tables, string-literal code positions. Registers them as extra inputs
   so the traced function stays cache-friendly.
2. `eval_expr(expr, ctx)` — called inside `jax.jit` tracing. Pure array
   compute; reads aux inputs registered by phase 1.

Null semantics are SQL three-valued logic: values carry an optional
validity mask; AND/OR are Kleene; comparisons/arithmetic propagate null.
"""

from __future__ import annotations

import dataclasses
import fnmatch
import re
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..dtypes import SqlType
from ..errors import ExecutionError, NotSupportedError
from ..sql.ast import BinOp, UnOp
from ..plan.logical import (
    BBinary, BCase, BCast, BColumn, BExpr, BInList, BIsDistinctFrom, BIsNull,
    BLike, BLiteral, BScalarFunc, BScalarSubquery, BStringFunc, BUnary,
)
from ..functions import FunctionRegistry


# --------------------------------------------------------------------------
# Value-with-validity
# --------------------------------------------------------------------------

@dataclasses.dataclass
class VV:
    """A traced value + optional validity mask (None = all valid)."""
    arr: object
    valid: object = None     # bool array or None

    def valid_mask(self, like=None):
        if self.valid is not None:
            return self.valid
        ref = like if like is not None else self.arr
        return jnp.ones(jnp.shape(ref), dtype=jnp.bool_)


def and_valid(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a & b


# --------------------------------------------------------------------------
# Host prepare phase
# --------------------------------------------------------------------------

def sort_unique_dict(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Return (sorted unique values, remap old_code -> new_code)."""
    order = np.argsort(values, kind="stable")
    sorted_vals = values[order]
    uniq_mask = np.ones(len(sorted_vals), dtype=bool)
    if len(sorted_vals) > 1:
        uniq_mask[1:] = sorted_vals[1:] != sorted_vals[:-1]
    new_dict = sorted_vals[uniq_mask]
    # position of each sorted element's unique bucket
    bucket = np.cumsum(uniq_mask) - 1
    remap = np.empty(len(values), dtype=np.int32)
    remap[order] = bucket.astype(np.int32)
    return new_dict, remap


def merge_dicts(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merged sorted dict + remaps for codes of a and b into merged space."""
    merged = np.concatenate([np.asarray(a, dtype=object), np.asarray(b, dtype=object)])
    new_dict, remap = sort_unique_dict(merged)
    return new_dict, remap[:len(a)], remap[len(a):]


def like_to_regex(pattern: str, case_insensitive: bool) -> re.Pattern:
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        elif c == "\\" and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 1
        else:
            out.append(re.escape(c))
        i += 1
    flags = re.IGNORECASE if case_insensitive else 0
    return re.compile("^" + "".join(out) + "$", flags | re.DOTALL)


class ExprPrep:
    """Host-side preparation: walks expression trees, computes aux inputs.

    `input_dicts[i]` is the dictionary of input column i (None if not a
    string column). After prepare, `aux_arrays` holds numpy arrays to be
    passed (in order) as extra inputs to the jitted program, and
    `node_out_dict[id(expr)]` gives the output dictionary of every
    string-typed expression node.
    """

    def __init__(self, input_dicts: list, functions: Optional[FunctionRegistry] = None):
        self.input_dicts = input_dicts
        self.functions = functions
        self.aux_arrays: list[np.ndarray] = []
        self.node_aux: dict[int, dict] = {}      # id(node) -> {key: aux index or scalar}
        self.node_out_dict: dict[int, np.ndarray] = {}

    # ---- helpers ----
    def _add_aux(self, arr: np.ndarray) -> int:
        self.aux_arrays.append(np.ascontiguousarray(arr))
        return len(self.aux_arrays) - 1

    def _info(self, node) -> dict:
        return self.node_aux.setdefault(id(node), {})

    def out_dict(self, node) -> Optional[np.ndarray]:
        return self.node_out_dict.get(id(node))

    # ---- main walk ----
    def prepare(self, e: BExpr) -> None:
        if isinstance(e, BColumn):
            if e.dtype.is_string:
                d = self.input_dicts[e.index]
                if d is None:
                    d = np.asarray([""], dtype=object)
                self.node_out_dict[id(e)] = d
            return
        if isinstance(e, BLiteral):
            if e.dtype.is_string and e.value is not None:
                self.node_out_dict[id(e)] = np.asarray([e.value], dtype=object)
            return
        if isinstance(e, BBinary):
            self.prepare(e.left)
            self.prepare(e.right)
            lstr = e.left.dtype.is_string
            rstr = e.right.dtype.is_string
            if e.op in _CMP_SET and lstr and rstr:
                self._prepare_string_cmp(e)
            elif e.op is BinOp.CONCAT:
                self._prepare_concat(e)
            return
        if isinstance(e, BIsDistinctFrom):
            self.prepare(e.left)
            self.prepare(e.right)
            if e.left.dtype.is_string and e.right.dtype.is_string:
                self._prepare_string_cmp(e)
            return
        if isinstance(e, (BUnary, BIsNull)):
            self.prepare(e.operand)
            return
        if isinstance(e, BCast):
            self.prepare(e.operand)
            if e.operand.dtype.is_string and e.dtype.is_numeric:
                self._prepare_string_to_num(e)
            elif e.dtype.is_string and not e.operand.dtype.is_string:
                raise NotSupportedError("CAST to VARCHAR is not supported on device yet")
            elif e.dtype.is_string:
                self.node_out_dict[id(e)] = self.out_dict(e.operand)
            return
        if isinstance(e, BCase):
            for c, v in e.whens:
                self.prepare(c)
                self.prepare(v)
            if e.else_ is not None:
                self.prepare(e.else_)
            if e.dtype.is_string:
                self._prepare_string_case(e)
            return
        if isinstance(e, BInList):
            self.prepare(e.operand)
            for i in e.items:
                self.prepare(i)
            return
        if isinstance(e, BLike):
            self.prepare(e.operand)
            d = self.out_dict(e.operand)
            rx = like_to_regex(e.pattern, e.case_insensitive)
            from .. import native
            match = native.like_match(d, e.pattern, e.case_insensitive,
                                      py_matcher=rx.match)
            if match is None:
                match = np.asarray([bool(rx.match(s)) for s in d],
                                   dtype=np.bool_)
            self._info(e)["match_aux"] = self._add_aux(match)
            return
        if isinstance(e, BScalarFunc):
            for a in e.args:
                self.prepare(a)
            return
        if isinstance(e, BStringFunc):
            for a in e.args:
                self.prepare(a)
            self._prepare_string_func(e)
            return
        if isinstance(e, BScalarSubquery):
            info = self._info(e)
            if "value" not in info:
                raise ExecutionError(
                    "scalar subquery was not pre-evaluated by the executor")
            return
        raise NotSupportedError(f"prepare: {type(e).__name__}")

    # ---- string-specific preparations ----

    def _string_operand_repr(self, e: BExpr):
        """(kind, payload): 'col' with dict, or 'lit' with python str/None."""
        if isinstance(e, BLiteral):
            return "lit", e.value
        d = self.out_dict(e)
        if d is None:
            raise NotSupportedError(f"string expression {type(e).__name__} "
                                    "has no dictionary")
        return "col", d

    def _prepare_string_cmp(self, e) -> None:
        info = self._info(e)
        lk, lp = self._string_operand_repr(e.left)
        rk, rp = self._string_operand_repr(e.right)
        if lk == "col" and rk == "lit":
            info["mode"] = "col_lit"
            info.update(self._lit_position(lp, rp))
        elif lk == "lit" and rk == "col":
            info["mode"] = "lit_col"
            info.update(self._lit_position(rp, lp))
        elif lk == "col" and rk == "col":
            ld, rd = lp, rp
            if ld is rd or (len(ld) == len(rd) and (np.asarray(ld) == np.asarray(rd)).all()):
                info["mode"] = "same_dict"
            else:
                _, lremap, rremap = merge_dicts(ld, rd)
                info["mode"] = "remap"
                info["l_aux"] = self._add_aux(lremap)
                info["r_aux"] = self._add_aux(rremap)
        else:  # lit vs lit
            info["mode"] = "lit_lit"

    def _lit_position(self, d: np.ndarray, lit) -> dict:
        if lit is None:
            return {"lit_null": True, "pos": 0, "found": False}
        keys = np.asarray(d, dtype=object)
        pos = int(np.searchsorted(keys.astype(str), str(lit)))
        found = pos < len(keys) and keys[pos] == lit
        return {"lit_null": False, "pos": pos, "found": bool(found)}

    def _prepare_concat(self, e: BBinary) -> None:
        info = self._info(e)
        lk, lp = self._string_operand_repr(e.left)
        rk, rp = self._string_operand_repr(e.right)
        if lk == "col" and rk == "col":
            # pair-dictionary encoding: the product dictionary covers every
            # (left, right) combination; the device computes one packed
            # index per row and gathers the remap
            if len(lp) * len(rp) > (1 << 20):
                raise NotSupportedError(
                    "string || string with a combined dictionary over 2^20 "
                    "entries is not supported")
            product = np.asarray(
                [a + b for a in lp for b in rp], dtype=object)
            new_dict, remap = sort_unique_dict(product)
            info["mode"] = "pair"
            info["rwidth"] = len(rp)
            info["remap_aux"] = self._add_aux(remap)
            self.node_out_dict[id(e)] = new_dict
            return
        if lk == "lit" and rk == "lit":
            val = None if (lp is None or rp is None) else lp + rp
            info["mode"] = "lit"
            self.node_out_dict[id(e)] = np.asarray([val if val is not None else ""],
                                                   dtype=object)
            info["lit_null"] = val is None
            return
        # column ++ literal (either side): dictionary transform
        col_side = "l" if lk == "col" else "r"
        d = lp if lk == "col" else rp
        lit = rp if lk == "col" else lp
        if lit is None:
            info["mode"] = "null"
            self.node_out_dict[id(e)] = np.asarray([""], dtype=object)
            return
        transformed = np.asarray(
            [(s + lit) if col_side == "l" else (lit + s) for s in d], dtype=object)
        new_dict, remap = sort_unique_dict(transformed)
        info["mode"] = "remap"
        info["col_side"] = col_side
        info["remap_aux"] = self._add_aux(remap)
        self.node_out_dict[id(e)] = new_dict

    def _prepare_string_to_num(self, e: BCast) -> None:
        d = self.out_dict(e.operand)
        vals = np.zeros(len(d), dtype=np.float64)
        ok = np.zeros(len(d), dtype=np.bool_)
        for i, s in enumerate(d):
            try:
                vals[i] = float(s)
                ok[i] = True
            except (TypeError, ValueError):
                pass
        if not e.safe and not ok.all():
            bad = d[~ok][0]
            raise ExecutionError(f"CAST failed: {bad!r} is not a valid number")
        info = self._info(e)
        info["vals_aux"] = self._add_aux(vals)
        info["ok_aux"] = self._add_aux(ok)

    def _prepare_string_case(self, e: BCase) -> None:
        """Unify dictionaries of all string branches of a CASE."""
        branches = [v for _, v in e.whens] + ([e.else_] if e.else_ is not None else [])
        dicts = []
        for b in branches:
            k, p = self._string_operand_repr(b)
            dicts.append(np.asarray([p if p is not None else ""], dtype=object)
                         if k == "lit" else p)
        merged = np.concatenate([np.asarray(d, dtype=object) for d in dicts])
        new_dict, remap = sort_unique_dict(merged)
        info = self._info(e)
        offsets = np.cumsum([0] + [len(d) for d in dicts])
        info["branch_remaps"] = []
        for bi, b in enumerate(branches):
            sub = remap[offsets[bi]:offsets[bi + 1]]
            info["branch_remaps"].append(self._add_aux(sub.astype(np.int32)))
        self.node_out_dict[id(e)] = new_dict

    def _prepare_string_func(self, e: BStringFunc) -> None:
        info = self._info(e)
        arg0 = e.args[0]
        d = self.out_dict(arg0)
        if d is None:
            raise NotSupportedError(f"{e.name}(): first argument must be a string")
        extra = []
        for a in e.args[1:]:
            if not isinstance(a, BLiteral):
                raise NotSupportedError(
                    f"{e.name}(): extra arguments must be literals")
            extra.append(a.value)
        host_fn = e.udf
        if host_fn is None and self.functions is not None:
            f = self.functions.get(e.name)
            host_fn = f.host_fn if f else None
        if host_fn is None:
            raise NotSupportedError(f"no host implementation for {e.name}()")
        outs = None
        if not extra:
            from .. import native
            native_out = native.dict_transform(d, e.name, py_fn=host_fn)
            if native_out is not None:
                outs = list(native_out)
        if outs is None:
            outs = [host_fn(s, *extra) for s in d]
        if e.dtype.is_string:
            transformed = np.asarray([o if o is not None else "" for o in outs],
                                     dtype=object)
            new_dict, remap = sort_unique_dict(transformed)
            info["remap_aux"] = self._add_aux(remap)
            self.node_out_dict[id(e)] = new_dict
        else:
            npdt = {SqlType.INT64: np.int64, SqlType.INT32: np.int32,
                    SqlType.FLOAT64: np.float64, SqlType.FLOAT32: np.float32,
                    SqlType.BOOL: np.bool_}[e.dtype]
            info["vals_aux"] = self._add_aux(np.asarray(outs, dtype=npdt))

    def set_subquery_value(self, e: BScalarSubquery, value, is_null: bool,
                           out_dict: Optional[np.ndarray] = None) -> None:
        info = self._info(e)
        info["value"] = value
        info["is_null"] = is_null
        if out_dict is not None:
            self.node_out_dict[id(e)] = out_dict


_CMP_SET = (BinOp.EQ, BinOp.NEQ, BinOp.LT, BinOp.LTE, BinOp.GT, BinOp.GTE)


# --------------------------------------------------------------------------
# Traced evaluation phase
# --------------------------------------------------------------------------

class EvalCtx:
    """Traced-side context: input columns + aux arrays from ExprPrep."""

    def __init__(self, cols: list[VV], aux: list, prep: ExprPrep, nrows_hint=None):
        self.cols = cols
        self.aux = aux
        self.prep = prep
        self.nrows_hint = nrows_hint  # capacity, for broadcasting literals

    def info(self, node) -> dict:
        return self.prep.node_aux.get(id(node), {})

    def get_aux(self, idx: int):
        return self.aux[idx]


def _bcast(x, n):
    return jnp.broadcast_to(jnp.asarray(x), (n,))


def eval_expr(e: BExpr, ctx: EvalCtx) -> VV:
    n = ctx.nrows_hint

    if isinstance(e, BColumn):
        return ctx.cols[e.index]

    if isinstance(e, BLiteral):
        if e.value is None:
            return VV(jnp.zeros((n,), dtype=e.dtype.to_jax() if e.dtype is not SqlType.NULL
                                else jnp.int32),
                      jnp.zeros((n,), dtype=jnp.bool_))
        if e.dtype.is_string:
            # literal strings become code 0 of their single-entry dictionary
            return VV(jnp.zeros((n,), dtype=jnp.int32), None)
        return VV(_bcast(jnp.asarray(e.value, dtype=e.dtype.to_jax()), n), None)

    if isinstance(e, BBinary):
        return _eval_binary(e, ctx)

    if isinstance(e, BUnary):
        v = eval_expr(e.operand, ctx)
        if e.op is UnOp.NOT:
            return VV(~v.arr.astype(jnp.bool_), v.valid)
        if e.op is UnOp.NEG:
            return VV(-v.arr, v.valid)
        return v

    if isinstance(e, BIsNull):
        v = eval_expr(e.operand, ctx)
        isnull = (jnp.zeros((n,), jnp.bool_) if v.valid is None else ~v.valid)
        return VV(~isnull if e.negated else isnull, None)

    if isinstance(e, BIsDistinctFrom):
        return _eval_is_distinct(e, ctx)

    if isinstance(e, BCast):
        return _eval_cast(e, ctx)

    if isinstance(e, BCase):
        return _eval_case(e, ctx)

    if isinstance(e, BInList):
        return _eval_in_list(e, ctx)

    if isinstance(e, BLike):
        v = eval_expr(e.operand, ctx)
        match = ctx.get_aux(ctx.info(e)["match_aux"])
        codes = jnp.clip(v.arr, 0, match.shape[0] - 1)
        hit = match[codes]
        if e.negated:
            hit = ~hit
        return VV(hit, v.valid)

    if isinstance(e, BScalarFunc):
        return _eval_scalar_func(e, ctx)

    if isinstance(e, BStringFunc):
        return _eval_string_func(e, ctx)

    if isinstance(e, BScalarSubquery):
        info = ctx.info(e)
        if info.get("is_null", False):
            return VV(jnp.zeros((n,), dtype=e.dtype.to_jax()),
                      jnp.zeros((n,), dtype=jnp.bool_))
        return VV(_bcast(jnp.asarray(info["value"], dtype=e.dtype.to_jax()), n), None)

    raise NotSupportedError(f"eval: {type(e).__name__}")


def _numeric_common(l: VV, r: VV, lt: SqlType, rt: SqlType):
    out = None
    try:
        from ..dtypes import common_type
        out = common_type(lt if lt is not SqlType.NULL else rt,
                          rt if rt is not SqlType.NULL else lt)
    except TypeError:
        out = lt
    dt = out.to_jax()
    return l.arr.astype(dt), r.arr.astype(dt), out


def _eval_binary(e: BBinary, ctx: EvalCtx) -> VV:
    op = e.op
    if op is BinOp.AND or op is BinOp.OR:
        l = eval_expr(e.left, ctx)
        r = eval_expr(e.right, ctx)
        la = l.arr.astype(jnp.bool_)
        ra = r.arr.astype(jnp.bool_)
        lv = l.valid_mask() if l.valid is not None else None
        rv = r.valid_mask() if r.valid is not None else None
        ones = jnp.ones_like(la)
        lv = ones if lv is None else lv
        rv = ones if rv is None else rv
        if op is BinOp.AND:
            value = la & ra
            valid = (lv & rv) | (lv & ~la) | (rv & ~ra)
        else:
            value = la | ra
            valid = (lv & rv) | (lv & la) | (rv & ra)
        # value under "valid because one side decides" is already correct:
        # x AND false → false, x OR true → true, since invalid arr is garbage
        if op is BinOp.AND:
            value = jnp.where(lv & ~la, False, jnp.where(rv & ~ra, False, value))
        else:
            value = jnp.where(lv & la, True, jnp.where(rv & ra, True, value))
        return VV(value, valid)

    if op in _CMP_SET and (e.left.dtype.is_string or e.right.dtype.is_string):
        return _eval_string_cmp(e, ctx)

    l = eval_expr(e.left, ctx)
    r = eval_expr(e.right, ctx)
    valid = and_valid(l.valid, r.valid)

    if op in _CMP_SET:
        if e.left.dtype is SqlType.BOOL or e.right.dtype is SqlType.BOOL:
            la, ra = l.arr.astype(jnp.int32), r.arr.astype(jnp.int32)
        else:
            la, ra, _ = _numeric_common(l, r, e.left.dtype, e.right.dtype)
        fn = {BinOp.EQ: jnp.equal, BinOp.NEQ: jnp.not_equal,
              BinOp.LT: jnp.less, BinOp.LTE: jnp.less_equal,
              BinOp.GT: jnp.greater, BinOp.GTE: jnp.greater_equal}[op]
        return VV(fn(la, ra), valid)

    if op is BinOp.CONCAT:
        return _eval_concat(e, ctx, l, r)

    # arithmetic
    la, ra, out_t = _numeric_common(l, r, e.left.dtype, e.right.dtype)
    dt = e.dtype.to_jax()
    if op is BinOp.ADD:
        return VV((la + ra).astype(dt), valid)
    if op is BinOp.SUB:
        return VV((la - ra).astype(dt), valid)
    if op is BinOp.MUL:
        return VV((la * ra).astype(dt), valid)
    if op is BinOp.DIV:
        if e.dtype.is_integer:
            safe = jnp.where(ra == 0, 1, ra)
            q = jnp.trunc(la.astype(jnp.float64) / safe.astype(jnp.float64)).astype(dt) \
                if False else _int_div_trunc(la, safe).astype(dt)
            return VV(q, and_valid(valid, ra != 0))
        safe = jnp.where(ra == 0, 1, ra).astype(dt)
        return VV(la.astype(dt) / safe, and_valid(valid, ra != 0))
    if op is BinOp.MOD:
        safe = jnp.where(ra == 0, 1, ra)
        if e.dtype.is_integer:
            m = la - _int_div_trunc(la, safe) * safe
        else:
            m = jnp.fmod(la, safe)
        return VV(m.astype(dt), and_valid(valid, ra != 0))
    raise NotSupportedError(f"binary op {op}")


def _int_div_trunc(a, b):
    """C-style truncating integer division (SQL semantics), not floor."""
    q = jnp.floor_divide(a, b)
    r = a - q * b
    # floor rounds toward -inf; adjust when signs differ and remainder nonzero
    adjust = (r != 0) & ((a < 0) != (b < 0))
    return q + adjust.astype(q.dtype)


def _eval_string_cmp(e, ctx: EvalCtx) -> VV:
    info = ctx.info(e)
    op = e.op if isinstance(e, BBinary) else BinOp.EQ
    l = eval_expr(e.left, ctx)
    r = eval_expr(e.right, ctx)
    valid = and_valid(l.valid, r.valid)
    mode = info.get("mode", "same_dict")
    fn = {BinOp.EQ: jnp.equal, BinOp.NEQ: jnp.not_equal,
          BinOp.LT: jnp.less, BinOp.LTE: jnp.less_equal,
          BinOp.GT: jnp.greater, BinOp.GTE: jnp.greater_equal}[op]

    if mode == "same_dict":
        return VV(fn(l.arr, r.arr), valid)
    if mode == "remap":
        lm = ctx.get_aux(info["l_aux"])
        rm = ctx.get_aux(info["r_aux"])
        lc = lm[jnp.clip(l.arr, 0, lm.shape[0] - 1)]
        rc = rm[jnp.clip(r.arr, 0, rm.shape[0] - 1)]
        return VV(fn(lc, rc), valid)
    if mode in ("col_lit", "lit_col"):
        if info.get("lit_null"):
            n = ctx.nrows_hint
            return VV(jnp.zeros((n,), jnp.bool_), jnp.zeros((n,), jnp.bool_))
        pos, found = info["pos"], info["found"]
        col = l if mode == "col_lit" else r
        codes = col.arr
        # order-preserving dictionary: compare codes against the literal's
        # insertion position
        if op is BinOp.EQ:
            res = (codes == pos) if found else jnp.zeros_like(codes, jnp.bool_)
        elif op is BinOp.NEQ:
            res = (codes != pos) if found else jnp.ones_like(codes, jnp.bool_)
        else:
            # col < lit ⇔ code < pos; col <= lit ⇔ code < pos or (found and ==)
            lt = codes < pos
            eq = (codes == pos) if found else jnp.zeros_like(codes, jnp.bool_)
            res = {BinOp.LT: lt, BinOp.LTE: lt | eq,
                   BinOp.GT: ~(lt | eq), BinOp.GTE: ~lt}[op]
            if mode == "lit_col":   # literal on the left: flip the relation
                res = {BinOp.LT: ~lt & ~eq, BinOp.LTE: ~lt,
                       BinOp.GT: lt, BinOp.GTE: lt | eq}[op]
        if mode == "lit_col" and op in (BinOp.EQ, BinOp.NEQ):
            pass  # symmetric
        return VV(res, col.valid if valid is None else valid)
    if mode == "lit_lit":
        lv = e.left.value
        rv = e.right.value
        if lv is None or rv is None:
            nrows = ctx.nrows_hint
            return VV(jnp.zeros((nrows,), jnp.bool_), jnp.zeros((nrows,), jnp.bool_))
        py = {BinOp.EQ: lv == rv, BinOp.NEQ: lv != rv, BinOp.LT: lv < rv,
              BinOp.LTE: lv <= rv, BinOp.GT: lv > rv, BinOp.GTE: lv >= rv}[op]
        return VV(_bcast(jnp.asarray(py), ctx.nrows_hint), None)
    raise ExecutionError(f"unknown string compare mode {mode}")


def _eval_is_distinct(e: BIsDistinctFrom, ctx: EvalCtx) -> VV:
    l = eval_expr(e.left, ctx)
    r = eval_expr(e.right, ctx)
    lv = l.valid_mask()
    rv = r.valid_mask()
    if e.left.dtype.is_string and e.right.dtype.is_string:
        info = ctx.info(e)
        if info.get("mode") == "remap":
            lm = ctx.get_aux(info["l_aux"])
            rm = ctx.get_aux(info["r_aux"])
            la = lm[jnp.clip(l.arr, 0, lm.shape[0] - 1)]
            ra = rm[jnp.clip(r.arr, 0, rm.shape[0] - 1)]
        else:
            la, ra = l.arr, r.arr
    else:
        la, ra, _ = _numeric_common(l, r, e.left.dtype, e.right.dtype)
    same = (lv & rv & (la == ra)) | (~lv & ~rv)
    distinct = ~same
    return VV(same if e.negated else distinct, None)


def _eval_cast(e: BCast, ctx: EvalCtx) -> VV:
    v = eval_expr(e.operand, ctx)
    src, dst = e.operand.dtype, e.dtype
    if src == dst:
        return v
    if src.is_string and dst.is_numeric:
        info = ctx.info(e)
        vals = ctx.get_aux(info["vals_aux"])
        ok = ctx.get_aux(info["ok_aux"])
        codes = jnp.clip(v.arr, 0, vals.shape[0] - 1)
        out = vals[codes].astype(dst.to_jax())
        valid = and_valid(v.valid, ok[codes])
        return VV(out, valid)
    if dst.is_string:
        return v  # same-dict passthrough prepared earlier
    if dst is SqlType.BOOL:
        return VV(v.arr.astype(jnp.bool_) if src is SqlType.BOOL
                  else (v.arr != 0), v.valid)
    if src.is_float and dst.is_integer:
        return VV(jnp.trunc(v.arr).astype(dst.to_jax()), v.valid)
    return VV(v.arr.astype(dst.to_jax()), v.valid)


def _eval_case(e: BCase, ctx: EvalCtx) -> VV:
    info = ctx.info(e)
    is_string = e.dtype.is_string
    branches = [v for _, v in e.whens] + ([e.else_] if e.else_ is not None else [])
    conds = [c for c, _ in e.whens]
    n = ctx.nrows_hint
    dt = e.dtype.to_jax()

    vals = []
    for bi, b in enumerate(branches):
        bv = eval_expr(b, ctx)
        arr = bv.arr
        if is_string:
            remap = ctx.get_aux(info["branch_remaps"][bi])
            arr = remap[jnp.clip(arr, 0, remap.shape[0] - 1)]
        vals.append(VV(arr.astype(dt), bv.valid))

    out = jnp.zeros((n,), dtype=dt)
    out_valid = jnp.zeros((n,), dtype=jnp.bool_)
    decided = jnp.zeros((n,), dtype=jnp.bool_)
    for ci, c in enumerate(conds):
        cv = eval_expr(c, ctx)
        hit = cv.arr.astype(jnp.bool_)
        if cv.valid is not None:
            hit = hit & cv.valid
        take = hit & ~decided
        out = jnp.where(take, vals[ci].arr, out)
        out_valid = jnp.where(take, vals[ci].valid_mask(), out_valid)
        decided = decided | hit
    if e.else_ is not None:
        ev = vals[-1]
        take = ~decided
        out = jnp.where(take, ev.arr, out)
        out_valid = jnp.where(take, ev.valid_mask(), out_valid)
    return VV(out, out_valid)


def _eval_in_list(e: BInList, ctx: EvalCtx) -> VV:
    # x IN (a, b, c) ≡ x=a OR x=b OR x=c with Kleene OR
    from ..plan.logical import BBinary as BB
    parts = []
    for item in e.items:
        eq = BB(SqlType.BOOL, e.operand.nullable or item.nullable,
                BinOp.EQ, e.operand, item)
        # string compares need prepared info keyed by node id; re-prepare lazily
        if e.operand.dtype.is_string:
            key = id(eq)
            if key not in ctx.prep.node_aux:
                raise ExecutionError("string IN list requires prepared compare")
        parts.append(eq)
    # numeric path: evaluate directly
    v = eval_expr(e.operand, ctx)
    n = ctx.nrows_hint
    any_hit = jnp.zeros((n,), jnp.bool_)
    any_null = (jnp.zeros((n,), jnp.bool_) if v.valid is None else ~v.valid)
    for item in e.items:
        iv = eval_expr(item, ctx)
        if e.operand.dtype.is_string:
            # string items are literals; compare via code positions is complex —
            # handled by optimizer rewriting IN to OR of equals. Fallback: error.
            raise NotSupportedError("IN over strings is rewritten by the optimizer")
        la, ra, _ = _numeric_common(v, iv, e.operand.dtype, item.dtype)
        hit = la == ra
        if iv.valid is not None:
            any_null = any_null | (~iv.valid)
            hit = hit & iv.valid
        any_hit = any_hit | hit
    value = any_hit
    valid = any_hit | ~any_null
    if e.negated:
        value = ~value
    return VV(value, valid)


def _eval_scalar_func(e: BScalarFunc, ctx: EvalCtx) -> VV:
    if e.name == "coalesce":
        n = ctx.nrows_hint
        out = jnp.zeros((n,), dtype=e.dtype.to_jax())
        out_valid = jnp.zeros((n,), jnp.bool_)
        decided = jnp.zeros((n,), jnp.bool_)
        for a in e.args:
            av = eval_expr(a, ctx)
            valid = av.valid_mask()
            take = valid & ~decided
            out = jnp.where(take, av.arr.astype(e.dtype.to_jax()), out)
            out_valid = out_valid | take
            decided = decided | valid
        return VV(out, out_valid)
    if e.name == "nullif":
        l = eval_expr(e.args[0], ctx)
        r = eval_expr(e.args[1], ctx)
        la, ra, _ = _numeric_common(l, r, e.args[0].dtype, e.args[1].dtype)
        eq = (la == ra)
        if r.valid is not None:
            eq = eq & r.valid
        valid = and_valid(l.valid, ~eq)
        return VV(l.arr, valid)
    # generic registered numeric function
    from ..functions import FunctionRegistry  # noqa
    fns = ctx.prep.functions
    fn = fns.get(e.name) if fns else None
    if fn is None or fn.device_fn is None:
        raise NotSupportedError(f"no device implementation for {e.name}()")
    args = [eval_expr(a, ctx) for a in e.args]
    valid = None
    for a in args:
        valid = and_valid(valid, a.valid)
    out = fn.device_fn([a.arr for a in args])
    return VV(jnp.asarray(out, dtype=e.dtype.to_jax()) if jnp.ndim(out) else
              _bcast(jnp.asarray(out, dtype=e.dtype.to_jax()), ctx.nrows_hint), valid)


def _eval_string_func(e: BStringFunc, ctx: EvalCtx) -> VV:
    info = ctx.info(e)
    v = eval_expr(e.args[0], ctx)
    if e.dtype.is_string:
        remap = ctx.get_aux(info["remap_aux"])
        codes = remap[jnp.clip(v.arr, 0, remap.shape[0] - 1)]
        return VV(codes, v.valid)
    vals = ctx.get_aux(info["vals_aux"])
    out = vals[jnp.clip(v.arr, 0, vals.shape[0] - 1)].astype(e.dtype.to_jax())
    return VV(out, v.valid)


def _eval_concat(e: BBinary, ctx: EvalCtx, l: VV, r: VV) -> VV:
    info = ctx.info(e)
    mode = info.get("mode")
    n = ctx.nrows_hint
    valid = and_valid(l.valid, r.valid)
    if mode == "lit":
        if info.get("lit_null"):
            return VV(jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.bool_))
        return VV(jnp.zeros((n,), jnp.int32), valid)
    if mode == "null":
        return VV(jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.bool_))
    if mode == "remap":
        remap = ctx.get_aux(info["remap_aux"])
        src = l if info["col_side"] == "l" else r
        codes = remap[jnp.clip(src.arr, 0, remap.shape[0] - 1)]
        return VV(codes, valid)
    if mode == "pair":
        remap = ctx.get_aux(info["remap_aux"])
        idx = l.arr.astype(jnp.int32) * info["rwidth"] + r.arr.astype(jnp.int32)
        codes = remap[jnp.clip(idx, 0, remap.shape[0] - 1)]
        return VV(codes, valid)
    raise ExecutionError(f"unknown concat mode {mode}")
