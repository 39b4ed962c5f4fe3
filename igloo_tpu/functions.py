"""Scalar function + UDF registry.

The reference registers one example UDF, `capitalize(Utf8)→Utf8`
(uppercases, null-preserving — /root/reference/crates/engine/src/lib.rs:71-144),
at engine construction. Here the registry is first-class:

- "numeric" functions run on device as fused jnp ops;
- "string" functions run as host dictionary transforms (see
  plan/logical.py BStringFunc) costing one device gather per row.

Users register UDFs with `QueryEngine.register_udf`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax.numpy as jnp

from .dtypes import SqlType, common_type
from .errors import BindError


@dataclasses.dataclass(frozen=True)
class ScalarFunction:
    name: str
    kind: str                        # 'numeric' | 'string' | 'string_to_scalar'
    ret_type: Callable               # (arg_types) -> SqlType
    device_fn: Optional[Callable] = None   # numeric: (args, ctx) -> array
    host_fn: Optional[Callable] = None     # string: python str -> str | scalar
    min_args: int = 1
    max_args: int = 1
    null_propagates: bool = True


def _num(t: SqlType, name: str) -> None:
    if not t.is_numeric:
        raise BindError(f"{name}() expects a numeric argument, got {t.name}")


def _float_ret(args):
    return SqlType.FLOAT64


def _same_ret(args):
    return args[0]


def _registry_builtin() -> dict[str, ScalarFunction]:
    reg: dict[str, ScalarFunction] = {}

    def add(f: ScalarFunction):
        reg[f.name] = f

    # ---- numeric, device-evaluated ----
    def unary_math(name, fn, ret=_float_ret):
        add(ScalarFunction(
            name, "numeric",
            ret_type=lambda a, n=name, r=ret: (_num(a[0], n), r(a))[1],
            device_fn=lambda args: fn(args[0]),
        ))

    unary_math("sqrt", jnp.sqrt)
    unary_math("exp", jnp.exp)
    unary_math("ln", jnp.log)
    unary_math("log", jnp.log)
    unary_math("log10", lambda x: jnp.log10(x))
    unary_math("log2", lambda x: jnp.log2(x))
    unary_math("sin", jnp.sin)
    unary_math("cos", jnp.cos)
    unary_math("tan", jnp.tan)
    unary_math("asin", jnp.arcsin)
    unary_math("acos", jnp.arccos)
    unary_math("atan", jnp.arctan)
    unary_math("abs", jnp.abs, ret=_same_ret)
    unary_math("sign", jnp.sign, ret=_same_ret)
    unary_math("floor", jnp.floor)
    unary_math("ceil", jnp.ceil)
    unary_math("sinh", jnp.sinh)
    unary_math("cosh", jnp.cosh)
    unary_math("tanh", jnp.tanh)
    unary_math("cbrt", jnp.cbrt)
    unary_math("degrees", jnp.degrees)
    unary_math("radians", jnp.radians)

    add(ScalarFunction(
        "atan2", "numeric",
        ret_type=lambda a: (_num(a[0], "atan2"), SqlType.FLOAT64)[1],
        device_fn=lambda args: jnp.arctan2(
            args[0].astype(jnp.float64), args[1].astype(jnp.float64)),
        min_args=2, max_args=2,
    ))
    add(ScalarFunction(
        "trunc", "numeric",
        ret_type=lambda a: (_num(a[0], "trunc"), SqlType.FLOAT64)[1],
        device_fn=lambda args: (
            jnp.trunc(args[0]) if len(args) == 1
            else jnp.trunc(args[0] * 10.0 ** args[1]) / 10.0 ** args[1]),
        min_args=1, max_args=2,
    ))

    add(ScalarFunction(
        "round", "numeric",
        ret_type=lambda a: (_num(a[0], "round"), SqlType.FLOAT64)[1],
        device_fn=lambda args: (
            jnp.round(args[0]) if len(args) == 1
            else jnp.round(args[0] * 10.0 ** args[1]) / 10.0 ** args[1]),
        min_args=1, max_args=2,
    ))
    add(ScalarFunction(
        "power", "numeric",
        ret_type=lambda a: (_num(a[0], "power"), SqlType.FLOAT64)[1],
        device_fn=lambda args: jnp.power(args[0].astype(jnp.float64), args[1]),
        min_args=2, max_args=2,
    ))
    reg["pow"] = dataclasses.replace(reg["power"], name="pow")
    add(ScalarFunction(
        "mod", "numeric",
        ret_type=lambda a: common_type(a[0], a[1]),
        device_fn=lambda args: _sql_mod(args[0], args[1]),
        min_args=2, max_args=2,
    ))
    add(ScalarFunction(
        "greatest", "numeric",
        ret_type=lambda a: _common_all(a),
        device_fn=lambda args: _reduce(jnp.maximum, args),
        min_args=2, max_args=99,
    ))
    add(ScalarFunction(
        "least", "numeric",
        ret_type=lambda a: _common_all(a),
        device_fn=lambda args: _reduce(jnp.minimum, args),
        min_args=2, max_args=99,
    ))
    add(ScalarFunction(
        "pi", "numeric", ret_type=lambda a: SqlType.FLOAT64,
        device_fn=lambda args: jnp.float64(math.pi), min_args=0, max_args=0,
    ))

    # ---- temporal ----
    def civil_from_days(days):
        # Howard Hinnant's algorithm, fully vectorized integer math
        z = days.astype(jnp.int64) + 719468
        era = jnp.floor_divide(z, 146097)
        doe = z - era * 146097
        yoe = jnp.floor_divide(
            doe - jnp.floor_divide(doe, 1460) + jnp.floor_divide(doe, 36524)
            - jnp.floor_divide(doe, 146096), 365)
        y = yoe + era * 400
        doy = doe - (365 * yoe + jnp.floor_divide(yoe, 4)
                     - jnp.floor_divide(yoe, 100))
        mp = jnp.floor_divide(5 * doy + 2, 153)
        d = doy - jnp.floor_divide(153 * mp + 2, 5) + 1
        m = mp + jnp.where(mp < 10, 3, -9)
        y = y + (m <= 2)
        return y, m, d

    def _days_of(args, t):
        a = args[0]
        if t is SqlType.TIMESTAMP:
            return jnp.floor_divide(a.astype(jnp.int64), 86_400_000_000)
        return a

    def date_fn(name, pick):
        def rt(arg_types, n=name):
            if not arg_types[0].is_temporal:
                raise BindError(f"{n}() expects a DATE or TIMESTAMP")
            return SqlType.INT64
        def impl(args, p=pick):
            # caller passes physical ints; timestamps are µs
            days = args[0]
            if days.dtype == jnp.int64:
                big = jnp.abs(days) > 1 << 22   # heuristically µs vs days
                days = jnp.where(big, jnp.floor_divide(days, 86_400_000_000),
                                 days)
            y, m, d = civil_from_days(days)
            return (y, m, d)[p].astype(jnp.int64)
        add(ScalarFunction(name, "numeric", ret_type=rt, device_fn=impl))

    date_fn("year", 0)
    date_fn("month", 1)
    date_fn("day", 2)

    def _to_days_and_tod(a):
        if a.dtype == jnp.int64:   # timestamp µs
            days = jnp.floor_divide(a, 86_400_000_000)
            return days, a - days * 86_400_000_000
        return a.astype(jnp.int64), None

    def temporal_fn(name, impl):
        def rt(arg_types, n=name):
            if not arg_types[0].is_temporal:
                raise BindError(f"{n}() expects a DATE or TIMESTAMP")
            return SqlType.INT64
        add(ScalarFunction(name, "numeric", ret_type=rt, device_fn=impl))

    def _quarter(args):
        days, _ = _to_days_and_tod(args[0])
        _, m, _d = civil_from_days(days)
        return (jnp.floor_divide(m + 2, 3)).astype(jnp.int64)

    temporal_fn("quarter", _quarter)

    def _time_part(divisor, modulo):
        def impl(args):
            _, tod = _to_days_and_tod(args[0])
            if tod is None:
                return jnp.zeros(args[0].shape, jnp.int64)
            return jnp.floor_divide(tod, divisor) % modulo
        return impl

    temporal_fn("hour", _time_part(3_600_000_000, 24))
    temporal_fn("minute", _time_part(60_000_000, 60))
    temporal_fn("second", _time_part(1_000_000, 60))

    def _dow(args):
        # 0 = Sunday (Postgres EXTRACT(DOW))
        days, _ = _to_days_and_tod(args[0])
        return (days + 4) % 7

    temporal_fn("dow", _dow)

    def _isodow(args):
        # 1 = Monday .. 7 = Sunday (ISO 8601)
        days, _ = _to_days_and_tod(args[0])
        return (days + 3) % 7 + 1

    temporal_fn("isodow", _isodow)

    def _epoch(args):
        a = args[0]
        if a.dtype == jnp.int64:                # timestamp µs
            return jnp.floor_divide(a, 1_000_000)
        return a.astype(jnp.int64) * 86_400     # date days → seconds

    temporal_fn("epoch", _epoch)

    def _doy(args):
        days, _ = _to_days_and_tod(args[0])
        y, _m, _d = civil_from_days(days)
        jan1 = days_from_civil(y, jnp.ones_like(y), jnp.ones_like(y))
        return days - jan1 + 1

    temporal_fn("doy", _doy)

    def days_from_civil(y, m, d):
        y = y - (m <= 2)
        era = jnp.floor_divide(y, 400)
        yoe = y - era * 400
        mp = m + jnp.where(m > 2, -3, 9)
        doy = jnp.floor_divide(153 * mp + 2, 5) + d - 1
        doe = yoe * 365 + jnp.floor_divide(yoe, 4) \
            - jnp.floor_divide(yoe, 100) + doy
        return era * 146097 + doe - 719468

    def _is_leap(y):
        return (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))

    def _weeks_in(y):
        jan1 = days_from_civil(y, jnp.ones_like(y), jnp.ones_like(y))
        dow1 = (jan1 + 3) % 7 + 1               # isodow of Jan 1
        return 52 + ((dow1 == 4) | (_is_leap(y) & (dow1 == 3))).astype(
            jnp.int64)

    def _isoweek(args):
        # ISO 8601 week number (Postgres EXTRACT(WEEK))
        days, _ = _to_days_and_tod(args[0])
        y, _m, _d = civil_from_days(days)
        doy = days - days_from_civil(y, jnp.ones_like(y),
                                     jnp.ones_like(y)) + 1
        isodow = (days + 3) % 7 + 1
        w = jnp.floor_divide(doy - isodow + 10, 7)
        return jnp.where(w < 1, _weeks_in(y - 1),
                         jnp.where(w > _weeks_in(y), 1, w))

    temporal_fn("week", _isoweek)

    # ---- date_trunc family: truncate preserving the input's type ----
    def temporal_same(name, impl):
        def rt(arg_types, n=name):
            if not arg_types[0].is_temporal:
                raise BindError(f"{n}() expects a DATE or TIMESTAMP")
            return arg_types[0]
        add(ScalarFunction(name, "numeric", ret_type=rt, device_fn=impl))

    def _trunc_unit(unit):
        def impl(args):
            a = args[0]
            is_ts = a.dtype == jnp.int64
            days, _tod = _to_days_and_tod(a)
            if unit in ("hour", "minute", "second"):
                if not is_ts:
                    return a
                div = {"hour": 3_600_000_000, "minute": 60_000_000,
                       "second": 1_000_000}[unit]
                return jnp.floor_divide(a, div) * div
            y, m, _d = civil_from_days(days)
            one = jnp.ones_like(y)
            if unit == "year":
                nd = days_from_civil(y, one, one)
            elif unit == "quarter":
                nm = (jnp.floor_divide(m - 1, 3)) * 3 + 1
                nd = days_from_civil(y, nm, one)
            elif unit == "month":
                nd = days_from_civil(y, m, one)
            elif unit == "week":
                nd = days - (days + 3) % 7       # back to Monday
            else:                                # day
                nd = days
            return nd * 86_400_000_000 if is_ts else nd.astype(a.dtype)
        return impl

    for _u in ("year", "quarter", "month", "week", "day",
               "hour", "minute", "second"):
        temporal_same(f"date_trunc_{_u}", _trunc_unit(_u))

    def _interval_shift(args):
        base, months, days, us = args
        months = months.astype(jnp.int64)
        days = days.astype(jnp.int64)
        us = us.astype(jnp.int64)
        is_ts = base.dtype == jnp.int64
        base_days = (jnp.floor_divide(base.astype(jnp.int64), 86_400_000_000)
                     if is_ts else base.astype(jnp.int64))
        tod = (base.astype(jnp.int64) - base_days * 86_400_000_000
               if is_ts else jnp.zeros_like(base_days))
        y, m, d = civil_from_days(base_days)
        # calendar month shift with day clamped to the target month length
        total_m = (y * 12 + (m - 1)) + months
        ny = jnp.floor_divide(total_m, 12)
        nm = total_m - ny * 12 + 1
        # days in target month (civil trick: day 0 of next month)
        next_m = jnp.where(nm == 12, 1, nm + 1)
        next_y = jnp.where(nm == 12, ny + 1, ny)
        month_len = days_from_civil(next_y, next_m, 1) \
            - days_from_civil(ny, nm, 1)
        nd = jnp.minimum(d, month_len)
        out_days = days_from_civil(ny, nm, nd) + days
        if is_ts:
            return out_days * 86_400_000_000 + tod + us
        return out_days.astype(jnp.int32)

    add(ScalarFunction(
        "interval_shift", "numeric",
        ret_type=lambda a: a[0],
        device_fn=_interval_shift, min_args=4, max_args=4))

    # ---- string → string (dictionary transforms) ----
    def str_fn(name, host):
        add(ScalarFunction(
            name, "string",
            ret_type=lambda a, n=name: _expect_str(a[0], n, SqlType.STRING),
            host_fn=host,
        ))

    str_fn("upper", lambda s: s.upper())
    str_fn("lower", lambda s: s.lower())
    # The reference's example UDF: full uppercase, null-preserving
    # (/root/reference/crates/engine/src/lib.rs:80-87).
    str_fn("capitalize", lambda s: s.upper())
    str_fn("trim", lambda s: s.strip())
    str_fn("ltrim", lambda s: s.lstrip())
    str_fn("rtrim", lambda s: s.rstrip())
    str_fn("reverse", lambda s: s[::-1])
    str_fn("initcap", lambda s: s.title())

    add(ScalarFunction(
        "substr", "string",
        ret_type=lambda a: _expect_str(a[0], "substr", SqlType.STRING),
        host_fn=_substr, min_args=2, max_args=3,
    ))
    reg["substring"] = dataclasses.replace(reg["substr"], name="substring")
    add(ScalarFunction(
        "replace", "string",
        ret_type=lambda a: _expect_str(a[0], "replace", SqlType.STRING),
        host_fn=lambda s, old, new: s.replace(old, new),
        min_args=3, max_args=3,
    ))
    add(ScalarFunction(
        "lpad", "string",
        ret_type=lambda a: _expect_str(a[0], "lpad", SqlType.STRING),
        host_fn=lambda s, n, fill=" ": s.rjust(int(n), fill[:1] or " "),
        min_args=2, max_args=3,
    ))
    add(ScalarFunction(
        "rpad", "string",
        ret_type=lambda a: _expect_str(a[0], "rpad", SqlType.STRING),
        host_fn=lambda s, n, fill=" ": s.ljust(int(n), fill[:1] or " "),
        min_args=2, max_args=3,
    ))

    add(ScalarFunction(
        "split_part", "string",
        ret_type=lambda a: _expect_str(a[0], "split_part", SqlType.STRING),
        host_fn=_split_part, min_args=3, max_args=3,
    ))
    add(ScalarFunction(
        "left", "string",
        ret_type=lambda a: _expect_str(a[0], "left", SqlType.STRING),
        host_fn=lambda s, n: s[:int(n)] if int(n) >= 0 else s[:len(s) + int(n)],
        min_args=2, max_args=2,
    ))
    add(ScalarFunction(
        "right", "string",
        ret_type=lambda a: _expect_str(a[0], "right", SqlType.STRING),
        host_fn=lambda s, n: (s[-int(n):] if int(n) > 0
                              else s[-int(n):] if int(n) < 0 else ""),
        min_args=2, max_args=2,
    ))
    add(ScalarFunction(
        "repeat", "string",
        ret_type=lambda a: _expect_str(a[0], "repeat", SqlType.STRING),
        host_fn=lambda s, n: s * max(int(n), 0), min_args=2, max_args=2,
    ))
    add(ScalarFunction(
        "translate", "string",
        ret_type=lambda a: _expect_str(a[0], "translate", SqlType.STRING),
        host_fn=_translate, min_args=3, max_args=3,
    ))

    # ---- string → scalar ----
    add(ScalarFunction(
        "length", "string_to_scalar",
        ret_type=lambda a: _expect_str(a[0], "length", SqlType.INT64),
        host_fn=lambda s: len(s),
    ))
    reg["char_length"] = dataclasses.replace(reg["length"], name="char_length")
    reg["character_length"] = dataclasses.replace(reg["length"], name="character_length")
    add(ScalarFunction(
        "starts_with", "string_to_scalar",
        ret_type=lambda a: _expect_str(a[0], "starts_with", SqlType.BOOL),
        host_fn=lambda s, p: s.startswith(p), min_args=2, max_args=2,
    ))
    add(ScalarFunction(
        "ends_with", "string_to_scalar",
        ret_type=lambda a: _expect_str(a[0], "ends_with", SqlType.BOOL),
        host_fn=lambda s, p: s.endswith(p), min_args=2, max_args=2,
    ))
    add(ScalarFunction(
        "strpos", "string_to_scalar",
        ret_type=lambda a: _expect_str(a[0], "strpos", SqlType.INT64),
        host_fn=lambda s, sub: s.find(sub) + 1, min_args=2, max_args=2,
    ))
    reg["instr"] = dataclasses.replace(reg["strpos"], name="instr")
    add(ScalarFunction(
        "ascii", "string_to_scalar",
        ret_type=lambda a: _expect_str(a[0], "ascii", SqlType.INT64),
        host_fn=lambda s: ord(s[0]) if s else 0,
    ))
    add(ScalarFunction(
        "regexp_like", "string_to_scalar",
        ret_type=lambda a: _expect_str(a[0], "regexp_like", SqlType.BOOL),
        host_fn=lambda s, pat: _re(pat).search(s) is not None,
        min_args=2, max_args=2,
    ))
    reg["regexp_matches"] = dataclasses.replace(reg["regexp_like"],
                                                name="regexp_matches")
    add(ScalarFunction(
        "regexp_replace", "string",
        ret_type=lambda a: _expect_str(a[0], "regexp_replace",
                                       SqlType.STRING),
        host_fn=lambda s, pat, rep: _re(pat).sub(_pg_sub(rep), s),
        min_args=3, max_args=3,
    ))
    add(ScalarFunction(
        "regexp_extract", "string",
        ret_type=lambda a: _expect_str(a[0], "regexp_extract",
                                       SqlType.STRING),
        host_fn=_regexp_extract, min_args=2, max_args=3,
    ))
    return reg


def _common_all(types):
    t = types[0]
    for u in types[1:]:
        t = common_type(t, u)
    return t


def _reduce(op, args):
    out = args[0]
    for a in args[1:]:
        out = op(out, a)
    return out


def _sql_mod(a, b):
    safe = jnp.where(b == 0, 1, b)
    return jnp.where(b == 0, 0, a - (a // safe).astype(a.dtype) * safe)


_RE_CACHE: dict = {}


def _re(pat: str):
    import re
    r = _RE_CACHE.get(pat)
    if r is None:
        r = _RE_CACHE[pat] = re.compile(pat)
    return r


def _pg_sub(rep: str) -> str:
    r"""Postgres \1 group references → Python re \1 (they coincide);
    escape lone backslashes that aren't group refs."""
    return rep


def _regexp_extract(s: str, pat: str, group=0):
    m = _re(pat).search(s)
    if m is None:
        return ""
    g = int(group)
    try:
        return m.group(g) or ""
    except IndexError:
        return ""


def _split_part(s: str, delim: str, n) -> str:
    if delim == "":
        return ""
    parts = s.split(delim)
    i = int(n)
    if i > 0:
        return parts[i - 1] if i <= len(parts) else ""
    if i < 0:
        return parts[i] if -i <= len(parts) else ""
    return ""


def _translate(s: str, src: str, dst: str) -> str:
    table = {}
    for i, ch in enumerate(src):
        table[ord(ch)] = dst[i] if i < len(dst) else None
    return s.translate(table)


def _substr(s: str, start, length=None):
    start = int(start)
    # SQL substr is 1-based; start<=0 shifts the window like Postgres
    begin = max(start - 1, 0)
    if length is None:
        return s[begin:]
    end = max(start - 1 + int(length), begin)
    return s[begin:end]


def _expect_str(t: SqlType, name: str, ret: SqlType) -> SqlType:
    if not t.is_string:
        raise BindError(f"{name}() expects a string argument, got {t.name}")
    return ret


class FunctionRegistry:
    def __init__(self):
        self._fns = _registry_builtin()
        self._udf_names: list[str] = []

    def get(self, name: str) -> ScalarFunction | None:
        return self._fns.get(name)

    def udf_names(self) -> list[str]:
        """Registered (non-builtin) UDF names — part of the persistent
        result cache fingerprint."""
        return list(self._udf_names)

    def register_udf(self, name: str, fn: Callable, *,
                     kind: str = "string",
                     ret_type: SqlType | None = None) -> None:
        """Register a user-defined scalar function.

        kind='string': host callable str→str applied via dictionary transform.
        kind='string_to_scalar': host callable str→int/float/bool.
        kind='numeric': jax-traceable callable over arrays.
        """
        name = name.lower()
        if kind == "numeric":
            rt = ret_type or SqlType.FLOAT64
            self._fns[name] = ScalarFunction(
                name, "numeric", ret_type=lambda a, r=rt: r,
                device_fn=lambda args, f=fn: f(*args),
                min_args=0, max_args=99)
        elif kind == "string":
            self._fns[name] = ScalarFunction(
                name, "string",
                ret_type=lambda a, n=name: _expect_str(a[0], n, SqlType.STRING),
                host_fn=fn, min_args=1, max_args=99)
        elif kind == "string_to_scalar":
            rt = ret_type or SqlType.INT64
            self._fns[name] = ScalarFunction(
                name, "string_to_scalar",
                ret_type=lambda a, n=name, r=rt: _expect_str(a[0], n, r),
                host_fn=fn, min_args=1, max_args=99)
        else:
            raise ValueError(f"unknown UDF kind {kind!r}")
        if name not in self._udf_names:
            self._udf_names.append(name)
