"""GROUP BY on the MXU: fused factorized one-hot matmul aggregation.

BASELINE config #2 (low-cardinality GROUP BY SUM/COUNT over 100M rows) is
the shape this kernel targets. A row-at-a-time hash table is the wrong
shape for a TPU; this kernel reduces value columns against group one-hots
on the MXU. Reference semantics: DataFusion's row-hash aggregate
(SURVEY §2.1); the reference streams 1024-row batches through a scalar
hash loop — here every row block is ONE matmul.

Two round-2 rewrites over the round-1 kernel:

1. FACTORIZED one-hot (the round-1 kernel did a (G, B) x (B, A) dot
   whose device time scaled with G):

     group g = hi*L + lo  factorizes the one-hot:  sum_r v_r * 1[g_r = g]
         = sum_r (1[hi_r = h] * v_r) * 1[lo_r = l]
         =       HP           @       LO^T

     HP[(h*P + p), r] = 1[hi_r == h] * plane_p[r]     (M = H*P rows)
     LO[l, r]         = 1[lo_r == l]                  (N = L columns)

   C = HP @ LO^T is ONE (M<=128, K=block) @ (K, N<=128) bf16 matmul per
   block — measured K-streaming cost on v5e scales with M only, so the
   factorization shrinks device time by G/(H*P): ~14x for G=256.

2. FUSED input processing: the kernel takes the RAW key / value / mask
   columns and computes slots, null masking, and the base-256 digit
   planes in VMEM. The round-1 design stacked an (A, n) f32 contribution
   matrix in XLA first — for the 100M-row bench that materialized 1.2 GB
   of HBM traffic and cost more device time than the kernel itself
   (xplane: 12.6 ms of fusions vs 9.7 ms kernel).

Numerical design (everything stays EXACT):
- the MXU's bf16 passes are exact for integers in [-256, 256), so i32
  value columns are decomposed in-kernel into base-256 digit planes:
  unsigned low digits ((v >> 8k) & 255) plus a signed top digit
  (v >> 8(d-1)), each exactly representable in bf16;
- per-block partials (< 2^21) accumulate across the sequential grid in a
  carry-split f32 pair: `lo in [0, 4096)` plus a multiples-of-4096
  counter; both stay inside the f32-exact integer range;
- digits recombine in f64 => exact while |value| < 256^digits and the
  per-group total < 2^45 (gated by `supported_span_aggs`).

Dead rows (filtered, NULL key, key outside [lo, lo+span)) are remapped
to hi == H — a zero one-hot column — so they contribute nothing.

Contribution columns are described by a static `col_spec`:
  ("p",)           presence: count of alive in-range rows per group
                   (count(*) and the valid-count of non-nullable sums)
  ("c", mi)        count of rows where masks[mi] (nullable count(x) /
                   valid-count of nullable sum/avg)
  ("s", vi, mi, d) sum of values[vi] (i32, |v| < 256^d) masked by
                   masks[mi] (or None), in d base-256 digit planes
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_STEP = 8192          # minimum rows per grid step (one dot per step)
_MAX_M = 128          # one MXU M-tile: H * total_planes must fit


def _step_rows(m: int) -> int:
    """Rows per grid step: bigger blocks amortize per-step overhead
    (measured: 9.4ms → 7.7ms at 100M rows going 8K → 128K rows/step)
    but the in-kernel HP matrix is (m, blk) f32 — bound its VMEM share
    to ~8MB and fall back to 8K rows for wide col_specs."""
    blk = (8 << 20) // (4 * max(m + 4, 1))
    blk = max(_STEP, min(131072, blk // _STEP * _STEP))
    return blk


def _pad(x: int, m: int) -> int:
    return -(-x // m) * m


def _spec_digits(col_spec) -> tuple:
    return tuple(c[3] if c[0] == "s" else 1 for c in col_spec)


def plan_shape(g_pad: int, digits: tuple[int, ...]):
    """Choose (H, L) with H*L >= g_pad, M = H*sum(digits) <= 128.

    Cost model from scripts/micro_mxu.py on v5e: dot time ~ M per row,
    one-hot build ~ (L + M) VPU element-ops per row; weight the dot ~3x.
    Returns None when no legal split exists (span too big for the MXU
    path — callers fall back to the sort-based aggregate).
    """
    p = sum(digits)
    best = None
    l = _LANE
    while l >= 8:
        h = -(-g_pad // l)
        m = h * p
        if m <= _MAX_M:
            cost = 3 * m + l
            if best is None or cost < best[0]:
                best = (cost, h, l)
        l //= 2
    if best is None:
        return None
    _, h, l = best
    return h, l


def _kernel(*refs, h_groups: int, l_groups: int, col_spec: tuple,
            n_values: int, n_masks: int, has_alive: bool, lo_key: int,
            span: int, blk: int, n_rows: int):
    it = iter(refs)
    key_ref = next(it)
    alive_ref = next(it) if has_alive else None
    value_refs = [next(it) for _ in range(n_values)]
    mask_refs = [next(it) for _ in range(n_masks)]
    hi_ref = next(it)
    lo_ref = next(it)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        hi_ref[...] = jnp.zeros_like(hi_ref)
        lo_ref[...] = jnp.zeros_like(lo_ref)

    keys = key_ref[...].reshape(1, blk)
    slot = keys - lo_key
    ok = (slot >= 0) & (slot < span)
    if n_rows % blk:
        # unpadded input: rows past n_rows in the (garbage-padded) final
        # block are dead. non-final blocks: n_rows - i*blk >= blk always.
        lin = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        ok &= lin < (n_rows - i * blk)
    if alive_ref is not None:
        ok &= alive_ref[...].reshape(1, blk) != 0
    # dead rows -> slot H*L -> hi == H, a zero one-hot column
    slot = jnp.where(ok, slot, h_groups * l_groups)
    lbits = l_groups.bit_length() - 1          # L is a power of two
    hi = jax.lax.shift_right_logical(slot, lbits)
    lo = jnp.bitwise_and(slot, l_groups - 1)

    masks01 = [(m[...].reshape(1, blk) != 0).astype(jnp.float32)
               for m in mask_refs]

    # contribution planes; None = constant 1 (presence — its HP rows are
    # the hi one-hot itself, no multiply needed)
    planes: list = []
    for c in col_spec:
        if c[0] == "p":
            planes.append(None)
        elif c[0] == "c":
            planes.append(masks01[c[1]])
        else:
            _, vi, mi, d = c
            v = value_refs[vi][...].reshape(1, blk)
            if mi is not None:
                v = jnp.where(masks01[mi] > 0, v, 0)
            for k in range(d - 1):
                dig = jnp.bitwise_and(
                    jax.lax.shift_right_logical(v, 8 * k), 255)
                planes.append(dig.astype(jnp.float32))
            top = jax.lax.shift_right_arithmetic(v, 8 * (d - 1))
            planes.append(top.astype(jnp.float32))

    p = len(planes)
    m = h_groups * p

    hid = jax.lax.broadcasted_iota(jnp.int32, (h_groups, blk), 0)
    lod = jax.lax.broadcasted_iota(jnp.int32, (l_groups, blk), 0)
    hi1 = (hid == hi).astype(jnp.float32)               # (H, blk)
    lo1 = (lod == lo).astype(jnp.bfloat16)              # (L, blk)
    rows = []
    for hh in range(h_groups):
        hrow = hi1[hh:hh + 1, :]
        for pl_ in planes:
            rows.append(hrow if pl_ is None else pl_ * hrow)
    hp = jnp.concatenate(rows, axis=0)                  # (M, blk)

    partial = jax.lax.dot_general(
        hp.astype(jnp.bfloat16), lo1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (M, L)

    # carry-split exact accumulation across the sequential grid
    acc = lo_ref[0:m, :] + partial
    carry = jnp.floor(acc * (1.0 / 4096.0))
    lo_ref[0:m, :] = acc - carry * 4096.0
    hi_ref[0:m, :] = hi_ref[0:m, :] + carry


@functools.partial(
    jax.jit,
    static_argnames=("lo_key", "span", "g_pad", "col_spec", "interpret"))
def groupby_fused_sums(key: jax.Array, alive, values, masks, *,
                       lo_key: int, span: int, g_pad: int,
                       col_spec: tuple, interpret: bool = False):
    """Fused MXU group-by. key: (n,) int32; alive: (n,) bool or None;
    values: tuple of (n,) int32; masks: tuple of (n,) bool. col_spec:
    see module docstring. Returns (g_pad, len(col_spec)) f64 exact sums.
    """
    n = key.shape[0]
    digits = _spec_digits(col_spec)
    shape = plan_shape(g_pad, digits)
    assert shape is not None, "span too large for MXU groupby"
    h_groups, l_groups = shape
    p = sum(digits)
    m = h_groups * p
    step = _step_rows(m)

    if n % _LANE:
        # rare non-128-multiple capacity: pad to a full block (copies).
        # keys pad out of [lo, lo+span) so padding rows are dead.
        n_pad = _pad(max(n, _STEP), _STEP)
        pad_key = lo_key - 1 if lo_key > -(2 ** 31) else lo_key + span
        key = jnp.pad(key, (0, n_pad - n), constant_values=pad_key)
        if alive is not None:
            alive = jnp.pad(alive, (0, n_pad - n))
        values = tuple(jnp.pad(v, (0, n_pad - n)) for v in values)
        masks = tuple(jnp.pad(mk, (0, n_pad - n)) for mk in masks)
        n = n_pad
    # (n,) -> (n/128, 128) is layout-free (T(1024) == row-major T(8,128));
    # the final partial grid block is masked in-kernel via n_rows.
    r = n // _LANE

    def as2d(x, dt):
        return x.astype(dt).reshape(r, _LANE)

    ins = [as2d(key, jnp.int32)]
    if alive is not None:
        ins.append(as2d(alive, jnp.int8))
    ins += [as2d(v, jnp.int32) for v in values]
    ins += [as2d(mk, jnp.int8) for mk in masks]
    step = min(step, _pad(n, _STEP))
    nb = -(-n // step)

    kern = functools.partial(
        _kernel, h_groups=h_groups, l_groups=l_groups, col_spec=col_spec,
        n_values=len(values), n_masks=len(masks),
        has_alive=alive is not None, lo_key=lo_key, span=span, blk=step,
        n_rows=n)
    m_pad = _pad(m, 8)
    blk_spec = pl.BlockSpec((step // _LANE, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((m_pad, l_groups), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    # the remote Mosaic compiler rejects i64 constants that x64 mode puts
    # into grid index maps — trace the kernel in 32-bit scope
    with jax.enable_x64(False):
        hi, lo = pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((m_pad, l_groups), jnp.float32),
                       jax.ShapeDtypeStruct((m_pad, l_groups), jnp.float32)),
            grid=(nb,),
            in_specs=[blk_spec] * len(ins),
            out_specs=(acc_spec, acc_spec),
            interpret=interpret,
        )(*ins)

    # C[h*P + p, l] -> sums[g = h*L + l, col] = sum_d C[..] * 256^d
    sums = hi.astype(jnp.float64) * 4096.0 + lo.astype(jnp.float64)
    sums = sums[:m].reshape(h_groups, p, l_groups)
    out_cols = []
    off = 0
    for d in digits:
        acc = jnp.zeros((h_groups, l_groups), jnp.float64)
        for k in range(d):
            acc = acc + sums[:, off + k, :] * (256.0 ** k)
        off += d
        out_cols.append(acc.reshape(h_groups * l_groups)[:g_pad])
    return jnp.stack(out_cols, axis=1)                  # (g_pad, C)


def build_fused_call(agg_specs, agg_digits, vvs_aggs):
    """Assemble (values, masks, col_spec, per-agg plan) for
    `groupby_fused_sums` from evaluated aggregate arguments.

    agg_specs: logical AggSpec list; agg_digits: per-agg value digit
    count (None for counts), from the gate's stats-derived bounds;
    vvs_aggs: evaluated VV (.arr/.valid) per agg that has an .arg.
    Returns (values, masks, col_spec, plan) where plan is one
    (kind, sum_col, cnt_col) per agg into the kernel's output columns.
    col 0 is always presence. Non-nullable count/valid-count columns
    dedupe onto presence (the one-hot already zeroes dead rows).
    """
    values: list = []
    masks: list = []
    mask_idx: dict = {}
    col_spec: list = [("p",)]
    plan = []

    def add_mask(v):
        key = id(v)
        if key not in mask_idx:
            mask_idx[key] = len(masks)
            masks.append(v)
        return mask_idx[key]

    it = iter(vvs_aggs)
    for a, d in zip(agg_specs, agg_digits):
        if a.arg is None:
            plan.append(("count_star", None, 0))
            continue
        v = next(it)
        if a.func == "count":
            if v.valid is None:
                plan.append(("count", None, 0))
            else:
                mi = add_mask(v.valid)
                col_spec.append(("c", mi))
                plan.append(("count", None, len(col_spec) - 1))
            continue
        # sum / avg
        mi = add_mask(v.valid) if v.valid is not None else None
        if mi is None:
            cnt_col = 0
        else:
            col_spec.append(("c", mi))
            cnt_col = len(col_spec) - 1
        values.append(v.arr.astype(jnp.int32))
        col_spec.append(("s", len(values) - 1, mi, d))
        plan.append((a.func, len(col_spec) - 1, cnt_col))
    return tuple(values), tuple(masks), tuple(col_spec), plan


def column_digits(func: str, bound, n_rows: int) -> int:
    """Base-256 digits needed for one contribution column."""
    if func in ("count_star", "count", "presence"):
        return 1
    b = int(abs(bound)) if bound is not None else (1 << 23) - 1
    d = 1
    while 256 ** d <= b:
        d += 1
    return d


def supported_span_aggs(agg_funcs, arg_dtypes, value_bounds, n_rows) -> bool:
    """Gate: every aggregate must be count/sum/avg over ints whose
    values stay inside the digit-exact window."""
    for func, dt, bound in zip(agg_funcs, arg_dtypes, value_bounds):
        if func in ("count_star", "count"):
            continue
        if func not in ("sum", "avg"):
            return False
        if dt is None or not dt.is_integer:
            return False
        if bound is None:
            return False
        if abs(bound) >= (1 << 23):
            return False
        if abs(bound) * max(n_rows, 1) >= (1 << 45):
            return False
    return True
