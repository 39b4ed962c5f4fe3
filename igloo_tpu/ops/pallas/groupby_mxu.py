"""GROUP BY on the MXU: factorized one-hot matmul for small key spans.

BASELINE config #2 (low-cardinality GROUP BY SUM/COUNT over 100M rows) is
the shape this kernel targets. A row-at-a-time hash table is the wrong
shape for a TPU; this kernel reduces value columns against group one-hots
on the MXU. Reference semantics: DataFusion's row-hash aggregate
(SURVEY §2.1); the reference streams 1024-row batches through a scalar
hash loop — here every row block is ONE matmul.

Design (round-2 rewrite — the round-1 kernel did a (G, B) x (B, A) dot
whose device time scaled with G and wasted the MXU on tiny N):

  group g = hi*L + lo  factorizes the one-hot:   sum_{r} v_r * 1[g_r = g]
      = sum_r (1[hi_r = h] * v_r) * 1[lo_r = l]
      =       HP           @       LO^T

  HP[(h*P + p), r] = 1[hi_r == h] * plane_p[r]      (M = H*P rows)
  LO[l, r]         = 1[lo_r == l]                   (N = L columns)

  C = HP @ LO^T  is ONE (M<=128, K=block) @ (K, N<=128) bf16 matmul per
  block — measured K-streaming cost on v5e scales with M only, so the
  factorization shrinks device time by G/ (H*P): ~14x for G=256.

Numerical design (everything stays EXACT):
- the MXU's bf16 passes are exact for integers < 256, so integer value
  columns are decomposed in-kernel into base-256 signed digit planes
  (sign * digit in [-255, 255], exact in bf16);
- per-block partials (< 2^21) accumulate across the sequential grid in a
  carry-split f32 pair: `lo in [0, 4096)` plus a multiples-of-4096
  counter; both stay inside the f32-exact integer range;
- digits recombine in f64 => exact while |value| < 256^digits and the
  per-group total < 2^45 (gated by `supported_span_aggs`).

Dead rows and NULL keys arrive as slot == g_pad; the kernel re-maps any
slot >= g_pad to hi == H (a zero one-hot column), so they contribute
nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_STEP = 8192          # rows per grid step (one dot per step)
_MAX_M = 128          # one MXU M-tile: H * total_planes must fit


def _pad(x: int, m: int) -> int:
    return -(-x // m) * m


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


def _kernel(slot_ref, contrib_ref, hi_ref, lo_ref, *, h_groups: int,
            l_groups: int, digits: tuple[int, ...], blk: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        hi_ref[...] = jnp.zeros_like(hi_ref)
        lo_ref[...] = jnp.zeros_like(lo_ref)

    p = sum(digits)
    m = h_groups * p
    slots = slot_ref[...].reshape(1, blk)
    # dead rows (slot >= H*L after clip by caller) -> hi == h_groups
    hi = slots // l_groups
    lo = slots % l_groups

    # digit planes (sign * base-256 digit, exact in bf16)
    planes = []
    for c, d in enumerate(digits):
        v = contrib_ref[c:c + 1, :]                     # (1, blk) f32
        if d == 1:
            planes.append(v)                            # already < 256
            continue
        sign = jnp.sign(v)
        mag = jnp.abs(v)
        for k in range(d):
            dig = jnp.floor(mag * (1.0 / (256.0 ** k))) % 256.0
            planes.append(sign * dig)
    plane_mat = jnp.concatenate(planes, axis=0)         # (P, blk)

    hid = jax.lax.broadcasted_iota(jnp.int32, (h_groups, blk), 0)
    lod = jax.lax.broadcasted_iota(jnp.int32, (l_groups, blk), 0)
    hi1 = (hid == hi).astype(jnp.float32)               # (H, blk)
    lo1 = (lod == lo).astype(jnp.bfloat16)              # (L, blk)
    hp = jnp.concatenate(
        [plane_mat * hi1[hh:hh + 1, :] for hh in range(h_groups)],
        axis=0)                                         # (M, blk)

    partial = jax.lax.dot_general(
        hp.astype(jnp.bfloat16), lo1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (M, L)

    # carry-split exact accumulation across the sequential grid
    acc = lo_ref[0:m, :] + partial
    carry = jnp.floor(acc * (1.0 / 4096.0))
    lo_ref[0:m, :] = acc - carry * 4096.0
    hi_ref[0:m, :] = hi_ref[0:m, :] + carry


@functools.partial(jax.jit,
                   static_argnames=("g_pad", "digits", "interpret"))
def groupby_onehot_sums(slots: jax.Array, contribs: jax.Array,
                        g_pad: int, digits: tuple[int, ...] = None,
                        interpret: bool = False) -> jax.Array:
    """slots: (n,) int32 in [0, g_pad) or ==g_pad for excluded rows.
    contribs: (A, n) f32 integer-valued contribution columns (already
    masked: excluded rows may hold anything — their slot disables them).
    digits: base-256 digit count per column (default 3). Returns
    (g_pad, A) f64 per-group sums (exact, see module docstring).
    """
    a, n = contribs.shape
    if digits is None:
        digits = (3,) * a
    assert len(digits) == a
    shape = plan_shape(g_pad, digits)
    assert shape is not None, "span too large for MXU groupby"
    h_groups, l_groups = shape
    p = sum(digits)
    m = h_groups * p

    n_pad = _pad(max(n, _STEP), _STEP)
    if n_pad != n:
        slots = jnp.pad(slots, (0, n_pad - n), constant_values=g_pad)
        contribs = jnp.pad(contribs, ((0, 0), (0, n_pad - n)))
    # excluded rows must land in hi == H: remap g_pad (which may sit
    # inside the H*L rectangle) to H*L
    slots = jnp.where(slots >= g_pad, h_groups * l_groups, slots)
    slots2 = slots.reshape(n_pad // _LANE, _LANE)
    nb = n_pad // _STEP

    kern = functools.partial(_kernel, h_groups=h_groups,
                             l_groups=l_groups, digits=digits, blk=_STEP)
    m_pad = _pad(m, 8)
    # the remote Mosaic compiler rejects i64 constants that x64 mode puts
    # into grid index maps — trace the kernel in 32-bit scope
    with jax.enable_x64(False):
        hi, lo = pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((m_pad, l_groups), jnp.float32),
                       jax.ShapeDtypeStruct((m_pad, l_groups), jnp.float32)),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((_STEP // _LANE, _LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((a, _STEP), lambda i: (0, i),
                             memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((m_pad, l_groups), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m_pad, l_groups), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(slots2, contribs)

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
    return jnp.stack(out_cols, axis=1)                  # (g_pad, A)


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
