"""GROUP BY on the MXU: one-hot matmul aggregation for dense small keys.

BASELINE config #2 (low-cardinality GROUP BY SUM/COUNT over 100M rows) is
the shape this kernel targets. The sort-based general path pays one
O(n log n) sort; here, when the key fits a small dense span (known from
ingest stats / dictionary size), each row block becomes a one-hot matrix
and the MXU reduces it against the value columns:

    partial[g, a] += onehot(keys_block) @ contributions_block

Numerical design (everything stays EXACT):
- the MXU lowers f32 matmuls through bf16 passes, so integer value
  columns are decomposed into base-256 digits — each digit is an integer
  < 256, exactly representable in bf16;
- the digit columns are packed as rows of ONE (A·D, n) matrix so the
  kernel reads a clean 2D block (in-kernel concat of lane-merged rows
  miscompiled on the remote Mosaic toolchain);
- per-block partials (< 2¹⁸) accumulate across the sequential grid in a
  carry-split f32 pair: `lo ∈ [0, 4096)` plus a multiples-of-4096
  counter. Both stay inside the f32-exact integer range, and unlike
  Kahan compensation nothing can be folded away by excess-precision
  compiler flags;
- digits recombine in f64 ⇒ exact for |value| < 2²³ and Σ < 2⁴⁶.

Hardware shaping:
- slots arrive lane-packed (n/128, 128); inside the kernel they merge to
  lanes (1, B) — Mosaic supports sublane→lane merges — and the one-hot
  puts groups in SUBLANES: onehot[g, r] = (g == slot_r), avoiding any
  unsupported reshape/transpose;
- dead rows and NULL keys get slot == G (a one-hot column of zeros).

Supported aggregates: count(*), count(x), sum(int), avg (sum+count
recombined outside). min/max/float sums stay on the sort path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 1024         # rows per one-hot dot (8 sublanes × 128 lanes)
_SUB = 8              # one-hot dots per grid step (amortizes step cost)
_STEP = _BLOCK * _SUB # rows per grid step
_LANE = 128
_DIGITS = 3           # base-256 digits per value column (|v| < 2^23)


def _pad(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(slot_ref, contrib_ref, hi_ref, lo_ref, *, g_pad: int,
            n_aggs: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        hi_ref[...] = jnp.zeros_like(hi_ref)
        lo_ref[...] = jnp.zeros_like(lo_ref)

    rows = _BLOCK // _LANE
    for b in range(_SUB):
        slots = slot_ref[b * rows:(b + 1) * rows, :].reshape(1, _BLOCK)
        gids = jax.lax.broadcasted_iota(jnp.int32, (g_pad, _BLOCK), 0)
        onehot = (gids == slots).astype(jnp.float32)        # (G, B)
        contrib = contrib_ref[:, b * _BLOCK:(b + 1) * _BLOCK]
        sign = jnp.sign(contrib)
        mag = jnp.abs(contrib)

        # one dot per base-256 digit plane: same FLOPs as a single packed
        # dot, but digits are computed in VMEM (no (A·D, n) HBM temp) and
        # the accumulator uses static column blocks
        for d in range(_DIGITS):
            digit = jnp.floor(mag * (1.0 / (256.0 ** d))) % 256.0
            plane = sign * digit                            # (A, B)
            partial = jax.lax.dot_general(
                onehot, plane,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # (G, A)
            # carry-split exact accumulation (see module docstring)
            lo = lo_ref[:, d * n_aggs:(d + 1) * n_aggs] + partial
            carry = jnp.floor(lo * (1.0 / 4096.0))
            lo_ref[:, d * n_aggs:(d + 1) * n_aggs] = lo - carry * 4096.0
            hi_ref[:, d * n_aggs:(d + 1) * n_aggs] = \
                hi_ref[:, d * n_aggs:(d + 1) * n_aggs] + carry


@functools.partial(jax.jit, static_argnames=("g_pad", "interpret"))
def groupby_onehot_sums(slots: jax.Array, contribs: jax.Array,
                        g_pad: int, interpret: bool = False) -> jax.Array:
    """slots: (n,) int32 in [0, g_pad) or ==g_pad for excluded rows.
    contribs: (n, A) f32 integer-valued contribution columns (already
    masked: excluded rows may hold anything — their slot disables them).
    Returns (g_pad, A) f64 per-group sums (exact, see module docstring).
    """
    n, a = contribs.shape
    n_pad = _pad(n, _STEP)
    if n_pad != n:
        slots = jnp.pad(slots, (0, n_pad - n), constant_values=g_pad)
        contribs = jnp.pad(contribs, ((0, n_pad - n), (0, 0)))
    nb = n_pad // _STEP
    slots2 = slots.reshape(n_pad // _LANE, _LANE)
    contrib_mat = contribs.T                                # (A, n_pad)

    kern = functools.partial(_kernel, g_pad=g_pad, n_aggs=a)
    # the remote Mosaic compiler rejects i64 constants that x64 mode puts
    # into grid index maps — trace the kernel in 32-bit scope
    with jax.enable_x64(False):
        hi, lo = _call(kern, slots2, contrib_mat, g_pad, a, nb, interpret)
    sums = hi.astype(jnp.float64) * 4096.0 + lo.astype(jnp.float64)
    out = jnp.zeros((g_pad, a), jnp.float64)
    for i in range(a):
        acc = jnp.zeros((g_pad,), jnp.float64)
        for d in range(_DIGITS):
            acc = acc + sums[:, d * a + i] * (256.0 ** d)
        out = out.at[:, i].set(acc)
    return out


def _call(kern, slots2, contrib_mat, g_pad, a, nb, interpret):
    rows_per_block = _STEP // _LANE
    slot_block = pl.BlockSpec((rows_per_block, _LANE), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    contrib_block = pl.BlockSpec((a, _STEP), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    acc_block = pl.BlockSpec((g_pad, a * _DIGITS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((g_pad, a * _DIGITS), jnp.float32),
                   jax.ShapeDtypeStruct((g_pad, a * _DIGITS), jnp.float32)),
        grid=(nb,),
        in_specs=[slot_block, contrib_block],
        out_specs=(acc_block, acc_block),
        interpret=interpret,
    )(slots2, contrib_mat)


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
