"""Sorted-probe membership test against a VMEM-windowed dense bitmap.

The dense-unique join's probe is one XLA gather per row — ~9 ns/row of
random HBM access no matter how the table is laid out
(scripts/micro_prims.py), 580 ms for the SF10 fact side. When the join
is a SEMI SHAPE (no right column is consumed downstream — the common
fact→dim filter join after late pruning), the whole table collapses to
ONE BIT per key slot, and sorting the probe by slot id localizes each
64K-row block to a ~70K-slot key range. This kernel then answers every
probe from VMEM:

- the bitmap lives in HBM as (rows, 128) int32 (4096 slots per sublane
  row); each grid step's window — TWO consecutive WR-row blocks chosen
  by a scalar-prefetched block index, so a window can start at any
  WR-row granularity — is auto-DMA'd to VMEM by Pallas;
- each sorted probe element finds its word with a 2·WR-step broadcast
  walk (the only VPU-native random read) and tests its bit;
- elements whose slot falls outside the window (a probe-density gap
  crossing the window edge) are counted as UNRESOLVED — the caller
  retries on the gather path, so results are always exact.

Cost: ~2·WR·4 VPU ops per probe element (≈0.2 ns at WR=32) + one
sequential bitmap read — versus ~9 ns for the XLA gather it replaces.
The probe sort that buys this locality is the dominant cost and is paid
by the caller (parallel/dist_exec._dense_local_join sorted path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
WR = 32            # window rows per block; a window = 2 blocks = 256K slots
SLOTS_PER_ROW = _LANE * 32


def _kernel(w0_ref, skey_ref, win0_ref, win1_ref, out_ref, stats_ref,
            carry_ref, *, br: int, span: int, bps: int, wr: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[0] = 0

    shape = (br, _LANE)
    skey = skey_ref[...]
    # bps bits per slot: slots pack 32/bps to an int32 word
    slot_shift = (32 // bps - 1).bit_length()
    word = jax.lax.shift_right_logical(skey, slot_shift)
    lane = jnp.bitwise_and(word, _LANE - 1)
    base = w0_ref[i] * wr
    lrow = jax.lax.shift_right_logical(word, 7) - base

    def _walk(r, acc):
        row0 = jnp.broadcast_to(win0_ref[pl.ds(r, 1), :], shape)
        g0 = jnp.take_along_axis(row0, lane, axis=1)
        acc = jnp.where(lrow == r, g0, acc)
        row1 = jnp.broadcast_to(win1_ref[pl.ds(r, 1), :], shape)
        g1 = jnp.take_along_axis(row1, lane, axis=1)
        return jnp.where(lrow == wr + r, g1, acc)

    acc = jax.lax.fori_loop(0, wr, _walk, jnp.zeros(shape, jnp.int32))

    alive = skey < span
    resolved = (lrow >= 0) & (lrow < 2 * wr)
    sub = jnp.bitwise_and(skey, 32 // bps - 1) * bps
    hit = jnp.bitwise_and(
        jax.lax.shift_right_logical(acc, sub), (1 << bps) - 1)
    # int32 select then narrow: an i8 scalar-splat select on an i1
    # vector trips the Mosaic "Invalid relayout" bug (extract.py notes)
    m32 = jnp.where(alive & resolved, hit, jnp.int32(0))
    out_ref[...] = m32.astype(jnp.int8)

    unres = jnp.where(alive & ~resolved, jnp.int32(1), jnp.int32(0))
    # axis-wise sums only: a full scalar reduce re-traces through a jnp
    # proxy under the process-global x64 mode and emits an int64
    # convert Mosaic rejects (see ops/pallas/extract.py notes)
    u1 = jnp.sum(unres, axis=1, keepdims=True)
    u2 = jnp.sum(u1, axis=0, keepdims=True)
    carry_ref[0] = carry_ref[0] + u2[0, 0]

    @pl.when(i == pl.num_programs(0) - 1)
    def _fin():
        stats_ref[0] = carry_ref[0]


@functools.partial(jax.jit,
                   static_argnames=("span", "bps", "wr", "interpret"))
def bitmap_probe(skey_sorted: jax.Array, bitmap2d: jax.Array,
                 w0: jax.Array, *, span: int, bps: int = 1,
                 wr: int = WR, interpret: bool = False):
    """skey_sorted: (n,) int32 ascending slot ids in [0, span], where
    span is the dead sentinel; n a multiple of 64·128. bitmap2d:
    (rows, 128) int32 table at bps bits per slot (bps in {1, 8}: a
    presence bitmap, or the packed value+1 byte table reinterpreted as
    words), rows a multiple of 2·WR. w0: (n_blocks,) int32 window BLOCK
    index per probe block (clamped to [0, rows/WR - 2]).

    Returns (out (n,) int8 — the bps-bit slot value (0 = no match) —
    and unresolved (1,) int32)."""
    n = skey_sorted.shape[0]
    br = 512                              # 64K probe elements per block
    assert n % (br * _LANE) == 0
    nb = n // (br * _LANE)
    rows = bitmap2d.shape[0]
    assert rows % (2 * wr) == 0 and rows >= 2 * wr

    kern = functools.partial(_kernel, br=br, span=span, bps=bps, wr=wr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((br, _LANE), lambda i, w0r: (i, 0)),
            pl.BlockSpec((wr, _LANE), lambda i, w0r: (w0r[i], 0)),
            pl.BlockSpec((wr, _LANE), lambda i, w0r: (w0r[i] + 1, 0)),
        ],
        out_specs=[
            pl.BlockSpec((br, _LANE), lambda i, w0r: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    with jax.enable_x64(False):
        out, stats = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n // _LANE, _LANE), jnp.int8),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ],
            interpret=interpret,
        )(w0, skey_sorted.reshape(n // _LANE, _LANE), bitmap2d, bitmap2d)
    return out.reshape(n), stats


def pack_bytes(table_i8: jax.Array, span: int, rows_out=None):
    """(span,) int8 byte table → ((rows,128) int32 words, rows) at
    8 bits per slot (512 slots per row), rows padded to 2·WR (or the
    caller's rows_out)."""
    per_row = _LANE * 4
    rows = -(-span // per_row)
    rows = -(-rows // (2 * WR)) * (2 * WR)
    if rows_out is not None:
        rows = rows_out
    total = rows * per_row
    p = table_i8
    if total != span:
        p = jnp.concatenate([p, jnp.zeros((total - span,), jnp.int8)])
    w = p.reshape(-1, 4).astype(jnp.uint32) & jnp.uint32(0xFF)
    shifts = (jnp.arange(4, dtype=jnp.uint32) * 8)[None, :]
    words = jnp.sum(w << shifts, axis=1).astype(jnp.int32)
    return words.reshape(rows, _LANE), rows


def pack_bitmap(presence_i8: jax.Array, span: int, rows_out=None):
    """(span,) int8 0/1 presence → ((rows,128) int32 bitmap, rows).
    rows padded to a multiple of 2·WR (or the caller's rows_out)."""
    rows = -(-span // SLOTS_PER_ROW)
    rows = -(-rows // (2 * WR)) * (2 * WR)
    if rows_out is not None:
        rows = rows_out
    total = rows * SLOTS_PER_ROW
    p = presence_i8
    if total != span:
        p = jnp.concatenate(
            [p, jnp.zeros((total - span,), jnp.int8)])
    w = p.reshape(-1, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :]
    words = jnp.sum(w << shifts, axis=1).astype(jnp.int32)
    return words.reshape(rows, _LANE), rows
