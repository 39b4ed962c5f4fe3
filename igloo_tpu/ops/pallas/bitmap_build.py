"""Dense slot-table construction from SORTED build keys — no scatter.

XLA's scatter costs ~8.6 ns per update regardless of order
(scripts/micro_prims.py), making the 15M-row dim-table build the #2
cost of the SF10 join (85 ms). When the build keys arrive sorted (PK
order — the common case for dim tables; detected by a cheap cummax
pass), each 64K-key block touches a contiguous ~512K-slot window, and
the placement becomes an in-VMEM one-hot MXU accumulation:

- contributions C[row, lane] = Σ_i B[i,row]·A[i,lane]·w_i, where A/B
  are the key's one-hot (lane, window-row) coordinates and w_i the
  bit/byte weight, computed as TWO bf16-exact f32 matmuls (lo/hi 16-bit
  halves — weights are sums of ≤4 distinct shifted values < 2^16, so
  every sum is exact);
- a sliding 2·WB-row scratch accumulator carries partially-filled
  boundary rows between consecutive blocks (the window advances
  monotonically), and each step DMAs its full window — overlap rows are
  overwritten WITH the carried values, so later writes win correctly;
- keys that overrun the window (a >512K-slot block span) are counted as
  unplaced → the caller falls back to the scatter build, so results are
  always exact.

Cost ≈ 0.4 ns/key (VPU one-hot construction bound; the matmuls are
~0.16 ns on the MXU) vs 8.6 ns/key for the scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
WB = 64                  # window rows per block slot; window = 2*WB rows


def _kernel(w0_ref, slot_ref, live_ref, val_ref, zero_ref, out_ref,
            stats_ref, acc_ref, stage_ref, carry_ref, sem, *, br: int,
            span: int, bps: int, nrows_out: int):
    del zero_ref                # aliased zero-init of the output
    i = pl.program_id(0)
    win = 2 * WB

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        carry_ref[0] = 0        # previous base row
        carry_ref[1] = 0        # unplaced count

    base = w0_ref[i]

    # ---- slide the accumulator by (base - prev_base) rows ----
    @pl.when(i > 0)
    def _slide():
        delta = jnp.minimum(base - carry_ref[0], win)
        shifted = acc_ref[pl.ds(delta, win), :]
        rowi = jax.lax.broadcasted_iota(jnp.int32, (win, _LANE), 0)
        acc_ref[0:win, :] = jnp.where(rowi < win - delta, shifted, 0)
    carry_ref[0] = base

    spw = 32 // bps                       # slots per int32 word
    sub_r = 16                            # 2048 keys per MXU sub-tile
    nsub = br // sub_r
    unp = jnp.zeros((1, 1), jnp.int32)
    for t in range(nsub):
        slot = slot_ref[t * sub_r:(t + 1) * sub_r, :]
        live = live_ref[t * sub_r:(t + 1) * sub_r, :].astype(jnp.int32)
        word = slot // spw
        lane = jnp.bitwise_and(word, _LANE - 1)
        lrow = jax.lax.shift_right_logical(word, 7) - base
        ok = (lrow >= 0) & (lrow < win) & (live > 0)
        sh = jnp.bitwise_and(slot, spw - 1) * bps
        if bps == 1:
            w32 = jnp.where(ok, jnp.int32(1), jnp.int32(0)) << sh
        else:
            v = val_ref[t * sub_r:(t + 1) * sub_r, :].astype(jnp.int32)
            w32 = jnp.where(ok, v, jnp.int32(0)) << sh
        wlo = jnp.bitwise_and(w32, 0xFFFF).astype(jnp.float32)
        whi = jax.lax.shift_right_logical(w32, 16).astype(jnp.float32)

        nk = sub_r * _LANE
        lrow_c = jnp.clip(lrow, 0, win - 1)
        a_lane = jax.lax.broadcasted_iota(jnp.int32, (_LANE, nk), 0)
        lane_f = lane.reshape(1, nk)
        row_f = lrow_c.reshape(1, nk)
        A = jnp.where(a_lane == lane_f, jnp.float32(1), jnp.float32(0))
        b_row = jax.lax.broadcasted_iota(jnp.int32, (win, nk), 0)
        B = jnp.where(b_row == row_f, jnp.float32(1), jnp.float32(0))

        clo = jax.lax.dot_general(
            B * wlo.reshape(1, nk), A,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        chi = jax.lax.dot_general(
            B * whi.reshape(1, nk), A,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        words = (clo.astype(jnp.int32)
                 | (chi.astype(jnp.int32) << 16))
        acc_ref[0:win, :] = acc_ref[0:win, :] + words

        inwin = (lrow >= 0) & (lrow < win)
        un = jnp.where(~inwin & (live > 0),
                       jnp.int32(1), jnp.int32(0))
        u1 = jnp.sum(un, axis=1, keepdims=True)
        unp = unp + jnp.sum(u1, axis=0, keepdims=True)
    carry_ref[1] = carry_ref[1] + unp[0, 0]

    # ---- emit the full window at the (clamped) base row ----
    base_c = jnp.minimum(base, nrows_out - win)
    stage_ref[...] = acc_ref[0:win, :]
    dma = pltpu.make_async_copy(stage_ref,
                                out_ref.at[pl.ds(base_c, win)], sem)
    dma.start()
    dma.wait()

    @pl.when(i == pl.num_programs(0) - 1)
    def _fin():
        stats_ref[0] = carry_ref[1]


@functools.partial(jax.jit,
                   static_argnames=("span", "bps", "nrows_out",
                                    "interpret"))
def sorted_table_build(slot: jax.Array, live: jax.Array, val, w0, *,
                       span: int, bps: int, nrows_out: int,
                       interpret: bool = False):
    """slot: (n,) int32 monotone non-decreasing slot ids (dead rows
    carry their predecessor's slot via cummax); live: (n,) int8 0/1;
    val: (n,) int32 weights for bps=8 (value+1) or None for bps=1;
    w0: (n_blocks,) int32 window base row per block, clamped monotone.

    Returns ((nrows_out, 128) int32 table words, unplaced (1,) int32).
    Rows no window writes stay zero (the output aliases a zero-filled
    input); overlap rows between consecutive windows are overwritten
    with the carried accumulator, so later writes win correctly.
    unplaced > 0 means some live key fell outside its block's window —
    the caller must fall back to the scatter build."""
    n = slot.shape[0]
    br = 128                               # 16K keys per block
    assert n % (br * _LANE) == 0
    nb = n // (br * _LANE)
    assert nrows_out % (2 * WB) == 0 and nrows_out >= 2 * WB

    kern = functools.partial(_kernel, br=br, span=span, bps=bps,
                             nrows_out=nrows_out)
    if val is None:
        val = jnp.zeros((n,), jnp.int32)
    zeros = jnp.zeros((nrows_out, _LANE), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((br, _LANE), lambda i, w0r: (i, 0)),
            pl.BlockSpec((br, _LANE), lambda i, w0r: (i, 0)),
            pl.BlockSpec((br, _LANE), lambda i, w0r: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * WB + 2 * WB, _LANE), jnp.int32),
            pltpu.VMEM((2 * WB, _LANE), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    with jax.enable_x64(False):
        out, stats = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nrows_out, _LANE), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ],
            # windows may leave gap rows untouched: the output starts
            # as the zero-filled input (rows with no keys stay zero)
            input_output_aliases={4: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(w0, slot.reshape(n // _LANE, _LANE),
          live.reshape(n // _LANE, _LANE),
          val.reshape(n // _LANE, _LANE), zeros)
    return out, stats
