"""Stream compaction in Pallas: selected rows to the front, stably.

Replaces sort-based compaction (`ops/masks.py compact_cosort`) on the
egress hot path. XLA's TPU sort is a bitonic network with O(log²·n)
passes — compacting a 67M-row filter result costs ~290 ms of HBM
traffic. This kernel does it in ONE read + ONE write pass:

- Each grid step loads a block of B = block_rows·128 rows into VMEM.
- Per-row displacement d = row_index − (exclusive count of selected
  rows before it). d is monotone non-decreasing, so moving every
  selected row down by its displacement one bit at a time (log₂B
  conditional linear shifts, LSB→MSB) never collides: a slot "pulls"
  from 2^b above it iff that element is valid and has bit b set, and a
  slot whose element moved away is invalidated (d = −1). Classic
  vector-machine compress; exact for any payload bit pattern since
  rows move through rolls + selects only (no arithmetic on values).
- Blocks append to the output at a running row offset carried in SMEM
  across the sequential grid. Offsets are arbitrary (not lane-aligned),
  so each compacted block is rotated down by `offset mod 128` (seven
  more conditional shifts keyed on the mod's bits), its first partial
  row is merged with the carried `pending` row, and the full block is
  DMA'd at the aligned row offset — the garbage tail past the block's
  selected rows is overwritten by the next block's DMA (grid steps run
  sequentially and each DMA completes before the next is issued).

Reference semantics being replaced: Arrow `filter_record_batch`
materialization (/root/reference/crates/engine/src/operators/filter.rs:57),
reshaped for a static-shape compiler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _roll(x, shift: int, axis: int):
    """pltpu.roll with negative-shift support (toward lower indices)."""
    size = x.shape[axis]
    return pltpu.roll(x, shift % size, axis=axis)


def _lin_up(x, s: int):
    """out[lin] = x[(lin + s) mod B] in row-major order on (br, 128)."""
    q, t = divmod(s, _LANE)
    if t == 0:
        return _roll(x, -q, axis=0)
    a = _roll(x, -t, axis=1)                      # a[r,c] = x[r,(c+t)%128]
    b = _roll(a, -(q + 1), axis=0)                # x[r+q+1, (c+t)%128]
    if q:
        a = _roll(a, -q, axis=0)                  # x[r+q, (c+t)%128]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < _LANE - t, a, b)


def _lin_down(x, t: int):
    """out[lin] = x[(lin − t) mod B], 0 < t < 128."""
    a = _roll(x, t, axis=1)                       # a[r,c] = x[r,(c-t)%128]
    b = _roll(a, 1, axis=0)                       # x[r-1, (c-t)%128]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= t, a, b)


def _kernel(mask_ref, *rest, br: int, nplanes: int):
    plane_refs = rest[:nplanes]
    out_refs = rest[nplanes:2 * nplanes]
    count_ref = rest[2 * nplanes]
    stage_ref, pend_ref, carry_ref, sem = rest[2 * nplanes + 1:]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[0] = 0
        carry_ref[1] = 0
        pend_ref[...] = jnp.zeros_like(pend_ref)

    shape = (br, _LANE)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, shape, 0)

    m = mask_ref[...].astype(jnp.int32)

    # inclusive prefix count within each 128-lane row
    ps = m
    s = 1
    while s < _LANE:
        ps = ps + jnp.where(lane >= s, pltpu.roll(ps, s, axis=1), 0)
        s *= 2
    # inclusive prefix of row totals down the sublanes
    row_incl = ps[:, _LANE - 1:_LANE]             # (br, 1)
    sub1 = jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0)
    rt = row_incl
    s = 1
    while s < br:
        rt = rt + jnp.where(sub1 >= s, pltpu.roll(rt, s, axis=0), 0)
        s *= 2
    k = rt[br - 1, 0]                             # selected rows this block
    pos_excl = (rt - row_incl) + (ps - m)         # exclusive global-in-block
    lin = sub * _LANE + lane
    d = jnp.where(m > 0, lin - pos_excl, -1)

    planes = [r[...] for r in plane_refs]

    # log-shift compaction: LSB→MSB over the block's row-index bits
    nbits = (br * _LANE - 1).bit_length()
    for b in range(nbits):
        sh = 1 << b
        d_up = _lin_up(d, sh)
        pull = (d_up >= 0) & (((d_up >> b) & 1) == 1)
        moved = (d >= 0) & (((d >> b) & 1) == 1)
        planes = [jnp.where(pull, _lin_up(p, sh), p) for p in planes]
        d = jnp.where(pull, d_up, jnp.where(moved, -1, d))

    off = carry_ref[0]
    pmod = carry_ref[1]

    # rotate down by the running offset's lane remainder (0..127)
    for bit in range(7):
        sh = 1 << bit
        cond = ((pmod >> bit) & 1) == 1
        planes = [jnp.where(cond, _lin_down(p, sh), p) for p in planes]

    head = (sub == 0) & (lane < pmod)
    new_total = pmod + k
    nr = new_total // _LANE
    nr_c = jnp.minimum(nr, br - 1)
    last = pl.program_id(0) == pl.num_programs(0) - 1

    # blocks with no selected rows contribute nothing — skip their
    # stage+DMA entirely (rows past the final count are garbage by
    # contract, so nothing needs overwriting). The last block always
    # writes, flushing the carried partial row.
    @pl.when((k > 0) | last)
    def _emit():
        for pi in range(nplanes):
            merged = jnp.where(head, pend_ref[pi], planes[pi])
            stage_ref[pi] = merged
            # next pending row: normally the staged partial row nr. A
            # COMPLETELY selected block with pmod > 0 overflows the
            # block (new_total > br*128): the cyclic rotation wrapped
            # its tail elements into linear positions [0, pmod_new) —
            # inside the head region the pend merge just overwrote in
            # `merged`. Those wrapped elements ARE the next pending
            # row; take them from the PRE-merge rotated plane (row 0),
            # not from the merged stage, or they are lost and every
            # later element shifts (wrong results on ~100%-selected
            # blocks — clustered tables hit this constantly).
            nrm = stage_ref.at[pi][pl.ds(nr_c, 1), :]
            pend_ref[pi] = jnp.where(nr >= br, planes[pi][0:1, :], nrm)
        for pi in range(nplanes):
            dma = pltpu.make_async_copy(
                stage_ref.at[pi], out_refs[pi].at[pl.ds(off, br)], sem)
            dma.start()
            dma.wait()
        # the LAST block's wrap case: its final partial row lives in
        # pend (row off+br), beyond this block's DMA — flush it now or
        # the stream's tail elements are lost
        @pl.when(last & (nr >= br) & (new_total - nr * _LANE > 0))
        def _flush_wrap():
            for pi in range(nplanes):
                dma2 = pltpu.make_async_copy(
                    pend_ref.at[pi],
                    out_refs[pi].at[pl.ds(off + br, 1)], sem)
                dma2.start()
                dma2.wait()

    carry_ref[0] = off + nr
    carry_ref[1] = new_total - nr * _LANE

    @pl.when(i == pl.num_programs(0) - 1)
    def _fin():
        count_ref[0] = carry_ref[0] * _LANE + carry_ref[1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _compact_planes(mask_i8, planes, interpret=False):
    """mask_i8: (R,128) int8; planes: list of (R,128) int32.
    R must be a multiple of 32. Returns (out_planes, count)."""
    R = mask_i8.shape[0]
    br = next(b for b in (256, 128, 64, 32) if R % b == 0)
    nb = R // br
    nplanes = len(planes)

    kern = functools.partial(_kernel, br=br, nplanes=nplanes)
    mask_spec = pl.BlockSpec((br, _LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((br, _LANE), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[mask_spec] + [plane_spec] * nplanes,
            out_shape=(
                tuple(jax.ShapeDtypeStruct((R, _LANE), jnp.int32)
                      for _ in range(nplanes))
                + (jax.ShapeDtypeStruct((1,), jnp.int32),)
            ),
            out_specs=(
                tuple(pl.BlockSpec(memory_space=pl.ANY)
                      for _ in range(nplanes))
                + (pl.BlockSpec(memory_space=pltpu.SMEM),)
            ),
            scratch_shapes=[
                pltpu.VMEM((max(nplanes, 1), br, _LANE), jnp.int32),
                pltpu.VMEM((max(nplanes, 1), 1, _LANE), jnp.int32),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(mask_i8, *planes)
    out_planes = list(out[:nplanes])
    count = out[nplanes][0]
    return out_planes, count


def _to_planes(a: jax.Array, R: int):
    """Split a column into int32 (R,128) planes + a rebuild recipe."""
    dt = a.dtype
    if dt in (jnp.int64, jnp.uint64, jnp.float64):
        w = jax.lax.bitcast_convert_type(a, jnp.int32)      # (n, 2)
        return [w[:, 0].reshape(R, _LANE), w[:, 1].reshape(R, _LANE)], dt
    if dt in (jnp.float32, jnp.uint32):
        return [jax.lax.bitcast_convert_type(a, jnp.int32)
                .reshape(R, _LANE)], dt
    if dt == jnp.int32:
        return [a.reshape(R, _LANE)], dt
    # bool / int8 / int16 …: widen
    return [a.astype(jnp.int32).reshape(R, _LANE)], dt


def _from_planes(planes: list, dt, n: int):
    if dt in (jnp.int64, jnp.uint64, jnp.float64):
        w = jnp.stack([planes[0].reshape(n), planes[1].reshape(n)], axis=-1)
        return jax.lax.bitcast_convert_type(w, dt)
    flat = planes[0].reshape(n)
    if dt in (jnp.float32, jnp.uint32):
        return jax.lax.bitcast_convert_type(flat, dt)
    if dt == jnp.int32:
        return flat
    return flat.astype(dt)


def compactable(cap: int) -> bool:
    return cap % (32 * _LANE) == 0


def compact_rows(mask: jax.Array, arrays: list, valids: list,
                 interpret: bool = False):
    """Drop-in for ops.masks.compact_cosort on TPU-friendly capacities.

    mask: (cap,) bool; arrays/valids: columns (+None-able valid masks).
    Returns (arrays, valids, count) with selected rows compacted to the
    front, stably. Rows past `count` are garbage (dead by contract).
    """
    cap = mask.shape[0]
    R = cap // _LANE

    planes = []
    recipes = []            # (slot, n_planes, dtype, is_valid)
    for a in arrays:
        ps, dt = _to_planes(a, R)
        recipes.append((len(planes), len(ps), dt, False))
        planes.extend(ps)
    for v in valids:
        if v is None:
            recipes.append(None)
        else:
            ps, dt = _to_planes(v, R)
            recipes.append((len(planes), len(ps), dt, True))
            planes.extend(ps)

    mask_i8 = mask.astype(jnp.int8).reshape(R, _LANE)
    if not planes:
        return list(arrays), list(valids), jnp.sum(mask.astype(jnp.int32))

    out_planes, count = _compact_planes(mask_i8, planes,
                                        interpret=interpret)

    out_arrays = []
    out_valids = []
    it = iter(recipes)
    for a in arrays:
        slot, np_, dt, _ = next(it)
        out_arrays.append(_from_planes(out_planes[slot:slot + np_], dt, cap))
    for v in valids:
        r = next(it)
        if r is None:
            out_valids.append(None)
        else:
            slot, np_, dt, _ = r
            out_valids.append(
                _from_planes(out_planes[slot:slot + np_], dt, cap))
    return out_arrays, out_valids, count
