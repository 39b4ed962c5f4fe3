"""Fused threshold-select + row-sparse extraction (top-k candidate pass).

The ORDER BY … LIMIT prune (parallel/dist_exec._topk_prune) needs "rows
whose sort tuple <= threshold" extracted from an n-row table where the
match rate is ~0.1%. Doing that with XLA passes + the dense compaction
kernel costs ~6 full-array HBM sweeps plus a VPU-bound element-level
log-shift whose displacement is huge for sparse masks (xplane: 14.6 ms
for 33M rows, vs a 0.33 ms read roofline). This kernel does the whole
candidate pass in ONE sweep:

- per block, the sort-key RANKS are computed in VMEM from the raw key
  planes (mirroring dist_exec._orderable_rank bit-for-bit — parity is
  tested against it) and compared to per-key u64 threshold scalars
  (SMEM) with a row-index tiebreak: exactly _topk_prune's candidate
  predicate;
- candidate extraction is ROW-sparse: 128-lane rows containing at least
  one candidate are compacted to the block front with pure sublane
  shifts (log2(block_rows) steps — 8, vs 15 element-level steps whose
  lane shifts cost 3-4x more), then appended to the output at a running
  ROW offset by DMA (row-aligned, so no lane-rotation epilogue at all);
- the element mask travels with the rows as one more plane; a dense
  element-level compaction over the ~128x smaller candidate-row buffer
  (ops/pallas/compact.py) finishes the job outside. Stability: row
  order then lane order is preserved end to end.

Outputs additionally carry [rows_used, candidate_count, alive_count,
overflow] so _topk_prune's count verification needs no extra passes.

Reference shape being replaced: DataFusion SortExec+GlobalLimitExec
sort-everything (SURVEY §2.1 "DataFusion-reachable sort"); the reference
has no top-k path at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128

# key classes: how many planes and how the u64 rank is built in-kernel
#   "i64"   2 planes (hi, lo words of the int64)
#   "i32"   1 plane (int32 value: dict codes, int32/16/8, widened bool)
#   "fbits" 1 plane (uint32 bit pattern of the f32-cast key)
#   "rank"  2 planes (hi, lo words of a precomputed u64 rank: fallback)
KEY_CLASSES = ("i64", "i32", "fbits", "rank")


def _u(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _rank_pair(planes, valid_i32, klass: str, ascending: bool,
               nulls_first: bool):
    """(hi, lo) uint32 pair equal to dist_exec._orderable_rank's u64.

    planes: list of (BR, 128) int32 blocks; valid_i32: (BR, 128) int32
    0/1 vector or None (int32, NOT bool: `jnp.where(i8_derived_i1,
    scalar, scalar)` feeding bit ops crashes the TPU compiler — the
    valid plane is loaded as int8 and astype'd, never compared).
    Parity with _orderable_rank is asserted by
    tests/test_extract_kernel.py.
    """
    # Mosaic layout note: scalar-splat selects (`jnp.where(vec_i1,
    # scalar, scalar)`) combined with `~`/valid masking made the TPU
    # layout pass demand a replicated layout for the materialized i1
    # condition ("Invalid relayout ... vector<...xi1>"), so every
    # valid/sign select below is arithmetic on int32 0/1 vectors
    # (bit-identical results; see scripts/smoke_tpu.py).
    if klass == "i64":
        uhi = _u(planes[0]) ^ jnp.uint32(0x80000000)
        ulo = _u(planes[1])
    elif klass == "i32":
        v = planes[0]
        # sign -> {neg: 0x7FFFFFFF, pos: 0x80000000} == 0x80000000 - neg
        ni = jnp.where(v < 0, jnp.int32(1), jnp.int32(0))
        uhi = jnp.uint32(0x80000000) - ni.astype(jnp.uint32)
        ulo = _u(v)
    elif klass == "fbits":
        bits = _u(planes[0])
        # neg: ~bits; pos: bits | top == bits ^ (neg ? ~0 : top)
        ni = jnp.where((bits >> jnp.uint32(31)) > 0,
                       jnp.int32(1), jnp.int32(0))
        flip = (_u(-ni)                                   # ~0 where neg
                | jnp.uint32(0x80000000))                 # top elsewhere
        uhi = bits ^ flip
        ulo = jnp.zeros_like(uhi)
    else:  # "rank": already direction/null-packed — return as-is
        return _u(planes[0]), _u(planes[1])
    if not ascending:
        uhi = ~uhi
        ulo = ~ulo
    # u64 >> 1 across the pair
    ulo = (ulo >> jnp.uint32(1)) | (uhi << jnp.uint32(31))
    uhi = uhi >> jnp.uint32(1)
    if valid_i32 is not None:
        vi = valid_i32
        keep = _u(-vi)                                    # ~0 where valid
        nulls_bit = (vi if nulls_first else (1 - vi)) << 31
        uhi = (uhi & keep) | _u(nulls_bit)
        ulo = ulo & keep
    return uhi, ulo


def _predicate(thr_ref, planes, valids_i32, key_specs, br, i):
    """cand = (rank_1..rank_K, row_idx) <=_lex threshold (from SMEM).

    thr layout: [t_i, k0_hi, k0_lo, k1_hi, k1_lo, ...] as int32 words.
    planes/valids_i32: lists of (BR, 128) int32 blocks (valids 0/1).
    """
    shape = (br, _LANE)
    sub = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    gidx = (i * br + sub) * _LANE + lane
    cond = gidx <= thr_ref[0]
    for ki in reversed(range(len(key_specs))):
        klass, has_valid, asc, nf, pidx, vi = key_specs[ki]
        kplanes = [planes[j] for j in pidx]
        vv = valids_i32[vi] if has_valid else None
        uhi, ulo = _rank_pair(kplanes, vv, klass, asc, nf)
        # astype, not bitcast: int32->uint32 astype is bit-preserving
        # (two's complement wrap) and Mosaic's tpu.bitcast rejects
        # scalar (0-d) operands
        thi = jnp.full((), thr_ref[1 + 2 * ki], jnp.int32).astype(jnp.uint32)
        tlo = jnp.full((), thr_ref[2 + 2 * ki], jnp.int32).astype(jnp.uint32)
        lt = (uhi < thi) | ((uhi == thi) & (ulo < tlo))
        eq = (uhi == thi) & (ulo == tlo)
        cond = lt | (eq & cond)
    return cond


def _kernel(*refs, key_specs: tuple, n_planes: int, n_valids: int,
            cap_rows: int, br: int, emit_index: bool = False,
            has_alive: bool = True, n_thr: int = 0,
            gidx_packs: bool = False):
    n_out = 2 if emit_index else (n_planes + n_valids + 1)
    it = iter(refs)
    thr_ref = next(it)
    alive_ref = next(it) if has_alive else None
    plane_refs = [next(it) for _ in range(n_planes)]
    valid_refs = [next(it) for _ in range(n_valids)]
    out_refs = [next(it) for _ in range(n_out)]
    stats_ref = next(it)
    stage_ref, carry_ref, sem = next(it), next(it), next(it)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[0] = 0          # output row offset
        carry_ref[1] = 0          # candidate count
        carry_ref[2] = 0          # alive count
        carry_ref[3] = 0          # overflow flag

    shape = (br, _LANE)
    # alive/valid planes arrive as int8 and are astype'd, never compared:
    # an i1 derived from an int8 compare that feeds bit ops triggers the
    # Mosaic "Invalid relayout ... xi1" compiler crash; i1 from int32
    # compares (the predicate) is fine.
    # has_alive=False: prefix-alive tables pass the row count as the
    # LAST thr word instead of a (cap,) alive plane — at the 0.75B-row
    # top-k that plane (+ its int8 conversion) is 1.5 GB of HBM this
    # path cannot afford.
    if has_alive:
        ai = alive_ref[...].astype(jnp.int32)
    else:
        sub0 = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane0 = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        g0 = (i * br + sub0) * _LANE + lane0
        ai = jnp.where(g0 < thr_ref[n_thr - 1], jnp.int32(1), jnp.int32(0))
    planes = [r[...] for r in plane_refs]
    valids_i32 = [r[...].astype(jnp.int32) for r in valid_refs]

    cond = _predicate(thr_ref, planes, valids_i32, key_specs, br, i)

    # Mosaic notes (learned the hard way; see scripts/smoke_tpu.py):
    # - jnp.sum/any to a SCALAR routes through a jnp proxy re-traced
    #   under the process-global x64 setting -> int64 convert ->
    #   "64-bit types are not supported" (the round-2 bench crash);
    # - jnp.sum producing (R,1)/(1,L) lowers, but rolling or carrying
    #   its output crashes the remote TPU compiler (layout bug);
    # - the PROVEN idiom (ops/pallas/compact.py runs in production) is:
    #   roll-based prefix sums, (R,1) columns sliced from full-width
    #   vectors, [r,0] element extraction, SMEM carries from those.
    # Everything below sticks to that idiom — no reduce primitives.
    sub1 = jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0)
    ci = jnp.where(cond, jnp.int32(1), jnp.int32(0)) * ai  # cand as 0/1

    def row_cumsum(col):                       # (BR,1) inclusive
        s = 1
        while s < br:
            col = col + jnp.where(sub1 >= s,
                                  pltpu.roll(col, s, axis=0), 0)
            s *= 2
        return col

    # per-row lane reductions: jnp.sum along lanes lowers fine on the
    # current Mosaic (the historical full-width roll-prefix workaround
    # cost ~2x17 element-ops/row — the kernel's single biggest term)
    row_el = jnp.sum(ci, axis=1, keepdims=True)        # (BR,1) cand/row
    row_al = jnp.sum(ai, axis=1, keepdims=True)        # (BR,1) alive/row

    # ---- stats ----
    carry_ref[1] = carry_ref[1] + row_cumsum(row_el)[br - 1, 0]
    carry_ref[2] = carry_ref[2] + row_cumsum(row_al)[br - 1, 0]

    # ---- row-sparse compaction (sublane shifts only) ----
    ra = jnp.where(row_el > 0, jnp.int32(1), jnp.int32(0))  # (BR,1)
    incl = row_cumsum(ra)
    k_rows = incl[br - 1, 0]
    # displacement, row-replicated to full width so every roll/select
    # below runs on (BR,128) int32 vectors (compact.py's proven layout)
    d1 = jnp.where(row_el > 0, sub1 - (incl - ra), -1)
    d = jnp.broadcast_to(d1, shape)

    if emit_index:
        # index-emit mode: instead of the (possibly many) data planes,
        # output each candidate's flat ROW-MAJOR element index — the
        # caller gathers the real rows afterwards. This keeps the
        # kernel's input traffic to the key planes only and its output
        # budget independent of the table's width (the 1B-row top-k
        # memory enabler; see dist_exec._topk_prune_fused_index).
        sub = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        gidx = (i * br + sub) * _LANE + lane
        if gidx_packs:
            # one routed plane instead of two: the candidate bit rides
            # in bit 30 of the flat index (n <= 2^30), unpacked at the
            # (tiny) staging step
            movers = [gidx | (ci << 30)]
        else:
            movers = [gidx, ci]
    else:
        movers = (planes + valids_i32 + [ci])

    nbits = (br - 1).bit_length()
    for b in range(nbits):
        sh = 1 << b
        d_up = pltpu.roll(d, (-sh) % br, axis=0)
        pull = (d_up >= 0) & (((d_up >> b) & 1) == 1)
        moved = ((d >> b) & 1) == 1
        movers = [jnp.where(pull, pltpu.roll(p, (-sh) % br, axis=0), p)
                  for p in movers]
        d = jnp.where(pull, d_up, jnp.where(moved, -1, d))

    # ---- append candidate rows at the running row offset ----
    # the output allocates br slack rows past cap_rows, so a full-block
    # DMA at any clamped offset <= cap_rows stays in bounds and never
    # clobbers rows that matter
    off = carry_ref[0]
    carry_ref[3] = carry_ref[3] | jnp.where(
        off + k_rows > cap_rows, 1, 0)
    off_c = jnp.minimum(off, cap_rows)

    @pl.when(k_rows > 0)
    def _emit():
        if emit_index and gidx_packs:
            stage_ref[0] = movers[0] & jnp.int32((1 << 30) - 1)
            stage_ref[1] = (movers[0] >> 30) & 1
        else:
            for pi in range(n_out):
                stage_ref[pi] = movers[pi]
        for pi, oref in enumerate(out_refs):
            dma = pltpu.make_async_copy(
                stage_ref.at[pi], oref.at[pl.ds(off_c, br)], sem)
            dma.start()
            dma.wait()

    carry_ref[0] = off + k_rows

    @pl.when(i == pl.num_programs(0) - 1)
    def _fin():
        stats_ref[0] = jnp.minimum(carry_ref[0], cap_rows)
        stats_ref[1] = carry_ref[1]
        stats_ref[2] = carry_ref[2]
        stats_ref[3] = carry_ref[3]


def extract_candidate_rows(thr: jax.Array, alive: jax.Array, planes,
                           valids, *, key_specs: tuple, cap_rows: int,
                           interpret: bool = False):
    """One-pass threshold select + row-sparse extract.

    thr: (1 + 2*K,) int32 — [t_i, per-key rank hi/lo words].
    alive: (n,) bool. planes: tuple of (n,) int32 data planes (deduped
    key+payload bit planes). valids: tuple of (n,) bool validity masks.
    key_specs: static tuple of (klass, has_valid, ascending, nulls_first,
    plane_indices, valid_idx) per sort key; plane_indices points into
    `planes` — ("i64"/"rank": (hi_idx, lo_idx); 1-plane classes:
    (idx,)).
    cap_rows: output capacity in 128-lane rows (multiple of 64, >= 256).

    Returns (out_planes, out_valids, out_mask, stats) where out_* are
    (cap_rows, 128) int32 planes (row-major element order), out_mask is
    0/1, and stats = [rows_used, cand_count, alive_count, overflow]
    int32. Rows at indices >= rows_used are garbage — the caller must
    AND the mask with (row < rows_used) before the dense compact.

    The jit call runs under `jax.enable_x64(False)`: Mosaic re-traces
    reduction proxies at LOWERING time with the process-global x64
    setting, so an engine running in x64 mode would otherwise emit an
    int64 convert inside the kernel and fail TPU lowering ("64-bit
    types are not supported") — a context manager around pallas_call
    inside the jit does NOT help because pallas kernels are traced
    lazily at jit-lowering time. All inputs/outputs are 32-bit, so the
    x32 compile is semantics-preserving. Regression guard:
    scripts/smoke_tpu.py (lowers every kernel on TPU with x64 on).
    """
    with jax.enable_x64(False):
        return _extract_jit(thr, alive, planes, valids,
                            key_specs=key_specs, cap_rows=cap_rows,
                            interpret=interpret)


def extract_candidate_indices(thr: jax.Array, alive: jax.Array, planes,
                              valids=(), *, key_specs: tuple,
                              cap_rows: int, interpret: bool = False):
    """Index-emit variant: one sweep over the KEY planes only, emitting
    each candidate's flat element index instead of the data planes.

    The caller gathers the actual rows by index afterwards (the
    candidate set is tiny), so kernel traffic = key planes + alive, and
    the output budget is independent of table width — this is what lets
    a 1B-row int64 top-k run in one pass inside v5e HBM where plane
    extraction would OOM (see dist_exec._topk_prune_fused_index).

    Returns (idx_plane, mask_plane, stats): (cap_rows, 128) int32 each;
    stats as in extract_candidate_rows. Same x32-compile note applies.
    """
    with jax.enable_x64(False):
        return _extract_idx_jit(thr, alive, planes, valids,
                                key_specs=key_specs, cap_rows=cap_rows,
                                interpret=interpret)


@functools.partial(jax.jit, static_argnames=("key_specs", "cap_rows",
                                             "interpret"))
def _extract_idx_jit(thr, alive, planes, valids, *, key_specs: tuple,
                     cap_rows: int, interpret: bool = False):
    out = _extract_call(thr, alive, planes, valids, key_specs=key_specs,
                        cap_rows=cap_rows, interpret=interpret,
                        emit_index=True)
    idx_plane, mask_plane = out[0][:cap_rows], out[1][:cap_rows]
    return idx_plane, mask_plane, out[2]


@functools.partial(jax.jit, static_argnames=("key_specs", "cap_rows",
                                             "interpret"))
def _extract_jit(thr: jax.Array, alive: jax.Array, planes,
                 valids, *, key_specs: tuple, cap_rows: int,
                 interpret: bool = False):
    n_planes, n_valids = len(planes), len(valids)
    nm = n_planes + n_valids + 1
    out = _extract_call(thr, alive, planes, valids, key_specs=key_specs,
                        cap_rows=cap_rows, interpret=interpret,
                        emit_index=False)
    out_planes = [o[:cap_rows] for o in out[:n_planes]]
    out_valids = [o[:cap_rows] for o in out[n_planes:n_planes + n_valids]]
    out_mask = out[nm - 1][:cap_rows]
    stats = out[nm]
    return out_planes, out_valids, out_mask, stats


def _extract_call(thr, alive, planes, valids, *, key_specs, cap_rows,
                  interpret, emit_index):
    has_alive = alive is not None
    n = (alive if has_alive else planes[0]).shape[0]
    assert n % 8192 == 0, "capacity must be 8192-aligned (table.PAD)"
    r = n // _LANE
    br = next(b for b in (256, 128, 64) if r % b == 0)
    nb = r // br
    assert cap_rows % 64 == 0 and cap_rows >= br

    def as2d(x, dt):
        return x.astype(dt).reshape(r, _LANE)

    ins = [thr.astype(jnp.int32)]
    if has_alive:
        ins.append(as2d(alive, jnp.int8))
    ins += [as2d(p, jnp.int32) for p in planes]
    ins += [as2d(v, jnp.int8) for v in valids]

    n_planes, n_valids = len(planes), len(valids)
    n_out = 2 if emit_index else (n_planes + n_valids + 1)
    kern = functools.partial(_kernel, key_specs=key_specs,
                             n_planes=n_planes, n_valids=n_valids,
                             cap_rows=cap_rows, br=br,
                             emit_index=emit_index,
                             has_alive=has_alive, n_thr=thr.shape[0],
                             gidx_packs=(n <= (1 << 30)))
    blk = pl.BlockSpec((br, _LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  + [blk] * (len(ins) - 1)),
        out_shape=(tuple(jax.ShapeDtypeStruct((cap_rows + br, _LANE),
                                              jnp.int32)
                         for _ in range(n_out))
                   + (jax.ShapeDtypeStruct((4,), jnp.int32),)),
        out_specs=(tuple(pl.BlockSpec(memory_space=pl.ANY)
                         for _ in range(n_out))
                   + (pl.BlockSpec(memory_space=pltpu.SMEM),)),
        scratch_shapes=[
            pltpu.VMEM((n_out, br, _LANE), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*ins)
