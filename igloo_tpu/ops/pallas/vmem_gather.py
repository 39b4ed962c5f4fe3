"""Random gather from a VMEM-resident table: Pallas page-select kernel.

XLA's TPU gather costs ~10 ns per element regardless of how small the
table is (each lookup is an independent HBM transaction), which makes it
the bottleneck of hash-join probes and output assembly — the TPU analog
of the reference's row-at-a-time probe loop
(/root/reference/crates/engine/src/operators/hash_join.rs:130-213).

For tables that fit in VMEM this kernel replaces the HBM transactions
with VPU work:

- the table is bit-packed into int32 "planes" of shape (Rt, 128) and
  held resident in VMEM across the whole grid (constant index_map);
- each grid step loads a tile of flat indices, splits them into
  (sublane, lane) coordinates, and walks the table page by page
  (a page = 8 sublanes = 1024 entries): every page row is broadcast
  across the tile, lane-gathered with the per-element lane index
  (`tpu.dynamic_gather` along lanes — the only native arbitrary-index
  shuffle on the VPU), and selected where the element's sublane
  coordinate matches that row;
- multiple planes (= multiple columns, or the two halves of a 64-bit
  column) share the page walk, so the row-match compare amortizes.

Cost is ~B/32 VPU element-ops per lookup for a B-entry table — ~1 ns at
B = 32 K vs ~10 ns for the XLA gather, independent of the number of
columns fetched. The crossover vs XLA's gather is ~400 K entries; above
that callers should use `ops.gather_ops.packed_gather` (one multi-word
row gather) instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_PAGE = 8                 # sublanes per page (one vreg row group)
_TILE = 256               # idx sublanes per grid step (32K indices)

# table-size ceiling for the kernel: beyond this the linear page walk
# loses to XLA's ~10ns/element gather. (B/32 ops @ ~1T element-ops/s
# crosses 10ns around B≈320K; stay a bit under.)
MAX_TABLE_ENTRIES = 1 << 18

# VMEM budget for resident table planes (bytes)
_VMEM_TABLE_BYTES = 6 << 20


def fits(n_entries: int, n_planes: int) -> bool:
    """True when an n_entries-row table of n_planes int32 planes should
    use this kernel (beats XLA gather and fits the VMEM budget)."""
    if n_entries > MAX_TABLE_ENTRIES:
        return False
    rt = _pad_to(max(n_entries, 1), _PAGE * _LANE) // _LANE
    return rt * _LANE * 4 * n_planes <= _VMEM_TABLE_BYTES


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(idx_ref, *rest, ti: int, npages: int, nplanes: int):
    tab_refs = rest[:nplanes]
    out_refs = rest[nplanes:]

    idx = idx_ref[...]
    sub = jnp.right_shift(idx, 7)                 # table sublane row
    lane = jnp.bitwise_and(idx, _LANE - 1)

    def page_body(p, accs):
        base = p * _PAGE
        pages = [r[pl.ds(base, _PAGE), :] for r in tab_refs]
        for k in range(_PAGE):
            hit = sub == base + k
            new = []
            for c in range(nplanes):
                rowb = jnp.broadcast_to(pages[c][k:k + 1, :], (ti, _LANE))
                g = jnp.take_along_axis(rowb, lane, axis=1)
                new.append(jnp.where(hit, g, accs[c]))
            accs = tuple(new)
        return accs

    accs = tuple(jnp.zeros((ti, _LANE), jnp.int32) for _ in range(nplanes))
    accs = jax.lax.fori_loop(0, npages, page_body, accs)
    for c in range(nplanes):
        out_refs[c][...] = accs[c]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_planes(idx2d, tab_planes, interpret=False):
    """idx2d: (Ri,128) int32 in [0, Rt*128); tab_planes: list of
    (Rt,128) int32 with Rt a multiple of 8. Returns gathered planes,
    each (Ri,128) int32."""
    ri = idx2d.shape[0]
    rt = tab_planes[0].shape[0]
    nplanes = len(tab_planes)
    # tile VMEM: accumulators + double-buffered outputs + idx ≈
    # (2·nplanes + 2) · ti·128·4 bytes — budget ~4 MB on top of the
    # resident table planes
    budget_rows = (4 << 20) // ((2 * nplanes + 2) * _LANE * 4)
    ti = next((t for t in (_TILE, 128, 64, 32, 16, 8)
               if t <= budget_rows and ri % t == 0), 8)
    nb = ri // ti

    kern = functools.partial(_kernel, ti=ti, npages=rt // _PAGE,
                             nplanes=nplanes)
    idx_spec = pl.BlockSpec((ti, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((rt, _LANE), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ti, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[idx_spec] + [tab_spec] * nplanes,
            out_shape=tuple(jax.ShapeDtypeStruct((ri, _LANE), jnp.int32)
                            for _ in range(nplanes)),
            out_specs=tuple(out_spec for _ in range(nplanes)),
            interpret=interpret,
        )(idx2d, *tab_planes)
    return list(out)


def _column_planes(a: jax.Array):
    """Split a 1-D column into int32 plane columns + rebuild dtype
    (shift-based for 64-bit types — see ops/gather_ops._planes_of)."""
    from ..gather_ops import _planes_of
    return _planes_of(a)


def _column_from(planes: list, dt):
    from ..gather_ops import _rebuild
    return _rebuild(planes, dt)


def count_planes(dtypes) -> int:
    """Number of int32 planes `arrays` of these dtypes pack into."""
    n = 0
    for dt in dtypes:
        n += 2 if dt in (jnp.int64, jnp.uint64, jnp.float64) else 1
    return n


def vmem_gather(arrays: list, idx: jax.Array, interpret: bool = False):
    """out[c][i] = arrays[c][idx[i]] for small device-resident tables.

    arrays: 1-D columns, all the same length B (the table). idx: (N,)
    int32, already clamped to [0, B). Caller must have checked
    `fits(B, count_planes(...))`. Works under jit.
    """
    b = arrays[0].shape[0]
    n = idx.shape[0]
    bp = _pad_to(max(b, 1), _PAGE * _LANE)
    npad = _pad_to(max(n, 1), _PAGE * _LANE)

    tab_planes = []
    recipes = []
    for a in arrays:
        ps, dt = _column_planes(a)
        recipes.append((len(tab_planes), len(ps), dt))
        for p in ps:
            if bp != b:
                p = jnp.concatenate(
                    [p, jnp.zeros((bp - b,), jnp.int32)])
            tab_planes.append(p.reshape(bp // _LANE, _LANE))

    idx32 = idx.astype(jnp.int32)
    if npad != n:
        idx32 = jnp.concatenate(
            [idx32, jnp.zeros((npad - n,), jnp.int32)])
    idx2d = idx32.reshape(npad // _LANE, _LANE)

    out_planes = _gather_planes(idx2d, tab_planes, interpret=interpret)

    outs = []
    for slot, np_, dt in recipes:
        flats = [out_planes[slot + k].reshape(npad)[:n] for k in range(np_)]
        outs.append(_column_from(flats, dt))
    return outs
