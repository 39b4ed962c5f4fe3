"""Multi-column row gather: one lookup fetches every column.

The TPU pays ~10 ns per XLA gather *element* almost independent of the
row width (measured on v5e: 1×int32 rows 97M rows/s, 4×int32 rows 128M
rows/s). Fetching C columns with C separate gathers therefore costs C×
what one gather of C-word rows costs. This module routes a multi-column
gather to the cheapest mechanism:

1. `vmem_gather` (ops/pallas/vmem_gather.py) when the table fits the
   kernel's VMEM/crossover budget — VPU page-walk, ~10× XLA at 32 K
   entries, column count nearly free;
2. one packed XLA row gather otherwise: columns bit-pack into an
   (B, W) int32 matrix, one gather fetches W-word rows, columns unpack
   with bitcasts (all fused by XLA);
3. a plain `a[idx]` when there is only one word anyway.

This replaces the per-column probe/assembly loads of the reference's
HashJoinExec (/root/reference/crates/engine/src/operators/hash_join.rs:221-280)
with batched HBM transactions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pallas import vmem_gather as vg


def _planes_of(a: jax.Array):
    """Split a column into int32 planes. 64-bit types split via shifts
    (the TPU x64-emulation pass can't rewrite (n,2)-shaped bitcasts in
    every surrounding fusion — only 1-D same-width bitcasts are safe)."""
    dt = a.dtype
    if dt == jnp.float64:
        # (n,2)-form bit access — gather_columns routes f64 around this
        # on the engine paths (see its `direct` list)
        w = jax.lax.bitcast_convert_type(a, jnp.int32)        # (n, 2)
        return [w[:, 0], w[:, 1]], dt
    if dt in (jnp.int64, jnp.uint64):
        # shifts instead of bitcasts: int64 broadcasts/fusions trip the
        # same emulation pass
        bits = a.astype(jnp.uint64)
        lo = jax.lax.bitcast_convert_type(
            (bits & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.int32)
        hi = jax.lax.bitcast_convert_type(
            (bits >> jnp.uint64(32)).astype(jnp.uint32), jnp.int32)
        return [lo, hi], dt
    if dt in (jnp.float32, jnp.uint32):
        return [jax.lax.bitcast_convert_type(a, jnp.int32)], dt
    if dt == jnp.int32:
        return [a], dt
    return [a.astype(jnp.int32)], dt


def _rebuild(planes: list, dt):
    if dt == jnp.float64:
        w = jnp.stack([planes[0], planes[1]], axis=-1)        # (n, 2)
        return jax.lax.bitcast_convert_type(w, jnp.float64)
    if dt in (jnp.int64, jnp.uint64):
        lo = jax.lax.bitcast_convert_type(planes[0], jnp.uint32) \
            .astype(jnp.uint64)
        hi = jax.lax.bitcast_convert_type(planes[1], jnp.uint32) \
            .astype(jnp.uint64)
        return ((hi << jnp.uint64(32)) | lo).astype(dt)
    if dt in (jnp.float32, jnp.uint32):
        return jax.lax.bitcast_convert_type(planes[0], dt)
    if dt == jnp.int32:
        return planes[0]
    return planes[0].astype(dt)


def gather_columns(arrays: list, idx: jax.Array, interpret=None):
    """out[c][i] = arrays[c][idx[i]] — all columns in one pass.

    arrays: 1-D device columns of equal length B (None entries pass
    through as None). idx: (N,) integer indices already clamped to
    [0, B). Works under jit. interpret=None auto-selects Pallas
    interpret mode off-TPU (CPU test meshes).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    live = [a for a in arrays if a is not None]
    if not live:
        return list(arrays)
    b = live[0].shape[0]
    idx = idx.astype(jnp.int32)

    planes = []
    recipes = []          # (slot, nplanes, dtype) | ("direct", i) | None
    direct = []           # f64 columns gathered as-is: their bit access
    for a in arrays:      # (any f64↔int bitcast) is fragile under the
        if a is None:     # TPU x64-emulation rewrite when fusion feeds
            recipes.append(None)        # it a broadcast
            continue
        if a.dtype == jnp.float64:
            recipes.append(("direct", len(direct)))
            direct.append(a)
            continue
        ps, dt = _planes_of(a)
        recipes.append((len(planes), len(ps), dt))
        planes.extend(ps)

    if not planes:
        out_planes = []
    elif vg.fits(b, len(planes)):
        out_planes = vg.vmem_gather(planes, idx, interpret=interpret)
    elif len(planes) >= 2:
        packed = jnp.stack(planes, axis=-1)          # (B, W) int32
        rows = packed[idx]                           # one W-word gather
        out_planes = [rows[:, k] for k in range(len(planes))]
    else:
        out_planes = [planes[0][idx]]
    direct_out = [a[idx] for a in direct]

    outs = []
    for r in recipes:
        if r is None:
            outs.append(None)
            continue
        if r[0] == "direct":
            outs.append(direct_out[r[1]])
            continue
        slot, np_, dt = r
        outs.append(_rebuild(out_planes[slot:slot + np_], dt))
    return outs
