"""Selection-mask algebra and compaction.

The reference's FilterExec materializes a new RecordBatch per batch via
Arrow's `filter_record_batch` (/root/reference/crates/engine/src/operators/filter.rs:57).
On a static-shape compiler that per-row materialization is poison, so
filters here only AND into a selection mask (late materialization); rows
are physically compacted once, at pipeline breakers or egress.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_perm(mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Permutation that brings mask=True rows to the front, stably.

    Returns (perm, count). Rows past `count` in the permuted order are
    garbage and must stay masked.

    Prefer `compact_cosort` — moving payload THROUGH the sort network is
    ~7× faster on TPU than permuting then gathering.
    """
    # stable argsort of ~mask: False(=0, i.e. selected) sorts first
    perm = jnp.argsort((~mask).astype(jnp.int32), stable=True)
    count = jnp.sum(mask.astype(jnp.int32))
    return perm, count


def compact_cosort(mask: jax.Array, arrays: list, valids: list):
    """Stream compaction by co-sorting payload columns with the mask key.

    lax.sort's bitonic network moves payload operands at vector speed; a
    random gather after argsort runs ~7× slower on TPU. Returns
    (compacted arrays, compacted valids, count).
    """
    key = (~mask).astype(jnp.int32)
    operands = [key]
    slots = []                       # where each payload landed
    for a in arrays:
        slots.append(len(operands))
        operands.append(a)
    vslots = []
    for v in valids:
        if v is None:
            vslots.append(None)
        else:
            vslots.append(len(operands))
            operands.append(v)
    out = jax.lax.sort(operands, num_keys=1, is_stable=True)
    out_arrays = [out[s] for s in slots]
    out_valids = [None if s is None else out[s] for s in vslots]
    count = jnp.sum(mask.astype(jnp.int32))
    return out_arrays, out_valids, count


def compact(mask: jax.Array, arrays: list, valids: list):
    """Stream compaction: Pallas log-shift kernel when the capacity is
    tile-aligned (ONE read + ONE write pass, ~8× faster than the sort
    network at 67M rows), else the co-sort fallback.

    FLOAT64 columns always take the co-sort path on TPU: the kernel
    moves data as int32 planes and the remote TPU compiler rejects
    EVERY f64 bitcast (f64→i32 pair, even plain f64→i64 — measured
    r5); lax.sort moves f64 payload operands fine."""
    import jax as _jax

    from .pallas import compact as pc
    on_tpu = _jax.default_backend() == "tpu"
    has_f64 = any(a is not None and a.dtype == jnp.float64
                  for a in list(arrays))
    if pc.compactable(mask.shape[0]) and not (on_tpu and has_f64):
        return pc.compact_rows(mask, arrays, valids, interpret=not on_tpu)
    return compact_cosort(mask, arrays, valids)


def gather_rows(arrs: list[jax.Array], perm: jax.Array) -> list[jax.Array]:
    return [a[perm] for a in arrs]


def first_k_mask(mask: jax.Array, k, offset=0) -> jax.Array:
    """LIMIT/OFFSET over a selection mask without materializing rows:
    keep set bits with ordinal in [offset, offset+k)."""
    ordinal = jnp.cumsum(mask.astype(jnp.int64)) - 1
    keep = mask & (ordinal >= offset)
    if k is not None:
        keep = keep & (ordinal < offset + k)
    return keep
