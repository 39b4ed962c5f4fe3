"""Multi-key sort with SQL null-ordering semantics.

The reference gets ORDER BY (incl. NULLS FIRST, tested at
/root/reference/crates/engine/src/lib.rs:205-228) from DataFusion's
row-oriented sort. Here it is a single `jax.lax.sort` over lexicographic
key operands — XLA's TPU sort is a tiled bitonic network that keeps the
VPU busy; rows masked out by the selection vector sort to the end via a
leading "dead" key, so no compaction is needed before sorting.

Key encoding per SQL key:
  [null_rank, value']  where null_rank orders nulls first/last and
  value' is the value transformed for direction (DESC: bitwise-NOT for
  ints/codes, negation for floats — exact total-order reversal).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _direction_transform(arr: jax.Array, ascending: bool) -> jax.Array:
    if ascending:
        if arr.dtype == jnp.bool_:
            return arr.astype(jnp.int32)
        return arr
    if arr.dtype in (jnp.int32, jnp.int64, jnp.int8, jnp.int16):
        return ~arr
    if arr.dtype == jnp.bool_:
        return 1 - arr.astype(jnp.int32)
    return -arr  # floats (SQL has no NaN values; nulls are separate)


def sort_perm(keys: list[tuple[jax.Array, jax.Array | None, bool, bool]],
              alive: jax.Array | None) -> jax.Array:
    """Return the row permutation for a multi-key SQL sort.

    keys: list of (values, validity-or-None, ascending, nulls_first).
    alive: selection mask; dead rows sort after all alive rows.
    """
    n = keys[0][0].shape[0]
    operands: list[jax.Array] = []
    if alive is not None:
        operands.append((~alive).astype(jnp.int32))  # alive rows first
    for values, valid, ascending, nulls_first in keys:
        if valid is not None:
            null_rank = jnp.where(valid, 1, 0) if nulls_first else jnp.where(valid, 0, 1)
            operands.append(null_rank.astype(jnp.int32))
        operands.append(_direction_transform(values, ascending))
    iota = jnp.arange(n, dtype=jnp.int32)
    num_keys = len(operands)
    out = jax.lax.sort(operands + [iota], num_keys=num_keys, is_stable=True)
    return out[-1]


def top_k_perm(values: jax.Array, valid: jax.Array | None, ascending: bool,
               nulls_first: bool, alive: jax.Array | None, k: int) -> jax.Array:
    """Permutation of the top-k rows for a single-key ORDER BY ... LIMIT k.

    Uses jax.lax.top_k over a rank-encoded key — O(n log k) instead of a
    full sort when k ≪ n. Returns a length-k permutation (garbage past the
    real row count; caller keeps its own count).
    """
    # encode "bigger is better": flip ascending
    v = _direction_transform(values, not ascending)
    if v.dtype in (jnp.int64,):
        enc = v.astype(jnp.float64) if False else v
    enc = v.astype(jnp.float32) if v.dtype == jnp.bool_ else v
    # order: alive & null-rank dominate
    big = jnp.asarray(jnp.finfo(jnp.float32).max if jnp.issubdtype(enc.dtype, jnp.floating)
                      else jnp.iinfo(enc.dtype).max, dtype=enc.dtype)
    if valid is not None:
        # nulls_first means nulls are BEST (come first)
        enc = jnp.where(valid, enc, big if nulls_first else -big)
    if alive is not None:
        enc = jnp.where(alive, enc, -big)  # dead rows worst
    _, idx = jax.lax.top_k(enc, k)
    return idx
