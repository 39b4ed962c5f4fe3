"""Distributed shuffle: the collective exchange inside `shard_map`.

This is the component the reference only *intends*: its Shuffle fragment
type is declared but never constructed and its pull-based GetDataForTask
RPC is a stub (/root/reference/crates/coordinator/src/fragment.rs:12,
crates/api/proto/coordinator.proto:60-68, crates/worker/src/service.rs:26-32).
Here the exchange is a real `jax.lax.all_to_all` over the mesh axis —
XLA schedules it on ICI (intra-slice) / DCN (cross-slice) and overlaps it
with surrounding compute.

Mechanics (all traced, fixed shapes):
1. each shard buckets its alive rows by destination (hash(key) % P),
2. rows scatter into a (P × dest_cap) send buffer (per-dest capacity is
   static; overflow is *detected* and surfaced, never silently dropped),
3. one tiled all_to_all exchanges the buffers,
4. the received (P × dest_cap) rows flatten into the shard's new local
   table with a fresh alive mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dest_from_key(key64: jax.Array, num_parts: int) -> jax.Array:
    """Uniform destination from a normalized 64-bit key (splitmix64 mix)."""
    x = key64.astype(jnp.uint64)
    x = (x ^ (x >> 30)) * jnp.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> 27)) * jnp.uint64(0x94D049BB133111EB)
    x = x ^ (x >> 31)
    return (x % jnp.uint64(num_parts)).astype(jnp.int32)


def shuffle_rows(pairs: list, alive: jax.Array, dest: jax.Array,
                 num_parts: int, dest_cap: int, axis: str = "d"):
    """Exchange rows so that row r lands on shard dest[r].

    pairs: list of (values, validity-or-None) row arrays, length cap.
    Returns (new_pairs, new_alive, overflow) where the new arrays have
    length num_parts * dest_cap and overflow is a per-shard bool scalar
    (any destination bucket exceeded dest_cap — caller must check after
    the program returns and retry with a larger dest_cap).
    """
    n = alive.shape[0]
    P = num_parts
    out_n = P * dest_cap

    d = jnp.where(alive, dest, P)
    # per-destination counts and bucket start offsets
    counts = jnp.zeros((P,), jnp.int32).at[dest].add(alive.astype(jnp.int32),
                                                     mode="drop")
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    # stable order: alive rows grouped by destination
    order = jnp.argsort(d, stable=True)
    sdest = d[order]
    # rank of each sorted row within its destination run
    iota = jnp.arange(n, dtype=jnp.int32)
    rank = iota - starts[jnp.clip(sdest, 0, P - 1)]
    ok = (sdest < P) & (rank < dest_cap)
    slot = jnp.where(ok, sdest * dest_cap + rank, out_n)  # out-of-range → drop

    def exchange(arr):
        buf = jnp.zeros((out_n,), arr.dtype).at[slot].set(arr[order],
                                                          mode="drop")
        return jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0,
                                  tiled=True)

    new_alive = jnp.zeros((out_n,), jnp.bool_).at[slot].set(
        jnp.ones((n,), jnp.bool_), mode="drop")
    new_alive = jax.lax.all_to_all(new_alive, axis, split_axis=0,
                                   concat_axis=0, tiled=True)

    new_pairs = []
    for arr, valid in pairs:
        new_arr = exchange(arr)
        new_valid = exchange(valid) if valid is not None else None
        new_pairs.append((new_arr, new_valid))

    overflow = jnp.max(counts) > dest_cap
    return new_pairs, new_alive, overflow
