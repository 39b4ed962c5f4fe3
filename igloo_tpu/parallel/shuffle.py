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

# trace-time accounting of per-shard collective payload bytes — shapes
# are static, so accumulating at trace time is exact. The scaling
# harness (__graft_entry__.dryrun_multichip) resets this, runs a query
# at each mesh size, and reports exchanged bytes per shard.
TRACE = {"bytes": 0, "calls": 0}


def reset_trace() -> None:
    TRACE["bytes"] = 0
    TRACE["calls"] = 0


def record_exchange(nbytes: int) -> None:
    TRACE["bytes"] += int(nbytes)
    TRACE["calls"] += 1


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
    nbytes = out_n * 1                              # alive plane (bool)
    for arr, valid in pairs:
        new_arr = exchange(arr)
        new_valid = exchange(valid) if valid is not None else None
        new_pairs.append((new_arr, new_valid))
        nbytes += out_n * arr.dtype.itemsize + (out_n if valid is not None
                                                else 0)
    record_exchange(nbytes)

    overflow = jnp.max(counts) > dest_cap
    return new_pairs, new_alive, overflow


# ---------------------------------------------------------------------------
# skew-aware repartitioning (north star: salted hot probes + replicated
# hot build rows instead of capacity-doubling retries)
# ---------------------------------------------------------------------------

def detect_hot_keys(key64, alive, est_thresh: int, n_hot: int = 32,
                    sample: int = 8192):
    """Strided-sample heavy-hitter detection (traced, static shapes).

    Sorts an S-element sample, measures per-key run lengths, and keeps
    the top n_hot keys whose extrapolated total count exceeds
    est_thresh. Returns (hot_keys (n_hot,) int64, hot_flag (n_hot,)
    bool) — unflagged slots never match in is_hot."""
    n = key64.shape[0]
    S = min(sample, n)
    stride = max(n // S, 1)
    ks = key64[::stride][:S].astype(jnp.int64)
    al = alive[::stride][:S]
    dead = (~al).astype(jnp.int32)
    _, sk = jax.lax.sort([dead, ks], num_keys=2)
    iota = jnp.arange(S, dtype=jnp.int32)
    n_alive_s = jnp.sum(al.astype(jnp.int32))
    alive_pref = iota < n_alive_s
    prev_eq = jnp.concatenate([
        jnp.zeros((1,), jnp.bool_),
        (sk[1:] == sk[:-1]) & alive_pref[1:]])
    anchor = jax.lax.cummax(jnp.where(prev_eq, jnp.int32(0), iota))
    runlen = iota - anchor + 1
    # a run must also end at the alive/dead sample boundary: the first
    # dead slot's garbage key can equal the run's key, which would
    # otherwise suppress is_end and silently drop the hot key
    is_end = jnp.concatenate([(sk[1:] != sk[:-1]) | ~alive_pref[1:],
                              jnp.ones((1,), jnp.bool_)])
    score = jnp.where(alive_pref & is_end, runlen, 0)
    vals, idxs = jax.lax.top_k(score, n_hot)
    hot_keys = sk[idxs]
    hot_flag = vals.astype(jnp.int64) * stride > est_thresh
    return hot_keys, hot_flag


def is_hot(key64, hot_keys, hot_flag):
    """Membership of each key in the (static-size) hot set — n_hot
    vectorized compares, no gathers."""
    x = key64.astype(jnp.int64)
    m = jnp.zeros(x.shape, jnp.bool_)
    for j in range(hot_keys.shape[0]):
        m = m | (hot_flag[j] & (x == hot_keys[j]))
    return m


def salted_dest(key64, row_iota, num_parts: int):
    """Uniform per-ROW destination for hot probe keys (Knuth-hash of the
    row index): spreads a heavy hitter across every shard."""
    s = (row_iota.astype(jnp.uint32) * jnp.uint32(2654435761)) \
        >> jnp.uint32(7)
    return (s % jnp.uint32(num_parts)).astype(jnp.int32)


def shuffle_rows_replicated(pairs, alive, dest, hot_sel, num_parts: int,
                            dest_cap: int, hot_cap: int, axis: str = "d"):
    """Build-side exchange with heavy-hitter replication.

    Rows NOT in hot_sel scatter to their hash destination exactly like
    shuffle_rows; rows in hot_sel are compacted into a hot region of
    hot_cap rows that is appended to EVERY destination tile, so salted
    probe rows find their match wherever they land. Tile layout:
    [dest_cap normal | hot_cap hot]; output length num_parts *
    (dest_cap + hot_cap). Overflow covers both the normal buckets and
    the hot region."""
    n = alive.shape[0]
    P = num_parts
    tile = dest_cap + hot_cap
    out_n = P * tile

    norm_alive = alive & ~hot_sel
    d = jnp.where(norm_alive, dest, P)
    counts = jnp.zeros((P,), jnp.int32).at[dest].add(
        norm_alive.astype(jnp.int32), mode="drop")
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    order = jnp.argsort(d, stable=True)
    sdest = d[order]
    iota = jnp.arange(n, dtype=jnp.int32)
    rank = iota - starts[jnp.clip(sdest, 0, P - 1)]
    ok = (sdest < P) & (rank < dest_cap)
    slot = jnp.where(ok, sdest * tile + rank, out_n)

    horder = jnp.argsort(~hot_sel, stable=True)     # hot rows first
    hn = jnp.sum(hot_sel.astype(jnp.int32))

    def exchange(arr):
        buf = jnp.zeros((out_n,), arr.dtype).at[slot].set(arr[order],
                                                          mode="drop")
        # hot_cap can exceed n after deep overflow retries (factor
        # doubling): pad the hot region instead of shape-erroring —
        # pad slots are dead (ha masks rank >= hn)
        hot_vals = arr[horder[:hot_cap]]
        if hot_cap > n:
            hot_vals = jnp.concatenate(
                [hot_vals, jnp.zeros((hot_cap - n,), arr.dtype)])
        buf = buf.reshape(P, tile).at[:, dest_cap:].set(
            hot_vals[None, :]).reshape(out_n)
        return jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0,
                                  tiled=True)

    new_alive = jnp.zeros((out_n,), jnp.bool_).at[slot].set(
        jnp.ones((n,), jnp.bool_), mode="drop")
    ha = jnp.arange(hot_cap) < hn      # first hn horder rows are hot
    new_alive = new_alive.reshape(P, tile).at[:, dest_cap:].set(
        ha[None, :]).reshape(out_n)
    new_alive = jax.lax.all_to_all(new_alive, axis, split_axis=0,
                                   concat_axis=0, tiled=True)

    new_pairs = []
    nbytes = out_n * 1
    for arr, valid in pairs:
        new_arr = exchange(arr)
        new_valid = exchange(valid) if valid is not None else None
        new_pairs.append((new_arr, new_valid))
        nbytes += out_n * arr.dtype.itemsize + (out_n if valid is not None
                                                else 0)
    record_exchange(nbytes)

    overflow = (jnp.max(counts) > dest_cap) | (hn > hot_cap)
    return new_pairs, new_alive, overflow
