"""Equi-join kernels: sorted build side + vectorized binary-search probe.

The reference's HashJoinExec materializes the right side into a
`HashMap<debug-formatted key bytes, rows>` and probes row-by-row
(/root/reference/crates/engine/src/operators/hash_join.rs:100-213) — and
emits Right/Full unmatched rows incorrectly (`:189-202`). Here:

- build side is sorted by a normalized 64-bit key (`lax.sort`);
- every probe row binary-searches the sorted keys at once
  (`jnp.searchsorted`, a vectorized O(log n) gather tree — the TPU
  analog of a hash-probe, fully parallel across the VPU);
- duplicate build keys expand via an offset-search (two-phase: the host
  reads the total match count once to size the output);
- Right/Full unmatched build rows are appended correctly, exceeding the
  reference's semantics.

NULL join keys never match (SQL equality). Multi-column keys are packed
exactly when both fit 64 bits, otherwise mixed-hashed and verified
against the original columns after the probe, so results remain exact.

Dead rows (masked-out or null-keyed) are sorted to the tail via a
leading dead-flag key, and the tail is rewritten to +INT64_MAX after the
sort so the key array stays globally sorted; probe ranges are clamped to
the live prefix, which keeps even keys equal to INT64_MAX exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT64_MAX = jnp.iinfo(jnp.int64).max


def _key_max(dtype):
    """Sentinel that sorts after every real key of this dtype."""
    return jnp.iinfo(dtype).max


# ---------------------------------------------------------------------------
# key normalization
# ---------------------------------------------------------------------------

def _mix64(x: jax.Array) -> jax.Array:
    """splitmix64 finalizer — high-quality 64-bit mixing on the VPU."""
    x = x.astype(jnp.uint64)
    x = (x ^ (x >> 30)) * jnp.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> 27)) * jnp.uint64(0x94D049BB133111EB)
    x = x ^ (x >> 31)
    return x


def _to_bits(a: jax.Array) -> tuple[jax.Array, int]:
    if a.dtype == jnp.bool_:
        return a.astype(jnp.uint64), 1
    if a.dtype in (jnp.int8, jnp.uint8):
        return a.astype(jnp.uint64) & jnp.uint64(0xFF), 8
    if a.dtype in (jnp.int32, jnp.uint32):
        return a.astype(jnp.uint64) & jnp.uint64(0xFFFFFFFF), 32
    if a.dtype == jnp.float32:
        a = jnp.where(a == 0, jnp.zeros_like(a), a)  # -0.0 == 0.0
        return jax.lax.bitcast_convert_type(a, jnp.uint32).astype(jnp.uint64), 32
    if a.dtype in (jnp.int64, jnp.uint64):
        return a.astype(jnp.uint64), 64
    if a.dtype == jnp.float64:
        a = jnp.where(a == 0, jnp.zeros_like(a), a)
        return jax.lax.bitcast_convert_type(a, jnp.uint64), 64
    raise TypeError(f"unsupported join key dtype {a.dtype}")


def normalize_keys(cols: list[jax.Array]) -> tuple[jax.Array, bool]:
    """Combine key columns into one integer key (int32 when it fits —
    64-bit lanes halve TPU throughput).

    Returns (key, exact). exact=False means hashed (collisions possible →
    caller must verify matches against original columns).
    """
    if len(cols) == 1:
        a = cols[0]
        if a.dtype in (jnp.int32, jnp.int8, jnp.int16, jnp.uint8,
                       jnp.uint16, jnp.bool_):
            return a.astype(jnp.int32), True
        if a.dtype == jnp.float32:
            a = jnp.where(a == 0, jnp.zeros_like(a), a)  # -0.0 == 0.0
            return jax.lax.bitcast_convert_type(a, jnp.int32), True
        bits, _ = _to_bits(a)
        return bits.astype(jnp.int64), True
    bit_parts = [_to_bits(c) for c in cols]
    total = sum(w for _, w in bit_parts)
    if total <= 64:
        key = jnp.zeros_like(bit_parts[0][0])
        for bits, width in bit_parts:
            key = (key << jnp.uint64(width)) | bits
        return key.astype(jnp.int64), True
    h = jnp.zeros_like(bit_parts[0][0])
    for bits, _ in bit_parts:
        h = _mix64(h ^ _mix64(bits))
    return h.astype(jnp.int64), False


# ---------------------------------------------------------------------------
# build phase
# ---------------------------------------------------------------------------

def build_side(key: jax.Array, joinable: jax.Array, payload=()):
    """Sort build rows (joinable first, by key), carrying payload columns
    through the sort network (permute-then-gather is ~7× slower on TPU).

    Returns (sorted_keys, perm, n_joinable, sorted_payload). sorted_keys
    is globally sorted with the dead tail rewritten to the dtype max.
    None entries in payload pass through as None.
    """
    n = key.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    dead = (~joinable).astype(jnp.int32)
    operands = [dead, key, iota]
    slots = []
    for p in payload:
        if p is None:
            slots.append(None)
        else:
            slots.append(len(operands))
            operands.append(p)
    out = jax.lax.sort(operands, num_keys=2, is_stable=True)
    sk, perm = out[1], out[2]
    sorted_payload = [None if s is None else out[s] for s in slots]
    nj = jnp.sum(joinable.astype(jnp.int32))
    sk = jnp.where(iota < nj, sk, _key_max(key.dtype))
    return sk, perm, nj, sorted_payload


# ---------------------------------------------------------------------------
# probe phase
# ---------------------------------------------------------------------------

def probe_counts(sorted_keys: jax.Array, n_joinable, probe_key: jax.Array,
                 probe_joinable: jax.Array):
    """For each probe row: start position and match count in the live
    prefix of the sorted build keys."""
    start = jnp.searchsorted(sorted_keys, probe_key, side="left")
    end = jnp.searchsorted(sorted_keys, probe_key, side="right")
    end = jnp.minimum(end, n_joinable)
    start = jnp.minimum(start, n_joinable)
    counts = jnp.where(probe_joinable, jnp.maximum(end - start, 0), 0)
    return start.astype(jnp.int32), counts.astype(jnp.int32)


def expand_matches(start: jax.Array, counts: jax.Array, out_cap: int):
    """Expansion for duplicate build keys.

    Output slot j maps to (probe_row[j], build_pos[j], slot_valid[j]).
    out_cap is static — the host sized it after reading total=sum(counts).
    """
    n_probe = counts.shape[0]
    offsets = jnp.cumsum(counts.astype(jnp.int64))          # inclusive
    total = offsets[-1]
    j = jnp.arange(out_cap, dtype=jnp.int64)
    probe_row = jnp.searchsorted(offsets, j, side="right").astype(jnp.int32)
    probe_row = jnp.clip(probe_row, 0, n_probe - 1)
    base = jnp.where(probe_row > 0, offsets[jnp.maximum(probe_row - 1, 0)], 0)
    k = (j - base).astype(jnp.int32)
    build_pos = start[probe_row] + k
    slot_valid = j < total
    return probe_row, build_pos, slot_valid


def unmatched_build_mask_sorted(sorted_keys: jax.Array, n_joinable,
                                other_key: jax.Array,
                                other_joinable: jax.Array):
    """For RIGHT/FULL joins: mask in SORTED build order of joinable build
    rows whose key never occurs among the other side's joinable keys.
    (Sorted order avoids the scatter back to original row order — callers
    emit unmatched rows from the co-sorted payload.)"""
    nb = sorted_keys.shape[0]
    iota_o = jnp.arange(other_key.shape[0], dtype=jnp.int32)
    dead_o = (~other_joinable).astype(jnp.int32)
    _, so = jax.lax.sort([dead_o, other_key], num_keys=2)
    n_other = jnp.sum(other_joinable.astype(jnp.int32))
    so = jnp.where(iota_o < n_other, so, _key_max(other_key.dtype))
    pos = jnp.searchsorted(so, sorted_keys, side="left")
    hit = (pos < n_other) & (so[jnp.clip(pos, 0, so.shape[0] - 1)] == sorted_keys)
    alive_build = jnp.arange(nb) < n_joinable
    return alive_build & ~hit
