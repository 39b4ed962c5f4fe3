"""Pallas stream-compaction kernel (ops/pallas/compact.py) unit tests.

Runs in interpret mode on CPU (conftest forces the CPU backend); the
same code path compiles on TPU. Covers the edge cases of the log-shift
algorithm: empty/full masks, block-boundary offsets, 64-bit planes,
None-able validity masks, and the non-tile-aligned fallback.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from igloo_tpu.ops.masks import compact, compact_cosort
from igloo_tpu.ops.pallas.compact import compact_rows, compactable


def _check(mask, arrays, valids, **kw):
    arrs, out_valids, count = compact_rows(
        jnp.asarray(mask),
        [jnp.asarray(a) for a in arrays],
        [None if v is None else jnp.asarray(v) for v in valids],
        interpret=True, **kw)
    k = int(mask.sum())
    assert int(count) == k
    for got, a in zip(arrs, arrays):
        np.testing.assert_array_equal(np.asarray(got)[:k], a[mask])
    for got, v in zip(out_valids, valids):
        if v is None:
            assert got is None
        else:
            np.testing.assert_array_equal(np.asarray(got)[:k], v[mask])


@pytest.mark.parametrize("cap,p", [
    (4096, 0.5), (4096, 0.0), (4096, 1.0), (8192, 0.74),
    (32768, 0.9), (65536, 0.03),
])
def test_mixed_dtypes(cap, p):
    rng = np.random.default_rng(cap + int(p * 100))
    mask = rng.random(cap) < p
    a32 = rng.integers(-(1 << 31), 1 << 31, cap, dtype=np.int64).astype(np.int32)
    a64 = rng.integers(-(1 << 62), 1 << 62, cap, dtype=np.int64)
    af = rng.normal(size=cap).astype(np.float32)
    ad = rng.normal(size=cap).astype(np.float64)
    vb = rng.random(cap) < 0.8
    _check(mask, [a32, a64, af, ad], [vb, None, vb, None])


def test_single_selected_rows_cross_blocks():
    # one selected row per 4096-block exercises the pending-row carry
    cap = 32768
    mask = np.zeros(cap, dtype=bool)
    mask[np.arange(8) * 4096 + 17] = True
    a = np.arange(cap, dtype=np.int32)
    _check(mask, [a], [None])


def test_alternating_mask():
    cap = 8192
    mask = (np.arange(cap) % 2).astype(bool)
    a = np.arange(cap, dtype=np.int32)
    _check(mask, [a], [None])


def test_no_payload_count_only():
    mask = np.zeros(4096, dtype=bool)
    mask[5] = True
    arrs, valids, count = compact_rows(jnp.asarray(mask), [], [],
                                       interpret=True)
    assert int(count) == 1 and arrs == [] and valids == []


def test_dispatcher_fallback_non_aligned():
    # capacity 128 is not tile-aligned for the kernel → co-sort fallback
    assert not compactable(128)
    rng = np.random.default_rng(0)
    mask = rng.random(128) < 0.5
    a = rng.integers(0, 1000, 128).astype(np.int32)
    arrs, _, count = compact(jnp.asarray(mask), [jnp.asarray(a)], [None])
    k = int(mask.sum())
    assert int(count) == k
    np.testing.assert_array_equal(np.asarray(arrs[0])[:k], a[mask])


def test_matches_cosort_reference():
    rng = np.random.default_rng(7)
    cap = 16384
    mask = rng.random(cap) < 0.3
    a = rng.integers(0, 1 << 20, cap).astype(np.int32)
    ref = compact_cosort(jnp.asarray(mask), [jnp.asarray(a)], [None])
    new = compact_rows(jnp.asarray(mask), [jnp.asarray(a)], [None],
                       interpret=True)
    k = int(mask.sum())
    np.testing.assert_array_equal(np.asarray(ref[0][0])[:k],
                                  np.asarray(new[0][0])[:k])
    assert int(ref[2]) == int(new[2]) == k


def test_full_block_wrap_after_partial(engine_np_oracle=None):
    """A COMPLETELY selected block following a partial block overflows
    the staged block cyclically (new_total > br*128): the wrapped tail
    elements must become the next pending row, and the last block's
    wrap must flush an extra row — r5 wrong-results fix (clustered
    tables produce exactly these masks: long unselected prefix, then
    ~100%-selected runs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from igloo_tpu.ops import masks

    rng = np.random.default_rng(3)
    n = 1 << 18
    cases = [
        np.concatenate([np.zeros(150_000, bool),
                        np.ones(n - 150_000, bool)]),
        np.concatenate([np.zeros(32768 + 17, bool),
                        np.ones(n - 32768 - 17, bool)]),
        np.concatenate([rng.random(65536) < 0.3,
                        np.ones(n - 65536, bool)]),
        np.ones(n, bool),
        np.concatenate([rng.random(4096) < 0.7,
                        np.ones(n - 8192, bool),
                        np.zeros(4096, bool)]),
    ]
    for mask in cases:
        a = rng.integers(0, 1 << 30, n).astype(np.int32)
        arrs, _, cnt = masks.compact(
            jnp.asarray(mask), [jnp.asarray(a)], [None])
        cnt = int(cnt)
        assert cnt == int(mask.sum())
        assert np.array_equal(np.asarray(arrs[0])[:cnt], a[mask])
