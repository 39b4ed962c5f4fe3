"""Kernel-layer unit tests: edge cases the SQL surface may not reach."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from igloo_tpu.ops import join_ops, masks
from igloo_tpu.ops.aggregate import AggInput, grouped_aggregate
from igloo_tpu.ops.sort_ops import _direction_transform


def test_join_key_int64_max_sentinel():
    # keys equal to INT64_MAX must still join correctly (the dead-tail
    # sentinel uses the same value)
    big = jnp.iinfo(jnp.int64).max
    build = jnp.asarray([1, big, 5], dtype=jnp.int64)
    joinable = jnp.asarray([True, True, False])
    sk, perm, nj, _ = join_ops.build_side(build, joinable)
    probe = jnp.asarray([big, 1, 7], dtype=jnp.int64)
    start, counts = join_ops.probe_counts(sk, nj, probe,
                                          jnp.ones(3, jnp.bool_))
    assert counts.tolist() == [1, 1, 0]


def test_join_negative_float_zero():
    k, exact = join_ops.normalize_keys([jnp.asarray([0.0, -0.0, 1.5],
                                                    dtype=jnp.float64)])
    assert exact
    assert k[0] == k[1]          # -0.0 joins with 0.0


def test_multikey_packing_exact():
    a = jnp.asarray([1, 2], dtype=jnp.int32)
    b = jnp.asarray([3, 4], dtype=jnp.int32)
    k, exact = join_ops.normalize_keys([a, b])
    assert exact and k[0] != k[1]
    # three int32s exceed 64 bits → hashed, flagged inexact
    _, exact3 = join_ops.normalize_keys([a, b, a])
    assert not exact3


def test_direction_transform_int_min():
    x = jnp.asarray([jnp.iinfo(jnp.int64).min, -1, 0,
                     jnp.iinfo(jnp.int64).max], dtype=jnp.int64)
    d = _direction_transform(x, ascending=False)
    # order must be exactly reversed
    assert jnp.argsort(d).tolist() == [3, 2, 1, 0]


def test_compact_cosort_empty_and_full():
    vals = jnp.arange(8, dtype=jnp.int32)
    arrs, valids, count = masks.compact_cosort(
        jnp.zeros(8, jnp.bool_), [vals], [None])
    assert int(count) == 0
    arrs, valids, count = masks.compact_cosort(
        jnp.ones(8, jnp.bool_), [vals], [None])
    assert int(count) == 8
    assert arrs[0].tolist() == list(range(8))


def test_first_k_mask_offset():
    m = jnp.asarray([True, False, True, True, False, True])
    out = masks.first_k_mask(m, 2, offset=1)
    assert out.tolist() == [False, False, True, True, False, False]


def test_grouped_aggregate_all_dead():
    keys = [(jnp.asarray([1, 2, 3], dtype=jnp.int64), None)]
    aggs = [AggInput("count_star", None, None)]
    out_keys, out_aggs, ngroups = grouped_aggregate(
        keys, aggs, jnp.zeros(3, jnp.bool_))
    assert int(ngroups) == 0


def test_grouped_aggregate_single_group_bound():
    keys = [(jnp.asarray([5, 5, 5, 5], dtype=jnp.int64), None)]
    aggs = [AggInput("sum", jnp.asarray([1, 2, 3, 4], dtype=jnp.int64), None)]
    out_keys, out_aggs, ngroups = grouped_aggregate(
        keys, aggs, None, max_groups=8)
    assert int(ngroups) == 1
    assert int(out_aggs[0][0][0]) == 10
    assert int(out_keys[0][0][0]) == 5


def test_expand_matches_boundaries():
    start = jnp.asarray([0, 2, 5], dtype=jnp.int32)
    counts = jnp.asarray([2, 3, 0], dtype=jnp.int32)
    probe_row, build_pos, valid = join_ops.expand_matches(start, counts, 8)
    assert probe_row[:5].tolist() == [0, 0, 1, 1, 1]
    assert build_pos[:5].tolist() == [0, 1, 2, 3, 4]
    assert valid.tolist() == [True] * 5 + [False] * 3
