"""Paired-int32 physical storage for INT64 columns (table.py
Column.pair_hi): logical results must match plain int64 storage through
scan, sort/top-k (index-emit prune path on the fragment executor), and
egress."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _paired_table(vals: np.ndarray):
    from igloo_tpu.table import Column, DeviceTable, pad_count
    from igloo_tpu.dtypes import SqlType
    cap = pad_count(len(vals))
    pad = np.zeros(cap - len(vals), dtype=np.int64)
    v = np.concatenate([vals, pad])
    lo = (v & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    hi = ((v >> 32) & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    col = Column(data=jnp.asarray(lo), dtype=SqlType.INT64,
                 pair_hi=jnp.asarray(hi))
    return DeviceTable({"k": col}, len(vals))


@pytest.fixture()
def vals():
    rng = np.random.default_rng(7)
    # mix of small, negative and >32-bit magnitudes (hi plane matters)
    v = rng.integers(-(1 << 62), 1 << 62, 5000, dtype=np.int64)
    v[:100] = rng.integers(-50, 50, 100)
    return v


def test_combine_roundtrip(vals):
    from igloo_tpu.table import combine_pair64
    t = _paired_table(vals)
    c = t.columns["k"]
    got = np.asarray(jax.device_get(
        combine_pair64(c.data, c.pair_hi)))[:len(vals)]
    assert np.array_equal(got, vals)


def test_paired_scan_egress(engine, vals):
    engine.register_table("pk", _paired_table(vals))
    out = engine.execute("SELECT k FROM pk")
    assert sorted(out.column(0).to_pylist()) == sorted(vals.tolist())


def test_paired_order_by_limit(engine, vals):
    engine.register_table("pk", _paired_table(vals))
    out = engine.execute("SELECT k FROM pk ORDER BY k LIMIT 50")
    assert out.column(0).to_pylist() == sorted(vals.tolist())[:50]

    out = engine.execute("SELECT k FROM pk ORDER BY k DESC LIMIT 50")
    assert out.column(0).to_pylist() == sorted(vals.tolist(),
                                               reverse=True)[:50]


def test_paired_filter_agg(engine, vals):
    engine.register_table("pk", _paired_table(vals))
    out = engine.execute(
        "SELECT count(*) AS c FROM pk WHERE k > 0")
    assert out.column(0).to_pylist() == [int((vals > 0).sum())]
