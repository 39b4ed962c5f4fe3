"""MXU one-hot aggregation kernel: parity with the sort-based path."""

import os

import numpy as np
import pyarrow as pa
import pytest


def _data(n=5000, G=100, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, G, n), type=pa.int32()),
        "v": pa.array(rng.integers(-500, 500, n), type=pa.int32()),
        "s": pa.array(rng.choice(["a", "b", "c", "d"], n)),
    })


QUERY = ("SELECT k, count(*) AS c, count(v) AS cv, sum(v) AS s, avg(v) AS a "
         "FROM t GROUP BY k ORDER BY k")


def test_mxu_agg_matches_sort_path(engine, monkeypatch):
    import igloo_tpu
    engine.register_table("t", _data())
    mxu = engine.execute(QUERY).to_pydict()

    eng2 = igloo_tpu.QueryEngine()
    eng2.register_table("t", _data())
    monkeypatch.setenv("IGLOO_DISABLE_MXU_AGG", "1")
    ref = eng2.execute(QUERY).to_pydict()
    assert mxu == ref


def test_mxu_agg_string_key(engine):
    engine.register_table("t", _data())
    out = engine.execute(
        "SELECT s, count(*) AS c, sum(v) AS sv FROM t GROUP BY s ORDER BY s")
    import pandas as pd
    df = _data().to_pandas()
    want = (df.groupby("s", as_index=False)
            .agg(c=("v", "size"), sv=("v", "sum")).sort_values("s"))
    assert out.column("s").to_pylist() == list(want["s"])
    assert out.column("c").to_pylist() == [int(x) for x in want["c"]]
    assert out.column("sv").to_pylist() == [int(x) for x in want["sv"]]


def test_mxu_gate_rejects_nullable_and_minmax(engine):
    # nullable key and min/max must fall back to the sort path (correctness)
    engine.register_table("t", pa.table({
        "k": pa.array([1, None, 1, 2], type=pa.int32()),
        "v": [10, 20, 30, 40]}))
    out = engine.execute(
        "SELECT k, count(*) AS c, min(v) AS mn FROM t GROUP BY k "
        "ORDER BY k NULLS LAST")
    assert out.column("k").to_pylist() == [1, 2, None]
    assert out.column("c").to_pylist() == [2, 1, 1]
    assert out.column("mn").to_pylist() == [10, 40, 20]
