"""Tiny-cardinality GROUP BY (ops/tiny_agg.py) vs a pandas oracle.

≤32 combined group slots → masked whole-column reductions (no sort;
distributed: one psum/pmin/pmax merge). Must agree with the general
sort path on every aggregate, null pattern, and key shape.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def data():
    rng = np.random.default_rng(3)
    n = 5000
    g = rng.integers(0, 5, n)
    h = rng.choice(["x", "y", None], n, p=[0.45, 0.45, 0.1])
    v = rng.integers(-50, 50, n).astype(np.int64)
    f = np.round(rng.uniform(-10, 10, n), 3)
    fv = rng.random(n) < 0.9
    s = rng.choice(["aa", "bb", "cc"], n)
    big = (rng.integers(0, 3, n) + 5_000_000_000).astype(np.int64)
    t = pa.table({
        "g": pa.array(g, type=pa.int32()),
        "h": pa.array(h),
        "v": pa.array(v),
        "f": pa.array(np.where(fv, f, 0.0), type=pa.float64(),
                      mask=~fv),
        "s": pa.array(s),
        "big": pa.array(big),
    })
    df = t.to_pandas()
    return t, df


def test_tiny_agg_single_key(engine, data):
    t, df = data
    engine.register_table("t", t)
    out = engine.execute(
        "SELECT g, count(*) AS c, sum(v) AS sv, sum(f) AS sf, "
        "avg(f) AS af, min(f) AS mnf, max(v) AS mxv, count(f) AS cf, "
        "stddev(f) AS sd, min(s) AS mns "
        "FROM t GROUP BY g ORDER BY g").to_pandas()
    want = (df.groupby("g", as_index=False)
            .agg(c=("v", "size"), sv=("v", "sum"), sf=("f", "sum"),
                 af=("f", "mean"), mnf=("f", "min"), mxv=("v", "max"),
                 cf=("f", "count"), sd=("f", "std"), mns=("s", "min"))
            .sort_values("g").reset_index(drop=True))
    assert out["g"].tolist() == want["g"].tolist()
    assert out["c"].tolist() == want["c"].tolist()
    assert out["sv"].tolist() == want["sv"].tolist()
    np.testing.assert_allclose(out["sf"], want["sf"], rtol=1e-9)
    np.testing.assert_allclose(out["af"], want["af"], rtol=1e-9)
    np.testing.assert_allclose(out["mnf"], want["mnf"], rtol=1e-12)
    assert out["mxv"].tolist() == want["mxv"].tolist()
    assert out["cf"].tolist() == want["cf"].tolist()
    np.testing.assert_allclose(out["sd"], want["sd"], rtol=1e-9)
    assert out["mns"].tolist() == want["mns"].tolist()


def test_tiny_agg_multi_key_nulls(engine, data):
    t, df = data
    engine.register_table("t", t)
    out = engine.execute(
        "SELECT g, h, count(*) AS c, sum(v) AS sv FROM t "
        "GROUP BY g, h ORDER BY g, h NULLS LAST").to_pandas()
    want = (df.groupby(["g", "h"], as_index=False, dropna=False)
            .agg(c=("v", "size"), sv=("v", "sum")))
    want = want.sort_values(
        ["g", "h"], na_position="last").reset_index(drop=True)
    assert out["c"].tolist() == want["c"].tolist()
    assert out["sv"].tolist() == want["sv"].tolist()
    assert out["h"].tolist() == want["h"].tolist()


def test_tiny_agg_int64_key_large_base(engine, data):
    t, df = data
    engine.register_table("t", t)
    out = engine.execute(
        "SELECT big, count(*) AS c FROM t GROUP BY big ORDER BY big"
    ).to_pandas()
    want = (df.groupby("big", as_index=False).agg(c=("v", "size"))
            .sort_values("big").reset_index(drop=True))
    assert out["big"].tolist() == want["big"].tolist()
    assert out["c"].tolist() == want["c"].tolist()


def test_tiny_agg_distributed(data):
    import jax
    t, df = data
    from igloo_tpu.parallel.engine import DistributedQueryEngine
    e = DistributedQueryEngine(result_cache=False)
    e.register_table("t", t)
    out = e.execute(
        "SELECT g, h, sum(v) AS sv, min(f) AS mn, max(f) AS mx, "
        "count(*) AS c FROM t GROUP BY g, h ORDER BY g, h NULLS LAST"
    ).to_pandas()
    want = (df.groupby(["g", "h"], as_index=False, dropna=False)
            .agg(sv=("v", "sum"), mn=("f", "min"), mx=("f", "max"),
                 c=("v", "size"))
            .sort_values(["g", "h"], na_position="last")
            .reset_index(drop=True))
    assert out["sv"].tolist() == want["sv"].tolist()
    assert out["c"].tolist() == want["c"].tolist()
    np.testing.assert_allclose(out["mn"], want["mn"], rtol=1e-12)
    np.testing.assert_allclose(out["mx"], want["mx"], rtol=1e-12)


def test_tiny_agg_having_and_empty_groups(engine):
    engine.register_table("e", pa.table({
        "g": pa.array([1, 1, 3], type=pa.int32()),
        "v": pa.array([10, 20, 30], type=pa.int64())}))
    out = engine.execute(
        "SELECT g, sum(v) AS s FROM e GROUP BY g HAVING sum(v) > 25 "
        "ORDER BY g")
    # only non-empty groups exist (g=2 in the [1,3] span must NOT appear)
    assert out.column("g").to_pylist() == [1, 3]
    assert out.column("s").to_pylist() == [30, 30]
    out = engine.execute("SELECT g, count(*) AS c FROM e GROUP BY g "
                         "ORDER BY g")
    assert out.column("g").to_pylist() == [1, 3]
    assert out.column("c").to_pylist() == [2, 1]