"""ORDER BY … LIMIT top-k candidate pruning (dist_exec._topk_prune).

Tables above the 2^18-row gate so the prune path actually engages;
results must be byte-identical to a full stable sort, including
duplicate-heavy keys (tuple+row-index threshold), multi-key sorts,
OFFSET, and NULL ordering.
"""

import numpy as np
import pyarrow as pa
import pytest

from igloo_tpu import QueryEngine

N = 1 << 19


@pytest.fixture(scope="module")
def eng():
    e = QueryEngine(result_cache=False)
    rng = np.random.default_rng(0)
    k = rng.integers(0, 1 << 40, N)
    e.register_table("t", pa.table({"k": pa.array(k, type=pa.int64())}))
    kt = np.zeros(N, dtype=np.int64)
    kt[::1000] = 1
    e.register_table("t2", pa.table({"k": pa.array(kt),
                                     "i": pa.array(np.arange(N))}))
    a = rng.integers(0, 4, N)
    b = rng.integers(0, 1 << 30, N)
    e.register_table("t3", pa.table({"a": pa.array(a), "b": pa.array(b)}))
    kn = rng.integers(0, 1000, N).astype(object)
    kn[rng.random(N) < 0.01] = None
    e.register_table("t4", pa.table({"k": pa.array(kn.tolist(),
                                                   type=pa.int64())}))
    e._np = dict(k=k, kt=kt, a=a, b=b)
    return e


def test_topk_asc(eng):
    got = eng.execute("SELECT k FROM t ORDER BY k LIMIT 50").column(0).to_pylist()
    assert got == sorted(eng._np["k"].tolist())[:50]


def test_topk_desc(eng):
    got = eng.execute("SELECT k FROM t ORDER BY k DESC LIMIT 50").column(0).to_pylist()
    assert got == sorted(eng._np["k"].tolist(), reverse=True)[:50]


def test_topk_offset(eng):
    got = eng.execute(
        "SELECT k FROM t ORDER BY k LIMIT 20 OFFSET 30").column(0).to_pylist()
    assert got == sorted(eng._np["k"].tolist())[30:50]


def test_topk_heavy_ties_stable(eng):
    got = eng.execute("SELECT i FROM t2 ORDER BY k LIMIT 10").column(0).to_pylist()
    idx = np.argsort(eng._np["kt"], kind="stable")[:10]
    assert got == np.arange(N)[idx].tolist()


def test_topk_multikey_leading_ties(eng):
    got = eng.execute("SELECT a, b FROM t3 ORDER BY a, b LIMIT 25")
    order = np.lexsort((eng._np["b"], eng._np["a"]))[:25]
    assert got.column(0).to_pylist() == eng._np["a"][order].tolist()
    assert got.column(1).to_pylist() == eng._np["b"][order].tolist()


def test_topk_nulls_first(eng):
    got = eng.execute(
        "SELECT k FROM t4 ORDER BY k NULLS FIRST LIMIT 10").column(0).to_pylist()
    assert all(x is None for x in got)


def test_fused_matches_general_path(eng, monkeypatch):
    """The fused Pallas extraction and the general XLA path must emit
    identical rows (both are exercised against the same engine state)."""
    import igloo_tpu

    q = "SELECT k FROM t ORDER BY k DESC LIMIT 37"
    fused = eng.execute(q).to_pydict()
    e2 = igloo_tpu.QueryEngine(result_cache=False)
    e2.register_table("t", pa.table({"k": pa.array(eng._np["k"],
                                                   type=pa.int64())}))
    monkeypatch.setenv("IGLOO_DISABLE_FUSED_TOPK", "1")
    general = e2.execute(q).to_pydict()
    assert fused == general


def test_index_mode_matches_general(monkeypatch):
    """Index-emit prune (hi-word superset + gather + exact re-verify)
    must match the general path exactly — int64, f64 and multi-key
    (i64 leading) shapes, asc and desc."""
    import igloo_tpu

    monkeypatch.setenv("IGLOO_TOPK_INDEX_MIN", str(1 << 18))
    rng = np.random.default_rng(7)
    k = rng.integers(-(1 << 40), 1 << 40, N)
    f = rng.normal(size=N) * 1e6
    p = rng.integers(0, 100, N)

    def fresh():
        e = igloo_tpu.QueryEngine(result_cache=False)
        e.register_table("ti", pa.table({
            "k": pa.array(k, type=pa.int64()),
            "f": pa.array(f, type=pa.float64()),
            "p": pa.array(p, type=pa.int32()),
        }))
        return e

    queries = [
        "SELECT k, p FROM ti ORDER BY k LIMIT 40",
        "SELECT k FROM ti ORDER BY k DESC LIMIT 33",
        "SELECT f, p FROM ti ORDER BY f LIMIT 25",
        "SELECT k, f FROM ti ORDER BY k, f DESC LIMIT 20",
    ]
    e1 = fresh()
    got = [e1.execute(q).to_pydict() for q in queries]
    monkeypatch.setenv("IGLOO_DISABLE_FUSED_TOPK", "1")
    e2 = fresh()
    want = [e2.execute(q).to_pydict() for q in queries]
    assert got == want


def test_index_mode_degenerate_hi_falls_back(monkeypatch):
    """int64 keys all inside int32 range give a constant hi word — the
    superset blows the candidate cap and the overflow retry must
    disable index mode and still return the right rows."""
    import igloo_tpu

    monkeypatch.setenv("IGLOO_TOPK_INDEX_MIN", str(1 << 18))
    rng = np.random.default_rng(9)
    k = rng.integers(0, 1 << 20, N)      # hi word == 0 for every row
    e = igloo_tpu.QueryEngine(result_cache=False)
    e.register_table("td", pa.table({"k": pa.array(k, type=pa.int64())}))
    got = e.execute("SELECT k FROM td ORDER BY k LIMIT 50").column(0).to_pylist()
    assert got == sorted(k.tolist())[:50]
