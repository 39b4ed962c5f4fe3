"""Out-of-core (chunked) execution vs in-memory differential suite.

The chunked engine streams the table through fixed-capacity device
buffers (igloo_tpu/ooc.py); every query here must match the in-memory
engine's result exactly (floats to tolerance — partial sums re-associate
the reduction order). The reference's bar is bounded-memory execution at
any table size (parquet_scan.rs:46-82); the bounded-residency assertion
at the bottom checks the stream actually bounds device bytes.
"""

import numpy as np
import pyarrow as pa
import pytest

import igloo_tpu

N = 200_000
CHUNK = 32_768          # 6 full chunks + a ragged tail


def _data():
    rng = np.random.default_rng(7)
    return pa.table({
        "k": rng.integers(0, 50, N).astype(np.int32),
        "v": pa.array(np.where(rng.random(N) < 0.1, None,
                               np.round(rng.normal(10, 4, N), 6)),
                      type=pa.float64()),
        "s": pa.array([f"cat_{i:02d}" for i in
                       rng.integers(0, 20, N)]),
        "d": rng.permutation(N).astype(np.int64),
    })


@pytest.fixture(scope="module")
def engines():
    t = _data()
    mem = igloo_tpu.QueryEngine()
    mem.register_table("t", t)
    mem.register_table("dim", pa.table(
        {"k": np.arange(50, dtype=np.int32),
         "w": np.arange(50, dtype=np.int64) * 10}))
    mem.register_table("dim25", pa.table(
        {"k": np.arange(25, dtype=np.int32),
         "w": np.arange(25, dtype=np.int64) * 7}))
    ooc = igloo_tpu.QueryEngine()
    ooc.register_chunked("t", t, chunk_rows=CHUNK)
    ooc.register_table("dim", pa.table(
        {"k": np.arange(50, dtype=np.int32),
         "w": np.arange(50, dtype=np.int64) * 10}))
    ooc.register_table("dim25", pa.table(
        {"k": np.arange(25, dtype=np.int32),
         "w": np.arange(25, dtype=np.int64) * 7}))
    return mem, ooc


def _rows(tbl: pa.Table):
    cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    return [tuple(c[i] for c in cols) for i in range(tbl.num_rows)]


def check(engines, sql, ordered=True):
    mem, ooc = engines
    want = _rows(mem.execute(sql))
    got = _rows(ooc.execute(sql))
    if not ordered:
        want = sorted(want, key=repr)
        got = sorted(got, key=repr)
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert len(g) == len(w)
        for a, b in zip(g, w):
            if isinstance(b, float) and isinstance(a, float):
                assert a == pytest.approx(b, rel=1e-9, abs=1e-9), (g, w)
            else:
                assert a == b, (g, w)


def test_global_aggs(engines):
    check(engines, """
        SELECT count(*), count(v), sum(v), min(v), max(v), avg(v),
               sum(k), min(s), max(s), min(d), max(d)
        FROM t""")


def test_grouped_aggs(engines):
    check(engines, """
        SELECT k, count(*) AS c, sum(v) AS sv, avg(v) AS av,
               min(d) AS mind, max(d) AS maxd
        FROM t GROUP BY k ORDER BY k""")


def test_group_by_string(engines):
    check(engines, """
        SELECT s, count(*), sum(v), min(k), max(k)
        FROM t GROUP BY s ORDER BY s""")


def test_filter_group(engines):
    check(engines, """
        SELECT s, count(*), sum(v)
        FROM t WHERE v > 10.0 AND k < 40
        GROUP BY s ORDER BY s""")


def test_var_stddev(engines):
    check(engines, """
        SELECT k, var(v) AS vv, stddev(v) AS sv, var_samp(v)
        FROM t GROUP BY k ORDER BY k""")


def test_global_var(engines):
    check(engines, "SELECT var(v), stddev(v) FROM t")


def test_having(engines):
    check(engines, """
        SELECT k, count(*) AS c FROM t
        GROUP BY k HAVING count(*) > 3900 ORDER BY c DESC, k""")


def test_projected_group_expr(engines):
    check(engines, """
        SELECT k % 7 AS g, sum(v * 2 + 1) AS x, count(v)
        FROM t GROUP BY g ORDER BY g""")


def test_case_in_agg(engines):
    check(engines, """
        SELECT s, sum(CASE WHEN k > 25 THEN v ELSE 0 END)
        FROM t GROUP BY s ORDER BY s""")


def test_topk(engines):
    check(engines, "SELECT d, k, v FROM t ORDER BY d DESC LIMIT 50")
    check(engines, "SELECT d, s FROM t ORDER BY d LIMIT 25")


def test_limit_streams_early(engines):
    mem, ooc = engines
    out = ooc.execute("SELECT k, d FROM t LIMIT 100")
    assert out.num_rows == 100
    assert ooc.last_ooc.chunks == 1      # early stop after first chunk


def test_pure_filter_concat(engines):
    check(engines, "SELECT k, d, v FROM t WHERE k = 3 ORDER BY d")
    check(engines, "SELECT d FROM t WHERE d < 1000 ORDER BY d")


def test_distinct(engines):
    check(engines, "SELECT DISTINCT k FROM t ORDER BY k")
    check(engines, "SELECT DISTINCT s, k % 2 FROM t ORDER BY s, 2")


def test_count_distinct_fallback(engines):
    # non-decomposable aggregate -> concat split (streams the chain,
    # aggregates the union)
    check(engines, "SELECT count(DISTINCT k) FROM t")
    check(engines, "SELECT s, count(DISTINCT k) FROM t GROUP BY s ORDER BY s")


def test_any_value(engines):
    check(engines, "SELECT k, any_value(d) FROM t GROUP BY k ORDER BY k")


def test_ctas_from_chunked(engines):
    mem, ooc = engines
    ooc.execute("CREATE TABLE agg1 AS SELECT k, sum(v) AS sv FROM t GROUP BY k")
    mem.execute("CREATE TABLE agg1 AS SELECT k, sum(v) AS sv FROM t GROUP BY k")
    try:
        check(engines, "SELECT k, sv FROM agg1 ORDER BY k")
    finally:
        ooc.execute("DROP TABLE agg1")
        mem.execute("DROP TABLE agg1")


def test_join_streams_per_chunk(engines):
    # chunked fact x in-memory dim: the join itself runs per chunk (the
    # fact table never materializes whole); the aggregate decomposes
    # above it
    check(engines, "SELECT sum(w) FROM t JOIN dim ON t.k = dim.k")
    mem, ooc = engines
    assert ooc.last_ooc.split == "aggregate"
    assert ooc.last_ooc.chunks == -(-N // CHUNK)
    check(engines, """
        SELECT dim.w, count(*), sum(t.v) FROM t JOIN dim ON t.k = dim.k
        WHERE t.k < 30 GROUP BY dim.w ORDER BY dim.w""")


def test_left_join_streams(engines):
    # dim25 covers only half the key range: per-chunk LEFT emission of
    # unmatched probe rows must union to the in-memory result
    check(engines, """
        SELECT t.k, count(dim25.w) AS c, count(*) AS n
        FROM t LEFT JOIN dim25 ON t.k = dim25.k
        GROUP BY t.k ORDER BY t.k""")


def test_two_chunked_tables_raise(engines):
    _, ooc = engines
    from igloo_tpu.errors import NotSupportedError
    t2 = _data().slice(0, 50_000)
    ooc.register_chunked("t2", t2, chunk_rows=CHUNK)
    try:
        with pytest.raises(NotSupportedError):
            ooc.execute("SELECT count(*) FROM t JOIN t2 ON t.k = t2.k")
    finally:
        ooc.deregister_table("t2")


def test_stats_and_bounded_residency(engines):
    mem, ooc = engines
    ooc.execute("SELECT k, sum(v) FROM t WHERE d % 3 = 0 GROUP BY k")
    st = ooc.last_ooc
    assert st is not None and st.split == "aggregate"
    assert st.chunks == -(-N // CHUNK)
    assert st.rows_scanned == N
    # live device bytes above the pre-query baseline must stay ~chunk-
    # sized, far below the whole table (4 cols x 8B x 200k ~ 5.4 MB;
    # chunk residency incl. double buffering + partials << that)
    delta = st.peak_live_bytes - st.base_live_bytes
    table_bytes = N * (4 + 8 + 4 + 8)
    assert delta < table_bytes // 2, (delta, table_bytes)


def test_virtual_generator_table():
    """Fully virtual table: nothing host-resident either — the shape a
    larger-than-RAM benchmark uses."""
    eng = igloo_tpu.QueryEngine()
    n = 500_000

    def chunk_fn(start, stop, columns):
        i = np.arange(start, stop, dtype=np.int64)
        out = {}
        if "g" in columns:
            out["g"] = (i % 97).astype(np.int32)
        if "x" in columns:
            out["x"] = (i * 2654435761 % (1 << 20)).astype(np.int64)
        return {c: out[c] for c in columns}

    eng.register_chunked(
        "virt", fields=pa.schema([("g", pa.int32()), ("x", pa.int64())]),
        nrows=n, chunk_fn=chunk_fn, chunk_rows=65_536)
    out = eng.execute(
        "SELECT count(*) AS c, sum(x) AS sx FROM virt WHERE g < 10")
    i = np.arange(n, dtype=np.int64)
    g = i % 97
    x = i * 2654435761 % (1 << 20)
    m = g < 10
    assert out.column("c")[0].as_py() == int(m.sum())
    assert out.column("sx")[0].as_py() == int(x[m].sum())
