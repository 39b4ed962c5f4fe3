"""SQL surface additions: FILTER, ::casts, set-op ALL variants, flexible
LIMIT/OFFSET/FETCH, position(IN), regex/string/temporal functions.

The reference reaches most of this surface through DataFusion
(SURVEY §2.1 'Operators NOT custom-implemented'); here it is native.
"""

import datetime

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def t_engine(engine):
    engine.register_table("t", pa.table({
        "s": ["hello world", "Foo", None, "bar_baz"],
        "x": pa.array([1.5, -2.25, 3.0, None]),
        "i": pa.array([10, 20, 30, 40], type=pa.int64()),
        "d": pa.array(["2024-01-15", "2024-06-30", None, "2023-12-01"]),
    }))
    return engine


def col(out, name=None):
    return out.column(name if name is not None else 0).to_pylist()


def test_filter_clause(t_engine):
    out = t_engine.execute(
        "SELECT sum(i) FILTER (WHERE i > 15) AS s, "
        "count(*) FILTER (WHERE i > 25) AS c, "
        "avg(i) FILTER (WHERE i < 25) AS a, "
        "count(DISTINCT i) FILTER (WHERE i >= 20) AS cd FROM t")
    assert [c[0].as_py() for c in out.columns] == [90, 2, 15.0, 3]


def test_filter_clause_grouped(t_engine):
    out = t_engine.execute(
        "SELECT i % 20 AS g, sum(i) FILTER (WHERE i > 10) AS s "
        "FROM t GROUP BY i % 20 ORDER BY g")
    # g=0: {20, 40} → 60; g=10: {10, 30} with i>10 → 30
    assert col(out, "s") == [60, 30]


def test_colon_cast(t_engine):
    out = t_engine.execute("SELECT i::DOUBLE AS r, (i + 1)::BIGINT AS b "
                           "FROM t ORDER BY i LIMIT 1")
    assert col(out, "r") == [10.0]
    assert col(out, "b") == [11]


def test_limit_offset_orders(t_engine):
    assert col(t_engine.execute(
        "SELECT i FROM t ORDER BY i DESC OFFSET 1 LIMIT 2")) == [30, 20]
    assert col(t_engine.execute(
        "SELECT i FROM t ORDER BY i LIMIT 2 OFFSET 1")) == [20, 30]
    assert col(t_engine.execute(
        "SELECT i FROM t ORDER BY i OFFSET 1 ROWS "
        "FETCH NEXT 2 ROWS ONLY")) == [20, 30]
    assert col(t_engine.execute(
        "SELECT i FROM t ORDER BY i FETCH FIRST ROW ONLY")) == [10]


def test_intersect_except_all(engine):
    engine.register_table("a", pa.table({
        "v": pa.array([1, 1, 1, 2, 2, 3, None, None], type=pa.int64())}))
    engine.register_table("b", pa.table({
        "v": pa.array([1, 1, 2, 4, None], type=pa.int64())}))
    out = engine.execute("SELECT v FROM a INTERSECT ALL SELECT v FROM b")
    # multiplicities: min(3,2)=2 ones, min(2,1)=1 two, NULL: min(2,1)=1
    assert sorted(col(out), key=lambda v: (v is None, v)) == [1, 1, 2, None]
    out = engine.execute("SELECT v FROM a EXCEPT ALL SELECT v FROM b")
    # max(3-2,0)=1 one, max(2-1,0)=1 two, 3, max(2-1,0)=1 NULL
    assert sorted(col(out), key=lambda v: (v is None, v)) == [1, 2, 3, None]


def test_intersect_all_multicol(engine):
    engine.register_table("a", pa.table({
        "x": [1, 1, 2], "y": ["p", "p", "q"]}))
    engine.register_table("b", pa.table({
        "x": [1, 1, 1], "y": ["p", "p", "p"]}))
    out = engine.execute(
        "SELECT x, y FROM a INTERSECT ALL SELECT x, y FROM b")
    assert sorted(zip(col(out, "x"), col(out, "y"))) == [(1, "p"), (1, "p")]


def test_position_strpos(t_engine):
    assert col(t_engine.execute(
        "SELECT position('o' IN s) FROM t")) == [5, 2, None, 0]
    assert col(t_engine.execute(
        "SELECT strpos(s, 'ba') FROM t")) == [0, 0, None, 1]


def test_string_functions(t_engine):
    e = t_engine
    assert col(e.execute("SELECT split_part(s, '_', 2) FROM t")) == \
        ["", "", None, "baz"]
    assert col(e.execute("SELECT split_part(s, ' ', -1) FROM t")) == \
        ["world", "Foo", None, "bar_baz"]
    assert col(e.execute("SELECT left(s, 3) FROM t")) == \
        ["hel", "Foo", None, "bar"]
    assert col(e.execute("SELECT right(s, 3) FROM t")) == \
        ["rld", "Foo", None, "baz"]
    assert col(e.execute("SELECT repeat(s, 2) FROM t LIMIT 2")) == \
        ["hello worldhello world", "FooFoo"]
    assert col(e.execute("SELECT translate(s, 'lo', 'L') FROM t LIMIT 1")) \
        == ["heLL wrLd"]
    assert col(e.execute("SELECT ascii(s) FROM t")) == [104, 70, None, 98]
    assert col(e.execute("SELECT regexp_like(s, '^[a-z]+_') FROM t")) == \
        [False, False, None, True]
    assert col(e.execute("SELECT regexp_replace(s, 'o+', '0') FROM t")) == \
        ["hell0 w0rld", "F0", None, "bar_baz"]
    assert col(e.execute(
        "SELECT regexp_extract(s, '([a-z]+) ([a-z]+)', 2) FROM t")) == \
        ["world", "", None, ""]


def test_numeric_functions(t_engine):
    out = t_engine.execute(
        "SELECT trunc(x) AS t1, trunc(x * 10, 1) AS t2, atan2(1.0, 1.0) "
        "AS a, degrees(pi()) AS dg, sinh(0.0) AS sh FROM t WHERE x = 1.5")
    r = [c[0].as_py() for c in out.columns]
    assert r[0] == 1.0 and abs(r[1] - 15.0) < 1e-9
    assert abs(r[2] - 0.7853981633974483) < 1e-12
    assert abs(r[3] - 180.0) < 1e-9 and r[4] == 0.0


def test_date_trunc_and_extract(engine):
    days = [datetime.date(2023, 12, 28) + datetime.timedelta(days=k)
            for k in range(0, 800, 13)]
    engine.register_table("dts", pa.table({"d": pa.array(days)}))
    out = engine.execute(
        "SELECT date_trunc('month', d) AS m, date_trunc('year', d) AS y, "
        "date_trunc('quarter', d) AS q, date_trunc('week', d) AS w, "
        "extract(week FROM d) AS wk, extract(isodow FROM d) AS dw, "
        "extract(epoch FROM d) AS ep FROM dts")
    for i, d in enumerate(days):
        assert out.column("m")[i].as_py() == d.replace(day=1)
        assert out.column("y")[i].as_py() == d.replace(month=1, day=1)
        qm = (d.month - 1) // 3 * 3 + 1
        assert out.column("q")[i].as_py() == d.replace(month=qm, day=1)
        assert out.column("w")[i].as_py() == \
            d - datetime.timedelta(days=d.isoweekday() - 1)
        iso = d.isocalendar()
        assert out.column("wk")[i].as_py() == iso[1], d
        assert out.column("dw")[i].as_py() == iso[2], d
        epoch = (d - datetime.date(1970, 1, 1)).days * 86400
        assert out.column("ep")[i].as_py() == epoch


def test_cast_to_varchar(engine):
    engine.register_table("c", pa.table({
        "i": pa.array([10, 2, None, 40], type=pa.int64()),
        "x": pa.array([1.5, -2.25, 3.0, None]),
        "b": [True, False, None, True],
        "d": pa.array([datetime.date(2024, 1, 15), None,
                       datetime.date(2023, 12, 1),
                       datetime.date(2024, 6, 30)]),
    }))
    e = engine
    assert col(e.execute("SELECT CAST(i AS VARCHAR) FROM c")) == \
        ["10", "2", None, "40"]
    assert col(e.execute("SELECT i::VARCHAR || '-x' FROM c")) == \
        ["10-x", "2-x", None, "40-x"]
    assert col(e.execute("SELECT CAST(x AS VARCHAR) FROM c")) == \
        ["1.5", "-2.25", "3.0", None]
    assert col(e.execute("SELECT CAST(b AS VARCHAR) FROM c")) == \
        ["true", "false", None, "true"]
    assert col(e.execute("SELECT CAST(d AS VARCHAR) FROM c")) == \
        ["2024-01-15", None, "2023-12-01", "2024-06-30"]
    # rendered strings obey the engine's ordering/comparison invariants
    assert col(e.execute(
        "SELECT CAST(i AS VARCHAR) FROM c "
        "ORDER BY CAST(i AS VARCHAR) NULLS LAST")) == \
        ["10", "2", "40", None]   # lexicographic: '10' < '2' < '40'
    assert col(e.execute(
        "SELECT count(*) FROM c WHERE CAST(i AS VARCHAR) LIKE '1%'")) == [1]
    out = e.execute(
        "SELECT CAST(i % 20 AS VARCHAR) AS g, count(*) AS n FROM c "
        "WHERE i IS NOT NULL GROUP BY CAST(i % 20 AS VARCHAR) ORDER BY g")
    assert col(out, "g") == ["0", "10", "2"]
    assert col(e.execute(
        "SELECT upper(CAST(b AS VARCHAR)) FROM c LIMIT 2")) == \
        ["TRUE", "FALSE"]


def test_cast_varchar_timestamp(engine):
    ts = [datetime.datetime(2024, 3, 7, 14, 35, 42, 123456),
          datetime.datetime(2021, 11, 30, 23, 0, 0)]
    engine.register_table("ct", pa.table({
        "t": pa.array(ts, type=pa.timestamp("us"))}))
    assert col(engine.execute("SELECT CAST(t AS VARCHAR) FROM ct")) == \
        ["2024-03-07 14:35:42.123456", "2021-11-30 23:00:00"]


def test_not_exists_null_keys(engine):
    """NOT EXISTS is a PLAIN anti join: NULL keys never match and such
    rows are KEPT (previously leaked NOT IN's three-valued semantics)."""
    engine.register_table("t", pa.table({
        "k": pa.array([1, 2, None], type=pa.int64()), "v": [10, 20, 30]}))
    engine.register_table("s", pa.table({
        "k": pa.array([1, None], type=pa.int64())}))
    out = engine.execute(
        "SELECT v FROM t WHERE NOT EXISTS "
        "(SELECT 1 FROM s WHERE s.k = t.k)")
    assert sorted(out.column("v").to_pylist()) == [20, 30]
    out = engine.execute("SELECT v FROM t WHERE k NOT IN (SELECT k FROM s)")
    assert out.column("v").to_pylist() == []   # NULL in subquery → empty


def test_correlated_not_in(engine):
    engine.register_table("t", pa.table({
        "k": pa.array([1, 2, 3, None], type=pa.int64()),
        "x": pa.array([5, 5, 9, 5], type=pa.int64()),
        "v": [10, 20, 30, 40]}))
    engine.register_table("s", pa.table({
        "k": pa.array([1, 1, 2, 3], type=pa.int64()),
        "y": pa.array([5, 6, None, 7], type=pa.int64())}))
    # k=1: x∈S → out; k=2: S={NULL} → out; k=3: 9∉{7} → keep;
    # k=NULL: S empty → keep
    out = engine.execute(
        "SELECT v FROM t WHERE x NOT IN (SELECT y FROM s WHERE s.k = t.k)")
    assert sorted(out.column("v").to_pylist()) == [30, 40]
    # NULL probe: kept only when its correlated group is empty
    engine.register_table("t2", pa.table({
        "k": pa.array([1, 9], type=pa.int64()),
        "x": pa.array([None, None], type=pa.int64()), "v": [1, 2]}))
    out = engine.execute(
        "SELECT v FROM t2 WHERE x NOT IN (SELECT y FROM s WHERE s.k = t2.k)")
    assert out.column("v").to_pylist() == [2]


def test_string_agg(engine):
    engine.register_table("sa", pa.table({
        "g": ["a", "b", "a", None, "b", "a"],
        "s": ["x", "y", None, "z", "y", "w"],
        "v": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
    }))
    out = engine.execute(
        "SELECT g, string_agg(s, ',') AS r, sum(v) AS sv FROM sa "
        "GROUP BY g ORDER BY g NULLS LAST")
    assert col(out, "r") == ["x,w", "y,y", "z"]
    assert col(out, "sv") == [10, 7, 4]
    assert col(engine.execute(
        "SELECT string_agg(s, '|') FROM sa")) == ["x|y|z|y|w"]
    out = engine.execute(
        "SELECT g, string_agg(DISTINCT s, ',') AS r FROM sa "
        "GROUP BY g ORDER BY g NULLS LAST")
    assert col(out, "r") == ["x,w", "y", "z"]
    assert col(engine.execute(
        "SELECT string_agg(CAST(v AS VARCHAR), '+') FROM sa "
        "WHERE v < 4")) == ["1+2+3"]
    # empty group set → NULL (SQL: no rows aggregated)
    assert col(engine.execute(
        "SELECT string_agg(s, ',') FROM sa WHERE v > 100")) == [None]


def test_date_trunc_timestamp(engine):
    ts = [datetime.datetime(2024, 3, 7, 14, 35, 42, 123456),
          datetime.datetime(2021, 11, 30, 23, 59, 59, 999999)]
    engine.register_table("tss", pa.table({
        "t": pa.array(ts, type=pa.timestamp("us"))}))
    out = engine.execute(
        "SELECT date_trunc('hour', t) AS h, date_trunc('day', t) AS d, "
        "date_trunc('minute', t) AS mi FROM tss")
    for i, v in enumerate(ts):
        assert out.column("h")[i].as_py() == v.replace(
            minute=0, second=0, microsecond=0)
        assert out.column("d")[i].as_py() == v.replace(
            hour=0, minute=0, second=0, microsecond=0)
        assert out.column("mi")[i].as_py() == v.replace(
            second=0, microsecond=0)
