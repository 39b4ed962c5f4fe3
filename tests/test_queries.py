"""Broad SQL behavior coverage: aggregates, joins, expressions, set ops.

Covers the full DataFusion-path capability surface the reference reaches
(SURVEY §2.1 'Operators NOT custom-implemented') natively.
"""

import math

import pyarrow as pa
import pytest


@pytest.fixture()
def sales_engine(engine):
    engine.register_table("sales", pa.table({
        "region": ["east", "west", "east", "west", "east", None],
        "amount": pa.array([10, 20, 30, None, 50, 60], type=pa.int64()),
        "qty": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], type=pa.float64()),
    }))
    engine.register_table("regions", pa.table({
        "region": ["east", "west", "north"],
        "manager": ["Ann", "Bob", "Cal"],
    }))
    return engine


def rows(t, *cols):
    return list(zip(*[t.column(c).to_pylist() for c in cols]))


# ---------------- aggregates ----------------

def test_grouped_aggregate(sales_engine):
    out = sales_engine.execute(
        "SELECT region, sum(amount) AS s, count(*) AS c, count(amount) AS ca, "
        "avg(amount) AS a, min(amount) AS mn, max(amount) AS mx "
        "FROM sales GROUP BY region ORDER BY region NULLS LAST")
    assert rows(out, "region", "s", "c", "ca", "mn", "mx") == [
        ("east", 90, 3, 3, 10, 50),
        ("west", 20, 2, 1, 20, 20),
        (None, 60, 1, 1, 60, 60),
    ]
    assert out.column("a").to_pylist() == [30.0, 20.0, 60.0]


def test_ungrouped_aggregate(sales_engine):
    out = sales_engine.execute(
        "SELECT sum(amount), count(*), count(amount), avg(amount), "
        "min(amount), max(amount) FROM sales")
    assert out.num_rows == 1
    r = [c[0].as_py() for c in out.columns]
    assert r == [170, 6, 5, 34.0, 10, 60]


def test_empty_aggregate(engine):
    engine.register_table("e", pa.table({"x": pa.array([], type=pa.int64())}))
    out = engine.execute("SELECT count(*), sum(x), min(x) FROM e")
    assert [c[0].as_py() for c in out.columns] == [0, None, None]


def test_count_distinct(sales_engine):
    out = sales_engine.execute(
        "SELECT count(DISTINCT region) FROM sales")
    assert out.column(0)[0].as_py() == 2
    out2 = sales_engine.execute(
        "SELECT region, count(DISTINCT amount) AS d FROM sales GROUP BY region "
        "ORDER BY region NULLS LAST")
    assert rows(out2, "region", "d") == [("east", 3), ("west", 1), (None, 1)]


def test_having(sales_engine):
    out = sales_engine.execute(
        "SELECT region, sum(amount) AS s FROM sales GROUP BY region "
        "HAVING sum(amount) > 30 ORDER BY s DESC")
    assert rows(out, "region", "s") == [("east", 90), (None, 60)]


def test_group_by_expression_and_ordinal(sales_engine):
    out = sales_engine.execute(
        "SELECT amount % 20 AS bucket, count(*) AS c FROM sales "
        "GROUP BY 1 ORDER BY bucket NULLS LAST")
    assert rows(out, "bucket", "c") == [(0, 2), (10, 3), (None, 1)]


def test_stddev_var(engine):
    engine.register_table("v", pa.table({"x": [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]}))
    out = engine.execute("SELECT var(x), stddev(x) FROM v")
    assert abs(out.column(0)[0].as_py() - 32.0 / 7.0) < 1e-9
    assert abs(out.column(1)[0].as_py() - math.sqrt(32.0 / 7.0)) < 1e-9


def test_agg_expression_output(sales_engine):
    out = sales_engine.execute(
        "SELECT region, sum(amount) * 2 + count(*) AS z FROM sales "
        "WHERE region IS NOT NULL GROUP BY region ORDER BY region")
    assert rows(out, "region", "z") == [("east", 183), ("west", 42)]


# ---------------- joins ----------------

def test_inner_join(sales_engine):
    out = sales_engine.execute(
        "SELECT s.region, s.amount, r.manager FROM sales s "
        "JOIN regions r ON s.region = r.region ORDER BY s.amount NULLS LAST")
    got = rows(out, "region", "amount", "manager")
    assert got == [("east", 10, "Ann"), ("west", 20, "Bob"),
                   ("east", 30, "Ann"), ("east", 50, "Ann"),
                   ("west", None, "Bob")]


def test_left_join(sales_engine):
    out = sales_engine.execute(
        "SELECT s.amount, r.manager FROM sales s LEFT JOIN regions r "
        "ON s.region = r.region ORDER BY s.amount NULLS LAST")
    assert rows(out, "amount", "manager") == [
        (10, "Ann"), (20, "Bob"), (30, "Ann"), (50, "Ann"),
        (60, None), (None, "Bob")]


def test_right_join(sales_engine):
    out = sales_engine.execute(
        "SELECT s.amount, r.manager FROM sales s RIGHT JOIN regions r "
        "ON s.region = r.region ORDER BY r.manager, s.amount NULLS LAST")
    assert rows(out, "amount", "manager") == [
        (10, "Ann"), (30, "Ann"), (50, "Ann"), (20, "Bob"), (None, "Bob"),
        (None, "Cal")]


def test_full_join(engine):
    engine.register_table("a", pa.table({"k": [1, 2, 3], "va": [10, 20, 30]}))
    engine.register_table("b", pa.table({"k": [2, 3, 4], "vb": [200, 300, 400]}))
    out = engine.execute(
        "SELECT a.k, va, vb FROM a FULL JOIN b ON a.k = b.k "
        "ORDER BY coalesce(va, vb)")
    assert rows(out, "k", "va", "vb") == [
        (1, 10, None), (2, 20, 200), (3, 30, 300), (None, None, 400)]


def test_join_duplicate_build_keys(engine):
    engine.register_table("f", pa.table({"k": [1, 1, 2], "x": [1, 2, 3]}))
    engine.register_table("d", pa.table({"k": [1, 1, 3], "y": [10, 20, 30]}))
    out = engine.execute(
        "SELECT x, y FROM f JOIN d ON f.k = d.k ORDER BY x, y")
    assert rows(out, "x", "y") == [(1, 10), (1, 20), (2, 10), (2, 20)]


def test_cross_join(engine):
    engine.register_table("l", pa.table({"x": [1, 2]}))
    engine.register_table("r", pa.table({"y": ["a", "b"]}))
    out = engine.execute("SELECT x, y FROM l CROSS JOIN r ORDER BY x, y")
    assert rows(out, "x", "y") == [(1, "a"), (1, "b"), (2, "a"), (2, "b")]


def test_join_null_keys_never_match(engine):
    engine.register_table("n1", pa.table({"k": [1, None], "x": [1, 2]}))
    engine.register_table("n2", pa.table({"k": [1, None], "y": [10, 20]}))
    out = engine.execute("SELECT x, y FROM n1 JOIN n2 ON n1.k = n2.k")
    assert rows(out, "x", "y") == [(1, 10)]


def test_join_residual_condition(engine):
    engine.register_table("j1", pa.table({"k": [1, 1, 2], "x": [5, 15, 25]}))
    engine.register_table("j2", pa.table({"k": [1, 2], "lo": [10, 20]}))
    out = engine.execute(
        "SELECT x, lo FROM j1 JOIN j2 ON j1.k = j2.k AND x > lo ORDER BY x")
    assert rows(out, "x", "lo") == [(15, 10), (25, 20)]


def test_join_on_strings(engine):
    engine.register_table("s1", pa.table({"s": ["a", "b", "c"], "x": [1, 2, 3]}))
    engine.register_table("s2", pa.table({"s": ["b", "c", "d"], "y": [20, 30, 40]}))
    out = engine.execute("SELECT x, y FROM s1 JOIN s2 ON s1.s = s2.s ORDER BY x")
    assert rows(out, "x", "y") == [(2, 20), (3, 30)]


def test_using_join_and_star(engine):
    engine.register_table("u1", pa.table({"id": [1, 2], "a": [10, 20]}))
    engine.register_table("u2", pa.table({"id": [2, 3], "b": [200, 300]}))
    out = engine.execute("SELECT * FROM u1 JOIN u2 USING (id) ORDER BY a")
    assert out.column_names == ["id", "a", "right_id", "b"]


def test_multi_key_join(engine):
    engine.register_table("m1", pa.table({
        "k1": pa.array([1, 1, 2], type=pa.int32()),
        "k2": pa.array([10, 20, 10], type=pa.int32()), "x": [1, 2, 3]}))
    engine.register_table("m2", pa.table({
        "k1": pa.array([1, 2], type=pa.int32()),
        "k2": pa.array([20, 10], type=pa.int32()), "y": [100, 200]}))
    out = engine.execute(
        "SELECT x, y FROM m1 JOIN m2 ON m1.k1 = m2.k1 AND m1.k2 = m2.k2 "
        "ORDER BY x")
    assert rows(out, "x", "y") == [(2, 100), (3, 200)]


# ---------------- expressions ----------------

def test_arithmetic_and_division(engine):
    engine.register_table("t", pa.table({"a": [7, -7, 5], "b": [2, 2, 0]}))
    out = engine.execute("SELECT a / b AS q, a % b AS m, a * 1.0 / 2 AS f FROM t")
    assert out.column("q").to_pylist() == [3, -3, None]   # truncating; /0 → NULL
    assert out.column("m").to_pylist() == [1, -1, None]
    assert out.column("f").to_pylist() == [3.5, -3.5, 2.5]


def test_case_coalesce_nullif(engine):
    engine.register_table("t", pa.table({"x": [1, None, 3]}))
    out = engine.execute(
        "SELECT CASE WHEN x > 1 THEN 'big' WHEN x = 1 THEN 'one' ELSE 'null' END AS c, "
        "coalesce(x, -1) AS co, nullif(x, 3) AS nf FROM t")
    assert out.column("c").to_pylist() == ["one", "null", "big"]
    assert out.column("co").to_pylist() == [1, -1, 3]
    assert out.column("nf").to_pylist() == [1, None, None]


def test_in_between_like(engine):
    engine.register_table("t", pa.table({
        "x": [1, 2, 3, 4], "s": ["apple", "banana", "cherry", "apricot"]}))
    out = engine.execute(
        "SELECT x FROM t WHERE x IN (1, 3) OR x BETWEEN 4 AND 9 ORDER BY x")
    assert out.column("x").to_pylist() == [1, 3, 4]
    out2 = engine.execute("SELECT s FROM t WHERE s LIKE 'ap%' ORDER BY s")
    assert out2.column("s").to_pylist() == ["apple", "apricot"]
    out3 = engine.execute("SELECT s FROM t WHERE s NOT LIKE '%a%' ORDER BY s")
    assert out3.column("s").to_pylist() == ["cherry"]


def test_three_valued_logic(engine):
    engine.register_table("t", pa.table({"x": [1, None, 3]}))
    # NULL comparisons are NULL → filtered out
    out = engine.execute("SELECT x FROM t WHERE x > 0 OR x < 100 ORDER BY x")
    assert out.column("x").to_pylist() == [1, 3]
    out2 = engine.execute("SELECT x FROM t WHERE x IS NULL")
    assert out2.column("x").to_pylist() == [None]
    out3 = engine.execute("SELECT x IS DISTINCT FROM 1 AS d FROM t ORDER BY x NULLS LAST")
    assert out3.column("d").to_pylist() == [False, True, True]


def test_string_functions(engine):
    engine.register_table("t", pa.table({"s": ["Hello", "world", None]}))
    out = engine.execute(
        "SELECT upper(s) AS u, lower(s) AS l, length(s) AS n, "
        "substr(s, 2, 3) AS sub, s || '!' AS exc FROM t")
    assert out.column("u").to_pylist() == ["HELLO", "WORLD", None]
    assert out.column("l").to_pylist() == ["hello", "world", None]
    assert out.column("n").to_pylist() == [5, 5, None]
    assert out.column("sub").to_pylist() == ["ell", "orl", None]
    assert out.column("exc").to_pylist() == ["Hello!", "world!", None]


def test_string_comparison_with_literal(engine):
    engine.register_table("t", pa.table({"s": ["apple", "banana", "cherry"]}))
    out = engine.execute("SELECT s FROM t WHERE s > 'apple' ORDER BY s")
    assert out.column("s").to_pylist() == ["banana", "cherry"]
    out2 = engine.execute("SELECT s FROM t WHERE s = 'banana'")
    assert out2.column("s").to_pylist() == ["banana"]
    out3 = engine.execute("SELECT s FROM t WHERE s <> 'kiwi' ORDER BY s")
    assert out3.num_rows == 3


def test_cast(engine):
    engine.register_table("t", pa.table({"s": ["1", "2.5", "x"], "f": [1.9, -1.9, 0.5]}))
    out = engine.execute("SELECT TRY_CAST(s AS DOUBLE) AS d, CAST(f AS INT) AS i FROM t")
    assert out.column("d").to_pylist() == [1.0, 2.5, None]
    assert out.column("i").to_pylist() == [1, -1, 0]


def test_math_functions(engine):
    engine.register_table("t", pa.table({"x": [4.0, 9.0]}))
    out = engine.execute("SELECT sqrt(x) AS r, abs(-x) AS a, power(x, 2) AS p FROM t")
    assert out.column("r").to_pylist() == [2.0, 3.0]
    assert out.column("a").to_pylist() == [4.0, 9.0]
    # XLA lowers pow via exp/log on some backends — accept float rounding
    for got, want in zip(out.column("p").to_pylist(), [16.0, 81.0]):
        assert abs(got - want) < 1e-9


# ---------------- sorting / limits / distinct / set ops ----------------

def test_order_by_multi_key(engine):
    engine.register_table("t", pa.table({
        "a": [1, 2, 1, 2], "b": [9, 8, 7, 6]}))
    out = engine.execute("SELECT a, b FROM t ORDER BY a ASC, b DESC")
    assert rows(out, "a", "b") == [(1, 9), (1, 7), (2, 8), (2, 6)]


def test_order_by_alias_and_expression(engine):
    engine.register_table("t", pa.table({"x": [3, 1, 2]}))
    out = engine.execute("SELECT x * 10 AS y FROM t ORDER BY y")
    assert out.column("y").to_pylist() == [10, 20, 30]
    out2 = engine.execute("SELECT x FROM t ORDER BY x % 2, x")
    assert out2.column("x").to_pylist() == [2, 1, 3]


def test_limit_offset(engine):
    engine.register_table("t", pa.table({"x": list(range(10))}))
    out = engine.execute("SELECT x FROM t ORDER BY x DESC LIMIT 3")
    assert out.column("x").to_pylist() == [9, 8, 7]
    out2 = engine.execute("SELECT x FROM t ORDER BY x LIMIT 2 OFFSET 5")
    assert out2.column("x").to_pylist() == [5, 6]


def test_distinct(engine):
    engine.register_table("t", pa.table({"x": [1, 2, 1, 3, 2], "y": ["a", "b", "a", "c", "b"]}))
    out = engine.execute("SELECT DISTINCT x, y FROM t ORDER BY x")
    assert rows(out, "x", "y") == [(1, "a"), (2, "b"), (3, "c")]


def test_union(engine):
    engine.register_table("t1", pa.table({"x": [1, 2]}))
    engine.register_table("t2", pa.table({"x": [2, 3]}))
    out = engine.execute("SELECT x FROM t1 UNION ALL SELECT x FROM t2 ORDER BY x")
    assert out.column("x").to_pylist() == [1, 2, 2, 3]
    out2 = engine.execute("SELECT x FROM t1 UNION SELECT x FROM t2 ORDER BY x")
    assert out2.column("x").to_pylist() == [1, 2, 3]


def test_union_strings(engine):
    engine.register_table("t1", pa.table({"s": ["b", "a"]}))
    engine.register_table("t2", pa.table({"s": ["c", "a"]}))
    out = engine.execute("SELECT s FROM t1 UNION ALL SELECT s FROM t2 ORDER BY s")
    assert out.column("s").to_pylist() == ["a", "a", "b", "c"]


# ---------------- subqueries / CTEs / statements ----------------

def test_cte(engine):
    engine.register_table("t", pa.table({"x": [1, 2, 3, 4]}))
    out = engine.execute(
        "WITH big AS (SELECT x FROM t WHERE x > 2) "
        "SELECT sum(x) AS s FROM big")
    assert out.column("s")[0].as_py() == 7


def test_derived_table(engine):
    engine.register_table("t", pa.table({"x": [1, 2, 3]}))
    out = engine.execute(
        "SELECT y + 1 AS z FROM (SELECT x * 2 AS y FROM t) d ORDER BY z")
    assert out.column("z").to_pylist() == [3, 5, 7]


def test_scalar_subquery(engine):
    engine.register_table("t", pa.table({"x": [1, 2, 3, 4]}))
    out = engine.execute("SELECT x FROM t WHERE x > (SELECT avg(x) FROM t) ORDER BY x")
    assert out.column("x").to_pylist() == [3, 4]


def test_show_create_drop(engine):
    engine.register_table("t", pa.table({"x": [1, 2, 3]}))
    assert engine.execute("SHOW TABLES").column("table_name").to_pylist() == ["t"]
    engine.execute("CREATE TABLE t2 AS SELECT x * 2 AS y FROM t")
    out = engine.execute("SELECT sum(y) AS s FROM t2")
    assert out.column("s")[0].as_py() == 12
    engine.execute("DROP TABLE t2")
    assert "t2" not in engine.table_names()


def test_explain(engine):
    engine.register_table("t", pa.table({"x": [1]}))
    text = engine.explain("SELECT x FROM t WHERE x > 0 ORDER BY x")
    assert "Sort" in text and "Filter" in text and "Scan" in text


def test_custom_udf(engine):
    engine.register_table("t", pa.table({"s": ["ab", "cd"]}))
    engine.register_udf("exclaim", lambda s: s + "!")
    out = engine.execute("SELECT exclaim(s) AS e FROM t ORDER BY e")
    assert out.column("e").to_pylist() == ["ab!", "cd!"]


def test_result_cache(engine):
    engine.register_table("t", pa.table({"x": [1, 2, 3]}))
    q = "SELECT sum(x) AS s FROM t"
    engine.execute(q)
    engine.execute(q)
    assert engine.last_metrics.cache_hit
    # registration invalidates
    engine.register_table("t", pa.table({"x": [10]}))
    out = engine.execute(q)
    assert out.column("s")[0].as_py() == 10


def test_in_subquery_semi_join(engine):
    engine.register_table("t", pa.table({"x": [1, 2, 3, 4]}))
    engine.register_table("s", pa.table({"y": [2, 4, 9]}))
    out = engine.execute("SELECT x FROM t WHERE x IN (SELECT y FROM s) ORDER BY x")
    assert out.column("x").to_pylist() == [2, 4]
    out2 = engine.execute(
        "SELECT x FROM t WHERE x NOT IN (SELECT y FROM s) ORDER BY x")
    assert out2.column("x").to_pylist() == [1, 3]


def test_not_in_null_aware(engine):
    engine.register_table("t", pa.table({"x": [1, 2, None]}))
    engine.register_table("s", pa.table({"y": [2, None]}))
    # any NULL in the subquery: NOT IN never TRUE
    out = engine.execute("SELECT x FROM t WHERE x NOT IN (SELECT y FROM s)")
    assert out.column("x").to_pylist() == []
    # empty subquery: NOT IN is TRUE for every row
    engine.register_table("e", pa.table({"y": pa.array([], type=pa.int64())}))
    out2 = engine.execute(
        "SELECT x FROM t WHERE x NOT IN (SELECT y FROM e) ORDER BY x NULLS LAST")
    assert out2.column("x").to_pylist() == [1, 2, None]


def test_exists_subquery(engine):
    engine.register_table("t", pa.table({"x": [1, 2]}))
    engine.register_table("s", pa.table({"y": [5]}))
    engine.register_table("e", pa.table({"y": pa.array([], type=pa.int64())}))
    assert engine.execute(
        "SELECT x FROM t WHERE EXISTS (SELECT y FROM s)").num_rows == 2
    assert engine.execute(
        "SELECT x FROM t WHERE EXISTS (SELECT y FROM e)").num_rows == 0
    assert engine.execute(
        "SELECT x FROM t WHERE NOT EXISTS (SELECT y FROM e)").num_rows == 2


def test_in_subquery_strings(engine):
    engine.register_table("t", pa.table({"s": ["a", "b", "c"]}))
    engine.register_table("sub", pa.table({"v": ["b", "c", "z"]}))
    out = engine.execute(
        "SELECT s FROM t WHERE s IN (SELECT v FROM sub) ORDER BY s")
    assert out.column("s").to_pylist() == ["b", "c"]


def test_intersect_except(engine):
    engine.register_table("t1", pa.table({"x": [1, 2, 3, None, 2]}))
    engine.register_table("t2", pa.table({"x": [2, None, 5]}))
    out = engine.execute(
        "SELECT x FROM t1 INTERSECT SELECT x FROM t2 ORDER BY x NULLS LAST")
    assert out.column("x").to_pylist() == [2, None]
    out2 = engine.execute(
        "SELECT x FROM t1 EXCEPT SELECT x FROM t2 ORDER BY x")
    assert out2.column("x").to_pylist() == [1, 3]


def test_intersect_strings(engine):
    engine.register_table("a1", pa.table({"s": ["x", "y", "z"]}))
    engine.register_table("a2", pa.table({"s": ["y", "z", "w"]}))
    out = engine.execute("SELECT s FROM a1 INTERSECT SELECT s FROM a2 ORDER BY s")
    assert out.column("s").to_pylist() == ["y", "z"]


def test_dates(engine):
    import datetime
    engine.register_table("orders_t", pa.table({
        "d": pa.array([datetime.date(1998, 9, 2), datetime.date(1997, 1, 15),
                       datetime.date(1998, 12, 31), None], type=pa.date32()),
        "v": [1, 2, 3, 4],
    }))
    out = engine.execute(
        "SELECT v FROM orders_t WHERE d < '1998-09-02' ORDER BY v")
    assert out.column("v").to_pylist() == [2]
    out2 = engine.execute(
        "SELECT year(d) AS y, month(d) AS m, day(d) AS dd FROM orders_t "
        "WHERE d IS NOT NULL ORDER BY d")
    assert rows(out2, "y", "m", "dd") == [(1997, 1, 15), (1998, 9, 2),
                                          (1998, 12, 31)]
    out3 = engine.execute(
        "SELECT year(d) AS y, count(*) AS c FROM orders_t "
        "WHERE d IS NOT NULL GROUP BY year(d) ORDER BY y")
    assert rows(out3, "y", "c") == [(1997, 1), (1998, 2)]


def test_timestamps(engine):
    import datetime
    engine.register_table("ev", pa.table({
        "ts": pa.array([datetime.datetime(2020, 1, 1, 10, 0),
                        datetime.datetime(2021, 6, 15, 23, 59)],
                       type=pa.timestamp("us")),
        "x": [1, 2],
    }))
    out = engine.execute("SELECT x FROM ev WHERE ts > '2020-06-01' ORDER BY x")
    assert out.column("x").to_pylist() == [2]
    out2 = engine.execute("SELECT year(ts) AS y FROM ev ORDER BY y")
    assert out2.column("y").to_pylist() == [2020, 2021]


def test_explain_analyze(engine):
    engine.register_table("t", pa.table({"x": [1, 2, 3]}))
    out = engine.execute("EXPLAIN ANALYZE SELECT sum(x) FROM t")
    text = "\n".join(out.column("plan").to_pylist())
    assert "Aggregate" in text and "rows: 1" in text and "execution:" in text


def test_outer_join_with_residual(engine):
    engine.register_table("lo", pa.table({"k": [1, 1, 2, 3], "x": [5, 15, 25, 9]}))
    engine.register_table("ro", pa.table({"k": [1, 2, 4], "lim": [10, 20, 30]}))
    # LEFT: pairs failing the residual leave the probe row null-padded
    out = engine.execute(
        "SELECT x, lim FROM lo LEFT JOIN ro ON lo.k = ro.k AND x > lim "
        "ORDER BY x")
    assert rows(out, "x", "lim") == [
        (5, None), (9, None), (15, 10), (25, 20)]
    # RIGHT: build rows with no surviving pair re-surface
    out2 = engine.execute(
        "SELECT x, lim FROM lo RIGHT JOIN ro ON lo.k = ro.k AND x > lim "
        "ORDER BY lim, x NULLS LAST")
    assert rows(out2, "x", "lim") == [
        (15, 10), (25, 20), (None, 30)]
    # FULL combines both
    out3 = engine.execute(
        "SELECT x, lim FROM lo FULL JOIN ro ON lo.k = ro.k AND x > lim "
        "ORDER BY x NULLS LAST, lim NULLS LAST")
    assert rows(out3, "x", "lim") == [
        (5, None), (9, None), (15, 10), (25, 20), (None, 30)]


def test_typed_date_literals_and_intervals(engine):
    import datetime
    engine.register_table("dt", pa.table({
        "d": pa.array([datetime.date(1994, 6, 15), datetime.date(1995, 6, 15),
                       datetime.date(1996, 1, 31)], type=pa.date32()),
        "v": [1, 2, 3],
    }))
    out = engine.execute(
        "SELECT v FROM dt WHERE d >= DATE '1994-01-01' "
        "AND d < DATE '1994-01-01' + INTERVAL '1' YEAR ORDER BY v")
    assert out.column("v").to_pylist() == [1]
    out2 = engine.execute(
        "SELECT v FROM dt WHERE d - INTERVAL '6 months' >= DATE '1995-01-01' "
        "ORDER BY v")
    assert out2.column("v").to_pylist() == [3]
    # calendar clamping: Jan 31 + 1 month = Feb 29 (1996 is a leap year)
    out3 = engine.execute(
        "SELECT year(d + INTERVAL '1' MONTH) AS y, month(d + INTERVAL '1' MONTH) AS m, "
        "day(d + INTERVAL '1' MONTH) AS dd FROM dt WHERE v = 3")
    assert rows(out3, "y", "m", "dd") == [(1996, 2, 29)]


def test_correlated_exists(engine):
    engine.register_table("cust", pa.table({"id": [1, 2, 3], "nm": ["a", "b", "c"]}))
    engine.register_table("ords", pa.table({
        "cid": [1, 1, 3], "total": [5, 50, 8]}))
    out = engine.execute(
        "SELECT nm FROM cust WHERE EXISTS "
        "(SELECT 1 FROM ords WHERE ords.cid = cust.id AND total > 10) ORDER BY nm")
    assert out.column("nm").to_pylist() == ["a"]
    out2 = engine.execute(
        "SELECT nm FROM cust WHERE NOT EXISTS "
        "(SELECT 1 FROM ords WHERE ords.cid = cust.id) ORDER BY nm")
    assert out2.column("nm").to_pylist() == ["b"]


def test_correlated_in(engine):
    engine.register_table("t1", pa.table({"g": [1, 1, 2], "x": [10, 20, 30]}))
    engine.register_table("t2", pa.table({"g": [1, 1, 2], "y": [10, 99, 31]}))
    out = engine.execute(
        "SELECT x FROM t1 WHERE x IN (SELECT y FROM t2 WHERE t2.g = t1.g) "
        "ORDER BY x")
    assert out.column("x").to_pylist() == [10]


def test_correlated_scalar_aggregate_subquery(engine):
    # TPC-H Q17 shape: per-key threshold from a correlated aggregate
    engine.register_table("li", pa.table({
        "pk": [1, 1, 1, 2, 2, 3],
        "qty": [1, 10, 100, 4, 6, 9],
    }))
    out = engine.execute(
        "SELECT pk, qty FROM li l1 WHERE qty < "
        "(SELECT 0.5 * avg(qty) FROM li l2 WHERE l2.pk = l1.pk) "
        "ORDER BY pk, qty")
    # pk=1 avg=37 → threshold 18.5 → qty 1,10 pass; pk=2 avg=5 → 2.5 none;
    # pk=3 single row 9 < 4.5 no
    assert rows(out, "pk", "qty") == [(1, 1), (1, 10)]


def test_extract_units(engine):
    import datetime
    engine.register_table("ex", pa.table({
        "ts": pa.array([datetime.datetime(2021, 8, 17, 14, 35, 9)],
                       type=pa.timestamp("us")),
        "d": pa.array([datetime.date(2020, 2, 29)], type=pa.date32()),
    }))
    out = engine.execute(
        "SELECT EXTRACT(year FROM ts) y, EXTRACT(quarter FROM ts) q, "
        "EXTRACT(hour FROM ts) h, EXTRACT(second FROM ts) s, "
        "EXTRACT(dow FROM d) dw, EXTRACT(doy FROM d) dy FROM ex")
    assert rows(out, "y", "q", "h", "s", "dw", "dy") == [
        (2021, 3, 14, 9, 6, 60)]


def test_values_table_constructor(engine):
    out = engine.execute(
        "SELECT c1, c2 FROM (VALUES (1, 'a'), (2, 'b'), (-3, NULL)) "
        "AS v(c1, c2) ORDER BY c1")
    assert rows(out, "c1", "c2") == [(-3, None), (1, "a"), (2, "b")]
    out2 = engine.execute(
        "SELECT t.x, v.c2 FROM (VALUES (1, 'one'), (2, 'two')) v(c1, c2) "
        "JOIN (VALUES (1, 10), (2, 20)) t(c1, x) ON v.c1 = t.c1 ORDER BY x")
    assert rows(out2, "x", "c2") == [(10, "one"), (20, "two")]


def test_string_concat_columns(engine):
    engine.register_table("cc", pa.table({
        "a": ["x", "y", None], "b": ["1", "2", "3"]}))
    out = engine.execute("SELECT a || '-' || b AS j FROM cc ORDER BY j NULLS LAST")
    assert out.column("j").to_pylist() == ["x-1", "y-2", None]


def test_join_on_expression_keys(engine):
    import pyarrow as pa
    engine.register_table("u8", pa.table({
        "name": ["Alice", "Bob", "Charlie", "Diana", "Eve"],
        "age": pa.array([25, 30, 35, 28, 32], type=pa.int32()),
    }))
    out = engine.execute(
        "SELECT u.name, v.name AS friend FROM u8 AS u LEFT JOIN u8 AS v "
        "ON u.age % 2 = v.age % 2 AND v.age > u.age ORDER BY u.name, friend")
    assert list(zip(out.column("name").to_pylist(),
                    out.column("friend").to_pylist())) == [
        ("Alice", "Charlie"), ("Bob", "Eve"), ("Charlie", None),
        ("Diana", "Bob"), ("Diana", "Eve"), ("Eve", None)]


def test_join_no_equi_keys(engine):
    import pyarrow as pa
    engine.register_table("u9", pa.table({
        "name": ["Alice", "Bob", "Charlie"],
        "age": pa.array([25, 30, 35], type=pa.int32()),
    }))
    out = engine.execute(
        "SELECT a.name, b.name AS older FROM u9 AS a JOIN u9 AS b "
        "ON b.age > a.age ORDER BY a.name, older")
    assert list(zip(out.column("name").to_pylist(),
                    out.column("older").to_pylist())) == [
        ("Alice", "Bob"), ("Alice", "Charlie"), ("Bob", "Charlie")]
    out = engine.execute(
        "SELECT a.name, b.name AS older FROM u9 AS a LEFT JOIN u9 AS b "
        "ON b.age > a.age ORDER BY a.name, older")
    assert list(zip(out.column("name").to_pylist(),
                    out.column("older").to_pylist())) == [
        ("Alice", "Bob"), ("Alice", "Charlie"), ("Bob", "Charlie"),
        ("Charlie", None)]


def test_median_quantile(engine):
    import pyarrow as pa
    engine.register_table("mq", pa.table({
        "g": ["a", "a", "a", "b", "b", "c"],
        "x": pa.array([10, 30, 20, 5, 15, 7], type=pa.int64()),
        "y": pa.array([1.0, None, 3.0, 2.0, None, None], type=pa.float64()),
    }))
    out = engine.execute(
        "SELECT g, median(x) AS m, quantile(x, 0.0) AS lo, "
        "quantile(x, 1.0) AS hi FROM mq GROUP BY g ORDER BY g")
    assert out.column("m").to_pylist() == [20.0, 10.0, 7.0]
    assert out.column("lo").to_pylist() == [10.0, 5.0, 7.0]
    assert out.column("hi").to_pylist() == [30.0, 15.0, 7.0]
    # even-count interpolation + nulls skipped
    out = engine.execute("SELECT median(x) AS m, median(y) AS my FROM mq")
    assert out.column("m").to_pylist() == [12.5]
    assert out.column("my").to_pylist() == [2.0]
    # quantile interpolation: 0.25 over [5,7,10,15,20,30]
    out = engine.execute("SELECT quantile(x, 0.25) AS q FROM mq")
    assert out.column("q").to_pylist() == [7.75]


def test_median_empty_and_errors(engine):
    import pyarrow as pa
    import pytest as _pytest
    from igloo_tpu.errors import BindError
    engine.register_table("me", pa.table({"x": pa.array([1, 2, 3])}))
    out = engine.execute("SELECT median(x) AS m FROM me WHERE x > 100")
    assert out.column("m").to_pylist() == [None]
    with _pytest.raises(BindError, match="fraction"):
        engine.execute("SELECT quantile(x, 1.5) FROM me")
