"""Window function tests vs pandas-computed expectations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def wengine(engine):
    engine.register_table("t", pa.table({
        "dept": ["a", "a", "a", "b", "b", "c"],
        "emp": ["e1", "e2", "e3", "e4", "e5", "e6"],
        "pay": pa.array([10, 30, 20, 40, 40, 50], type=pa.int64()),
    }))
    return engine


def rows(t, *cols):
    return list(zip(*[t.column(c).to_pylist() for c in cols]))


def test_row_number(wengine):
    out = wengine.execute(
        "SELECT emp, row_number() OVER (PARTITION BY dept ORDER BY pay DESC) AS rn "
        "FROM t ORDER BY emp")
    assert rows(out, "emp", "rn") == [
        ("e1", 3), ("e2", 1), ("e3", 2), ("e4", 1), ("e5", 2), ("e6", 1)]


def test_rank_dense_rank(wengine):
    out = wengine.execute(
        "SELECT emp, rank() OVER (PARTITION BY dept ORDER BY pay) AS r, "
        "dense_rank() OVER (PARTITION BY dept ORDER BY pay) AS dr "
        "FROM t ORDER BY emp")
    assert rows(out, "emp", "r", "dr") == [
        ("e1", 1, 1), ("e2", 3, 3), ("e3", 2, 2),
        ("e4", 1, 1), ("e5", 1, 1), ("e6", 1, 1)]


def test_running_sum_with_peers(wengine):
    out = wengine.execute(
        "SELECT emp, sum(pay) OVER (PARTITION BY dept ORDER BY pay) AS rs "
        "FROM t ORDER BY emp")
    # dept b has tied pay=40: peers both get the full 80
    assert rows(out, "emp", "rs") == [
        ("e1", 10), ("e2", 60), ("e3", 30), ("e4", 80), ("e5", 80), ("e6", 50)]


def test_partition_total_without_order(wengine):
    out = wengine.execute(
        "SELECT emp, sum(pay) OVER (PARTITION BY dept) AS tot, "
        "count(*) OVER (PARTITION BY dept) AS c, "
        "avg(pay) OVER (PARTITION BY dept) AS a "
        "FROM t ORDER BY emp")
    assert rows(out, "emp", "tot", "c") == [
        ("e1", 60, 3), ("e2", 60, 3), ("e3", 60, 3),
        ("e4", 80, 2), ("e5", 80, 2), ("e6", 50, 1)]
    assert out.column("a").to_pylist() == [20.0, 20.0, 20.0, 40.0, 40.0, 50.0]


def test_lag_lead(wengine):
    out = wengine.execute(
        "SELECT emp, lag(pay) OVER (PARTITION BY dept ORDER BY pay) AS lg, "
        "lead(pay, 1) OVER (PARTITION BY dept ORDER BY pay) AS ld "
        "FROM t ORDER BY emp")
    assert rows(out, "emp", "lg", "ld") == [
        ("e1", None, 20), ("e2", 20, None), ("e3", 10, 30),
        ("e4", None, 40), ("e5", 40, None), ("e6", None, None)]


def test_first_value_string(wengine):
    out = wengine.execute(
        "SELECT emp, first_value(emp) OVER (PARTITION BY dept ORDER BY pay DESC) AS top "
        "FROM t ORDER BY emp")
    assert rows(out, "emp", "top") == [
        ("e1", "e2"), ("e2", "e2"), ("e3", "e2"),
        ("e4", "e4"), ("e5", "e4"), ("e6", "e6")]


def test_window_no_partition(wengine):
    out = wengine.execute(
        "SELECT emp, row_number() OVER (ORDER BY pay, emp) AS rn FROM t ORDER BY rn")
    assert out.column("emp").to_pylist() == ["e1", "e3", "e2", "e4", "e5", "e6"]


def test_window_over_aggregate(wengine):
    out = wengine.execute(
        "SELECT dept, sum(pay) AS s, "
        "rank() OVER (ORDER BY sum(pay) DESC) AS r "
        "FROM t GROUP BY dept ORDER BY dept")
    assert rows(out, "dept", "s", "r") == [("a", 60, 2), ("b", 80, 1),
                                           ("c", 50, 3)]


def test_window_expression(wengine):
    out = wengine.execute(
        "SELECT emp, pay - avg(pay) OVER (PARTITION BY dept) AS diff "
        "FROM t ORDER BY emp")
    assert out.column("diff").to_pylist() == [-10.0, 10.0, 0.0, 0.0, 0.0, 0.0]


def test_window_misplaced_errors(wengine):
    from igloo_tpu.errors import BindError
    with pytest.raises(BindError, match="SELECT list"):
        wengine.execute(
            "SELECT emp FROM t WHERE row_number() OVER (ORDER BY pay) = 1")


# ---------------------------------------------------------------------------
# ranking extensions + frames
# ---------------------------------------------------------------------------

def test_percent_rank_cume_dist(wengine):
    out = wengine.execute(
        "SELECT emp, percent_rank() OVER (PARTITION BY dept ORDER BY pay) AS pr, "
        "cume_dist() OVER (PARTITION BY dept ORDER BY pay) AS cd "
        "FROM t ORDER BY emp")
    # dept a: pays 10,20,30 -> pr 0,.5,1; dept b: 40,40 tied -> pr 0,0 cd 1,1
    assert rows(out, "emp", "pr", "cd") == [
        ("e1", 0.0, 1 / 3), ("e2", 1.0, 1.0), ("e3", 0.5, 2 / 3),
        ("e4", 0.0, 1.0), ("e5", 0.0, 1.0), ("e6", 0.0, 1.0)]


def test_ntile(engine):
    import pyarrow as pa
    engine.register_table("s", pa.table({"x": list(range(1, 11))}))
    out = engine.execute(
        "SELECT x, ntile(3) OVER (ORDER BY x) AS b FROM s ORDER BY x")
    # 10 rows, 3 buckets: sizes 4,3,3
    assert out.column("b").to_pylist() == [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    out = engine.execute(
        "SELECT x, ntile(20) OVER (ORDER BY x) AS b FROM s ORDER BY x")
    assert out.column("b").to_pylist() == list(range(1, 11))


def test_nth_value(wengine):
    out = wengine.execute(
        "SELECT emp, nth_value(emp, 2) OVER "
        "(PARTITION BY dept ORDER BY pay "
        " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nv "
        "FROM t ORDER BY emp")
    assert rows(out, "emp", "nv") == [
        ("e1", "e3"), ("e2", "e3"), ("e3", "e3"),
        ("e4", "e5"), ("e5", "e5"), ("e6", None)]


def test_rows_frame_moving_sum_avg(engine):
    import pyarrow as pa
    engine.register_table("s", pa.table({
        "g": ["a"] * 5 + ["b"] * 3,
        "x": [1, 2, 3, 4, 5, 10, 20, 30],
    }))
    out = engine.execute(
        "SELECT x, sum(x) OVER (PARTITION BY g ORDER BY x "
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS ms, "
        "avg(x) OVER (PARTITION BY g ORDER BY x "
        "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS ma "
        "FROM s ORDER BY g, x")
    assert out.column("ms").to_pylist() == [3, 6, 9, 12, 9, 30, 60, 50]
    assert out.column("ma").to_pylist() == [
        1.0, 1.5, 2.5, 3.5, 4.5, 10.0, 15.0, 25.0]


def test_rows_frame_min_max_bounded(engine):
    import pyarrow as pa
    engine.register_table("s", pa.table({
        "g": ["a"] * 6,
        "x": [5, 1, 4, 2, 6, 3],
        "ord": [1, 2, 3, 4, 5, 6],
    }))
    out = engine.execute(
        "SELECT ord, min(x) OVER (ORDER BY ord "
        "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS mn, "
        "max(x) OVER (ORDER BY ord "
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS mx "
        "FROM s ORDER BY ord")
    # x by ord: 5 1 4 2 6 3
    assert out.column("mn").to_pylist() == [1, 1, 1, 1, 2, 2]
    assert out.column("mx").to_pylist() == [5, 5, 4, 6, 6, 6]


def test_rows_frame_unbounded_following(engine):
    import pyarrow as pa
    engine.register_table("s", pa.table({
        "g": ["a", "a", "a", "b", "b"],
        "x": [3, 1, 2, 7, 5],
    }))
    out = engine.execute(
        "SELECT g, x, sum(x) OVER (PARTITION BY g ORDER BY x "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rs, "
        "min(x) OVER (PARTITION BY g ORDER BY x "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS mn, "
        "last_value(x) OVER (PARTITION BY g ORDER BY x "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv "
        "FROM s ORDER BY g, x")
    assert out.column("rs").to_pylist() == [6, 5, 3, 5 + 7, 7]
    assert out.column("mn").to_pylist() == [1, 2, 3, 5, 7]
    assert out.column("lv").to_pylist() == [3, 3, 3, 7, 7]


def test_rows_frame_empty(engine):
    import pyarrow as pa
    engine.register_table("s", pa.table({"x": [1, 2, 3]}))
    out = engine.execute(
        "SELECT x, sum(x) OVER (ORDER BY x "
        "ROWS BETWEEN 3 PRECEDING AND 2 PRECEDING) AS s2, "
        "count(*) OVER (ORDER BY x "
        "ROWS BETWEEN 3 PRECEDING AND 2 PRECEDING) AS c2 "
        "FROM s ORDER BY x")
    assert out.column("s2").to_pylist() == [None, None, 1]
    assert out.column("c2").to_pylist() == [0, 0, 1]


def test_rows_frame_shorthand(engine):
    import pyarrow as pa
    engine.register_table("s", pa.table({"x": [1, 2, 3, 4]}))
    out = engine.execute(
        "SELECT x, sum(x) OVER (ORDER BY x ROWS 2 PRECEDING) AS s "
        "FROM s ORDER BY x")
    assert out.column("s").to_pylist() == [1, 3, 6, 9]


def test_range_current_to_unbounded(wengine):
    out = wengine.execute(
        "SELECT emp, sum(pay) OVER (PARTITION BY dept ORDER BY pay "
        "RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rs "
        "FROM t ORDER BY emp")
    # reverse running sum, peers included: dept b ties both get 80
    assert rows(out, "emp", "rs") == [
        ("e1", 60), ("e2", 30), ("e3", 50),
        ("e4", 80), ("e5", 80), ("e6", 50)]


def test_multiple_over_clauses(wengine):
    out = wengine.execute(
        "SELECT emp, row_number() OVER (PARTITION BY dept ORDER BY pay) AS a, "
        "row_number() OVER (ORDER BY pay DESC, emp) AS b, "
        "sum(pay) OVER (PARTITION BY dept) AS c "
        "FROM t ORDER BY emp")
    assert rows(out, "emp", "a", "b") == [
        ("e1", 1, 6), ("e2", 3, 4), ("e3", 2, 5),
        ("e4", 1, 2), ("e5", 2, 3), ("e6", 1, 1)]
    assert out.column("c").to_pylist() == [60, 60, 60, 80, 80, 50]


def test_frame_on_ranking_errors(wengine):
    from igloo_tpu.errors import BindError
    with pytest.raises(BindError, match="frame"):
        wengine.execute(
            "SELECT rank() OVER (ORDER BY pay ROWS 1 PRECEDING) FROM t")


def test_range_numeric_offset_not_supported(wengine):
    from igloo_tpu.errors import NotSupportedError
    with pytest.raises(NotSupportedError, match="RANGE"):
        wengine.execute(
            "SELECT sum(pay) OVER (ORDER BY pay "
            "RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) FROM t")


def test_window_nulls_in_frame(engine):
    import pyarrow as pa
    engine.register_table("s", pa.table({
        "x": [1, 2, 3, 4],
        "v": pa.array([10, None, 30, None], type=pa.int64()),
    }))
    out = engine.execute(
        "SELECT x, sum(v) OVER (ORDER BY x "
        "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s, "
        "min(v) OVER (ORDER BY x "
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS mn "
        "FROM s ORDER BY x")
    assert out.column("s").to_pylist() == [10, 10, 30, 30]
    assert out.column("mn").to_pylist() == [10, 10, 30, 30]
