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
