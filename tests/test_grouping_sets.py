"""ROLLUP / CUBE / GROUPING SETS (desugared to per-set aggregates +
UNION ALL; GROUPING() markers as per-branch literals)."""

import pyarrow as pa
import pytest


@pytest.fixture()
def gengine(engine):
    engine.register_table("t", pa.table({
        "g": ["a", "a", "b", "b", "b"],
        "h": [1, 2, 1, 1, 2],
        "x": [10, 20, 30, 40, 50],
    }))
    return engine


def rows(t, *cols):
    return list(zip(*[t.column(c).to_pylist() for c in cols]))


def test_rollup(gengine):
    out = gengine.execute(
        "SELECT g, h, sum(x) AS s FROM t GROUP BY ROLLUP(g, h) "
        "ORDER BY g NULLS LAST, h NULLS LAST")
    assert rows(out, "g", "h", "s") == [
        ("a", 1, 10), ("a", 2, 20), ("a", None, 30),
        ("b", 1, 70), ("b", 2, 50), ("b", None, 120),
        (None, None, 150)]


def test_cube(gengine):
    out = gengine.execute(
        "SELECT g, h, count(*) AS c FROM t GROUP BY CUBE(g, h) "
        "ORDER BY g NULLS LAST, h NULLS LAST")
    assert rows(out, "g", "h", "c") == [
        ("a", 1, 1), ("a", 2, 1), ("a", None, 2),
        ("b", 1, 2), ("b", 2, 1), ("b", None, 3),
        (None, 1, 3), (None, 2, 2), (None, None, 5)]


def test_grouping_sets_explicit(gengine):
    out = gengine.execute(
        "SELECT g, h, sum(x) AS s FROM t "
        "GROUP BY GROUPING SETS ((g, h), (), (h)) "
        "ORDER BY g NULLS LAST, h NULLS LAST")
    assert rows(out, "g", "h", "s") == [
        ("a", 1, 10), ("a", 2, 20), ("b", 1, 70), ("b", 2, 50),
        (None, 1, 80), (None, 2, 70), (None, None, 150)]


def test_grouping_function(gengine):
    out = gengine.execute(
        "SELECT g, grouping(g) AS gg, grouping(h) AS gh, sum(x) AS s "
        "FROM t GROUP BY ROLLUP(g, h) ORDER BY gg, gh, g, h")
    gg = out.column("gg").to_pylist()
    gh = out.column("gh").to_pylist()
    assert gg == [0, 0, 0, 0, 0, 0, 1]
    assert gh == [0, 0, 0, 0, 1, 1, 1]
    # the grand-total row
    assert out.column("s").to_pylist()[-1] == 150


def test_grouping_in_having(gengine):
    out = gengine.execute(
        "SELECT g, sum(x) AS s FROM t GROUP BY ROLLUP(g) "
        "HAVING grouping(g) = 1")
    assert rows(out, "g", "s") == [(None, 150)]


def test_mixed_plain_and_rollup(gengine):
    # GROUP BY a, ROLLUP(b) = sets {(a,b), (a)}
    out = gengine.execute(
        "SELECT g, h, sum(x) AS s FROM t GROUP BY g, ROLLUP(h) "
        "ORDER BY g, h NULLS LAST")
    assert rows(out, "g", "h", "s") == [
        ("a", 1, 10), ("a", 2, 20), ("a", None, 30),
        ("b", 1, 70), ("b", 2, 50), ("b", None, 120)]


def test_rollup_avg_min_max(gengine):
    out = gengine.execute(
        "SELECT g, avg(x) AS a, min(x) AS lo, max(x) AS hi FROM t "
        "GROUP BY ROLLUP(g) ORDER BY g NULLS LAST")
    assert rows(out, "g", "a", "lo", "hi") == [
        ("a", 15.0, 10, 20), ("b", 40.0, 30, 50), (None, 30.0, 10, 50)]


def test_rollup_cube_still_column_names(gengine):
    # contextual words: usable as identifiers
    gengine.register_table("r", pa.table({"rollup": [1, 2], "cube": [3, 4]}))
    out = gengine.execute(
        "SELECT rollup, sum(cube) AS s FROM r GROUP BY rollup ORDER BY rollup")
    assert rows(out, "rollup", "s") == [(1, 3), (2, 4)]


def test_grouping_requires_group_expr(gengine):
    from igloo_tpu.errors import BindError
    with pytest.raises(BindError, match="grouping"):
        gengine.execute(
            "SELECT grouping(x) FROM t GROUP BY ROLLUP(g)")
