"""Tokenizer/parser unit tests (≙ reference parser shim coverage,
/root/reference/crates/engine/src/parser.rs)."""

import pytest

from igloo_tpu.sql import ast, parse_sql
from igloo_tpu.errors import SqlParseError


def test_simple_select():
    s = parse_sql("SELECT 42 as answer;")
    assert isinstance(s, ast.Select)
    assert s.items[0].alias == "answer"
    assert s.items[0].expr == ast.Literal(42)


def test_select_star_where_order():
    s = parse_sql("SELECT * FROM t WHERE age > 30 ORDER BY age DESC NULLS FIRST LIMIT 3 OFFSET 1")
    assert isinstance(s.items[0].expr, ast.Star)
    assert isinstance(s.from_, ast.TableRef) and s.from_.name == "t"
    assert isinstance(s.where, ast.BinaryOp) and s.where.op is ast.BinOp.GT
    (o,) = s.order_by
    assert o.ascending is False and o.nulls_first is True
    assert s.limit == 3 and s.offset == 1


def test_join_kinds():
    s = parse_sql("SELECT a.x FROM a LEFT OUTER JOIN b ON a.id = b.id")
    j = s.from_
    assert isinstance(j, ast.Join) and j.kind is ast.JoinKind.LEFT
    s2 = parse_sql("SELECT 1 FROM a, b")
    assert s2.from_.kind is ast.JoinKind.CROSS
    s3 = parse_sql("SELECT 1 FROM a JOIN b USING (id, ts)")
    assert s3.from_.using == ("id", "ts")


def test_group_by_having():
    s = parse_sql("SELECT dept, sum(pay) FROM emp GROUP BY dept HAVING sum(pay) > 10")
    assert len(s.group_by) == 1
    assert isinstance(s.having, ast.BinaryOp)


def test_expressions():
    s = parse_sql("SELECT a + b * 2, -c, NOT d, e IS NOT NULL, f BETWEEN 1 AND 2, "
                  "g IN (1, 2, 3), h LIKE 'x%', CAST(i AS BIGINT), "
                  "CASE WHEN a > 0 THEN 'pos' ELSE 'neg' END FROM t")
    exprs = [it.expr for it in s.items]
    assert isinstance(exprs[0], ast.BinaryOp) and exprs[0].op is ast.BinOp.ADD
    assert isinstance(exprs[0].right, ast.BinaryOp)  # precedence: b*2
    assert isinstance(exprs[1], ast.UnaryOp)
    assert isinstance(exprs[3], ast.IsNull) and exprs[3].negated
    assert isinstance(exprs[4], ast.Between)
    assert isinstance(exprs[5], ast.InList)
    assert isinstance(exprs[6], ast.Like)
    assert isinstance(exprs[7], ast.Cast) and exprs[7].type_name == "bigint"
    assert isinstance(exprs[8], ast.Case)


def test_string_escapes_and_comments():
    s = parse_sql("SELECT 'it''s' -- trailing\n, 2 /* block */ FROM t")
    assert s.items[0].expr == ast.Literal("it's")


def test_cte_union():
    s = parse_sql("WITH x AS (SELECT 1 a) SELECT a FROM x UNION ALL SELECT 2")
    assert isinstance(s, ast.SetOp) and s.kind is ast.SetOpKind.UNION_ALL
    assert s.ctes[0][0] == "x"


def test_subquery_relation():
    s = parse_sql("SELECT y FROM (SELECT a AS y FROM t) sub WHERE y < (SELECT max(a) FROM t)")
    assert isinstance(s.from_, ast.SubqueryRef) and s.from_.alias == "sub"
    assert isinstance(s.where.right, ast.ScalarSubquery)


def test_statements():
    assert isinstance(parse_sql("EXPLAIN SELECT 1"), ast.Explain)
    assert isinstance(parse_sql("SHOW TABLES"), ast.ShowTables)
    c = parse_sql("CREATE TABLE t2 AS SELECT * FROM t")
    assert isinstance(c, ast.CreateTableAs) and c.name == "t2"
    d = parse_sql("DROP TABLE IF EXISTS t2")
    assert isinstance(d, ast.DropTable) and d.if_exists


def test_errors():
    with pytest.raises(SqlParseError):
        parse_sql("SELECT FROM")
    with pytest.raises(SqlParseError):
        parse_sql("SELECT 'unterminated")
    with pytest.raises(SqlParseError):
        parse_sql("SELECT 1 2 3 !!!")


def test_distinct_and_functions():
    s = parse_sql("SELECT DISTINCT count(DISTINCT x), count(*) FROM t")
    assert s.distinct
    f0 = s.items[0].expr
    assert f0.distinct and f0.name == "count"
    f1 = s.items[1].expr
    assert isinstance(f1.args[0], ast.Star)
