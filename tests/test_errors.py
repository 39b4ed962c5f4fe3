"""Error surface: parse, bind, catalog, execution failures."""

import pyarrow as pa
import pytest

from igloo_tpu.errors import (BindError, CatalogError, NotSupportedError,
                              SqlParseError)


def test_parse_errors(engine):
    with pytest.raises(SqlParseError):
        engine.execute("SELEC 1")
    with pytest.raises(SqlParseError):
        engine.execute("SELECT 1 FROM")


def test_unknown_table(engine):
    with pytest.raises(CatalogError, match="not found"):
        engine.execute("SELECT * FROM nope")


def test_unknown_column(engine):
    engine.register_table("t", pa.table({"x": [1]}))
    with pytest.raises(BindError, match="not found"):
        engine.execute("SELECT y FROM t")
    with pytest.raises(BindError, match="available: t.x"):
        engine.execute("SELECT t.y FROM t")


def test_ambiguous_column(engine):
    engine.register_table("a", pa.table({"k": [1]}))
    engine.register_table("b", pa.table({"k": [1]}))
    with pytest.raises(BindError, match="ambiguous"):
        engine.execute("SELECT k FROM a JOIN b ON a.k = b.k")


def test_type_errors(engine):
    engine.register_table("t", pa.table({"s": ["x"], "n": [1]}))
    with pytest.raises(BindError):
        engine.execute("SELECT s + 1 FROM t")
    with pytest.raises(BindError):
        engine.execute("SELECT sum(s) FROM t")
    with pytest.raises(BindError, match="GROUP BY"):
        engine.execute("SELECT n, s FROM t GROUP BY n")


def test_unknown_function(engine):
    engine.register_table("t", pa.table({"x": [1]}))
    with pytest.raises(BindError, match="unknown function"):
        engine.execute("SELECT frobnicate(x) FROM t")


def test_having_without_group(engine):
    engine.register_table("t", pa.table({"x": [1]}))
    with pytest.raises(BindError, match="HAVING"):
        engine.execute("SELECT x FROM t HAVING x > 1")


def test_drop_missing_table(engine):
    from igloo_tpu.errors import IglooError
    with pytest.raises(IglooError, match="does not exist"):
        engine.execute("DROP TABLE missing")
    # IF EXISTS swallows it
    engine.execute("DROP TABLE IF EXISTS missing")
