"""Connector tests: CSV, Iceberg-dir, engine registration surface.

≙ reference connector tests (crates/connectors/filesystem/src/lib.rs:48-114,
iceberg/src/lib.rs:150-185).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from igloo_tpu.errors import CatalogError


def test_csv_with_header(engine, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,name,score\n1,alpha,1.5\n2,beta,2.5\n3,,3.5\n")
    engine.register_csv("t", str(p))
    out = engine.execute("SELECT id, name, score FROM t WHERE score > 2 ORDER BY id")
    assert out.column("id").to_pylist() == [2, 3]
    assert out.column("name").to_pylist() == ["beta", None]


def test_csv_without_header(engine, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text("1,x\n2,y\n")
    engine.register_csv("t", str(p), has_header=False)
    out = engine.execute("SELECT * FROM t")
    assert out.num_rows == 2


def test_csv_missing_file(engine):
    with pytest.raises(CatalogError, match="does not exist"):
        engine.register_csv("t", "/nonexistent/file.csv")


def test_iceberg_directory(engine, tmp_path):
    # reference layout: {table}/data/**/*.parquet (iceberg/src/lib.rs:42-76)
    data_dir = tmp_path / "tbl" / "data" / "part=0"
    os.makedirs(data_dir)
    pq.write_table(pa.table({"x": [1, 2]}), data_dir / "a.parquet")
    pq.write_table(pa.table({"x": [3]}), data_dir / "b.parquet")
    engine.register_iceberg("ice", str(tmp_path / "tbl"))
    out = engine.execute("SELECT sum(x) AS s FROM ice")
    assert out.column("s")[0].as_py() == 6


def test_iceberg_missing_data_dir(engine, tmp_path):
    with pytest.raises(CatalogError, match="data dir"):
        engine.register_iceberg("ice", str(tmp_path / "empty"))


def test_register_overwrite_and_deregister(engine):
    engine.register_table("t", pa.table({"x": [1]}))
    engine.register_table("t", pa.table({"x": [7, 8]}))
    assert engine.execute("SELECT count(*) AS c FROM t").column("c")[0].as_py() == 2
    assert engine.deregister_table("t")
    from igloo_tpu.errors import CatalogError as CE
    with pytest.raises(CE):
        engine.execute("SELECT * FROM t")


def test_dbapi_sqlite(engine, tmp_path):
    import sqlite3
    db = tmp_path / "x.db"

    def connect():
        return sqlite3.connect(db)

    conn = connect()
    conn.execute("CREATE TABLE emp (id INTEGER, name TEXT, pay REAL)")
    conn.executemany("INSERT INTO emp VALUES (?, ?, ?)",
                     [(1, "a", 10.5), (2, "b", 20.0), (3, None, 7.25)])
    conn.commit()
    conn.close()

    engine.register_dbapi("emp", connect)
    out = engine.execute(
        "SELECT id, name, pay FROM emp WHERE pay > 8 ORDER BY id")
    assert out.column("id").to_pylist() == [1, 2]
    assert out.column("name").to_pylist() == ["a", "b"]
