"""Golden parity tests anchored to the reference engine's own fixtures.

- SELECT 42 → Int64 "answer" (/root/reference/crates/engine/src/lib.rs:156-184)
- capitalize UDF + ORDER BY NULLS FIRST (lib.rs:186-231)
- parquet filter+sort E2E (crates/engine/tests/integration_test.rs:14-76)
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_select_42(engine):
    out = engine.execute("SELECT 42 as answer;")
    assert out.num_rows == 1
    assert out.schema.field("answer").type == pa.int64()
    assert out.column("answer")[0].as_py() == 42


def test_capitalize_udf_nulls_first(engine):
    # the reference's UDF test verbatim (lib.rs:186-231)
    engine.register_table("test_strings", pa.table({
        "text_col": ["hello", "WoRlD", None, "rust", ""],
    }))
    out = engine.execute(
        "SELECT capitalize(text_col) AS capitalized_text FROM test_strings "
        "ORDER BY capitalized_text ASC NULLS FIRST")
    assert out.column("capitalized_text").to_pylist() == [
        None, "", "HELLO", "RUST", "WORLD"]


def test_end_to_end_parquet_query(engine, tmp_path):
    # the reference's canonical E2E test (integration_test.rs:14-76)
    path = tmp_path / "test_data.parquet"
    pq.write_table(pa.table({
        "id": pa.array([1, 2, 3, 4, 5], type=pa.int32()),
        "name": ["Alice", "Bob", "Charlie", "Diana", "Eve"],
        "age": pa.array([25, 30, 35, 28, 32], type=pa.int32()),
    }), path)
    engine.register_parquet("test_table", str(path))
    out = engine.execute(
        "SELECT name, age FROM test_table WHERE age > 30 ORDER BY age")
    assert out.num_rows == 2
    assert out.column("name").to_pylist() == ["Eve", "Charlie"]
    assert out.column("age").to_pylist() == [32, 35]


def test_users_filter_projection(users_engine):
    # BASELINE config #1: SELECT name WHERE age > 25
    out = users_engine.execute("SELECT name FROM users WHERE age > 25")
    assert sorted(out.column("name").to_pylist()) == [
        "Bob", "Charlie", "Diana", "Eve"]
