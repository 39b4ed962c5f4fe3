"""Bounded-memory parquet ingest (DeviceTable.from_parquet_streamed) and
chunked d2h egress: results must match the whole-table path exactly.
≙ the reference's 1024-row streamed RecordBatches
(/root/reference/crates/engine/src/operators/parquet_scan.rs:46-82)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def pq_file(tmp_path):
    rng = np.random.default_rng(5)
    n = 50_000
    v = rng.integers(-1000, 1000, n).astype(object)
    v[rng.integers(0, n, n // 9)] = None
    t = pa.table({
        "a": pa.array(rng.integers(0, 1 << 40, n), type=pa.int64()),
        "b": pa.array(rng.integers(0, 100, n), type=pa.int32()),
        "v": pa.array(list(v), type=pa.int32()),
        "f": pa.array(rng.random(n), type=pa.float64()),
    })
    path = tmp_path / "t.parquet"
    pq.write_table(t, path, row_group_size=7000)   # several row groups
    return str(path), t


def test_streamed_matches_from_arrow(pq_file):
    from igloo_tpu.table import DeviceTable
    path, t = pq_file
    whole = DeviceTable.from_arrow(t)
    streamed = DeviceTable.from_parquet_streamed(path, chunk_rows=6000)
    assert streamed.nrows == whole.nrows
    wa, sa = whole.to_arrow(), streamed.to_arrow()
    for name in t.column_names:
        assert sa.column(name).to_pylist() == wa.column(name).to_pylist()
    # integer stats accumulate across chunks
    for name in ("a", "b", "v"):
        assert streamed.columns[name].stats == whole.columns[name].stats


def test_streamed_via_register(engine, pq_file, monkeypatch):
    monkeypatch.setenv("IGLOO_STREAM_INGEST_BYTES", "1")  # force streaming
    path, t = pq_file
    engine.register_parquet("pt", path)
    out = engine.execute("SELECT count(*) AS c, sum(b) AS s FROM pt")
    assert out.column(0).to_pylist() == [t.num_rows]
    assert out.column(1).to_pylist() == [
        int(np.asarray(t.column("b")).sum())]
    out = engine.execute("SELECT count(*) AS c FROM pt WHERE v IS NULL")
    assert out.column(0).to_pylist() == [t.column("v").null_count]


def test_chunked_egress(pq_file, monkeypatch):
    from igloo_tpu.table import DeviceTable
    path, t = pq_file
    dt = DeviceTable.from_arrow(t)
    monkeypatch.setattr(DeviceTable, "EGRESS_CHUNK_ROWS", 8192)
    out = dt.to_arrow()
    for name in t.column_names:
        assert out.column(name).to_pylist() == \
            t.column(name).to_pylist()
