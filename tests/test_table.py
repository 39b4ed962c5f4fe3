"""DeviceTable ingest/egress roundtrips."""

import numpy as np
import pyarrow as pa

from igloo_tpu.table import DeviceTable, pad_count


def test_pad_count():
    # capacities divide the Pallas kernels' 8192-row grid step so every
    # pallas_call grid is exact (table.py PAD)
    assert pad_count(0) == 8192
    assert pad_count(1) == 8192
    assert pad_count(8192) == 8192
    assert pad_count(8193) == 16384


def test_numeric_roundtrip():
    t = pa.table({
        "i": pa.array([1, 2, None, 4], type=pa.int64()),
        "f": pa.array([1.5, None, 3.5, 4.5], type=pa.float64()),
        "b": pa.array([True, False, None, True]),
    })
    dt = DeviceTable.from_arrow(t)
    assert dt.nrows == 4 and dt.capacity == 8192
    out = dt.to_arrow()
    assert out.to_pydict() == t.to_pydict()


def test_string_dictionary_roundtrip():
    t = pa.table({"s": ["banana", None, "apple", "banana", ""]})
    dt = DeviceTable.from_arrow(t)
    col = dt.columns["s"]
    # order-preserving dictionary: sorted
    assert list(col.dictionary) == sorted(col.dictionary)
    assert dt.to_arrow().to_pydict() == t.to_pydict()


def test_int32_preserved():
    t = pa.table({"x": pa.array([1, 2], type=pa.int32())})
    dt = DeviceTable.from_arrow(t)
    assert dt.to_arrow().schema.field("x").type == pa.int32()


def test_from_pydict():
    dt = DeviceTable.from_pydict({"a": [1, 2, 3]})
    assert dt.nrows == 3
    assert dt.to_pydict()["a"] == [1, 2, 3]


# ---------------------------------------------------------------------------
# persistent result cache
# ---------------------------------------------------------------------------

def test_persistent_cache_cross_process_key(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from igloo_tpu import QueryEngine

    data = pa.table({"x": pa.array(np.arange(100), type=pa.int64())})
    src = tmp_path / "t.parquet"
    pq.write_table(data, str(src))
    cdir = str(tmp_path / "cache")

    e1 = QueryEngine(cache_dir=cdir)
    e1.register_parquet("t", str(src))
    r1 = e1.execute("SELECT sum(x) AS s FROM t WHERE x < 50")
    assert r1.column("s").to_pylist() == [sum(range(50))]

    # a NEW engine (fresh process analog) hits the disk tier
    e2 = QueryEngine(cache_dir=cdir)
    e2.register_parquet("t", str(src))
    before = e2._result_cache.hits
    r2 = e2.execute("SELECT sum(x) AS s FROM t WHERE x < 50")
    assert r2.column("s").to_pylist() == [sum(range(50))]
    assert e2._result_cache.hits == before + 1

    # touching the source file invalidates the key
    import os, time
    os.utime(str(src), (time.time() + 10, time.time() + 10))
    e3 = QueryEngine(cache_dir=cdir)
    e3.register_parquet("t", str(src))
    e3.execute("SELECT sum(x) AS s FROM t WHERE x < 50")
    assert e3._result_cache.hits == 0  # recomputed, not served stale


def test_persistent_cache_memory_tables_never_cross(tmp_path):
    import pyarrow as pa
    from igloo_tpu import QueryEngine

    cdir = str(tmp_path / "cache")
    e1 = QueryEngine(cache_dir=cdir)
    e1.register_table("m", pa.table({"x": [1, 2, 3]}))
    assert e1.execute("SELECT sum(x) AS s FROM m").column("s").to_pylist() == [6]

    e2 = QueryEngine(cache_dir=cdir)
    e2.register_table("m", pa.table({"x": [10, 20, 30]}))
    out = e2.execute("SELECT sum(x) AS s FROM m")
    assert out.column("s").to_pylist() == [60]  # no stale cross-process hit


def test_shape_buckets():
    """Opt-in ingest-cap bucketing: small tables unchanged; big caps
    snap to a 1/16-granular log grid (≤12.5% pad), PAD-aligned."""
    import igloo_tpu.table as T
    assert T.bucket_count(100) == T.pad_count(100)
    assert T.bucket_count(1 << 20) == T.pad_count(1 << 20)
    old = T.SHAPE_BUCKETS
    T.SHAPE_BUCKETS = True
    try:
        for n in (60_000_000, 100_000_000, (1 << 20) + 1, 12_345_678):
            b = T.bucket_count(n)
            assert b >= T.pad_count(n)
            assert b % T.PAD == 0
            assert b <= T.pad_count(n) * 1.125 + T.PAD
        # nearby sizes share one shape
        assert T.bucket_count(60_000_000) == T.bucket_count(62_000_000)
    finally:
        T.SHAPE_BUCKETS = old
