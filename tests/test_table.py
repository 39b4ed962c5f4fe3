"""DeviceTable ingest/egress roundtrips."""

import numpy as np
import pyarrow as pa

from igloo_tpu.table import DeviceTable, pad_count


def test_pad_count():
    assert pad_count(0) == 128
    assert pad_count(1) == 128
    assert pad_count(128) == 128
    assert pad_count(129) == 256


def test_numeric_roundtrip():
    t = pa.table({
        "i": pa.array([1, 2, None, 4], type=pa.int64()),
        "f": pa.array([1.5, None, 3.5, 4.5], type=pa.float64()),
        "b": pa.array([True, False, None, True]),
    })
    dt = DeviceTable.from_arrow(t)
    assert dt.nrows == 4 and dt.capacity == 128
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
