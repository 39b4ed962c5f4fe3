"""Native host library (C++ via ctypes) parity with pure Python."""

import numpy as np
import pytest

from igloo_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_dict_transform_parity():
    vals = np.asarray(["Hello", "WORLD", "  pad  ", "", "mïxéd", "ASCII"],
                      dtype=object)
    for op, py in [("upper", str.upper), ("lower", str.lower),
                   ("reverse", lambda s: s[::-1]), ("trim", str.strip),
                   ("ltrim", str.lstrip), ("rtrim", str.rstrip)]:
        got = native.dict_transform(vals, op, py_fn=py)
        assert got is not None
        assert list(got) == [py(s) for s in vals], op


def test_like_match_parity():
    from igloo_tpu.exec.expr import like_to_regex
    vals = np.asarray(["apple", "applesauce", "grape", "ap_le", "", "Ümlaut"],
                      dtype=object)
    for pattern, ci in [("ap%", False), ("%pp%", False), ("a__le", False),
                        ("%", False), ("", False), ("APPLE%", True),
                        ("ap\\_le", False), ("üm%", True)]:
        rx = like_to_regex(pattern, ci)
        got = native.like_match(vals, pattern, ci, py_matcher=rx.match)
        want = [bool(rx.match(s)) for s in vals]
        assert got is not None and list(got) == want, (pattern, ci)


def test_hash_strings():
    vals = np.asarray(["a", "b", "a", ""], dtype=object)
    h = native.hash_strings(vals)
    assert h is not None
    assert h[0] == h[2] and h[0] != h[1]


def test_engine_uses_native_path(engine):
    import pyarrow as pa
    engine.register_table("t", pa.table({"s": ["Foo", "BAR", "Straße", None]}))
    out = engine.execute("SELECT upper(s) AS u FROM t ORDER BY u NULLS LAST")
    assert out.column("u").to_pylist() == ["BAR", "FOO", "STRASSE", None]
