"""ctypes loader for the native host library (native/igloo_host.cpp).

Builds lazily with g++ on first use if the .so is missing; every entry
point degrades to pure Python when the library (or a fast path) is
unavailable, so the engine never hard-depends on the toolchain.

Strings cross the boundary in Arrow layout (one UTF-8 buffer + int64
offsets) — zero copies on the C++ side. Non-ASCII entries are flagged by
the library and re-done with Python str methods, keeping Unicode
semantics identical to the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO_PATH = os.path.join(_REPO_ROOT, "build", "libigloo_host.so")
_SRC_PATH = os.path.join(_REPO_ROOT, "native", "igloo_host.cpp")

_OPS = {"upper": 0, "lower": 1, "reverse": 2, "trim": 3, "ltrim": 4,
        "rtrim": 5, "capitalize": 0}


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH):
            if not os.path.exists(_SRC_PATH):
                return None
            try:
                os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC_PATH, "-o", _SO_PATH],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.ascii_transform.restype = ctypes.c_int64
        lib.ascii_transform.argtypes = [u8p, i64p, ctypes.c_int64,
                                        ctypes.c_int32, u8p, i64p, u8p]
        lib.like_match.restype = None
        lib.like_match.argtypes = [u8p, i64p, ctypes.c_int64, u8p,
                                   ctypes.c_int64, ctypes.c_int32, u8p, u8p]
        lib.hash64_strings.restype = None
        lib.hash64_strings.argtypes = [u8p, i64p, ctypes.c_int64,
                                       ctypes.c_uint64, u64p]
        lib.string_lengths.restype = None
        lib.string_lengths.argtypes = [u8p, i64p, ctypes.c_int64, i64p, u8p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _to_arrow_layout(values: np.ndarray):
    """object array of str → (utf8 bytes, int64 offsets)."""
    encoded = [s.encode("utf-8") for s in values]
    offsets = np.zeros(len(encoded) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in encoded], out=offsets[1:])
    data = np.frombuffer(b"".join(encoded), dtype=np.uint8).copy()
    return data, offsets


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def dict_transform(values: np.ndarray, op: str,
                   py_fn=None) -> Optional[np.ndarray]:
    """Apply a string→string transform to a dictionary.

    Returns None when the native path is unavailable (caller falls back
    to pure Python). Non-ASCII entries are recomputed with py_fn.
    """
    lib = _load()
    if lib is None or op not in _OPS:
        return None
    n = len(values)
    if n == 0:
        return values.copy()
    data, offsets = _to_arrow_layout(values)
    out_data = np.empty_like(data) if len(data) else np.empty(1, np.uint8)
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    needs_py = np.zeros(n, dtype=np.uint8)
    rc = lib.ascii_transform(
        _ptr(data if len(data) else out_data, ctypes.c_uint8),
        _ptr(offsets, ctypes.c_int64), n, _OPS[op],
        _ptr(out_data, ctypes.c_uint8), _ptr(out_offsets, ctypes.c_int64),
        _ptr(needs_py, ctypes.c_uint8))
    if rc != 0:
        return None
    raw = out_data.tobytes()
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = raw[out_offsets[i]:out_offsets[i + 1]].decode("utf-8")
    if needs_py.any():
        if py_fn is None:
            return None
        for i in np.nonzero(needs_py)[0]:
            out[i] = py_fn(values[i])
    return out


def like_match(values: np.ndarray, pattern: str,
               case_insensitive: bool, py_matcher=None) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    n = len(values)
    if n == 0:
        return np.zeros(0, dtype=np.bool_)
    data, offsets = _to_arrow_layout(values)
    pat = np.frombuffer(pattern.encode("utf-8"), dtype=np.uint8).copy()
    out = np.zeros(n, dtype=np.uint8)
    needs_py = np.zeros(n, dtype=np.uint8)
    lib.like_match(
        _ptr(data if len(data) else out, ctypes.c_uint8),
        _ptr(offsets, ctypes.c_int64), n,
        _ptr(pat if len(pat) else out, ctypes.c_uint8), len(pat),
        1 if case_insensitive else 0,
        _ptr(out, ctypes.c_uint8), _ptr(needs_py, ctypes.c_uint8))
    result = out.astype(np.bool_)
    if needs_py.any():
        if py_matcher is None:
            return None
        for i in np.nonzero(needs_py)[0]:
            result[i] = bool(py_matcher(values[i]))
    return result


def hash_strings(values: np.ndarray, seed: int = 0) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    n = len(values)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    data, offsets = _to_arrow_layout(values)
    out = np.zeros(n, dtype=np.uint64)
    lib.hash64_strings(
        _ptr(data if len(data) else offsets.view(np.uint8)[:1], ctypes.c_uint8),
        _ptr(offsets, ctypes.c_int64), n, ctypes.c_uint64(seed),
        _ptr(out, ctypes.c_uint64))
    return out
