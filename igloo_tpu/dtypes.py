"""Logical SQL types and their device (JAX) physical mappings.

The reference engine inherits Arrow's type system wholesale (RecordBatch
columns, /root/reference/crates/engine/src/physical_plan.rs:13). Here the
logical type is engine metadata and the physical representation is chosen
for the TPU:

- integers/floats/bools → JAX arrays of the matching dtype
- strings → order-preserving dictionary codes (int32) + a host-side
  dictionary (numpy object array); all device compute happens on codes.

Order-preserving means the dictionary is sorted, so `code_a < code_b` iff
`str_a < str_b` — ORDER BY and range predicates on strings run entirely on
device. This replaces Arrow's native Utf8 arrays (which a TPU cannot
process) while keeping byte-exact output at egress.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np
import pyarrow as pa


class SqlType(enum.Enum):
    INT64 = "bigint"
    INT32 = "int"
    FLOAT64 = "double"
    FLOAT32 = "float"
    BOOL = "boolean"
    STRING = "varchar"
    DATE32 = "date"          # days since epoch, int32 physical
    TIMESTAMP = "timestamp"  # microseconds since epoch, int64 physical
    NULL = "null"            # type of a bare NULL literal

    # ---- classification ----
    @property
    def is_integer(self) -> bool:
        return self in (SqlType.INT64, SqlType.INT32)

    @property
    def is_float(self) -> bool:
        return self in (SqlType.FLOAT64, SqlType.FLOAT32)

    @property
    def is_numeric(self) -> bool:
        return self.is_integer or self.is_float

    @property
    def is_temporal(self) -> bool:
        return self in (SqlType.DATE32, SqlType.TIMESTAMP)

    @property
    def is_string(self) -> bool:
        return self is SqlType.STRING

    # ---- physical mapping ----
    def to_jax(self):
        return _JAX_OF[self]

    def to_arrow(self) -> pa.DataType:
        return _ARROW_OF[self]

    def __repr__(self) -> str:  # compact in plan dumps
        return self.name


_JAX_OF = {
    SqlType.INT64: jnp.int64,
    SqlType.INT32: jnp.int32,
    SqlType.FLOAT64: jnp.float64,
    SqlType.FLOAT32: jnp.float32,
    SqlType.BOOL: jnp.bool_,
    SqlType.STRING: jnp.int32,  # dictionary codes
    SqlType.DATE32: jnp.int32,
    SqlType.TIMESTAMP: jnp.int64,
    SqlType.NULL: jnp.int32,
}

_ARROW_OF = {
    SqlType.INT64: pa.int64(),
    SqlType.INT32: pa.int32(),
    SqlType.FLOAT64: pa.float64(),
    SqlType.FLOAT32: pa.float32(),
    SqlType.BOOL: pa.bool_(),
    SqlType.STRING: pa.string(),
    SqlType.DATE32: pa.date32(),
    SqlType.TIMESTAMP: pa.timestamp("us"),
    SqlType.NULL: pa.null(),
}


def from_arrow(t: pa.DataType) -> SqlType:
    """Map an Arrow type to a logical SqlType (widening where needed)."""
    if pa.types.is_dictionary(t):
        return from_arrow(t.value_type)
    if pa.types.is_int64(t) or pa.types.is_uint32(t) or pa.types.is_uint64(t):
        return SqlType.INT64
    if pa.types.is_integer(t):  # int8/16/32, uint8/16
        return SqlType.INT32
    if pa.types.is_float64(t):
        return SqlType.FLOAT64
    if pa.types.is_float32(t) or pa.types.is_float16(t):
        return SqlType.FLOAT32
    if pa.types.is_boolean(t):
        return SqlType.BOOL
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return SqlType.STRING
    if pa.types.is_date32(t):
        return SqlType.DATE32
    if pa.types.is_timestamp(t):
        return SqlType.TIMESTAMP
    if pa.types.is_date64(t):
        return SqlType.TIMESTAMP
    if pa.types.is_null(t):
        return SqlType.NULL
    raise TypeError(f"unsupported Arrow type for TPU ingest: {t}")


def common_type(a: SqlType, b: SqlType) -> SqlType:
    """Numeric type promotion for binary expressions (Postgres-like)."""
    if a == b:
        return a
    if a is SqlType.NULL:
        return b
    if b is SqlType.NULL:
        return a
    if a.is_numeric and b.is_numeric:
        if a.is_float or b.is_float:
            if SqlType.FLOAT64 in (a, b) or SqlType.INT64 in (a, b):
                return SqlType.FLOAT64
            return SqlType.FLOAT64 if SqlType.INT64 in (a, b) else SqlType.FLOAT32
        return SqlType.INT64  # int32 ∪ int64
    if a.is_temporal and b.is_temporal:
        return SqlType.TIMESTAMP
    raise TypeError(f"no common type for {a} and {b}")


def numpy_dtype(t: SqlType):
    return {
        SqlType.INT64: np.int64,
        SqlType.INT32: np.int32,
        SqlType.FLOAT64: np.float64,
        SqlType.FLOAT32: np.float32,
        SqlType.BOOL: np.bool_,
        SqlType.STRING: np.int32,
        SqlType.DATE32: np.int32,
        SqlType.TIMESTAMP: np.int64,
        SqlType.NULL: np.int32,
    }[t]
