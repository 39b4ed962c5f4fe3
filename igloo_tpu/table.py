"""Device-resident columnar tables: the TPU replacement for Arrow RecordBatch.

The reference moves `arrow::RecordBatch` through every operator
(/root/reference/crates/engine/src/physical_plan.rs:11-17) in 1024-row
streamed batches (parquet_scan.rs:54). A TPU wants the opposite shape of
data: few, large, statically-shaped arrays resident in HBM so XLA can tile
them onto the VPU/MXU. So:

- A `Column` is one JAX array (whole table, padded to a lane multiple)
  plus an optional validity mask and, for strings, a host-side
  order-preserving dictionary (see dtypes.py).
- A `DeviceTable` is an ordered set of named Columns sharing a row count.
- Ingest (pyarrow → device) and egress (device → pyarrow) are the only
  places strings are materialized as bytes; all device compute is on
  fixed-width arrays.

Padding: row counts are padded up to a multiple of `PAD` so every kernel
sees aligned shapes; `nrows` carries the true count and operators mask the
tail (`row_mask()`).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa

from .dtypes import SqlType, from_arrow as sqltype_from_arrow, numpy_dtype

PAD = 8192  # grid-step alignment: every column length divides the Pallas
            # kernels' 8192-row grid step, so pallas_call grids are exact
            # (ragged final blocks DMA past the tile-padded allocation and
            # fault the TPU) and the in-jit pad/copy paths never trigger


def pad_count(n: int, pad: int = PAD) -> int:
    return max(pad, -(-n // pad) * pad)


# Opt-in ingest-capacity bucketing (EngineConfig.shape_buckets /
# QueryEngine(shape_buckets=True)): snap table capacities to a 1/16-
# granular log grid so nearby table sizes share compiled fragment
# shapes. Bounds the number of distinct XLA compiles a many-table
# workload triggers at the cost of ≤12.5% padded rows per table —
# leave off when per-query throughput matters more than compile count.
SHAPE_BUCKETS = False


def bucket_count(n: int) -> int:
    cap = pad_count(n)
    if not SHAPE_BUCKETS or cap <= (1 << 20):
        return cap
    step = 1 << ((cap - 1).bit_length() - 4)   # 16 steps per octave
    return pad_count(-(-cap // step) * step)


def combine_pair64(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """(lo, hi) int32 planes → int64 values."""
    lo_u = jax.lax.bitcast_convert_type(lo, jnp.uint32).astype(jnp.uint64)
    hi_u = jax.lax.bitcast_convert_type(hi, jnp.uint32).astype(jnp.uint64)
    return ((hi_u << jnp.uint64(32)) | lo_u).astype(jnp.int64)


@dataclasses.dataclass
class Column:
    data: jax.Array
    dtype: SqlType
    validity: jax.Array | None = None          # bool; True = valid; None = all valid
    dictionary: np.ndarray | None = None       # sorted str dictionary for STRING
    stats: tuple | None = None                 # (min, max) for integer columns
    # paired-int32 physical storage for INT64 columns: when set, `data`
    # is the LOW int32 plane and `pair_hi` the HIGH plane. XLA's x64
    # emulation otherwise peaks at 2× the column (both 4 GB split halves
    # + the 8 GB buffer) — paired storage lets a 2^30-row int64 column
    # live in 8 GB and lets plane-consumers (index-emit top-k) read the
    # hi word without ever materializing the 64-bit lanes.
    pair_hi: jax.Array | None = None

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    def data64(self) -> jax.Array:
        """Materialized logical array (combines paired planes)."""
        if self.pair_hi is None:
            return self.data
        return combine_pair64(self.data, self.pair_hi)

    def valid_mask(self, capacity: int | None = None) -> jax.Array:
        if self.validity is not None:
            return self.validity
        n = capacity if capacity is not None else self.capacity
        return jnp.ones((n,), dtype=jnp.bool_)


def _sort_dictionary(values: np.ndarray, codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Re-sort a dictionary so code order == lexicographic order, remapping codes."""
    order = np.argsort(values, kind="stable")
    rank = np.empty(len(values), dtype=np.int32)
    rank[order] = np.arange(len(values), dtype=np.int32)
    return values[order], rank[codes]


def encode_strings(arr: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Arrow string array → (codes int32, valid bool, sorted dictionary).

    Null slots get code 0 with valid=False.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_dictionary(arr.type):
        arr = arr.dictionary_encode()
    codes = arr.indices.to_numpy(zero_copy_only=False)
    valid = ~np.asarray(arr.is_null())
    codes = np.where(valid, codes, 0).astype(np.int32)
    values = np.asarray(arr.dictionary.to_pylist(), dtype=object)
    if len(values) == 0:
        values = np.asarray([""], dtype=object)
        codes = np.zeros_like(codes)
    values, codes = _sort_dictionary(values, codes)
    return codes, valid, values


class DeviceTable:
    """Named device columns + a true row count."""

    def __init__(self, columns: Mapping[str, Column], nrows: int):
        self.columns: dict[str, Column] = dict(columns)
        self.nrows = int(nrows)
        caps = {c.capacity for c in self.columns.values()}
        if len(caps) > 1:
            raise ValueError(f"ragged column capacities: {caps}")

    # ---- shape ----
    @property
    def capacity(self) -> int:
        if not self.columns:
            return pad_count(self.nrows)
        return next(iter(self.columns.values())).capacity

    @property
    def names(self) -> list[str]:
        return list(self.columns.keys())

    def schema(self) -> list[tuple[str, SqlType]]:
        return [(n, c.dtype) for n, c in self.columns.items()]

    def row_mask(self) -> jax.Array:
        """True for real rows, False for pad tail."""
        return jnp.arange(self.capacity) < self.nrows

    def __repr__(self) -> str:
        cols = ", ".join(f"{n}:{c.dtype.name}" for n, c in self.columns.items())
        return f"DeviceTable[{self.nrows} rows, cap {self.capacity}]({cols})"

    # ---- ingest ----
    @classmethod
    def from_arrow(cls, table: pa.Table, device=None) -> "DeviceTable":
        nrows = table.num_rows
        cap = bucket_count(nrows)
        cols: dict[str, Column] = {}
        for name, col in zip(table.column_names, table.columns):
            st = sqltype_from_arrow(col.type)
            if st.is_string:
                codes, valid, dictionary = encode_strings(col)
                data = _pad_np(codes, cap)
                vmask = None if valid.all() and nrows == cap else _pad_np(valid, cap)
                cols[name] = Column(
                    data=_put(data, device), dtype=st,
                    validity=_put(vmask, device) if vmask is not None else None,
                    dictionary=dictionary,
                )
            else:
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                np_data, valid = _np_column(arr, st)
                data = _pad_np(np_data, cap)
                vmask = None
                if valid is not None:
                    vmask = _pad_np(valid, cap)
                elif nrows != cap:
                    vmask = None  # tail handled by row_mask, not validity
                stats = None
                if st.is_integer and nrows > 0:
                    import pyarrow.compute as pc
                    try:
                        mm = pc.min_max(arr)
                        lo, hi = mm["min"].as_py(), mm["max"].as_py()
                        if lo is not None and hi is not None:
                            stats = (int(lo), int(hi))
                    except Exception:
                        stats = None
                cols[name] = Column(
                    data=_put(data, device), dtype=st,
                    validity=_put(vmask, device) if vmask is not None else None,
                    stats=stats,
                )
        return cls(cols, nrows)

    @classmethod
    def from_pydict(cls, data: Mapping[str, Iterable], device=None) -> "DeviceTable":
        return cls.from_arrow(pa.table(dict(data)), device=device)

    @classmethod
    def from_parquet_streamed(cls, path: str, device=None,
                              chunk_rows: int = 1 << 22) -> "DeviceTable":
        """Bounded-memory parquet ingest: row-group batches decode on
        the host and stream into preallocated device buffers via
        donated dynamic_update_slice programs, so peak memory is
        (device buffers + one chunk) on both sides instead of 2× the
        table. JAX async dispatch overlaps chunk i's host→device copy
        with chunk i+1's Arrow decode (the TPU-shaped analog of the
        reference's 1024-row streamed RecordBatches,
        /root/reference/crates/engine/src/operators/parquet_scan.rs:46-82).

        String/dictionary columns need the global order-preserving
        dictionary (a two-pass property) — tables containing them fall
        back to from_arrow. Integer min/max stats accumulate per chunk.
        """
        import functools

        import pyarrow.parquet as pq

        from .dtypes import from_arrow as sql_from_arrow

        pf = pq.ParquetFile(path)
        n = pf.metadata.num_rows
        schema = pf.schema_arrow
        sts = {}
        for f in schema:
            st = sql_from_arrow(f.type)
            if st.is_string:
                return cls.from_arrow(pq.read_table(path), device=device)
            sts[f.name] = st
        if n == 0:
            return cls.from_arrow(pq.read_table(path), device=device)

        # nullability per column from row-group metadata; unknown
        # null counts are treated as nullable
        nullable = {f.name: False for f in schema}
        for rg in range(pf.metadata.num_row_groups):
            for ci in range(pf.metadata.num_columns):
                col = pf.metadata.row_group(rg).column(ci)
                name = col.path_in_schema.split(".")[0]
                stats = col.statistics
                if stats is None or stats.null_count is None:
                    nullable[name] = True
                elif stats.null_count > 0:
                    nullable[name] = True

        cap = bucket_count(n)
        names = [f.name for f in schema]
        bufs = {}
        vbufs = {}
        for name in names:
            npdt = numpy_dtype(sts[name])
            bufs[name] = jnp.zeros((cap,), dtype=npdt)
            if nullable[name]:
                vbufs[name] = jnp.zeros((cap,), dtype=jnp.bool_)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def fill(b, vb, base, chunks, vchunks):
            b = {k: jax.lax.dynamic_update_slice(b[k], chunks[k], (base,))
                 for k in b}
            vb = {k: jax.lax.dynamic_update_slice(vb[k], vchunks[k],
                                                  (base,))
                  for k in vb}
            return b, vb

        stats_acc: dict = {name: None for name in names}
        base = 0
        for batch in pf.iter_batches(batch_size=chunk_rows):
            chunks = {}
            vchunks = {}
            for name in names:
                arr = batch.column(name)
                st = sts[name]
                np_data, valid = _np_column(arr, st)
                chunks[name] = np_data
                if name in vbufs:
                    vchunks[name] = (valid if valid is not None
                                     else np.ones(len(np_data), bool))
                if st.is_integer and len(np_data):
                    alive = np_data if valid is None else np_data[valid]
                    if len(alive):
                        lo, hi = int(alive.min()), int(alive.max())
                        cur = stats_acc[name]
                        stats_acc[name] = (
                            (lo, hi) if cur is None
                            else (min(cur[0], lo), max(cur[1], hi)))
            bufs, vbufs = fill(bufs, vbufs, jnp.int32(base),
                               chunks, vchunks)
            base += len(batch)

        cols = {}
        for name in names:
            vb = vbufs.get(name)
            cols[name] = Column(
                data=_put(bufs[name], device) if device else bufs[name],
                dtype=sts[name],
                # validity must ride with its data: a split placement
                # forces implicit transfers (or errors) in later jitted ops
                validity=(_put(vb, device) if (device and vb is not None)
                          else vb),
                stats=stats_acc[name])
        return cls(cols, n)

    # ---- egress ----
    # device→host egress chunk size (rows): large results transfer in
    # bounded slices instead of one whole-column d2h copy
    EGRESS_CHUNK_ROWS = 1 << 26

    def _chunked_get(self, col_or_arr, n: int) -> np.ndarray:
        if isinstance(col_or_arr, Column):
            if col_or_arr.pair_hi is None:
                return self._chunked_get(col_or_arr.data, n)
            step = self.EGRESS_CHUNK_ROWS
            if n <= step:
                return np.asarray(jax.device_get(
                    combine_pair64(col_or_arr.data[:n],
                                   col_or_arr.pair_hi[:n])))
            out = np.empty((n,), dtype=np.int64)
            for base in range(0, n, step):
                end = min(base + step, n)
                # combine per chunk: the full-width int64 never
                # materializes on device
                out[base:end] = np.asarray(jax.device_get(combine_pair64(
                    col_or_arr.data[base:end],
                    col_or_arr.pair_hi[base:end])))
            return out
        arr = col_or_arr
        step = self.EGRESS_CHUNK_ROWS
        if n <= step:
            return np.asarray(jax.device_get(arr))[:n]
        out = np.empty((n,), dtype=np.dtype(arr.dtype))
        for base in range(0, n, step):
            end = min(base + step, n)
            out[base:end] = np.asarray(jax.device_get(arr[base:end]))
        return out

    def to_arrow(self) -> pa.Table:
        arrays = []
        names = []
        n = self.nrows
        for name, col in self.columns.items():
            host = self._chunked_get(col, n)
            valid = None
            if col.validity is not None:
                valid = self._chunked_get(col.validity, n)
            if col.dtype.is_string:
                dictionary = col.dictionary if col.dictionary is not None else np.asarray([""], dtype=object)
                codes = np.clip(host.astype(np.int64), 0, len(dictionary) - 1)
                # vectorized rehydration: dictionary gather + null mask,
                # no per-row Python
                values = dictionary[codes]
                if valid is not None:
                    arrays.append(pa.array(values, type=pa.string(),
                                           mask=~valid))
                else:
                    arrays.append(pa.array(values, type=pa.string()))
            else:
                arrow_t = col.dtype.to_arrow()
                if col.dtype.is_temporal:
                    phys = pa.int32() if col.dtype is SqlType.DATE32 else pa.int64()
                    a = (pa.array(host, type=phys, mask=~valid)
                         if valid is not None else pa.array(host, type=phys))
                    arrays.append(a.cast(arrow_t))
                elif valid is not None:
                    arrays.append(pa.array(host, type=arrow_t, mask=~valid))
                else:
                    arrays.append(pa.array(host, type=arrow_t))
            names.append(name)
        if not names:
            return pa.table({})
        return pa.table(dict(zip(names, arrays)))

    def to_pydict(self) -> dict[str, list]:
        return self.to_arrow().to_pydict()

    def to_pandas(self):
        return self.to_arrow().to_pandas()


def _put(x, device):
    if x is None:
        return None
    arr = jnp.asarray(x)
    if device is not None:
        arr = jax.device_put(arr, device)
    return arr


def _np_column(arr, st: SqlType):
    """Arrow array/batch-column → (np_data, valid|None) in the engine's
    physical representation (temporal→int days/µs, nulls zero-filled)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if st.is_temporal:
        # physical representation: date32 → days (int32),
        # timestamp → microseconds (int64)
        target = pa.int32() if st is SqlType.DATE32 else pa.int64()
        if st is SqlType.TIMESTAMP:
            arr = arr.cast(pa.timestamp("us"))
        arr = arr.cast(target)
    valid = ~np.asarray(arr.is_null()) if arr.null_count else None
    npdt = numpy_dtype(st)
    np_data = arr.to_numpy(zero_copy_only=False)
    if valid is not None:
        # to_numpy of a nullable column yields float with NaN; refetch
        # via fill
        np_data = arr.fill_null(_zero_value(st)).to_numpy(
            zero_copy_only=False)
    return np.ascontiguousarray(np_data).astype(npdt, copy=False), valid


def _pad_np(a: np.ndarray, cap: int) -> np.ndarray:
    if len(a) == cap:
        return a
    out = np.zeros((cap,), dtype=a.dtype)
    out[: len(a)] = a
    return out


def _zero_value(st: SqlType):
    if st.is_float:
        return 0.0
    if st is SqlType.BOOL:
        return False
    return 0
