"""File connectors: Parquet, CSV, Iceberg-style directories.

Decode runs in Arrow C++ (pyarrow, multithreaded) — the same native
substrate the reference links (parquet crate / csv crate,
/root/reference/crates/engine/src/operators/parquet_scan.rs,
/root/reference/crates/connectors/filesystem/src/lib.rs). Instead of the
reference's 1024-row streamed batches (parquet_scan.rs:54), whole columns
are staged into HBM once; the TPU wants few large arrays, not many small
batches.

Iceberg support mirrors the reference's `IcebergScanExec`
(/root/reference/crates/connectors/iceberg/src/lib.rs:42-143): recursive
`*.parquet` discovery under `{table}/data/` with no manifest handling.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq

from ..catalog import Catalog, LazyFileProvider
from ..errors import CatalogError


def _file_identity(kind: str, *paths: str) -> str:
    """Stable cross-process content fingerprint for the persistent result
    cache: absolute path + mtime_ns + size per file."""
    parts = [kind]
    for path in paths:
        st = os.stat(path)
        parts.append(f"{os.path.abspath(path)}:{st.st_mtime_ns}:{st.st_size}")
    return "|".join(parts)


def register_parquet(catalog: Catalog, name: str, path: str, device=None) -> None:
    if not os.path.exists(path):
        raise CatalogError(f"parquet path does not exist: {path}")

    def schema_fn():
        return pq.read_schema(path)

    # files past this size ingest in bounded row-group chunks with
    # decode↔upload overlap (table.py from_parquet_streamed) instead of
    # materializing the whole pa.Table + a second device copy
    stream_bytes = int(os.environ.get("IGLOO_STREAM_INGEST_BYTES",
                                      256 << 20))

    def load_fn():
        from ..table import DeviceTable
        if os.path.getsize(path) >= stream_bytes:
            return DeviceTable.from_parquet_streamed(path, device=device)
        return pq.read_table(path)

    catalog.register(name, LazyFileProvider(
        schema_fn, load_fn, device=device,
        identity=_file_identity("parquet", path)))


def register_csv(catalog: Catalog, name: str, path: str, *,
                 has_header: bool = True, device=None) -> None:
    """≙ CsvTable (filesystem connector, lib.rs:18-46) incl. the
    has_header flag the reference exposes."""
    if not os.path.exists(path):
        raise CatalogError(f"csv path does not exist: {path}")
    read_opts = pacsv.ReadOptions(autogenerate_column_names=not has_header)
    conv_opts = pacsv.ConvertOptions(strings_can_be_null=True)

    def schema_fn():
        return pacsv.read_csv(path, read_options=read_opts,
                              convert_options=conv_opts).schema

    def load_fn():
        return pacsv.read_csv(path, read_options=read_opts,
                              convert_options=conv_opts)

    catalog.register(name, LazyFileProvider(
        schema_fn, load_fn, device=device,
        identity=_file_identity("csv", path)))


def register_iceberg(catalog: Catalog, name: str, table_dir: str, device=None) -> None:
    """Directory-layout Iceberg scan: every *.parquet under {table}/data/,
    recursively (≙ iceberg/src/lib.rs:42-76 `find_parquet_files`)."""
    data_dir = os.path.join(table_dir, "data")
    if not os.path.isdir(data_dir):
        raise CatalogError(f"iceberg data dir does not exist: {data_dir}")

    def files():
        out = sorted(glob.glob(os.path.join(data_dir, "**", "*.parquet"),
                               recursive=True))
        if not out:
            raise CatalogError(f"no parquet files under {data_dir}")
        return out

    def schema_fn():
        return pq.read_schema(files()[0])

    def load_fn():
        tables = [pq.read_table(f) for f in files()]
        return pa.concat_tables(tables, promote_options="permissive")

    catalog.register(name, LazyFileProvider(
        schema_fn, load_fn, device=device,
        identity=_file_identity("iceberg", *files())))
