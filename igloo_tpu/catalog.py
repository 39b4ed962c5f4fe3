"""Table catalog: name → device-resident table (lazy-loading providers).

≙ the reference's MemoryCatalog (`HashMap<String, Arc<dyn TableProvider>>`,
/root/reference/crates/common/src/catalog.rs:5-27) plus its per-source
TableProvider impls (/root/reference/crates/connectors/). Providers here
decode on host via pyarrow (Arrow C++ — the same native substrate the
reference links) and stage columns into HBM once; repeat queries hit the
device-resident table (≙ the reference's Cache crate keyed by table).
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

import pyarrow as pa

from .dtypes import SqlType, from_arrow
from .errors import CatalogError
from .plan.logical import Field
from .table import DeviceTable


class TableProvider:
    """Lazily produces a DeviceTable; schema known up front.

    `identity` is a stable cross-process content fingerprint (e.g. file
    path + mtime + size) used by the persistent result cache; None means
    the table is process-local (in-memory) and cache keys involving it
    stay process-scoped."""

    identity: Optional[str] = None

    def schema(self) -> tuple:
        raise NotImplementedError

    def load(self) -> DeviceTable:
        raise NotImplementedError

    def row_estimate(self) -> Optional[int]:
        """Row count when known WITHOUT forcing a load (join-order
        costing); None otherwise."""
        return None


class MemoryProvider(TableProvider):
    def __init__(self, table: DeviceTable):
        self._table = table

    def schema(self):
        return tuple(Field(n, t, c.validity is not None)
                     for (n, t), c in zip(self._table.schema(),
                                          self._table.columns.values()))

    def load(self):
        return self._table

    def row_estimate(self):
        return self._table.nrows


class ArrowProvider(TableProvider):
    """Wraps a host pyarrow.Table; device upload happens on first scan."""

    def __init__(self, table: pa.Table, device=None):
        self._arrow = table
        self._device = device
        self._loaded: Optional[DeviceTable] = None

    def schema(self):
        return tuple(
            Field(f.name, from_arrow(f.type), f.nullable)
            for f in self._arrow.schema)

    def load(self):
        if self._loaded is None:
            self._loaded = DeviceTable.from_arrow(self._arrow, device=self._device)
        return self._loaded

    def row_estimate(self):
        return self._arrow.num_rows


class LazyFileProvider(TableProvider):
    """Parquet/CSV/Iceberg-dir provider: schema peek now, decode+upload lazily."""

    def __init__(self, schema_fn: Callable[[], pa.Schema],
                 load_fn: Callable[[], pa.Table], device=None,
                 identity: Optional[str] = None):
        self._schema_fn = schema_fn
        self._load_fn = load_fn
        self._device = device
        self._schema: Optional[tuple] = None
        self._loaded: Optional[DeviceTable] = None
        self.identity = identity

    def schema(self):
        if self._schema is None:
            s = self._schema_fn()
            self._schema = tuple(
                Field(f.name, from_arrow(f.type), f.nullable) for f in s)
        return self._schema

    def load(self):
        if self._loaded is None:
            t = self._load_fn()
            # load_fn may stream straight into a DeviceTable (bounded-
            # memory parquet ingest) instead of materializing pa.Table
            self._loaded = (t if isinstance(t, DeviceTable)
                            else DeviceTable.from_arrow(
                                t, device=self._device))
        return self._loaded

    def row_estimate(self):
        return self._loaded.nrows if self._loaded is not None else None


class Catalog:
    def __init__(self):
        self._providers: dict[str, TableProvider] = {}
        self._lock = threading.RLock()

    def register(self, name: str, provider: TableProvider,
                 overwrite: bool = True) -> None:
        with self._lock:
            key = name.lower()
            if not overwrite and key in self._providers:
                raise CatalogError(f"table {name!r} already registered")
            self._providers[key] = provider

    def deregister(self, name: str) -> bool:
        with self._lock:
            return self._providers.pop(name.lower(), None) is not None

    def names(self) -> list[str]:
        with self._lock:
            return sorted(self._providers)

    def fingerprint(self, volatile_token: str) -> str:
        """Stable catalog identity for persistent cache keys: each file-
        backed table contributes its content identity; in-memory tables
        contribute the process-local volatile token."""
        with self._lock:
            parts = [
                f"{name}={p.identity or ('volatile:' + volatile_token)}"
                for name, p in sorted(self._providers.items())
            ]
        return ";".join(parts)

    def has(self, name: str) -> bool:
        return name.lower() in self._providers

    def _get(self, name: str) -> TableProvider:
        p = self._providers.get(name.lower())
        if p is None:
            raise CatalogError(
                f"table {name!r} not found; registered tables: {self.names()}")
        return p

    def table_schema(self, name: str) -> tuple:
        return self._get(name).schema()

    def table_rows(self, name: str) -> Optional[int]:
        """Row count when known without forcing a load, else None."""
        p = self._providers.get(name.lower())
        return p.row_estimate() if p is not None else None

    def get_table(self, name: str) -> DeviceTable:
        return self._get(name).load()
