"""Generic DB-API 2.0 connector.

≙ the reference's postgres/mysql connectors — which are 9-line TODO
stubs (/root/reference/crates/connectors/{postgres,mysql}/src/lib.rs:1-9).
This is the real thing: any DB-API driver (psycopg2, mysql-connector,
sqlite3, …) can back a table; rows fetch once, convert to Arrow, and
stage into HBM like every other source.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

from ..catalog import Catalog, LazyFileProvider


def _fetch_arrow(connect: Callable, query: str) -> pa.Table:
    conn = connect()
    try:
        cur = conn.cursor()
        try:
            cur.execute(query)
            col_names = [d[0] for d in cur.description]
            rows = cur.fetchall()
        finally:
            cur.close()
    finally:
        conn.close()
    columns = {name: [r[i] for r in rows] for i, name in enumerate(col_names)}
    return pa.table(columns) if rows else pa.table(
        {name: pa.array([], type=pa.null()) for name in col_names})


def register_dbapi(catalog: Catalog, name: str, connect: Callable,
                   query: str | None = None, device=None) -> None:
    """Register a table backed by a DB-API connection factory.

    connect: zero-arg callable returning a DB-API connection
    query: SQL to fetch rows (default: SELECT * FROM {name})
    """
    q = query or f"SELECT * FROM {name}"

    def schema_fn():
        return _fetch_arrow(connect, q).schema

    def load_fn():
        return _fetch_arrow(connect, q)

    catalog.register(name, LazyFileProvider(schema_fn, load_fn, device=device))
