"""Storage connectors: host-side decode (pyarrow / Arrow C++) → HBM staging.

≙ /root/reference/crates/connectors/{filesystem,iceberg,postgres,mysql}
and the ParquetScanExec operator
(/root/reference/crates/engine/src/operators/parquet_scan.rs).
"""

from .dbapi import register_dbapi
from .files import register_csv, register_parquet, register_iceberg

__all__ = ["register_csv", "register_parquet", "register_iceberg",
           "register_dbapi"]
