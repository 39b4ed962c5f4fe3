"""igloo-tpu: a TPU-native distributed SQL query-execution engine.

A from-scratch JAX/XLA/Pallas realization of the capability surface of
igloo-io/igloo (a Rust coordinator/worker SQL engine on DataFusion +
Arrow Flight; structural analysis in SURVEY.md). The data plane is
whole-column device compute under `jax.jit`/`shard_map`; the control
plane (parsing, planning, catalog, cluster coordination) is host Python;
ingest/egress ride Arrow C++ via pyarrow.

Quick start:

    import igloo_tpu
    eng = igloo_tpu.QueryEngine()
    eng.register_parquet("t", "data/sample.parquet")
    eng.execute("SELECT name, age FROM t WHERE age > 30 ORDER BY age")
"""

import jax as _jax

# SQL needs 64-bit integers/floats (BIGINT/DOUBLE, count/sum semantics).
_jax.config.update("jax_enable_x64", True)

from .engine import QueryEngine
from .table import DeviceTable


def DistributedQueryEngine(*args, **kwargs):
    """Engine over the full device mesh (lazy import to keep base import
    light)."""
    from .parallel.engine import DistributedQueryEngine as _D
    return _D(*args, **kwargs)
from .catalog import Catalog
from .errors import (BindError, CatalogError, ExecutionError, IglooError,
                     NotSupportedError, PlanError, SqlParseError)
from .dtypes import SqlType

__version__ = "0.1.0"

__all__ = [
    "QueryEngine", "DistributedQueryEngine", "DeviceTable", "Catalog",
    "SqlType",
    "IglooError", "SqlParseError", "BindError", "PlanError",
    "NotSupportedError", "ExecutionError", "CatalogError",
]
