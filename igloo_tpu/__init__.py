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

import os as _os

import jax as _jax

# SQL needs 64-bit integers/floats (BIGINT/DOUBLE, count/sum semantics).
_jax.config.update("jax_enable_x64", True)

# persistent compilation cache: query programs are large and TPU
# (re)compiles are expensive — warm starts matter for a serving engine.
# Opt out with IGLOO_NO_COMPILE_CACHE=1 or point IGLOO_COMPILE_CACHE
# elsewhere.
if not _os.environ.get("IGLOO_NO_COMPILE_CACHE"):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("IGLOO_COMPILE_CACHE", "/tmp/igloo_jax_cache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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
