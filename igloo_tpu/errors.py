"""Error types for the igloo-tpu engine.

Mirrors the reference's error surface (igloo-common `Error` enum,
/root/reference/crates/common/src/error.rs:6-21: Unknown(String) +
SqlParser(ParserError)) but widened for the richer native engine:
the reference delegates planning/execution errors to DataFusion; here
those stages are ours, so they get first-class error types.
"""

from __future__ import annotations


class IglooError(Exception):
    """Base class for all engine errors (≙ igloo_common::Error)."""


class SqlParseError(IglooError):
    """SQL text could not be tokenized/parsed (≙ Error::SqlParser)."""

    def __init__(self, message: str, line: int | None = None, col: int | None = None):
        self.line = line
        self.col = col
        loc = f" at line {line}, col {col}" if line is not None else ""
        super().__init__(f"SQL parse error{loc}: {message}")


class BindError(IglooError):
    """Name-resolution / type-check failure while building the logical plan."""


class PlanError(IglooError):
    """Logical→physical lowering failure (≙ PhysicalPlanner NotImplemented paths,
    /root/reference/crates/engine/src/physical_planner.rs:136-138)."""


class NotSupportedError(PlanError):
    """Feature recognized but not implemented."""


class ExecutionError(IglooError):
    """Runtime failure during kernel execution."""


class CatalogError(IglooError):
    """Unknown table / duplicate registration (≙ MemoryCatalog miss,
    /root/reference/crates/common/src/catalog.rs:5-27)."""
