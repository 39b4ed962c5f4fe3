"""SQL front end: tokenizer → parser → AST.

Replaces the reference's delegation to sqlparser-rs
(/root/reference/crates/engine/src/parser.rs:7-12) and DataFusion's SQL
planner. Pure Python — this is control-plane code and never hot.
"""

from .parser import parse_sql
from . import ast

__all__ = ["parse_sql", "ast"]
