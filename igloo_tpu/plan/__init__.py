"""Planning layers: AST → bound logical plan → optimized plan → execution.

Replaces the reference's split front-end (DataFusion logical planning +
Igloo PhysicalPlanner, /root/reference/crates/engine/src/physical_planner.rs:23-140)
with one native pipeline.
"""

from .binder import Binder
from .logical import LogicalPlan
from .optimizer import optimize

__all__ = ["Binder", "LogicalPlan", "optimize"]
