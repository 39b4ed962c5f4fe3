"""Execution layer: jitted kernels over device columns.

Replaces the reference's operator runtime
(/root/reference/crates/engine/src/operators/, async RecordBatch streams)
with whole-column XLA programs + Pallas kernels and a selection-mask
(late-materialization) execution model.
"""
