"""Data-plane kernels.

Every operator the reference implements as a Rust stream operator
(/root/reference/crates/engine/src/operators/) or delegates to DataFusion
(aggregate, sort) is here as a whole-column XLA/Pallas program:

- masks.py      selection-mask algebra + compaction (late materialization)
- sort_ops.py   multi-key sort with SQL null ordering, top-k
- aggregate.py  grouped/ungrouped aggregation (sort-based + MXU one-hot path)
- join_ops.py   sorted-key equi-join (inner/left/right/full/semi/anti/cross)
- hashing.py    64-bit key mixing for shuffle partitioning
- pallas/       hand-written TPU kernels for the hot paths
"""
