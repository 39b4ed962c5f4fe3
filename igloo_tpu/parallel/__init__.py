"""SPMD distribution layer.

Replaces the reference's coordinator/worker fragment scheduler and its
(stubbed) gRPC data plane (/root/reference/crates/coordinator/,
crates/worker/ — SURVEY §2.2/§2.4/§2.8) with:

- tables hash/block-partitioned over a `jax.sharding.Mesh`,
- query fragments compiled to ONE `shard_map` SPMD program,
- repartitioning via `all_to_all` collectives over ICI/DCN instead of
  RecordBatch gRPC streams,
- `jax.distributed.initialize` for multi-host bootstrap
  (≙ RegisterWorker), with a control-plane shim in cluster.py for
  the reference's register/heartbeat surface.
"""

from .mesh import make_mesh
from .partition import PartitionedTable

__all__ = ["make_mesh", "PartitionedTable"]
