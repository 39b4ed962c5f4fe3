"""DistributedQueryEngine: the full engine over a device mesh.

≙ the reference's coordinator role (process 0 parses/plans/collects,
/root/reference/crates/coordinator/src/main.rs) — but instead of mailing
fragments to stub workers, the distributable prefix of every plan runs as
one SPMD program over all devices (dist_exec.py) and only the
non-distributable tail (global ORDER BY, LIMIT, Values, set ops) runs on
the gathered result through the single-device executor.

The machinery lives in QueryEngine (fused execution over a 1-device
mesh); this subclass swaps in the full-slice mesh and adds explicit
partitioning controls.
"""

from __future__ import annotations

from typing import Optional

from ..config import EngineConfig
from ..engine import QueryEngine
from .mesh import make_mesh
from .partition import PartitionedTable


class DistributedQueryEngine(QueryEngine):
    def __init__(self, mesh=None, config: Optional[EngineConfig] = None,
                 **kwargs):
        config = config or EngineConfig(distributed=True)
        kwargs.setdefault("result_cache", config.result_cache)
        kwargs.setdefault("shape_buckets", config.shape_buckets)
        super().__init__(**kwargs)
        self.config = config
        self.auto_cluster = config.auto_cluster
        self.mesh = mesh or make_mesh(config.mesh_shape, config.mesh_axes)

    def partition_table(self, name: str, hash_key: Optional[str] = None,
                        cluster_key: Optional[str] = None) -> None:
        """Explicitly (re)partition a table: optionally hash-placed by
        key so joins/aggregates on that key skip their runtime shuffle,
        and/or clustered (per-shard sorted) by a key so sorted-probe
        joins on it skip their probe sort."""
        dt = self.catalog.get_table(name)
        pt = PartitionedTable.from_device_table(dt, self.mesh,
                                                hash_key=hash_key)
        if cluster_key is not None:
            pt.cluster_by(cluster_key)
        self._ptables[name.lower()] = pt
