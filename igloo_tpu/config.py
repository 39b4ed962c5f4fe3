"""Engine configuration.

≙ the reference's CLI flags (`--config`, `--sql`, `--distributed`,
/root/reference/crates/igloo/src/main.rs:9-20) and the reserved
`session_config` map (/root/reference/crates/api/proto/distributed.proto:46-49),
which the reference accepts but never implements. Here --config is honored
(JSON file) and session config keys map onto these fields.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass
class EngineConfig:
    # distribution
    distributed: bool = False
    mesh_shape: Optional[tuple] = None       # e.g. (8,) or (2, 4); None = all devices
    mesh_axes: tuple = ("d",)
    partition_count: Optional[int] = None    # default: number of devices
    # execution
    result_cache: bool = True
    # re-layout big fact tables on their join key after the first
    # sorted-probe join (engine.cluster_table applied lazily)
    auto_cluster: bool = True
    # snap ingest capacities to a 1/16-granular log grid so nearby table
    # sizes share compiled fragment shapes (≤12.5% pad in exchange for
    # a bounded distinct-compile count per workload)
    shape_buckets: bool = False
    max_result_cache_entries: int = 64
    # persistent (on-disk) result cache directory; None = memory-only
    cache_dir: Optional[str] = None
    # serving
    serve_host: str = "127.0.0.1"
    serve_port: int = 50051                  # reference coordinator port (main.rs:67)
    # data
    tables: dict = dataclasses.field(default_factory=dict)  # name -> {path, format}

    @classmethod
    def from_file(cls, path: str) -> "EngineConfig":
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in known}
        if "mesh_shape" in kwargs and kwargs["mesh_shape"] is not None:
            kwargs["mesh_shape"] = tuple(kwargs["mesh_shape"])
        return cls(**kwargs)

    def apply_session_config(self, conf: dict) -> "EngineConfig":
        out = dataclasses.replace(self)
        for k, v in conf.items():
            if hasattr(out, k):
                setattr(out, k, v)
        return out
