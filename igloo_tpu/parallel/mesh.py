"""Device mesh construction.

One flat data axis `d` over all devices (chips × hosts): SQL data
parallelism shards rows, and shuffle collectives ride ICI within a host's
chips and DCN across hosts — XLA picks the transport per link, which is
the TPU replacement for the reference's NCCL-free gRPC exchange
(SURVEY §2.8).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(shape: tuple | None = None, axes: tuple = ("d",),
              devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devs),)
    n = int(np.prod(shape))
    if n > len(devs):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devs)}")
    arr = np.array(devs[:n]).reshape(shape)
    return Mesh(arr, axes[:len(shape)])


def row_sharding(mesh: Mesh, axis: str = "d") -> NamedSharding:
    """(P, cap) arrays sharded one partition per device."""
    return NamedSharding(mesh, PartitionSpec(axis, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def global_get(x) -> np.ndarray:
    """Host numpy of a possibly process-spanning global array.

    Single-process meshes (and replicated outputs) are fully addressable
    — a plain device_get. Arrays sharded across OTHER processes of a
    multi-host slice need a process_allgather collective first (the
    multi-host analog of the reference coordinator's result collection,
    /root/reference/crates/coordinator/src/distributed_executor.rs:73-104).
    """
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
