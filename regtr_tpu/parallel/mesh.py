"""Device mesh construction + sharding helpers.

The reference is strictly single-device (SURVEY.md §2.3).  Here scaling is a
first-class design: a 1-D `data` mesh over all local chips (v5e-8 and up),
batch axis sharded in whole pairs (see core/pairs.py), parameters
replicated.  Multi-host extends the same mesh over DCN via
jax.distributed.initialize; collectives are implicit through pjit/sharding.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data",
              platform: Optional[str] = None) -> Mesh:
    devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (cloud-batch) axis across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device-put every array in the batch with its leading axis sharded."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host initialization over DCN (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
