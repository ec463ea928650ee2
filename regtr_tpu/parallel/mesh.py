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
    """Device-put every array in the batch with its leading axis sharded.

    Multi-process: each process's loader yields its OWN shard of the global
    batch, so the global array is the concatenation over processes —
    `make_array_from_process_local_data` expresses exactly that.  A plain
    device_put would instead treat every process's local batch as the same
    global value and silently keep only the addressable rows of each
    (verified empirically on the CPU multi-process backend), i.e. drop half
    of every process's data.
    """
    sh = batch_sharding(mesh, axis)
    if _spans_processes(mesh):
        return {
            k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def _spans_processes(mesh: Mesh) -> bool:
    return jax.process_count() > 1 and any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )


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
