"""Device-mesh helpers.

The reference's "distributed" story is two ROS processes + five pthreads on
one CPU (SURVEY §2 parallelism table, §5.8).  The TPU-native scale-out story
replaces it entirely: the descriptor bank, keyframe map, and pose graph
shard over a `jax.sharding.Mesh`, with XLA collectives (psum / all_gather)
riding ICI.  These helpers standardize mesh construction for one chip, one
host's chips, or a multi-host pod slice (jax.distributed — same code path).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


BANK_AXIS = "bank"


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize multi-host JAX (call once per host before make_mesh()).

    On cloud TPU pods the arguments auto-detect from the environment
    (`jax.distributed.initialize()` with no args); for manual clusters pass
    coordinator "host:port", the process count, and this host's index.
    Returns the global device count.  After this, `make_mesh()` over
    `jax.devices()` spans the whole slice and every collective in
    sharded_bank/dist_pgo rides ICI/DCN unchanged."""
    import jax

    if coordinator is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return len(jax.devices())


def make_mesh(
    num_devices: Optional[int] = None,
    axis: str = BANK_AXIS,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D mesh over the first `num_devices` devices (default: all)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def bank_sharding(mesh: Mesh, axis: str = BANK_AXIS) -> NamedSharding:
    """Shard the leading (keyframe) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
