"""Mesh-sharded data-parallel radar odometry (fleet / reprocessing scale).

make_batched_odometry_step (models/odometry.py) advances B independent
sensor streams in one program on one chip; this module shards the batch
axis across a device mesh so the same program spans all chips of a host or
a pod slice — the scale-out shape for mapping fleets and dataset
reprocessing.  There is nothing to communicate between streams (pure data
parallelism), so the only collective cost is the initial placement: XLA
compiles the vmapped step once per device with B/d streams each.

The reference has no analogue: one orora process handles one sensor
(SURVEY §1 L4)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from navtech_radar_slam_tpu.config import SlamConfig
from navtech_radar_slam_tpu.models import odometry as odo_mod
from navtech_radar_slam_tpu.parallel.mesh import BANK_AXIS


def make_sharded_batched_odometry(mesh: Mesh, cfg: SlamConfig,
                                  axis: str = BANK_AXIS):
    """Returns (step, shard) where

    step(powers (B, NA, NB), azimuths (NA,), carry, twists (B, 3))
        -> (carry', results, features_out)   — batch axis sharded over mesh
    shard(pytree) places batch-leading arrays with the stream sharding
        (use it on the initial carry / first upload).

    B must divide the mesh size.  All outputs keep the stream sharding, so
    chained calls never resharded; fetch only the small result leaves."""
    stream_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    step = functools.partial(odo_mod.odometry_step, cfg=cfg)
    batched = jax.vmap(step, in_axes=(0, None, 0, 0))

    jitted = jax.jit(
        batched,
        in_shardings=(stream_sharding, replicated, stream_sharding,
                      stream_sharding),
    )

    def shard(tree):
        return jax.device_put(tree, stream_sharding)

    return jitted, shard


def make_sharded_extract(mesh: Mesh, cfg: SlamConfig, axis: str = BANK_AXIS):
    """Sharded batched feature extraction: (B, NA, NB) scans -> ScanFeatures
    with the batch axis sharded (seeds the carry for the sharded step)."""
    stream_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def extract(powers, azimuths):
        return jax.vmap(
            lambda p: odo_mod.extract_scan_features(p, azimuths, cfg)
        )(powers)

    return jax.jit(
        extract, in_shardings=(stream_sharding, replicated)
    )
